"""Corpus-level statistics: global word frequencies and per-document
rarity scores — the explode/flat-map family over the ``documents`` table.

Scale shape: the explode NEVER ships raw word rows.  Each batch collapses
its words with an Arrow C++ hash-groupby first (zipf head words become
ONE row per batch), so the shuffle moves per-batch partials — the same
partial-then-finalize discipline as the numeric aggregates
(SURVEY.md §2.6; reference's latent Athena surface, README.md:113).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from realtime_clickstream_lakehouse_ray.config import tune_context
from realtime_clickstream_lakehouse_ray.functions.textstats import split_words
from realtime_clickstream_lakehouse_ray.pipelines.relational import topk


def _read_docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    tune_context()
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _word_partials(t: pa.Table) -> pa.Table:
    """Explode one batch's text into words and pre-combine counts
    (vectorized split + flatten + Arrow hash-groupby; no Python rows)."""
    flat = pc.list_flatten(split_words(t["text"]))
    agg = pa.table({"word": flat}).group_by("word").aggregate([("word", "count")])
    return pa.table(
        {"word": agg["word"], "n_part": agg["word_count"].cast(pa.int64())}
    )


def word_frequencies(sf_dir: str) -> ray.data.Dataset:
    """Global word -> total occurrence count (the full vocabulary)."""
    return (
        _read_docs(sf_dir, ["text"])
        .map_batches(_word_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n_part", alias_name="n"))
    )


def word_freq_topk(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Top-k corpus words (ties broken by word, so the set is exact)."""
    return topk(
        word_frequencies(sf_dir),
        keys=[("n", "descending"), ("word", "ascending")],
        k=k,
    )


def doc_rarity(sf_dir: str) -> ray.data.Dataset:
    """Per-document rarity: the global frequency of its rarest word
    (``min_df``) and its count of hapax legomena (``n_hapax``) — the
    corpus-novelty signals a data-quality filter keys on.

    Two stages: the vocabulary aggregate above, then one broadcast of the
    (word -> n) table into a second scan — per batch, words flatten and
    look up their counts via a C hash map, and per-doc min / hapax-count
    reduce over the list offsets with ``np.ufunc.reduceat``.  At 100-TB
    vocabulary (where the broadcast no longer fits) the same pipeline
    runs with the lookup replaced by the repo's bucketed hash join on
    ``word`` (relational.bucket_hash_join); the broadcast form is the
    documented small-side regime."""
    vocab = word_frequencies(sf_dir).to_pandas()
    freq_ref = ray.put(pd.Series(vocab["n"].to_numpy(), index=vocab["word"]))

    def fn(t: pa.Table) -> pa.Table:
        freq = ray.get(freq_ref)  # local zero-copy fetch per batch
        words = split_words(t["text"])
        offsets = np.asarray(words.offsets, dtype=np.int64)
        flat = words.flatten().to_pandas()
        n = flat.map(freq).to_numpy(dtype=np.int64)
        starts, lens = offsets[:-1], np.diff(offsets)
        keep = lens > 0
        min_df = np.minimum.reduceat(n, starts[keep])
        n_hapax = np.add.reduceat((n == 1).astype(np.int64), starts[keep])
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().filter(pa.array(keep)),
                "min_df": pa.array(min_df),
                "n_hapax": pa.array(n_hapax),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def doc_rarity_bucketed(sf_dir: str) -> ray.data.Dataset:
    """The 100-TB-vocabulary regime of ``doc_rarity``, as REAL code rather
    than a docstring promise: when the (word -> n) table no longer fits a
    broadcast, the per-word frequency lookup becomes a bucketed hash join
    on ``word`` — distinct (doc, word) presence rows join the vocabulary
    aggregate inside word-hash buckets, then one doc-keyed groupby
    finalizes Min(df) / hapax count.  Two shuffles total (word-bucket
    join + doc groupby), nothing vocabulary-sized ever on one node.
    Equality-tested against the broadcast regime in pytest.

    Note the semantics match ``doc_rarity`` exactly because min/hapax are
    presence-based: collapsing to DISTINCT (doc, word) before the join
    changes neither the per-doc min df nor which words are hapax."""
    from ray.data.aggregate import Min as _Min

    from realtime_clickstream_lakehouse_ray.pipelines.relational import bucket_hash_join

    vocab = word_frequencies(sf_dir)

    def explode_distinct(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        lens = np.asarray(pc.list_value_length(words)).astype(np.int64)
        flat = np.asarray(words.flatten()).astype(object)
        if not len(flat):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "w": pa.array([], pa.string())}
            )
        rows = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        uniq, codes = np.unique(flat, return_inverse=True)
        key = np.unique(codes.astype(np.int64) * len(t) + rows)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[key % len(t)]),
                "w": pa.array(uniq[key // len(t)].astype(str)),
            }
        )

    presence = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode_distinct, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = bucket_hash_join(presence, vocab, "w", "word", how="inner")

    def partial(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"]).astype(np.int64)
        g = (
            pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n": pa.array(n),
                    "h": pa.array((n == 1).astype(np.int64)),
                }
            )
            .group_by("doc_id")
            .aggregate([("n", "min"), ("h", "sum")])
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "min_part": g["n_min"].cast(pa.int64()),
                "hapax_part": g["h_sum"].cast(pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(
            _Min("min_part", alias_name="min_df"),
            Sum("hapax_part", alias_name="n_hapax"),
        )
    )


def chunk_documents(sf_dir: str, size: int = 64, stride: int = 48) -> ray.data.Dataset:
    """Explode each document into fixed-size overlapping chunks (the
    context-window splitter of an LLM data pipeline): chunk ``i`` covers
    bytes ``[i*stride, i*stride + size)``; the last chunk may be short.

    Fully vectorized row expansion over the Arrow string buffer — chunk
    offsets are computed with ``np.repeat``/``arange`` and the output
    StringArray is assembled with one fancy-indexed gather from the input
    value buffer (``StringArray.from_buffers``): no Python per-row slicing.
    Chunking is byte-based; the oracle's ``substr`` is character-based —
    identical on this ASCII corpus (documented limitation for UTF-8, where
    a real deployment chunks on rune boundaries in the same kernel)."""

    def explode(t: pa.Table) -> pa.Table:
        col = t["text"].combine_chunks().cast(pa.large_string())
        offsets = np.frombuffer(
            col.buffers()[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
        )
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        doc_start, n_bytes = offsets[:-1], np.diff(offsets)
        n_chunks = np.where(n_bytes > 0, (np.maximum(n_bytes, 1) - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        doc_rep = np.repeat(np.arange(len(t), dtype=np.int64), n_chunks)
        first_out = np.cumsum(n_chunks) - n_chunks
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(first_out, n_chunks)
        c_start = doc_start[doc_rep] + chunk_idx * stride
        c_len = np.minimum(size, n_bytes[doc_rep] - chunk_idx * stride)
        out_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(c_len, out=out_off[1:])
        gather = np.repeat(c_start, c_len) + (
            np.arange(out_off[-1], dtype=np.int64) - np.repeat(out_off[:-1], c_len)
        )
        chunks = pa.StringArray.from_buffers(
            total,
            pa.py_buffer(out_off.astype(np.int32).tobytes()),
            pa.py_buffer(buf[gather].tobytes()),
        )
        return pa.table(
            {
                "doc_id": pc.take(t["doc_id"].combine_chunks(), pa.array(doc_rep)),
                "chunk_idx": pa.array(chunk_idx),
                "chunk": chunks,
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def token_histogram(sf_dir: str, bin_width: int = 50) -> ray.data.Dataset:
    """Corpus length histogram per source: documents bucketed by
    ``n_chars // bin_width`` — the length-distribution summary every
    mixture report starts with.  Per-batch Arrow hash-groupby partials,
    then a tiny (sources × bins) Sum finalize: the shuffle moves per-batch
    partial counts, never documents."""

    def partial(t: pa.Table) -> pa.Table:
        bins = (np.asarray(t["n_chars"]).astype(np.int64) // bin_width) * bin_width
        agg = (
            pa.table({"source": t["source"], "bin_lo": pa.array(bins)})
            .group_by(["source", "bin_lo"])
            .aggregate([("bin_lo", "count")])
        )
        return pa.table(
            {
                "source": agg["source"],
                "bin_lo": agg["bin_lo"],
                "n_part": agg["bin_lo_count"].cast(pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir, ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "bin_lo"])
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )


def corpus_rollup(sf_dir: str) -> pa.Table:
    """GROUPING-SETS rollup over (source, lang): doc counts + char totals
    at every level — (source,lang), (source), (lang), grand total — with
    rolled-up keys as the ``'<all>'`` sentinel (NULL-free, so the result
    hashes identically across engines).

    Scale shape: the DISTRIBUTED part is the finest-level aggregate
    (per-batch hash-groupby partials → (source,lang) Sum); the coarser
    levels derive from that ~(sources × langs)-row result — a classic
    small-finalize, computed once on the collected aggregate (hundreds of
    rows at ANY corpus size, since rollup cardinality is bounded by the
    key domain, not the data)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        agg = (
            pa.table(
                {
                    "source": t["source"],
                    "lang": t["lang"],
                    "n_chars": t["n_chars"],
                }
            )
            .group_by(["source", "lang"])
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
        )
        return pa.table(
            {
                "source": agg["source"],
                "lang": agg["lang"],
                "n_part": agg["n_chars_count"].cast(pa.int64()),
                "c_part": agg["n_chars_sum"].cast(pa.int64()),
            }
        )

    fine = (
        _read_docs(sf_dir, ["source", "lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n_part", alias_name="n_docs"), Sum("c_part", alias_name="sum_chars"))
        .to_pandas()
    )
    levels = [fine.assign()]
    for keys in (["source"], ["lang"], []):
        g = (
            fine.groupby(keys, as_index=False)[["n_docs", "sum_chars"]].sum()
            if keys
            else fine[["n_docs", "sum_chars"]].sum().to_frame().T
        )
        for col in ("source", "lang"):
            if col not in g.columns:
                g[col] = "<all>"
        levels.append(g[["source", "lang", "n_docs", "sum_chars"]])
    out = pd.concat(levels, ignore_index=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _doc_word_runs(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch (doc_row, word_code, tf) runs + the batch's sorted
    vocabulary: explode words, lexsort (doc, code), collapse equal pairs.
    ``np.unique`` returns codes in lexicographic word order, so code order
    IS word order (used for exact tie-breaks)."""
    words = split_words(t["text"])
    offsets = np.asarray(words.offsets, dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(offsets))
    flat = np.asarray(words.flatten(), dtype=object)
    if not len(flat):
        z = np.empty(0, dtype=np.int64)
        return np.empty(0, dtype=object), z, z, z
    uniq, codes = np.unique(flat, return_inverse=True)
    order = np.lexsort((codes, doc_idx))
    d, c = doc_idx[order], codes[order]
    first = np.ones(len(d), dtype=bool)
    first[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    starts = np.flatnonzero(first)
    tf = np.diff(np.append(starts, len(d))).astype(np.int64)
    return uniq, d[starts], c[starts], tf


def doc_frequencies(sf_dir: str) -> ray.data.Dataset:
    """Global word -> number of documents containing it (DF)."""

    def partial(t: pa.Table) -> pa.Table:
        uniq, _, c, _ = _doc_word_runs(t)
        n = np.bincount(c, minlength=len(uniq)).astype(np.int64)
        return pa.table({"word": pa.array(uniq.astype(str)), "n_part": pa.array(n)})

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n_part", alias_name="df"))
    )


def tfidf_top_terms(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-document top-``k`` TF-IDF terms — the keyword extractor of a
    corpus-analysis pipeline.  Score = tf / df (df = document frequency);
    both engines compute the identical IEEE division, and ties break by
    word, so the selection is exact.

    Two stages, the ``doc_rarity`` broadcast regime: the DF aggregate is
    broadcast ONCE (vocabulary-sized — Heaps' law keeps it ≪ corpus; the
    documented large-vocabulary fallback is the bucketed hash join on
    ``word``), then one stateless vectorized pass computes per-doc term
    frequencies (lexsort run-length), gathers df, and trims to the top-k
    per doc with the run-rank kernel — no shuffle on the corpus side."""
    dfs = doc_frequencies(sf_dir).to_pandas()
    df_ref = ray.put(pd.Series(dfs["df"].to_numpy(), index=dfs["word"]))

    def fn(t: pa.Table) -> pa.Table:
        df_map = ray.get(df_ref)  # local zero-copy fetch per batch
        uniq, d, c, tf = _doc_word_runs(t)
        if not len(d):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                }
            )
        df_uniq = df_map.reindex(uniq.astype(str)).to_numpy(dtype=np.int64)
        df = df_uniq[c]
        score = tf.astype(np.float64) / df.astype(np.float64)
        order = np.lexsort((c, -score, d))
        dd = d[order]
        first = np.ones(len(dd), dtype=bool)
        first[1:] = dd[1:] != dd[:-1]
        run_start = np.maximum.accumulate(np.where(first, np.arange(len(dd)), 0))
        rank = np.arange(len(dd)) - run_start
        keep = np.sort(order[rank < k])
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[d[keep]]),
                "word": pa.array(uniq[c[keep]].astype(str)),
                "tf": pa.array(tf[keep]),
                "df": pa.array(df[keep]),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def heavy_hitter_words(sf_dir: str, inv_phi: int = 512, cap: int = 1024) -> pa.Table:
    """EXACT heavy hitters: every word whose corpus count ``n`` satisfies
    ``n * inv_phi >= N`` (N = total word occurrences), via the two-pass
    sketch-then-recount pattern — the way heavy hitters are found at
    100 TB without ever shuffling the full vocabulary:

    1. **Candidate pass** (one ``map_batches``, no shuffle): each batch
       builds a Misra–Gries summary of capacity ``cap`` — Arrow hash-
       groupby counts, minus the (cap+1)-th largest count, positive
       entries kept.  Summaries are mergeable by summation with total
       undercount <= N/(cap+1) per item (Agarwal et al., *Mergeable
       Summaries*), so with ``cap + 1 >= 2 * inv_phi`` every true heavy
       hitter has a positive merged count — the union of batch summaries
       is a guaranteed candidate SUPERSET, of size <= batches x cap
       (constant per batch, never vocabulary-sized).
    2. **Recount pass** (one ``map_batches``, no shuffle): the sorted
       candidate array is broadcast (``ray.put``); each batch emits exact
       counts restricted to candidates (searchsorted membership +
       bincount); the driver sums the candidate-sized partials and applies
       the integer-exact threshold ``n * inv_phi >= N``.

    Exactness: pass 1 can only over-generate candidates; pass 2 counts
    are exact; the threshold is integer arithmetic — so the output equals
    the oracle's ``HAVING count(*) * inv_phi >= total`` relation."""
    if cap + 1 < 2 * inv_phi:
        raise ValueError("need cap + 1 >= 2 * inv_phi for the superset guarantee")
    tune_context()
    docs = _read_docs(sf_dir, ["text"])

    def mg_partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(split_words(t["text"]))
        agg = pa.table({"word": flat}).group_by("word").aggregate([("word", "count")])
        words = np.asarray(agg["word"]).astype(str)
        cnts = np.asarray(agg["word_count"]).astype(np.int64)
        if len(cnts) > cap:
            kth = np.partition(cnts, len(cnts) - cap - 1)[len(cnts) - cap - 1]
            adj = cnts - kth
            keep = adj > 0
            words, cnts = words[keep], adj[keep]
        # "" sentinel row carries the batch's total word count (whitespace
        # split never yields an empty word, so the key cannot collide)
        return pa.table(
            {
                "word": pa.array(np.concatenate([words, np.array([""])])),
                "n_part": pa.array(np.concatenate([cnts, [int(len(flat))]])),
            }
        )

    parts = [
        t
        for t in ray.get(
            docs.map_batches(
                mg_partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    if not parts:
        return empty
    merged = pa.concat_tables(parts)
    w = np.asarray(merged["word"]).astype(str)
    c = np.asarray(merged["n_part"]).astype(np.int64)
    total = int(c[w == ""].sum())
    cand = np.unique(w[w != ""])
    if not len(cand) or total == 0:
        return empty
    cand_ref = ray.put(cand)

    def recount(t: pa.Table) -> pa.Table:
        from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

        keys = get_broadcast(cand_ref)
        flat = np.asarray(pc.list_flatten(split_words(t["text"]))).astype(str)
        idx = np.searchsorted(keys, flat)
        in_r = idx < len(keys)
        hit = np.zeros(len(flat), dtype=bool)
        hit[in_r] = keys[idx[in_r]] == flat[in_r]
        n = np.bincount(idx[hit], minlength=len(keys)).astype(np.int64)
        return pa.table({"i": pa.array(np.arange(len(keys), dtype=np.int64)), "n_part": pa.array(n)})

    counts = np.zeros(len(cand), dtype=np.int64)
    for t in ray.get(
        docs.map_batches(
            recount, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    ):
        if t.num_rows:
            counts[np.asarray(t["i"])] += np.asarray(t["n_part"])
    ok = counts * inv_phi >= total
    out = pa.table({"word": pa.array(cand[ok]), "n": pa.array(counts[ok])})
    return out.sort_by([("n", "descending"), ("word", "ascending")])


# ---------------------------------------------------------------------------
def _doc_ngram_rows(t: pa.Table, n: int) -> tuple[np.ndarray, pa.Array]:
    """Per-batch (doc_row, ngram-string) pairs: word n-grams built with
    n Arrow takes + ONE binary_join_element_wise — fully vectorized, no
    per-row Python."""
    words = split_words(t["text"])
    offsets = np.asarray(words.offsets, dtype=np.int64)
    lengths = np.diff(offsets)
    flat = words.flatten()
    total = len(flat)
    if total < n or len(t) == 0:
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    doc_per_pos = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
    # an n-gram starting at position i is valid iff i and i+n-1 fall in
    # the same document
    valid = doc_per_pos[: total - n + 1] == doc_per_pos[n - 1:]
    idx = np.flatnonzero(valid)
    if not len(idx):
        return np.empty(0, dtype=np.int64), pa.array([], pa.string())
    parts = [flat.take(pa.array(idx + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return doc_per_pos[idx], grams


def ngram_novelty(sf_dir: str, n: int = 3) -> ray.data.Dataset:
    """Per-document n-gram novelty — the integer-exact cousin of LM-based
    quality scoring: for each document, how many of its word ``n``-gram
    occurrences also appear in at least one OTHER document
    (``n_shared``), the total (``n_grams``), and the shared ratio.  Low
    ratio = novel text; ratio 1.0 = boilerplate assembled from corpus-
    common phrases.  Documents with fewer than ``n`` words emit no row
    (they have no n-grams), matching the oracle's inner join.

    Scale shape (two passes, the ``tfidf_top_terms`` broadcast regime):

      pass 1  per-batch partials collapse to DISTINCT (ngram, doc) pairs
              before the shuffle, then ``groupby(ngram).sum`` computes
              document frequency; only grams with df >= 2 survive —
              broadcast ONCE as a sorted hash64 set (phrase-vocabulary
              sized; the documented large-set fallback is the bucketed
              hash join on the gram hash, as in ``ngram_jaccard_dedup``).
      pass 2  one stateless vectorized ``map_batches``: rebuild grams,
              membership via searchsorted, two bincounts per batch.

    The broadcast membership test uses 64-bit gram hashes (collision
    odds ~(distinct grams)^2 / 2^64 — negligible, same contract as the
    engine's other hashed-identity kernels)."""
    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        doc_rows, grams = _doc_ngram_rows(t, n)
        if not len(doc_rows):
            return pa.table(
                {"g": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
            )
        uniq, codes = np.unique(np.asarray(grams).astype(object), return_inverse=True)
        # distinct (gram, doc) pairs within the batch
        key = codes.astype(np.int64) * len(t) + doc_rows
        gcode = np.unique(key) // len(t)
        n_docs = np.bincount(gcode, minlength=len(uniq)).astype(np.int64)
        return pa.table({"g": pa.array(uniq.astype(str)), "n_part": pa.array(n_docs)})

    df = (
        docs.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .aggregate(Sum("n_part", alias_name="df"))
    )

    def shared_partial(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater_equal(t["df"], 2))
        return pa.table({"h": pa.array(np.sort(hash64(keep["g"])))})

    shared_parts = df.map_batches(
        shared_partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    shared_ref = ray.put(np.sort(shared_parts["h"].to_numpy().astype(np.uint64)))

    def score(t: pa.Table) -> pa.Table:
        doc_rows, grams = _doc_ngram_rows(t, n)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
                "shared_ratio": pa.array([], pa.float64()),
            }
        )
        if not len(doc_rows):
            return empty
        shared = get_broadcast(shared_ref)
        h = hash64(grams)
        pos = np.searchsorted(shared, h)
        in_r = pos < len(shared)
        member = np.zeros(len(h), dtype=bool)
        member[in_r] = shared[pos[in_r]] == h[in_r]
        total = np.bincount(doc_rows, minlength=len(t)).astype(np.int64)
        hit = np.bincount(doc_rows[member], minlength=len(t)).astype(np.int64)
        has = total > 0
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(t["doc_id"])[has]),
                "n_grams": pa.array(total[has]),
                "n_shared": pa.array(hit[has]),
                "shared_ratio": pa.array(hit[has] / total[has]),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def source_ngram_overlap(sf_dir: str, n: int = 3, num_buckets: int = 64) -> pa.Table:
    """Inter-source contamination matrix: for every pair of sources, the
    exact Jaccard similarity of their DISTINCT word-``n``-gram sets
    (``n_inter``, ``n_union``, ``jaccard``; pairs sharing nothing are
    omitted, matching the oracle's inner join).  This is the corpus-level
    mix diagnostic run before weighting sources in a training mixture —
    two "different" crawls with jaccard ~1 are the same data twice.

    Scale shape: batches emit DISTINCT (gram-hash, source-code) pairs
    (per-batch dedup first), bucketed by gram hash so every copy of a
    gram lands in one bucket — per-bucket distinct IS global distinct.
    Inside a bucket each gram's source set becomes a uint64 BITMASK
    (``bitwise_or.reduceat`` — no per-gram Python); distinct masks
    (a handful of patterns) expand to per-source and per-pair counts.
    Only #buckets × ≤|sources|² partial rows reach the driver — the
    corpus never does.  Supports ≤64 sources (the bitmask width); the
    documented wider fallback is a second bucket level on source-code
    blocks.  Gram identity is the 58-bit truncated hash64 (collision
    odds negligible, same contract as the engine's other hashed-identity
    kernels)."""
    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    docs = _read_docs(sf_dir, ["source", "text"])

    empty = pa.table(
        {
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "n_inter": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    # tiny: the distinct source list (broadcast as the global code table)
    src_partials = docs.map_batches(
        lambda t: pa.table({"source": pc.unique(t["source"].combine_chunks())}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    sources = np.sort(src_partials["source"].unique().astype(object))
    n_src = len(sources)
    if n_src == 0:
        return empty
    if n_src > 64:
        raise ValueError(
            f"source_ngram_overlap supports <=64 sources (bitmask width), got {n_src}"
        )
    src_ref = ray.put(sources)

    def explode(t: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {"key": pa.array([], pa.uint64()), "__gb": pa.array([], pa.int32())}
        )
        srcs = get_broadcast(src_ref)
        tt = pa.table(
            {"doc_id": pa.array(np.arange(len(t), dtype=np.int64)), "text": t["text"]}
        )
        rows, grams = _doc_ngram_rows(tt, n)
        if not len(rows):
            return out_empty
        h58 = hash64(grams) >> np.uint64(6)  # 58-bit gram id; 6 bits for code
        sc = np.searchsorted(srcs, np.asarray(t["source"]).astype(object)[rows])
        key = np.unique(h58 * np.uint64(64) + sc.astype(np.uint64))
        return pa.table(
            {
                "key": pa.array(key),
                "__gb": pa.array(
                    ((key >> np.uint64(6)) % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        uk = np.unique(g["key"].to_numpy().astype(np.uint64))
        h = uk >> np.uint64(6)
        sc = (uk & np.uint64(63)).astype(np.int64)
        first = np.ones(len(h), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(first)
        masks = np.bitwise_or.reduceat(
            np.uint64(1) << sc.astype(np.uint64), starts
        )
        um, mc = np.unique(masks, return_counts=True)
        per_src = np.zeros(n_src, dtype=np.int64)
        inter = np.zeros(n_src * n_src, dtype=np.int64)
        # loop over DISTINCT source-set patterns (≤ min(2^n_src, grams);
        # in practice a handful), never over grams
        for m, c in zip(um, mc):
            bits = np.flatnonzero(
                (m >> np.arange(n_src, dtype=np.uint64)) & np.uint64(1)
            )
            per_src[bits] += int(c)
            if len(bits) >= 2:
                a, b = np.triu_indices(len(bits), k=1)
                np.add.at(inter, bits[a] * n_src + bits[b], int(c))
        rows = {"kind": [], "code": [], "n": []}
        nz = np.flatnonzero(per_src)
        rows["kind"] += ["src"] * len(nz)
        rows["code"] += nz.tolist()
        rows["n"] += per_src[nz].tolist()
        nz = np.flatnonzero(inter)
        rows["kind"] += ["pair"] * len(nz)
        rows["code"] += nz.tolist()
        rows["n"] += inter[nz].tolist()
        return pd.DataFrame(rows)

    partials = (
        docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(bucket_partials, batch_format="pandas")
        .to_pandas()  # ≤ num_buckets × (n_src + n_src²) tiny rows
    )
    if partials.empty:
        return empty
    agg = partials.groupby(["kind", "code"])["n"].sum()
    per_src = np.zeros(n_src, dtype=np.int64)
    for (kind, code), v in agg.items():
        if kind == "src":
            per_src[code] = v
    out_a, out_b, out_i, out_u = [], [], [], []
    for (kind, code), v in sorted(agg.items()):
        if kind != "pair":
            continue
        a, b = divmod(int(code), n_src)
        out_a.append(sources[a])
        out_b.append(sources[b])
        out_i.append(int(v))
        out_u.append(int(per_src[a] + per_src[b] - v))
    if not out_a:
        return empty
    return pa.table(
        {
            "source_a": pa.array(out_a, pa.string()),
            "source_b": pa.array(out_b, pa.string()),
            "n_inter": pa.array(out_i, pa.int64()),
            "n_union": pa.array(out_u, pa.int64()),
            "jaccard": pa.array(
                np.array(out_i, dtype=np.float64) / np.array(out_u, dtype=np.float64)
            ),
        }
    ).sort_by([("source_a", "ascending"), ("source_b", "ascending")])


def vocab_oov_rate(sf_dir: str, vocab_k: int = 200) -> pa.Table:
    """Per-source vocabulary coverage: total word occurrences, distinct
    words, and out-of-vocabulary occurrences vs the global top-``vocab_k``
    corpus vocabulary — the "does source X speak the corpus's language"
    signal a mixture designer reads before weighting sources (high OOV =
    domain shift / noise).  All three measures are integer-exact.

    Scale shape, three partial-then-finalize legs and ONE tiny broadcast:
      - vocab:     the existing ``word_freq_topk`` aggregate (ties broken
                   by word, deterministic), k rows to the driver;
      - totals:    per-batch (source, n_words, n_oov) partials against the
                   broadcast vocab set -> Sum per source (no raw words
                   shuffle; OOV test is one vectorized ``np.isin``);
      - distinct:  per-batch DISTINCT (source, word) combiner -> bucket by
                   ``hash(word)`` (a word lives in ONE bucket, so bucket
                   counts never double-count) -> per-source Sum — the
                   ``daily_distinct_users`` template.
    Finalize merges three #source-row tables on the driver."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    vocab = (
        word_freq_topk(sf_dir, k=vocab_k).to_pandas()["word"].to_numpy().astype(str)
    )
    vocab_ref = ray.put(np.sort(vocab))

    def totals_partial(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)  # tiny broadcast, local fetch
        words = split_words(t["text"])
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        src = np.repeat(np.asarray(t["source"]).astype(str), lens)
        flat = np.asarray(words.flatten()).astype(str)
        uniq, inv = np.unique(src, return_inverse=True)
        n_words = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        oov = ~np.isin(flat, v)
        n_oov = np.bincount(inv[oov], minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {"source": pa.array(uniq), "w_p": pa.array(n_words),
             "o_p": pa.array(n_oov)}
        )

    docs = _read_docs(sf_dir, ["source", "text"])
    totals = (
        docs.map_batches(totals_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("w_p", alias_name="n_words"), Sum("o_p", alias_name="n_oov"))
        .to_pandas()  # rows = #sources
    )

    num_buckets = 32

    def pair_partial(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        lens = np.asarray(pc.list_value_length(words), dtype=np.int64)
        pairs = pa.table(
            {
                "source": pa.array(np.repeat(np.asarray(t["source"]).astype(str), lens)),
                "word": words.flatten(),
            }
        )
        distinct = pa.TableGroupBy(pairs, ["source", "word"]).aggregate([])
        bucket = (hash64(distinct["word"]) % np.uint64(num_buckets)).astype(np.int32)
        return distinct.append_column("__bucket", pa.array(bucket))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["source", "word"]].drop_duplicates()
        out = d.groupby("source", sort=False).size().reset_index(name="d_p")
        out["d_p"] = out["d_p"].astype(np.int64)
        return out

    distinct = (
        docs.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("d_p", alias_name="n_distinct"))
        .to_pandas()
    )
    out = totals.merge(distinct, on="source")[
        ["source", "n_words", "n_distinct", "n_oov"]
    ]
    return pa.Table.from_pandas(out, preserve_index=False)


def _bigram_partials(t: pa.Table) -> pa.Table:
    """Explode one batch's text into adjacent word pairs and pre-combine
    counts — the first step of BPE/vocabulary induction and of n-gram LM
    estimation, run over text words so the oracle can state the exact
    relation.  Fully vectorized: the left-position index set is every
    flattened word position except each document's last, built from the
    ListArray offsets; pair strings come from one Arrow ``take`` +
    ``binary_join_element_wise``; the batch collapses with an Arrow C++
    hash-groupby before anything is shuffled (same partial-then-finalize
    discipline as ``word_frequencies``)."""
    words = split_words(t["text"])
    offsets = np.asarray(words.offsets, dtype=np.int64)
    flat = words.flatten()
    mask = np.ones(len(flat), dtype=bool)
    ends = offsets[1:] - 1  # each doc's final word position
    ends = ends[ends >= offsets[:-1]]  # drop empty docs
    mask[ends] = False
    left_idx = np.nonzero(mask)[0]
    left = flat.take(pa.array(left_idx, pa.int64()))
    right = flat.take(pa.array(left_idx + 1, pa.int64()))
    grams = pc.binary_join_element_wise(left, right, " ")
    agg = pa.table({"bigram": grams}).group_by("bigram").aggregate([("bigram", "count")])
    return pa.table(
        {"bigram": agg["bigram"], "n_part": agg["bigram_count"].cast(pa.int64())}
    )


def bigram_frequencies(sf_dir: str) -> ray.data.Dataset:
    """Global adjacent-word-pair -> total occurrence count (the pair
    statistics a BPE-style tokenizer trainer consumes)."""
    return (
        _read_docs(sf_dir, ["text"])
        .map_batches(_bigram_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bigram")
        .aggregate(Sum("n_part", alias_name="n"))
    )


def bigram_topk(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Top-k corpus word bigrams (ties broken by bigram text, so the set
    is exact) — the candidate-merge ranking step of tokenizer training,
    distributed as partial counts + the no-global-sort top-k."""
    return topk(
        bigram_frequencies(sf_dir),
        keys=[("n", "descending"), ("bigram", "ascending")],
        k=k,
    )


def word_cooccurrence(
    sf_dir: str, df_frac: float = 0.05, min_pair: int = 2
) -> pa.Table:
    """Word co-occurrence pair mining (the counting core of PMI phrase
    scoring): for every pair of frequent words, in how many documents do
    BOTH appear.  The PMI numerator/denominator counts are emitted exactly
    (n_pair here, per-word df from pass 1), so the score itself is one
    driver-side log away — kept out of the relation so the oracle
    comparison stays integer-exact.

    Scale shape — the mergeable-matrix regime:

      pass 1  distinct-(doc, word) per-batch partials -> groupby(word)
              document frequency; the vocabulary is cut at
              ``df >= ceil(df_frac * n_docs)`` (a few hundred head words),
              sorted, broadcast ONCE.
      pass 2  per batch, a boolean docs x V membership matrix M and ONE
              integer matmul ``M.T @ M`` produce the batch's FULL pairwise
              co-occurrence count matrix — a constant-size
              (V*(V-1)/2-cell) partial that merges by ADDITION, exactly
              like the HLL registers / partial blooms: the driver reduces
              bytes, never rows, and no pair row ever enters a shuffle.

    A document is one Arrow row, so rows never split across batches and
    per-batch distinctness is per-document distinctness.  At vocabularies
    too large for V² cells, the documented fallback is the packed-pair
    groupby used by ``dedup._bucket_candidate_pairs``."""
    import math

    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

    docs = _read_docs(sf_dir, ["text"])
    n_docs = docs.count()
    min_df = int(math.ceil(df_frac * n_docs))

    def df_partial(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        lens = np.asarray(pc.list_value_length(words)).astype(np.int64)
        flat = np.asarray(words.flatten()).astype(object)
        if not len(flat):
            return pa.table(
                {"word": pa.array([], pa.string()), "n_part": pa.array([], pa.int64())}
            )
        uniq, codes = np.unique(flat, return_inverse=True)
        rows = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        key = codes.astype(np.int64) * len(t) + rows  # distinct (word, doc)
        wcode = np.unique(key) // len(t)
        dfc = np.bincount(wcode, minlength=len(uniq)).astype(np.int64)
        return pa.table({"word": pa.array(uniq.astype(str)), "n_part": pa.array(dfc)})

    df_tbl = (
        docs.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n_part", alias_name="df"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], min_df)).select(["word"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    vocab = np.sort(df_tbl["word"].to_numpy(dtype=object))
    V = len(vocab)
    if V < 2:
        return pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "n_pair": pa.array([], pa.int64()),
            }
        )
    vocab_ref = ray.put(vocab)

    def cooc_partial(t: pa.Table) -> pa.Table:
        vc = get_broadcast(vocab_ref)
        words = split_words(t["text"])
        lens = np.asarray(pc.list_value_length(words)).astype(np.int64)
        flat = np.asarray(words.flatten()).astype(object)
        rows = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        idx = np.searchsorted(vc, flat)
        in_r = idx < len(vc)
        hit = np.zeros(len(flat), dtype=bool)
        hit[in_r] = vc[idx[in_r]] == flat[in_r]
        # membership is 0/1 -> float32 matrix (half the int64 footprint and
        # BLAS-dispatched); per-cell batch counts are bounded by the batch
        # row count << 2^24, so the float32 matmul is integer-exact
        m = np.zeros((len(t), len(vc)), dtype=np.float32)
        m[rows[hit], idx[hit]] = 1.0
        p = np.rint(m.T @ m).astype(np.int64)  # V x V batch counts
        iu, ju = np.triu_indices(len(vc), k=1)
        return pa.table(
            {"cells": pa.array([p[iu, ju].astype(np.int64).tobytes()], pa.large_binary())}
        )

    parts = docs.map_batches(
        cooc_partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # constant-size byte partials, reduced driver-side (bloom pattern)
    n_cells = V * (V - 1) // 2
    acc = np.zeros(n_cells, dtype=np.int64)
    for row in parts:
        acc += np.frombuffer(row["cells"], dtype=np.int64)
    iu, ju = np.triu_indices(V, k=1)
    keep = acc >= min_pair
    return pa.table(
        {
            "w1": pa.array(vocab[iu[keep]].astype(str)),
            "w2": pa.array(vocab[ju[keep]].astype(str)),
            "n_pair": pa.array(acc[keep]),
        }
    )
