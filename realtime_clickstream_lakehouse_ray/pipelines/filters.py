"""Corpus filtering for training-data curation: Gopher-style quality rules
and benchmark decontamination.

Reference parity: the reference repo's ETL validates + filters events
row-by-row in Spark (`/root/reference/etl/glue_stream.py`); this module is
the document-corpus analogue a 100 TB pre-training pipeline needs —
rule-based quality gating (Rae et al., Gopher, arXiv:2112.11446 §A1) and
eval-set decontamination by word n-gram overlap (GPT-3 appendix C /
Brown et al., arXiv:2005.14165).

Scale notes:
- ``quality_filter`` is ONE stateless vectorized ``map_batches`` over a
  2-column pruned read — embarrassingly parallel, no shuffle.
- ``decontaminate`` broadcasts the benchmark gram-hash set (benchmark
  suites are megabytes — small by nature, like the reference's broadcast
  lookup configs) via ``ray.put`` once, fetched once per actor in
  ``__init__``; the 100 TB corpus side streams through ``map_batches``
  with no shuffle and no driver-side data path.  If the "benchmark" side
  ever grew to corpus scale, the right shape is the inverted-index join
  used by ``dedup.ngram_jaccard_dedup``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from realtime_clickstream_lakehouse_ray.functions.minhash import shingle_hashes
from realtime_clickstream_lakehouse_ray.functions.textstats import (
    split_words,
    top_word_counts,
    unique_word_counts,
    word_char_totals,
    word_counts,
)


def _read_docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def quality_filter(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style rule-based quality gate, one vectorized pass.

    Per document: word count, mean word length, most-common-word ratio,
    distinct-word ratio, and the combined ``keep`` verdict.  All four
    measures are exact integer/ratio arithmetic so the DuckDB oracle
    matches bit-for-bit (int64 / int64 division in IEEE double on both
    engines)."""

    def fn(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        n_words = word_counts(words)
        n_chars_w = word_char_totals(words)
        n_top = top_word_counts(words)
        n_uniq = unique_word_counts(words)
        denom = np.maximum(n_words, 1).astype(np.float64)
        mean_word_len = n_chars_w.astype(np.float64) / denom
        top_word_ratio = n_top.astype(np.float64) / denom
        uniq_ratio = n_uniq.astype(np.float64) / denom
        keep = (
            (n_words >= 20)
            & (n_words <= 400)
            & (mean_word_len >= 2.0)
            & (mean_word_len <= 12.0)
            & (top_word_ratio <= 0.2)
            & (uniq_ratio >= 0.3)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words),
                "mean_word_len": pa.array(mean_word_len),
                "top_word_ratio": pa.array(top_word_ratio),
                "uniq_ratio": pa.array(uniq_ratio),
                "keep": pa.array(keep),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# (pattern, replacement) applied in order; all RE2 — identical semantics in
# Arrow's replace_substring_regex and DuckDB's regexp_replace.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{6,}", "<NUM>"),
    # configurable denylist terms stand in for a tenant's identifier list
    (r"\b(customer|user)\b", "<ID>"),
]


def pii_redact(sf_dir: str, rules: list[tuple[str, str]] = PII_RULES) -> ray.data.Dataset:
    """PII / denylist redaction: sequentially apply each RE2 rule to the
    text (global replace) and count the total substitutions made —
    the standard pre-training scrub pass (emails, long digit runs, a
    configurable term denylist).

    One stateless vectorized ``map_batches`` over a 2-column pruned read —
    Arrow's RE2 kernels (`replace_substring_regex`, `count_substring_regex`)
    run over the string buffer with no Python per row and no shuffle.
    Counts are taken on the text state each rule sees (rule i counts on the
    output of rules 0..i-1), mirroring chained ``regexp_replace`` exactly."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        n = np.zeros(len(t), dtype=np.int64)
        for pat, repl in rules:
            n += np.asarray(pc.count_substring_regex(txt, pat)).astype(np.int64)
            txt = pc.replace_substring_regex(txt, pat, repl)
        return pa.table(
            {"doc_id": t["doc_id"], "text_redacted": txt, "n_redactions": pa.array(n)}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _distinct_doc_grams(
    t: pa.Table, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, gram_hash) pairs, distinct within each document —
    the same lexsort-dedupe used by ``textstats.unique_word_counts``."""
    words = split_words(t["text"])
    flat, n_sh = shingle_hashes(words, k=k)
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_sh)
    if not len(flat):
        return doc_idx, flat
    order = np.lexsort((flat, doc_idx))
    d, h = doc_idx[order], flat[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return d[keep], h[keep]


class _ContaminationScorer:
    """Actor-pool stage: fetch the broadcast benchmark gram set once per
    actor, then score each corpus batch with searchsorted membership."""

    def __init__(self, bench_ref, k: int, bench_mod: int):
        self.bench = np.sort(ray.get(bench_ref))  # sorted uint64 gram hashes
        self.k = k
        self.bench_mod = bench_mod

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        corpus = t.filter(pa.array(ids % self.bench_mod != 0))
        if corpus.num_rows == 0 or not len(self.bench):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_hit": pa.array([], pa.int64()),
                }
            )
        d, h = _distinct_doc_grams(corpus, self.k)
        pos = np.searchsorted(self.bench, h)
        pos[pos == len(self.bench)] = 0
        hit = self.bench[pos] == h
        n_hit = np.bincount(d[hit], minlength=corpus.num_rows).astype(np.int64)
        mask = n_hit > 0
        return pa.table(
            {
                "doc_id": corpus["doc_id"].combine_chunks().filter(pa.array(mask)),
                "n_hit": pa.array(n_hit[mask]),
            }
        )


def decontaminate(
    sf_dir: str, k: int = 5, bench_mod: int = 17
) -> ray.data.Dataset:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``k``-gram with the held-out benchmark set (``doc_id % bench_mod == 0``
    stands in for an eval suite).  Output: contaminated ``doc_id`` plus the
    exact count of distinct shared grams (``n_hit``).

    Gram identity is a 64-bit rotate-xor chain over word hashes (collision
    odds ~n²/2⁶⁴ — negligible vs. the DuckDB string-gram oracle at any
    testable scale)."""
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        bench = t.filter(pa.array(ids % bench_mod == 0))
        if bench.num_rows == 0:
            return pa.table({"g": pa.array([], pa.uint64())})
        _, h = _distinct_doc_grams(bench, k)
        return pa.table({"g": pa.array(np.unique(h))})

    # benchmark side: small by nature (an eval suite), so a driver union +
    # one ray.put broadcast is the right regime — the corpus side never
    # leaves the workers.
    parts = ray.get(
        docs.map_batches(
            bench_grams, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    )
    grams = np.unique(
        np.concatenate(
            [np.asarray(p["g"]).astype(np.uint64) for p in parts if p.num_rows]
            or [np.array([], dtype=np.uint64)]
        )
    )
    bench_ref = ray.put(grams)

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return docs.map_batches(
        _ContaminationScorer,
        fn_constructor_args=(bench_ref, k, bench_mod),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, max(2, ncpu)),
    )


def embedding_outliers(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Embedding-space quality filter (the DataComp/SemDeDup-style screen):
    per ``label`` group, flag the ``k`` vectors farthest (lowest cosine)
    from the group centroid — integer output (``label, vec_id``), so the
    oracle survives cross-engine float-sum ordering (gaps between distinct
    vectors dwarf the ~1e-15 centroid drift).

    Three narrow stages, no wide shuffle on the vectors:
    1. per-batch partial sums per (label, dim) — 64 rows per label per
       batch, the classic partial-then-finalize combiner;
    2. tiny (labels × 64) groupby + driver centroid build, broadcast once;
    3. stateless vectorized cosine per batch + per-batch top-k trim, then
       one final per-LABEL merge (labels are tens, not millions)."""
    from ray.data.aggregate import Sum

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def partial_sums(t: pa.Table) -> pa.Table:
        mat = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
        dim = mat.size // t.num_rows
        mat = mat.reshape(t.num_rows, dim)
        lab = t["label"].combine_chunks().dictionary_encode()
        codes = np.asarray(lab.indices).astype(np.int64)
        uniq = np.unique(codes)
        rows = []
        for u in uniq:  # per DISTINCT label in the batch (tens), not per row
            sel = mat[codes == u]
            rows.append((lab.dictionary[u].as_py(), sel.sum(axis=0), len(sel)))
        labels = pa.array([r[0] for r in rows])
        sums = np.stack([r[1] for r in rows])
        n = np.array([r[2] for r in rows], dtype=np.int64)
        out = {"label": labels, "n": pa.array(n)}
        for d in range(dim):
            out[f"s{d}"] = pa.array(sums[:, d])
        return pa.table(out)

    parts = emb.map_batches(partial_sums, batch_format="pyarrow", zero_copy_batch=True)
    dim_cols = [c for c in parts.schema().names if c.startswith("s")]
    aggs = [Sum(c, alias_name=c) for c in dim_cols] + [Sum("n", alias_name="n")]
    cent_tbl = parts.groupby("label").aggregate(*aggs).to_pandas()
    cent_tbl = cent_tbl.sort_values("label", ignore_index=True)
    centroids = (
        cent_tbl[dim_cols].to_numpy(dtype=np.float64)
        / cent_tbl["n"].to_numpy(dtype=np.float64)[:, None]
    )
    label_order = {v: i for i, v in enumerate(cent_tbl["label"])}
    cent_ref = ray.put((label_order, centroids))

    def score(t: pa.Table) -> pa.Table:
        order, cents = ray.get(cent_ref)
        mat = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
        mat = mat.reshape(t.num_rows, cents.shape[1])
        lab_idx = np.array(
            [order[v] for v in t["label"].to_pylist()], dtype=np.int64
        )
        c = cents[lab_idx]
        cos = (mat * c).sum(axis=1) / (
            np.sqrt((mat * mat).sum(axis=1)) * np.sqrt((c * c).sum(axis=1))
        )
        out = pa.table(
            {"label": t["label"], "vec_id": t["vec_id"], "cos": pa.array(cos)}
        )
        # local trim: keep each label's k lowest-cosine rows of this batch
        ids = np.asarray(t["vec_id"]).astype(np.int64)
        sort_order = np.lexsort((ids, cos, lab_idx))
        li = lab_idx[sort_order]
        first = np.ones(len(li), dtype=bool)
        first[1:] = li[1:] != li[:-1]
        run_start = np.maximum.accumulate(np.where(first, np.arange(len(li)), 0))
        rank = np.arange(len(li)) - run_start
        keep = np.sort(sort_order[rank < k])
        return out.take(pa.array(keep))

    trimmed = emb.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)

    def final(g):
        g = g.sort_values(["cos", "vec_id"], kind="mergesort").head(k)
        return g[["label", "vec_id"]]

    return trimmed.groupby("label").map_groups(final, batch_format="pandas")


def repetition_stats(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Intra-document repetition (the Gopher "duplicate n-grams" rule):
    per document, total word ``k``-grams, distinct ``k``-grams, and the
    duplicate-gram ratio — one stateless vectorized pass (shingle hashing
    + the lexsort distinct), no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        flat, n_sh = shingle_hashes(words, k=k)
        d, _ = _distinct_doc_grams(t, k)
        n_uniq = np.bincount(d, minlength=t.num_rows).astype(np.int64)
        n_grams = n_sh.astype(np.int64)
        dup_ratio = (n_grams - n_uniq).astype(np.float64) / np.maximum(
            n_grams, 1
        ).astype(np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(n_grams),
                "n_uniq_grams": pa.array(n_uniq),
                "dup_gram_ratio": pa.array(dup_ratio),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def length_percentile_filter(sf_dir: str, q: float = 0.10) -> ray.data.Dataset:
    """Per-source length-percentile gate: drop every document whose
    ``n_chars`` falls below its source's exact ``q``-th discrete
    percentile — the data-driven version of a fixed min-length rule
    (sources have different length profiles, so one global threshold
    over- or under-prunes).

    Scale shape: the cut points come from the exact distributed-selection
    primitive (``quantile.quantile_disc_by`` — two streaming scans, no
    sort, driver holds only occupied histogram bins), then one broadcast
    of the tiny (source -> cut) table and one stateless filtering
    ``map_batches``.  No shuffle anywhere."""
    import pyarrow.compute as pc

    from realtime_clickstream_lakehouse_ray.pipelines.quantile import (
        quantile_disc_by,
    )

    ds = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])
    cuts = quantile_disc_by(ds, value_col="n_chars", group_col="source", qs={"cut": q})
    cut_ref = ray.put(
        dict(
            zip(
                np.asarray(cuts["source"]).astype(str),
                np.asarray(cuts["cut"]),
            )
        )
    )

    def gate(t: pa.Table) -> pa.Table:
        cut = ray.get(cut_ref)  # tiny broadcast dict, local fetch
        src = np.asarray(t["source"]).astype(str)
        thr = np.array([cut[s] for s in np.unique(src)])
        thr_per_row = thr[np.searchsorted(np.unique(src), src)]
        keep = np.asarray(t["n_chars"], dtype=np.float64) >= thr_per_row
        return t.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def length_outliers(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Per-source length-anomaly screen: flag every document whose
    ``n_chars`` deviates from its source's mean by more than ``k``
    standard deviations — the z-score outlier gate of a curation
    pipeline, computed EXACTLY in integer arithmetic (no float mean/std,
    so the flagged set is reproducible bit-for-bit and SQL-checkable).

    |x - mean| > k*std  is evaluated as  (cnt*x - s)^2 > k^2*(cnt*ssq - s^2)
    over exact integer moments (s = sum, ssq = sum of squares).  The
    driver reduces each source's quadratic to two integer cutoffs via
    ``math.isqrt`` —  outlier iff  x <= lo_cut  or  x >= hi_cut  — so the
    row-side gate is one vectorized int comparison.

    Scale shape: pass 1 = per-batch (source, cnt, s, ssq) partials ->
    tiny groupby (rows = #sources); driver math on that tiny table; pass
    2 = broadcast cutoff dict + one stateless filtering ``map_batches``.
    No shuffle of data rows anywhere.  Moments use Python ints on the
    driver, so ssq overflow is impossible at any corpus size (the
    per-batch int64 partials hold to ~2*10^5 batches of 2^31-char docs)."""
    import math

    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])

    def moments(t: pa.Table) -> pa.Table:
        x = np.asarray(t["n_chars"], dtype=np.int64)
        src = np.asarray(t["source"]).astype(str)
        uniq, inv = np.unique(src, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)  # int64 scatter-add: exact
        ssq = np.zeros(len(uniq), dtype=np.int64)  # (bincount weights= is float64)
        np.add.at(s, inv, x)
        np.add.at(ssq, inv, x * x)
        return pa.table(
            {"source": pa.array(uniq), "cnt_p": pa.array(cnt),
             "s_p": pa.array(s), "ssq_p": pa.array(ssq)}
        )

    mom = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("cnt_p", alias_name="cnt"), Sum("s_p", alias_name="s"),
                   Sum("ssq_p", alias_name="ssq"))
        .to_pandas()  # rows = #sources: tiny by construction
    )
    cuts: dict[str, tuple[int, int]] = {}
    for src, cnt, s, ssq in mom[["source", "cnt", "s", "ssq"]].itertuples(index=False):
        cnt, s, ssq = int(cnt), int(s), int(ssq)  # exact big-int math
        thr = math.isqrt(k * k * (cnt * ssq - s * s))
        # (cnt*x - s)^2 > K  <=>  |cnt*x - s| >= thr+1  (integers)
        lo_cut = (s - thr - 1) // cnt  # x <= lo_cut  <=>  cnt*x - s <= -thr-1
        hi_cut = -((-(s + thr + 1)) // cnt)  # ceil div: cnt*x - s >= thr+1
        cuts[str(src)] = (lo_cut, hi_cut)
    cut_ref = ray.put(cuts)

    def gate(t: pa.Table) -> pa.Table:
        cut = ray.get(cut_ref)  # tiny broadcast dict, local fetch
        src = np.asarray(t["source"]).astype(str)
        uniq = np.unique(src)
        lo = np.array([cut[s][0] for s in uniq], dtype=np.int64)
        hi = np.array([cut[s][1] for s in uniq], dtype=np.int64)
        idx = np.searchsorted(uniq, src)
        x = np.asarray(t["n_chars"], dtype=np.int64)
        keep = (x <= lo[idx]) | (x >= hi[idx])
        return t.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
