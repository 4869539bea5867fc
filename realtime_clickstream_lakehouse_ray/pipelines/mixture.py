"""Training-data mixture construction over the ``documents`` corpus:
deterministic sampling, per-source budget selection, and sequence-chunk
assignment — the operators that turn a deduped corpus into a training
mix at 100 TB.

All three are oracle-exact (no RNG): sampling keys off a content hash,
and the two windowed ops ride the distributed ordered-prefix-sum
primitive (``functions/prefix.py``) whose only shuffle is a NARROW sort
(order/value/group columns; the text never moves).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from realtime_clickstream_lakehouse_ray.config import tune_context
from realtime_clickstream_lakehouse_ray.functions.prefix import ordered_prefix_sum
from realtime_clickstream_lakehouse_ray.functions.textstats import md5_fingerprints


def _read_docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    tune_context()
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def sample_by_hash(sf_dir: str, threshold_hex: str = "1a") -> ray.data.Dataset:
    """Deterministic Bernoulli sample: keep a document iff
    ``md5(str(doc_id)) < threshold_hex`` (hex-string comparison, so the
    SQL oracle is the identical expression).  ``"1a"`` ≈ 10.2%.

    This is how a 100-TB pipeline samples reproducibly: no RNG state, no
    seed coordination across workers, membership decidable per row from
    the key alone — re-running any partition yields the same sample."""

    def fn(t: pa.Table) -> pa.Table:
        fp = md5_fingerprints(pc.cast(t["doc_id"], pa.string()).combine_chunks())
        keep = pc.less(fp, threshold_hex)
        return t.filter(keep)

    return _read_docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def source_char_budget(sf_dir: str, budget: int = 60_000) -> ray.data.Dataset:
    """Per-source budget selection: walk each source's documents in
    doc_id order and keep rows while the running char total stays within
    ``budget`` — the greedy mixture-construction step ("take the first
    N tokens of each source")."""
    ds = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])
    with_cum = ordered_prefix_sum(
        ds, order_col="doc_id", value_col="n_chars", by_col="source"
    )
    return with_cum.map_batches(
        lambda t: t.filter(pc.less_equal(t["cum"], budget)).select(
            ["doc_id", "source", "n_chars"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def pack_sequences_assign(sf_dir: str, seq_len: int = 2048) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing (the standard LLM-pretraining
    layout): per source, documents concatenate in doc_id order into one
    stream that is cut into fixed ``seq_len`` chunks; each document is
    assigned the chunk its FIRST char lands in:
    ``seq_id = (running_total_before_doc) // seq_len``."""
    ds = _read_docs(sf_dir, ["doc_id", "source", "n_chars"])
    with_cum = ordered_prefix_sum(
        ds, order_col="doc_id", value_col="n_chars", by_col="source"
    )

    def assign(t: pa.Table) -> pa.Table:
        before = np.asarray(t["cum"]) - np.asarray(t["n_chars"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "seq_id": pa.array((before // seq_len).astype(np.int64)),
            }
        )

    return with_cum.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def stratified_sample(sf_dir: str, k: int = 40) -> ray.data.Dataset:
    """Per-source stratified sample: keep the ``k`` documents with the
    smallest multiplicative-hash rank ``((doc_id % 100000007) * 2654435761)
    % 2^32`` within each source — a deterministic, seedless "N docs per
    source" draw (the inner modulus keeps the product inside int64 on BOTH
    engines at any doc_id).

    Scale shape: each batch pre-trims to its local top-k per source
    (vectorized lexsort rank), so the final per-source selection sees at
    most ``k × n_batches`` rows per source; the only Python-per-group call
    runs once per SOURCE (mixtures have tens of sources, not millions)."""
    ds = _read_docs(sf_dir, ["doc_id", "source"])

    def local_topk(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        rk = ((ids % 100000007) * 2654435761) % 4294967296
        src = t["source"].combine_chunks().dictionary_encode()
        codes = np.asarray(src.indices).astype(np.int64)
        order = np.lexsort((ids, rk, codes))
        c = codes[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        # rank within source = position - start of the source's run
        run_start = np.maximum.accumulate(np.where(first, np.arange(len(c)), 0))
        rank = np.arange(len(c)) - run_start
        keep_pos = order[rank < k]
        out = t.take(pa.array(np.sort(keep_pos)))
        ids_k = np.asarray(out["doc_id"]).astype(np.int64)
        rk_k = ((ids_k % 100000007) * 2654435761) % 4294967296
        return out.append_column("rk", pa.array(rk_k.astype(np.int64)))

    trimmed = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)

    def final_topk(g):
        g = g.sort_values(["rk", "doc_id"], kind="mergesort").head(k)
        return g[["doc_id", "source"]]

    return trimmed.groupby("source").map_groups(final_topk, batch_format="pandas")


def training_shard_manifest(sf_dir: str, num_shards: int = 8) -> ray.data.Dataset:
    """Deterministic global shuffle + shard assignment — the "write the
    training shards" step: every document gets a shard (multiplicative
    hash, reproducible across runs/engines) and a dense position within
    its shard in global hash order.

    Positions are computed with the distributed ordered-prefix-sum
    primitive (``functions/prefix.py``): ONE narrow range-partitioned sort
    of (order-key, shard) — the text never moves — then two streaming
    passes (per-block partials -> driver block offsets -> vectorized
    block-local cumsum).  No per-shard materialization: a shard's rows can
    span any number of blocks, so this holds when a shard is terabytes.

    The order key packs (hash, doc_id) into one int64 (hash < 2^32,
    doc_id < 2^31 asserted), giving the globally-unique order column the
    primitive requires while preserving (hash, doc_id) order."""
    ds = _read_docs(sf_dir, ["doc_id"])

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 31)):
            raise ValueError("training_shard_manifest requires doc_id in [0, 2^31)")
        h = ((ids % 100000007) * 2654435761) % 4294967296
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shard": pa.array((h % num_shards).astype(np.int64)),
                "okey": pa.array(h * np.int64(1 << 31) + ids),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    ranked = ordered_prefix_sum(tagged, "okey", "one", "shard", out_col="cum")

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shard": t["shard"],
                "pos": pa.array(np.asarray(t["cum"]).astype(np.int64) - 1),
            }
        )

    return ranked.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


def _doc_token_lists(t: pa.Table) -> pa.ListArray:
    """Per-doc token arrays derived from text exactly as the maintenance
    ingest does (per-word stable hash mod vocab) — the shared tokenizer
    for every token-payload op so pytest can brute-force-verify values."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words
    from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

    words = split_words(t["text"])
    vals = (hash64(words.flatten()) % np.uint64(VOCAB)).astype(np.int32)
    return pa.ListArray.from_arrays(words.offsets, pa.array(vals, pa.int32()))


_SPLIT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("chunk_id", pa.int64()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int64()),
    ]
)


def split_sequences(sf_dir: str, max_len: int = 128) -> ray.data.Dataset:
    """Split every document's token array into consecutive chunks of at
    most ``max_len`` tokens (last chunk short; empty docs emit nothing) —
    the max-context-length splitting step of a pretraining pipeline.

    Scale shape: embarrassingly parallel, ONE ``map_batches`` and zero
    shuffles; the chunk rows are an offsets-only re-cut of the batch's
    flat token values buffer (chunks of a doc are consecutive, so the
    values child is reused as-is — no gather, no copy)."""
    L = int(max_len)
    if L <= 0:
        raise ValueError("split_sequences requires max_len >= 1")

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SPLIT_SCHEMA.empty_table()
        toks = _doc_token_lists(t)
        offs = np.asarray(toks.offsets).astype(np.int64)
        n = offs[1:] - offs[:-1]
        kidx = np.nonzero(n > 0)[0]
        if not len(kidx):
            return _SPLIT_SCHEMA.empty_table()
        nk, base = n[kidx], offs[:-1][kidx]
        n_chunks = (nk - 1) // L + 1
        tot = int(n_chunks.sum())
        rep = np.repeat(np.arange(len(kidx)), n_chunks)
        within = np.arange(tot) - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        # per-chunk end cut points tile [0, len(values)] because empty
        # docs occupy zero width in the flat buffer
        ends = np.minimum(base[rep] + (within + 1) * L, (base + nk)[rep])
        new_offsets = np.concatenate([[0], ends])
        out_toks = pa.ListArray.from_arrays(
            pa.array(new_offsets.astype(np.int32), pa.int32()), toks.values
        )
        return pa.table(
            {
                "doc_id": pc.take(
                    t["doc_id"].combine_chunks().cast(pa.int64()),
                    pa.array(kidx[rep]),
                ),
                "chunk_id": pa.array(within.astype(np.int64)),
                "tokens": out_toks,
                "n_tok": pa.array(np.diff(new_offsets).astype(np.int64)),
            },
            schema=_SPLIT_SCHEMA,
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def split_sequences_overlap(
    sf_dir: str, window: int = 128, stride: int = 96
) -> ray.data.Dataset:
    """Sliding-window splitting with overlap (``stride < window``): chunk
    ``k`` covers tokens ``[k*stride, k*stride + window)`` — the
    long-context chunking layout that preserves ``window - stride``
    tokens of left context at every cut (what RAG indexing and
    long-document eval sets use, vs ``split_sequences``' disjoint cuts).

    Scale shape: embarrassingly parallel, ONE ``map_batches``, zero
    shuffles.  Overlapping chunks can't ride the offsets-only re-cut, so
    values gather through one global ``take`` index — still a single
    vectorized kernel per batch."""
    W, S = int(window), int(stride)
    if W <= 0 or S <= 0 or S > W:
        raise ValueError("split_sequences_overlap needs 0 < stride <= window")

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SPLIT_SCHEMA.empty_table()
        toks = _doc_token_lists(t)
        offs = np.asarray(toks.offsets).astype(np.int64)
        n = offs[1:] - offs[:-1]
        kidx = np.nonzero(n > 0)[0]
        if not len(kidx):
            return _SPLIT_SCHEMA.empty_table()
        nk, base = n[kidx], offs[:-1][kidx]
        n_chunks = (nk - 1) // S + 1
        tot = int(n_chunks.sum())
        rep = np.repeat(np.arange(len(kidx)), n_chunks)
        within = np.arange(tot) - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        starts = base[rep] + within * S
        lens = np.minimum(W, (base + nk)[rep] - starts)
        gather = (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(lens) - lens, lens)
            + np.repeat(starts, lens)
        )
        vals = toks.values.take(pa.array(gather))
        new_offsets = np.concatenate([[0], np.cumsum(lens)])
        out_toks = pa.ListArray.from_arrays(
            pa.array(new_offsets.astype(np.int32), pa.int32()), vals
        )
        return pa.table(
            {
                "doc_id": pc.take(
                    t["doc_id"].combine_chunks().cast(pa.int64()),
                    pa.array(kidx[rep]),
                ),
                "chunk_id": pa.array(within.astype(np.int64)),
                "tokens": out_toks,
                "n_tok": pa.array(lens.astype(np.int64)),
            },
            schema=_SPLIT_SCHEMA,
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def vocab_remap(sf_dir: str, mult: int = 31, add: int = 7) -> ray.data.Dataset:
    """Affine vocabulary remap ``tok -> (mult * tok + add) % VOCAB`` over
    the flat token values buffer — the vocab-surgery step (merge/renumber
    token ids after a tokenizer change).  ``VOCAB`` is prime, so any
    ``mult`` not divisible by it makes the remap a bijection.

    Scale shape: one ``map_batches``, no shuffle; the list offsets are
    untouched (structure is copied by reference) and the remap is a single
    vectorized pass over the values child."""
    from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

    if mult % VOCAB == 0:
        raise ValueError("vocab_remap: mult must not be divisible by VOCAB")

    def fn(t: pa.Table) -> pa.Table:
        toks = _doc_token_lists(t)
        vals = np.asarray(toks.values).astype(np.int64)
        out = ((mult * vals + add) % VOCAB).astype(np.int32)
        remapped = pa.ListArray.from_arrays(toks.offsets, pa.array(out, pa.int32()))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "tokens": remapped,
                "n_tok": pc.list_value_length(remapped).cast(pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _source_counts(ds: ray.data.Dataset):
    """Per-source doc counts via per-batch vectorized partials — the
    driver sees #sources × #batches tiny rows, never documents."""

    def partial_counts(t: pa.Table) -> pa.Table:
        vc = t["source"].combine_chunks().value_counts()
        return pa.table(
            {
                "source": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    df = ds.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if df.empty:
        return df
    return df.groupby("source")["cnt"].sum()


def _rank_within_source(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Appends ``cum`` = 1-based rank within source by deterministic hash
    order (ties by doc_id) via the ordered-prefix-sum primitive — ONE
    narrow sort of (okey, source, one); the order key packs (rank, doc_id)
    into int64 (rank < 2^32, doc_id < 2^31 asserted)."""

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 31)):
            raise ValueError("source-rank sampling requires doc_id in [0, 2^31)")
        rk = ((ids % 100000007) * 2654435761) % 4294967296
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "okey": pa.array(rk * np.int64(1 << 31) + ids),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
            }
        )

    return ordered_prefix_sum(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        order_col="okey",
        value_col="one",
        by_col="source",
        out_col="cum",
    )


def proportional_quota_sample(sf_dir: str, total: int = 300) -> ray.data.Dataset:
    """Weighted mixture construction: allocate an integer per-source quota
    proportional to source size by the largest-remainder (Hamilton)
    method — quotas sum EXACTLY to ``total`` (when ``total`` ≤ corpus
    size) with no RNG — then keep each source's ``quota`` smallest-hash-
    rank documents.

    Scale shape: quotas derive from the tiny per-source count table on the
    driver (#sources rows); membership is the same one-narrow-sort rank
    filter as ``balanced_resample`` with a per-source threshold looked up
    vectorized from the broadcast quota table."""
    ds = _read_docs(sf_dir, ["doc_id", "source"])
    counts = _source_counts(ds)
    if len(counts) == 0:
        return ds.limit(0)
    srcs = np.array(sorted(counts.index), dtype=object)
    cnt = counts.loc[srcs].to_numpy(dtype=np.int64)
    n = int(cnt.sum())
    fl = (total * cnt) // n
    rem = (total * cnt) % n
    leftover = int(total - fl.sum())
    # +1 to the `leftover` largest remainders; ties broken by source name
    # ascending (matches the SQL ORDER BY rem DESC, source)
    order = np.lexsort((srcs, -rem))
    bump = np.zeros(len(srcs), dtype=np.int64)
    bump[order[:leftover]] = 1
    quota = dict(zip(srcs, fl + bump))
    quota_ref = ray.put(quota)

    def gate(t: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        src = np.asarray(t["source"]).astype(object)
        uniq = np.unique(src)
        thr = np.array([q[s] for s in uniq], dtype=np.int64)
        keep = np.asarray(t["cum"]) <= thr[np.searchsorted(uniq, src)]
        return t.filter(pa.array(keep)).select(["doc_id", "source"])

    return _rank_within_source(ds).map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    )


def temperature_quota_sample(
    sf_dir: str, total: int = 300
) -> ray.data.Dataset:
    """Temperature-tempered mixture (T=2): per-source quotas allocated by
    the largest-remainder method over weights ``isqrt(count)`` — the
    integer-exact form of the ``count^(1/T)`` up/down-weighting every
    multi-source pretraining mix applies (rare sources get proportionally
    MORE than their share, dominant sources less).

    ``isqrt`` = ``floor(sqrt(count))``: IEEE sqrt is correctly rounded on
    both engines, so the weights — and therefore the whole Hamilton
    allocation — are bit-identical to the DuckDB oracle with no float
    summation-order hazard.  Membership is the same smallest-hash-rank
    gate as ``proportional_quota_sample``."""
    ds = _read_docs(sf_dir, ["doc_id", "source"])
    counts = _source_counts(ds)
    if len(counts) == 0:
        return ds.limit(0)
    srcs = np.array(sorted(counts.index), dtype=object)
    cnt = counts.loc[srcs].to_numpy(dtype=np.int64)
    w = np.floor(np.sqrt(cnt.astype(np.float64))).astype(np.int64)
    wsum = int(w.sum())
    if wsum == 0:
        return ds.limit(0)
    fl = (total * w) // wsum
    rem = (total * w) % wsum
    leftover = int(total - fl.sum())
    order = np.lexsort((srcs, -rem))
    bump = np.zeros(len(srcs), dtype=np.int64)
    bump[order[:leftover]] = 1
    # a source cannot exceed its own size: cap at count (quota spill is
    # NOT redistributed — documented contract, mirrored in the oracle)
    quota = dict(zip(srcs, np.minimum(fl + bump, cnt)))
    quota_ref = ray.put(quota)

    def gate(t: pa.Table) -> pa.Table:
        q = ray.get(quota_ref)
        src = np.asarray(t["source"]).astype(object)
        uniq = np.unique(src)
        thr = np.array([q[s] for s in uniq], dtype=np.int64)
        keep = np.asarray(t["cum"]) <= thr[np.searchsorted(uniq, src)]
        return t.filter(pa.array(keep)).select(["doc_id", "source"])

    return _rank_within_source(ds).map_batches(
        gate, batch_format="pyarrow", zero_copy_batch=True
    )


def epoch_shuffle(sf_dir: str, epoch: int = 1) -> ray.data.Dataset:
    """Reproducible global training order for one epoch: position =
    dense global rank under the epoch-salted multiplicative hash
    ``((doc_id % 100000007) * 2654435761 + epoch * 2654435761) % 2^32``
    (ties by doc_id).  Different epochs give different permutations;
    re-running any shard of the job regenerates the identical order — the
    seedless determinism a resumable 100-TB data loader needs.

    Scale shape: ONE narrow sort of (okey, 1) via the ordered-prefix-sum
    primitive — the text never moves; output is (doc_id, pos)."""
    ds = _read_docs(sf_dir, ["doc_id"])

    def tag(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 31)):
            raise ValueError("epoch_shuffle requires doc_id in [0, 2^31)")
        rk = ((ids % 100000007) * 2654435761 + epoch * 2654435761) % 4294967296
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "okey": pa.array(rk * np.int64(1 << 31) + ids),
                "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                "__g": pa.array(["g"] * len(ids), pa.string()),
            }
        )

    ranked = ordered_prefix_sum(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        order_col="okey",
        value_col="one",
        by_col="__g",
        out_col="cum",
    )
    return ranked.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": pc.subtract(t["cum"], 1).combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def balanced_resample(sf_dir: str) -> ray.data.Dataset:
    """Integer-exact per-source balancing: every source keeps exactly
    ``target = min(per-source doc count)`` documents — the ones with the
    smallest deterministic hash rank (ties by doc_id) — so the resampled
    mixture is uniform across sources with zero RNG state.

    Scale shape: per-source counts come from per-batch vectorized partials
    (driver sees #sources × #batches tiny rows, never documents); the
    rank-within-source filter is the distributed ordered-prefix-sum
    primitive (``_rank_within_source``) — ONE narrow sort, text never
    moves."""
    ds = _read_docs(sf_dir, ["doc_id", "source"])
    counts = _source_counts(ds)
    target = int(counts.min()) if len(counts) else 0
    return _rank_within_source(ds).map_batches(
        lambda t: t.filter(pc.less_equal(t["cum"], target)).select(
            ["doc_id", "source"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def pack_sequences_tokens(sf_dir: str, seq_len: int = 2048) -> ray.data.Dataset:
    """REAL sequence packing: produce the packed fixed-length token
    sequences themselves (not just the assignment) — per source, documents'
    token arrays concatenate in doc_id order into one stream cut into
    ``seq_len`` chunks; output one row per chunk: ``(source, seq_id,
    tokens, n_tok, n_docs)`` where ``tokens`` is the packed ``list<int32>``
    (the final chunk of each source is the short remainder).

    Tokens derive from text exactly as the maintenance ingest does
    (``maintenance.doc_to_tokens``: per-word stable hash mod vocab), so
    pytest can check the packed arrays against a brute-force concat while
    the SQL oracle checks the (source, seq_id, n_docs, n_tok) relation.

    Scale shape (what survives 10^12 sequences):
    - the running-offset pass is the NARROW prefix sum (only (doc_id,
      source, n_tok) sort-shuffles; tokens never enter the sort);
    - offsets meet their token arrays in a bucketed hash join on doc_id
      (side-tagged union, one shuffle of the tokens), FUSED with the
      boundary-slice explode: each doc splits into the consecutive
      sub-slices that chunk boundaries cut it into, so slice rows are a
      zero-copy re-offsetting of the doc's own values (flat buffer reused,
      no gather);
    - slices co-locate by chunk key hash (second and last token shuffle)
      and each bucket assembles ALL its chunks with one lexsort +
      run-length concat — B vectorized Python calls total, never one per
      chunk."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words
    from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

    L = int(seq_len)
    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_buckets = max(16, ncpu)

    # ---- stage A: narrow prefix sum -> (doc_id, start-of-doc offset) ----
    def narrow(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "n_tok": pc.list_value_length(words).cast(pa.int64()),
            }
        )

    cum = ordered_prefix_sum(
        _read_docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
            narrow, batch_format="pyarrow", zero_copy_batch=True
        ),
        order_col="doc_id",
        value_col="n_tok",
        by_col="source",
    )

    union_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("source", pa.string()),
            pa.field("tokens", pa.list_(pa.int32())),
            pa.field("start", pa.int64()),
            pa.field("__bucket", pa.int32()),
            pa.field("__side", pa.int8()),
        ]
    )

    def tag_offsets(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].cast(pa.int64())
        start = pc.subtract(t["cum"], t["n_tok"]).cast(pa.int64())
        bucket = (hash64(ids) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": ids,
                "source": pa.nulls(len(t), pa.string()),
                "tokens": pa.nulls(len(t), pa.list_(pa.int32())),
                "start": start,
                "__bucket": pa.array(bucket),
                "__side": pa.array(np.ones(len(t), dtype=np.int8)),
            },
            schema=union_schema,
        )

    def tag_tokens(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        flat = words.flatten()
        vals = (hash64(flat) % np.uint64(VOCAB)).astype(np.int32)
        toks = pa.ListArray.from_arrays(words.offsets, pa.array(vals, pa.int32()))
        ids = t["doc_id"].cast(pa.int64())
        bucket = (hash64(ids) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": ids,
                "source": t["source"].cast(pa.string()),
                "tokens": toks,
                "start": pa.nulls(len(t), pa.int64()),
                "__bucket": pa.array(bucket),
                "__side": pa.array(np.zeros(len(t), dtype=np.int8)),
            },
            schema=union_schema,
        )

    heavy = _read_docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        tag_tokens, batch_format="pyarrow", zero_copy_batch=True
    )
    light = cum.map_batches(tag_offsets, batch_format="pyarrow", zero_copy_batch=True)

    # ---- stage B (per join bucket): attach starts, explode into slices --
    def join_and_slice(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "seq_id": pa.array([], pa.int64()),
                "gs_start": pa.array([], pa.int64()),
                "toks": pa.array([], pa.list_(pa.int32())),
            }
        )
        side = np.asarray(g["__side"])
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        r_ids = np.asarray(rt["doc_id"])
        r_start = np.asarray(rt["start"])
        order = np.argsort(r_ids)
        r_ids, r_start = r_ids[order], r_start[order]
        l_ids = np.asarray(lt["doc_id"])
        pos = np.searchsorted(r_ids, l_ids)
        # every token row has exactly one offset row in its bucket
        start = r_start[pos].astype(np.int64)
        toks = lt["tokens"].combine_chunks()
        offs = np.asarray(toks.offsets).astype(np.int64)
        n = offs[1:] - offs[:-1]
        keep = n > 0
        orig_idx = np.nonzero(keep)[0]
        if not len(orig_idx):
            return empty
        start, n, base = start[keep], n[keep], offs[:-1][keep]
        end = start + n
        first_chunk = start // L
        n_slices = (end - 1) // L - first_chunk + 1
        doc_rep = np.repeat(np.arange(len(n)), n_slices)
        within = np.arange(int(n_slices.sum())) - np.repeat(
            np.cumsum(n_slices) - n_slices, n_slices
        )
        seq_id = first_chunk[doc_rep] + within
        gs_start = np.maximum(start[doc_rep], seq_id * L)
        gs_end = np.minimum(end[doc_rep], (seq_id + 1) * L)
        slice_local_start = base[doc_rep] + (gs_start - start[doc_rep])
        slice_len = gs_end - gs_start
        new_offsets = np.zeros(len(slice_len) + 1, dtype=np.int64)
        np.cumsum(slice_len, out=new_offsets[1:])
        # slices interleave freely across docs inside a bucket group, so
        # gather each slice's values from the flat buffer in row order
        gidx = np.repeat(slice_local_start - new_offsets[:-1], slice_len) + np.arange(
            int(slice_len.sum())
        )
        vals = np.asarray(toks.values)[gidx]
        src = pc.take(lt["source"].combine_chunks(), pa.array(orig_idx[doc_rep]))
        out_toks = pa.LargeListArray.from_arrays(
            new_offsets, pa.array(vals, pa.int32())
        ).cast(pa.list_(pa.int32()))
        return pa.table(
            {
                "source": src,
                "seq_id": pa.array(seq_id),
                "gs_start": pa.array(gs_start),
                "toks": out_toks,
            }
        )

    slices = (
        heavy.union(light)
        .groupby("__bucket")
        .map_groups(join_and_slice, batch_format="pyarrow")
    )

    # ---- stage C (per chunk bucket): assemble packed sequences ----------
    def tag_chunk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "source" not in t.column_names:
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "seq_id": pa.array([], pa.int64()),
                    "gs_start": pa.array([], pa.int64()),
                    "toks": pa.array([], pa.list_(pa.int32())),
                    "__cb": pa.array([], pa.int32()),
                }
            )
        key = hash64(t["source"]) + np.asarray(t["seq_id"]).astype(np.uint64)
        return t.append_column(
            "__cb", pa.array((key % np.uint64(n_buckets)).astype(np.int32))
        )

    def assemble(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.array([], pa.string()),
                "seq_id": pa.array([], pa.int64()),
                "tokens": pa.array([], pa.list_(pa.int32())),
                "n_tok": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        src = g["source"].combine_chunks().dictionary_encode()
        codes = np.asarray(src.indices).astype(np.int64)
        seq = np.asarray(g["seq_id"])
        gs = np.asarray(g["gs_start"])
        order = np.lexsort((gs, seq, codes))
        toks = g["toks"].combine_chunks()
        offs = np.asarray(toks.offsets).astype(np.int64)
        ln = (offs[1:] - offs[:-1])[order]
        gidx = np.repeat(offs[:-1][order] - np.cumsum(ln) + ln, ln) + np.arange(
            int(ln.sum())
        )
        vals = np.asarray(toks.values)[gidx]
        c_o, s_o = codes[order], seq[order]
        brk = np.ones(len(order), dtype=bool)
        brk[1:] = (c_o[1:] != c_o[:-1]) | (s_o[1:] != s_o[:-1])
        starts = np.nonzero(brk)[0]
        group_len = np.add.reduceat(ln, starts) if len(starts) else np.array([], np.int64)
        chunk_offsets = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(group_len, out=chunk_offsets[1:])
        n_docs = np.diff(np.concatenate([starts, [len(order)]]))
        out_toks = pa.LargeListArray.from_arrays(
            chunk_offsets, pa.array(vals, pa.int32())
        ).cast(pa.list_(pa.int32()))
        return pa.table(
            {
                "source": pc.take(src.dictionary, pa.array(c_o[starts])),
                "seq_id": pa.array(s_o[starts]),
                "tokens": out_toks,
                "n_tok": pa.array(group_len.astype(np.int64)),
                "n_docs": pa.array(n_docs.astype(np.int64)),
            }
        )

    return (
        slices.map_batches(tag_chunk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__cb")
        .map_groups(assemble, batch_format="pyarrow")
    )
