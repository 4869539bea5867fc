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
