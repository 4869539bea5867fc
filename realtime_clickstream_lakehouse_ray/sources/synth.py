"""Deterministic synthetic tokens tables (FIXTURES.md §1/§2).

Generation is seeded per file index (``numpy.random.default_rng(seed +
file_index)``) so any chunk can be regenerated independently inside a Ray
task with no cross-task state — the generator itself parallelizes as a
Ray Data pipeline over chunk descriptors.  ``source`` is Zipf-skewed so the
hot-partition / salting paths are exercised (FIXTURES.md: ``web`` is hot).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from realtime_clickstream_lakehouse_ray.schema import TOKENS_SCHEMA

SOURCES = ["web", "books", "code", "wiki", "news", "forums", "papers", "chat"]
_ZIPF_A = 1.5
VOCAB = 50_257
DEFAULT_SEED = 42


def _zipf_weights(n: int, a: float = _ZIPF_A) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** a
    return w / w.sum()


def gen_tokens_chunk(
    file_index: int,
    start_row: int,
    n_rows: int,
    seed: int = DEFAULT_SEED,
    mean: float = 6.0,
    sigma: float = 0.8,
    lo: int = 8,
    hi: int = 4096,
) -> pa.Table:
    """Generate rows [start_row, start_row+n_rows) of the canonical table."""
    rng = np.random.default_rng(seed + file_index)
    lengths = np.clip(
        rng.lognormal(mean=mean, sigma=sigma, size=n_rows), lo, hi
    ).astype(np.int64)
    values = rng.integers(0, VOCAB, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(offsets, values).cast(pa.list_(pa.int32()))
    idx = np.arange(start_row, start_row + n_rows)
    doc_id = pa.array(np.char.add("doc-", np.char.zfill(idx.astype("U12"), 12)))
    source_idx = rng.choice(len(SOURCES), size=n_rows, p=_zipf_weights(len(SOURCES)))
    source = pa.DictionaryArray.from_arrays(
        pa.array(source_idx, type=pa.int8()), pa.array(SOURCES)
    ).cast(pa.string())
    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(lengths.astype(np.int32)), source],
        schema=TOKENS_SCHEMA,
    )


def build_synthetic_table(
    root: str,
    n_rows: int,
    rows_per_file: int = 1000,
    seed: int = DEFAULT_SEED,
    files_per_task: int = 4,
    concurrency=(1, 8),
):
    """Create an on-disk engine table of ``n_rows`` deterministic rows,
    written as many deliberately small files (FIXTURES.md: the small-file
    problem is the point — per-microbatch writes in the reference with
    ``shuffle.partitions=1`` produce exactly this, glue_stream.py:297).

    Generation itself is a Ray Data pipeline over chunk indices (each chunk
    regenerable independently via its seeded rng), so building the bench
    table parallelizes and never materializes on the driver."""
    import ray.data

    from realtime_clickstream_lakehouse_ray.pipelines.table import Table

    table = Table.create(root)
    n_files = -(-n_rows // rows_per_file)

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for fid in batch.column("id").to_pylist():
            start = fid * rows_per_file
            out.append(
                gen_tokens_chunk(fid, start, min(rows_per_file, n_rows - start), seed)
            )
        return pa.concat_tables(out)

    ds = ray.data.range(n_files).map_batches(
        gen, batch_format="pyarrow", batch_size=files_per_task
    )
    table.append(ds, rows_per_file=rows_per_file, concurrency=concurrency)
    return table


def expected_tokens_table(n_rows: int, rows_per_file: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Regenerate the full expected table driver-side (small scales only)."""
    chunks = []
    n_files = -(-n_rows // rows_per_file)
    for fid in range(n_files):
        start = fid * rows_per_file
        chunks.append(gen_tokens_chunk(fid, start, min(rows_per_file, n_rows - start), seed))
    return pa.concat_tables(chunks)


def gen_updates_chunk(
    n_existing: int,
    n_updates: int,
    n_inserts: int,
    seed: int = DEFAULT_SEED,
) -> pa.Table:
    """MERGE source per FIXTURES.md §2: updates hit existing doc_ids spread
    across the id range (hence across all source partitions), inserts get
    fresh ids past the range, and the first update id is duplicated (with
    different tokens) to exercise keep-latest dedup."""
    rng = np.random.default_rng(seed + 10_000)
    upd_ids = rng.choice(n_existing, size=n_updates, replace=False)
    ins_ids = n_existing + np.arange(n_inserts)
    idx = np.concatenate([upd_ids, ins_ids, upd_ids[:1]])  # duplicate pair
    n = len(idx)
    lengths = rng.integers(8, 64, size=n).astype(np.int64)
    values = rng.integers(0, VOCAB, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(offsets, values).cast(pa.list_(pa.int32()))
    doc_id = pa.array(np.char.add("doc-", np.char.zfill(idx.astype("U12"), 12)))
    source_idx = rng.choice(len(SOURCES), size=n, p=_zipf_weights(len(SOURCES)))
    source = pa.array([SOURCES[i] for i in source_idx])
    return pa.Table.from_arrays(
        [doc_id, tokens, pa.array(lengths.astype(np.int32)), source],
        schema=TOKENS_SCHEMA,
    )
