"""Partitioned Parquet file writer stage with per-file stats.

The engine's write path is the Ray-native restatement of the reference's
Delta append sink (``_write_stream_to_s3``,
/root/reference/etl/glue_stream.py:304-354): conform the batch to the table
schema, write snappy Parquet into Hive-style ``source=<v>/`` partition
directories, and *return the per-file stats* that become ``add`` actions in
the snapshot commit (Delta gets these from its own transaction protocol;
we compute them inline so commits and lineage records carry
partition / rows / bytes / min-max ``n_tok`` / min-max ``doc_id`` /
token-sum without a second pass over the data).

Used as ``ds.map_batches(FileWriter(...), batch_format="pyarrow",
zero_copy_batch=True, batch_size=<rows per output file>)`` — an actor pool
when writing many files (writer state amortized), plain tasks otherwise.
The stage's output dataset is the tiny stats table, which the driver
collects to build the commit; the data itself never flows to the driver.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from realtime_clickstream_lakehouse_ray.schema import conform_table
from realtime_clickstream_lakehouse_ray.state.log import FileEntry

STATS_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("partition", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
        ("min_n_tok", pa.int64()),
        ("max_n_tok", pa.int64()),
        ("min_key", pa.string()),
        ("max_key", pa.string()),
        ("sum_tok", pa.int64()),
        ("bloom", pa.binary()),
        ("col_stats", pa.string()),  # JSON {phys_col: [lo, hi]} or null
    ]
)


def file_stats(
    tbl: pa.Table,
    path: str,
    partition: str,
    nbytes: int,
    stats_cols: tuple[str, ...] = (),
) -> FileEntry:
    """Compute a FileEntry from an in-memory table slice (vectorized),
    including the per-file key Bloom filter (functions/bloom.py) that
    restores MERGE file-skipping after Z-order scatters the key ranges.
    ``stats_cols`` (PHYSICAL names) get generic [min, max] entries in
    ``col_stats`` — the file-skipping index scan(where=) prunes with."""
    from realtime_clickstream_lakehouse_ray.functions.bloom import build_bloom
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    mm_tok = pc.min_max(tbl["n_tok"]) if "n_tok" in tbl.column_names else None
    mm_key = pc.min_max(tbl["doc_id"]) if "doc_id" in tbl.column_names else None
    sum_tok = pc.sum(tbl["n_tok"]).as_py() if "n_tok" in tbl.column_names else None
    bloom = (
        build_bloom(hash64(tbl["doc_id"].combine_chunks()))
        if "doc_id" in tbl.column_names and tbl.num_rows
        else None
    )
    col_stats = None
    if stats_cols and tbl.num_rows:
        col_stats = {}
        for c in stats_cols:
            if c not in tbl.column_names:
                continue
            t = tbl.schema.field(c).type
            if pa.types.is_nested(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
                continue  # no meaningful ordering for skipping
            mm = pc.min_max(tbl[c])
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is not None and hi is not None:
                if pa.types.is_timestamp(t) or pa.types.is_date(t):
                    lo, hi = str(lo), str(hi)  # JSON-safe, order-preserving ISO
                col_stats[c] = [lo, hi]
        col_stats = col_stats or None
    return FileEntry(
        path=path,
        partition=partition,
        rows=tbl.num_rows,
        bytes=nbytes,
        min_n_tok=(mm_tok["min"].as_py() if mm_tok else None),
        max_n_tok=(mm_tok["max"].as_py() if mm_tok else None),
        min_key=(mm_key["min"].as_py() if mm_key else None),
        max_key=(mm_key["max"].as_py() if mm_key else None),
        sum_tok=sum_tok,
        bloom=bloom,
        col_stats=col_stats,
    )


def write_file_atomic(tbl: pa.Table, abs_path: Path, compression: str = "snappy") -> int:
    """Write Parquet via temp + rename so crashes never leave half files
    visible; returns the file's byte size."""
    abs_path.parent.mkdir(parents=True, exist_ok=True)
    tmp = abs_path.parent / f".tmp-{uuid.uuid4().hex}.parquet"
    pq.write_table(tbl, tmp, compression=compression)
    nbytes = tmp.stat().st_size
    os.replace(tmp, abs_path)
    return nbytes


def split_by_partition(tbl: pa.Table, partition_col: str) -> dict[str, pa.Table]:
    """Split a batch into per-partition-value sub-tables (vectorized filter)."""
    col = tbl.column(partition_col)
    values = pc.unique(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if len(values) == 1:
        return {values[0].as_py(): tbl}
    return {
        v.as_py(): tbl.filter(pc.equal(col, v))
        for v in values
    }


def write_partitioned(
    tbl: pa.Table,
    root: str | os.PathLike,
    partition_col: str = "source",
    name_fn: Callable[[str], str] | None = None,
    compression: str = "snappy",
    stats_cols: tuple[str, ...] = (),
) -> list[FileEntry]:
    """Write one file per partition value present in ``tbl``; return stats."""
    root = Path(root)
    entries = []
    for part, sub in split_by_partition(tbl, partition_col).items():
        # non-string partition values (e.g. a date32 event_date) become
        # their Hive-style string form in paths, stats, and commit JSON
        part = part if isinstance(part, str) else str(part)
        name = name_fn(part) if name_fn else f"part-{uuid.uuid4().hex}.parquet"
        rel = f"{partition_col}={part}/{name}"
        nbytes = write_file_atomic(sub, root / rel, compression)
        entries.append(file_stats(sub, rel, part, nbytes, stats_cols=stats_cols))
    return entries


def entries_to_table(entries: list[FileEntry]) -> pa.Table:
    import json as _json

    return pa.Table.from_pylist(
        [
            {
                "path": e.path,
                "partition": e.partition,
                "rows": e.rows,
                "bytes": e.bytes,
                "min_n_tok": e.min_n_tok,
                "max_n_tok": e.max_n_tok,
                "min_key": e.min_key,
                "max_key": e.max_key,
                "sum_tok": e.sum_tok,
                "bloom": e.bloom,
                "col_stats": (
                    _json.dumps(e.col_stats) if e.col_stats else None
                ),
            }
            for e in entries
        ],
        schema=STATS_SCHEMA,
    )


class FileWriter:
    """Write stage: conform each Arrow batch and write it out as one
    Parquet file per partition value; emit the stats rows (reference M9 +
    K2 fused — see SURVEY.md §2.2/§2.3).

    Run it as STATELESS TASKS (``map_batches(make_file_writer(...))``) —
    the per-batch state is trivial, and task-based stages scale elastically
    with the pipeline instead of paying actor-pool warm-up (an autoscaling
    pool starting at 1 actor serializes short write stages; measured 20x
    slowdown on 20-unit jobs)."""

    def __init__(
        self,
        root: str,
        schema: pa.Schema,
        partition_col: str = "source",
        physical_names: list[str] | None = None,
        stats_cols: tuple[str, ...] = (),
    ):
        self.root = root
        self.schema = schema
        self.partition_col = partition_col
        # column-mapping support: batches arrive LOGICALLY named; after the
        # conform, rename positionally to the table's physical parquet
        # names so files always carry physical names (None = identity)
        self.physical_names = physical_names
        self.stats_cols = tuple(stats_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return entries_to_table([])
        batch = conform_table(batch, self.schema)
        if self.physical_names:
            batch = batch.rename_columns(self.physical_names)
        entries = write_partitioned(
            batch, self.root, self.partition_col, stats_cols=self.stats_cols
        )
        return entries_to_table(entries)


def make_file_writer(
    root: str,
    schema: pa.Schema,
    partition_col: str = "source",
    physical_names: list[str] | None = None,
    stats_cols: tuple[str, ...] = (),
):
    """Task-form of FileWriter (plain function -> stateless Ray tasks)."""
    writer = FileWriter(root, schema, partition_col, physical_names, stats_cols)

    def write_batch(batch: pa.Table) -> pa.Table:
        # cap this worker's Arrow pool: concurrent write tasks each spawn a
        # full-size pool otherwise and thrash the node (see BinRewriter)
        pa.set_cpu_count(2)
        return writer(batch)

    return write_batch


def write_slice_task(
    tbl: pa.Table,
    root: str,
    schema: pa.Schema,
    partition_col: str,
    name_prefix: str,
    physical_names: list[str] | None = None,
    stats_cols: tuple[str, ...] = (),
) -> list[FileEntry]:
    """Raw-task form of the partitioned writer (wrap with ``ray.remote``):
    returns the FileEntry list directly instead of a stats table, so a
    caller can launch slice writes as plain futures OVERLAPPED with a
    Dataset pipeline (MERGE overlaps the source append with the rewrite
    stage this way — the two touch disjoint files).  File names are
    deterministic (``<prefix>-NNN.parquet``), so a crashed-then-rerun job
    overwrites its own partial output instead of orphaning it."""
    pa.set_cpu_count(2)
    if tbl.num_rows == 0:
        return []
    tbl = conform_table(tbl, schema)
    if physical_names:
        tbl = tbl.rename_columns(physical_names)
    seq = iter(range(10**6))
    return write_partitioned(
        tbl,
        root,
        partition_col,
        name_fn=lambda part: f"{name_prefix}-{next(seq):03d}.parquet",
        stats_cols=stats_cols,
    )


def write_slice_ref_task(
    tbl: pa.Table,
    start: int,
    length: int,
    root: str,
    schema: pa.Schema,
    partition_col: str,
    name_prefix: str,
    physical_names: list[str] | None = None,
    stats_cols: tuple[str, ...] = (),
    drop_keys=None,
    keep_keys=None,
    key_col: str = "doc_id",
) -> list[FileEntry]:
    """Ref-based form of ``write_slice_task`` for the broadcast MERGE
    append: the caller passes the PREPARED source's ObjectRef (auto-deref
    = zero-copy plasma read; one transfer per node on a cluster) plus
    slice bounds, so the driver ships coordinates, never rows.  Optional
    ``keep_keys`` / ``drop_keys`` apply the SEQUENCE BY / WHEN MATCHED
    verdicts inside the task (key filters commute with row slicing, so
    per-slice filtering equals whole-source filtering)."""
    part = tbl.slice(start, length)
    if keep_keys is not None:
        part = part.filter(
            pc.is_in(part[key_col], value_set=pa.array(keep_keys, pa.string()))
        )
    elif drop_keys is not None and len(drop_keys):
        part = part.filter(
            pc.invert(
                pc.is_in(part[key_col], value_set=pa.array(drop_keys, pa.string()))
            )
        )
    return write_slice_task(
        part, root, schema, partition_col, name_prefix, physical_names,
        stats_cols,
    )
