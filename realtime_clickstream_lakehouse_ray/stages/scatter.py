"""Range-partitioned scatter/gather exchange for Z-order clustering.

Ray Data's ``Dataset.sort`` moves every row through the object store twice
(map put + reduce get) and pays heavy per-slice machinery on wide token
payloads: profiled SortMap tasks spend 0.1-0.2 s in the sort body but
1.9 s wall per task, and the measured scaling efficiency of the sort-based
Z-order is 0.40-0.51 versus 0.84 for the shuffle-free compaction pass over
the same bytes.  This module re-expresses the one all-to-all in the engine
as the classic external range-sort exchange instead:

1. **plan** — a narrow read of the curve dimensions only (no ``tokens``
   column leaves storage; at the reference data model that is < 2% of the
   table bytes) computes zkeys and samples them; exact index-based
   quantiles of the sample give B bucket boundaries, B = table_bytes /
   target_file_bytes (one output file per bucket).
2. **scatter** — an embarrassingly-parallel ``map_batches`` pass: each
   input block is zkey-sorted (vectorized argsort), cut into contiguous
   per-bucket runs (``searchsorted`` against the broadcast boundaries —
   ~B uint64s, shipped in the task spec), and each run is appended to the
   job's scratch as one uncompressed Arrow IPC fragment
   (``_scratch/<job>/bucket=NNNNN/``).  Zero-copy slices, zero
   cross-worker traffic.
3. **gather** — one task per bucket: mmap-read that bucket's fragments,
   one vectorized sort of ~target_file_bytes rows, write the final
   Parquet file(s).  Also embarrassingly parallel, and checkpointable
   per bucket (a resumed job skips finished buckets).

On a multi-node cluster the scratch directory lives on the table's own
shared storage (S3 / HDFS / NFS) exactly like the data files, so the
exchange crosses the network once in each direction — the same byte
movement as a push-based shuffle, but with no object-store slicing, no
centralized reduce scheduling, and bucket-granular resume.  Fragment-count
control: single-level scatter emits O(input_blocks x buckets) fragments —
ruinous at the 100 TB / 1 GB-file design point (10^5 buckets -> ~KB
slivers).  Above ``pipelines.table.SCATTER_TWO_LEVEL_THRESHOLD`` buckets
the exchange therefore runs TWO-LEVEL automatically: phase A scatters into
~sqrt(B) coarse ranges (every sqrt(B)-th final boundary), then phase B
(``make_repartitioner``) regroups each range's fragments to ~block size
and re-cuts against the final boundaries — total fragments
O(blocks x sqrt(B)), per-directory fan-out O(blocks), identical output to
single-level (equality-tested).  Provenance: reference OPTIMIZE ZORDER
semantics per README.md:159-176 (delegated there to the Delta JAR).
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from realtime_clickstream_lakehouse_ray.stages.zkey import add_zkey

FRAG_STATS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("path", pa.string()),
        ("rows", pa.int64()),
        ("bytes", pa.int64()),
    ]
)


def sample_zkeys(
    batch: pa.Table,
    dims: tuple[str, ...],
    bounds: dict[str, tuple[int, int]] | None,
    curve: str,
    part_rank: dict[str, int] | None,
    partition_col: str,
    max_samples: int = 4096,
) -> pa.Table:
    """Plan-phase stage: zkeys of an evenly-strided row sample of one
    narrow batch (curve dims only — the wide ``tokens`` column is never
    read in this pass)."""
    if batch.num_rows == 0:
        return pa.table({"zkey": pa.array([], type=pa.uint64())})
    zk = np.asarray(
        add_zkey(batch, dims, bounds, curve, part_rank, partition_col)
        .column("zkey")
        .combine_chunks()
    )
    if len(zk) > max_samples:
        idx = np.linspace(0, len(zk) - 1, max_samples).astype(np.int64)
        zk = zk[idx]
    return pa.table({"zkey": pa.array(zk, type=pa.uint64())})


def boundaries_from_sample(samples: np.ndarray, n_buckets: int) -> np.ndarray:
    """Exact index-based quantile boundaries (no float round-trip — zkeys
    use the full uint64 range once the partition rank is folded into the
    high bits, and float64 quantiles would corrupt the low 11 bits)."""
    if n_buckets <= 1 or samples.size == 0:
        return np.array([], dtype=np.uint64)
    s = np.sort(samples)
    idx = (np.arange(1, n_buckets) * len(s)) // n_buckets
    return np.unique(s[idx])  # dedup collapses empty buckets up front


class ScatterWriter:
    """Scatter-phase stage (stateless tasks): zkey-sort one block, cut it
    into per-bucket runs, append each run as an Arrow IPC fragment under
    the job scratch.  Emits one frag-stats row per fragment written."""

    def __init__(
        self,
        scratch: str,
        boundaries: np.ndarray,
        dims: tuple[str, ...],
        bounds: dict[str, tuple[int, int]] | None,
        curve: str,
        part_rank: dict[str, int] | None,
        partition_col: str,
    ):
        self.scratch = Path(scratch)
        self.boundaries = np.asarray(boundaries, dtype=np.uint64)
        self.dims = dims
        self.bounds = bounds
        self.curve = curve
        self.part_rank = part_rank
        self.partition_col = partition_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pa.set_cpu_count(2)  # concurrent tasks each spawn a pool otherwise
        if batch.num_rows == 0:
            return FRAG_STATS_SCHEMA.empty_table()
        if "zkey" not in batch.column_names:  # phase-B re-cuts carry zkey
            batch = add_zkey(
                batch, self.dims, self.bounds, self.curve, self.part_rank,
                self.partition_col,
            )
        zk = np.asarray(batch.column("zkey").combine_chunks())
        order = np.argsort(zk, kind="stable")
        batch = batch.take(pa.array(order))
        zk = zk[order]
        # bucket i = (boundaries[i-1], boundaries[i]]; cuts are the starts
        # of buckets 1..B-1 within the sorted block -> contiguous runs
        cuts = np.searchsorted(zk, self.boundaries, side="right")
        starts = np.concatenate(([0], cuts))
        ends = np.concatenate((cuts, [len(zk)]))
        rows: list[dict] = []
        for b, (s, e) in enumerate(zip(starts, ends)):
            if e <= s:
                continue
            run = batch.slice(s, e - s)  # zero-copy
            rel = f"bucket={b:05d}/frag-{uuid.uuid4().hex}.arrow"
            abspath = self.scratch / rel
            abspath.parent.mkdir(parents=True, exist_ok=True)
            tmp = abspath.parent / f".tmp-{uuid.uuid4().hex}"
            with pa.OSFile(str(tmp), "wb") as sink:
                with pa.ipc.new_file(sink, run.schema) as w:
                    w.write_table(run)
            nbytes = tmp.stat().st_size
            os.replace(tmp, abspath)
            rows.append(
                {"bucket": b, "path": rel, "rows": e - s, "bytes": nbytes}
            )
        return pa.Table.from_pylist(rows, schema=FRAG_STATS_SCHEMA)


def make_scatter_writer(**kwargs):
    """Task-form of ScatterWriter (plain function -> stateless elastic Ray
    tasks; the per-task state — ~B boundary uint64s — ships in the spec)."""
    writer = ScatterWriter(**kwargs)

    def scatter_batch(batch: pa.Table) -> pa.Table:
        return writer(batch)

    return scatter_batch


def make_repartitioner(
    coarse_scratch: str,
    scratch: str,
    boundaries: np.ndarray,
    dims: tuple[str, ...],
    bounds: dict[str, tuple[int, int]] | None,
    curve: str,
    part_rank: dict[str, int] | None,
    partition_col: str,
):
    """Phase-B stage of the TWO-LEVEL exchange: each work item is a
    ~block-sized GROUP of same-coarse-range phase-A fragments.  The task
    mmap-reads the group (zkey travels with the fragments, so no re-key),
    cuts it against the FULL final boundary array and appends per-final-
    bucket fragments under the main scratch.

    Why grouping matters: re-cutting fragments one at a time would emit
    O(phaseA_frags x sqrt(B)) slivers — the same blow-up two-level exists
    to avoid.  Grouped to block size, total fragment count across both
    phases is O(blocks x sqrt(B)) instead of the single-level
    O(blocks x B), and each scratch directory level holds at most
    O(blocks) entries."""
    writer = ScatterWriter(
        scratch=scratch,
        boundaries=boundaries,
        dims=dims,
        bounds=bounds,
        curve=curve,
        part_rank=part_rank,
        partition_col=partition_col,
    )

    def repartition(batch: pa.Table) -> pa.Table:
        import json

        out = []
        for spec_json in batch.column("spec").to_pylist():
            spec = json.loads(spec_json)
            tbl = read_fragments(coarse_scratch, spec["frags"])
            out.append(writer(tbl))
        return (
            pa.concat_tables(out) if out else FRAG_STATS_SCHEMA.empty_table()
        )

    return repartition


def group_fragments_by_bytes(
    rows: list[dict], group_bytes: int
) -> list[list[str]]:
    """Pack one coarse range's fragment paths into ~``group_bytes`` groups
    (first-fit in stats order) — the unit of phase-B work."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for r in rows:
        cur.append(r["path"])
        cur_bytes += int(r["bytes"])
        if cur_bytes >= group_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)
    return groups


def read_fragments(scratch: str, frag_paths: list[str]) -> pa.Table:
    """Memory-mapped read of one bucket's IPC fragments."""
    parts = []
    for rel in frag_paths:
        with pa.memory_map(str(Path(scratch) / rel), "rb") as src:
            parts.append(pa.ipc.open_file(src).read_all())
    return pa.concat_tables(parts, promote_options="default")


class GatherWriter:
    """Gather-phase stage: one unit per bucket — mmap-read the bucket's
    fragments, one vectorized zkey sort, conform (drops the transient
    ``zkey``), write ~target-size Parquet file(s) with deterministic names,
    persist the unit's lineage record + per-unit Bloom sidecar.  Mirrors
    BinRewriter's checkpoint protocol so an interrupted Z-order resumes at
    bucket granularity (finished buckets are skipped; a crashed bucket's
    rerun overwrites its own deterministic output paths)."""

    def __init__(
        self,
        root: str,
        schema: pa.Schema,
        partition_col: str,
        scratch: str,
        job_id: str,
        rows_per_file: int,
        signature: str,
        physical_names: list[str] | None = None,
        stats_cols: tuple[str, ...] = (),
    ):
        from realtime_clickstream_lakehouse_ray.state.checkpoint import JobCheckpoint

        self.root = Path(root)
        self.schema = schema
        # column-mapping: fragments are logically named (they come off the
        # table scan); rename positionally to physical after the conform
        self.physical_names = physical_names
        self.stats_cols = tuple(stats_cols)
        self.partition_col = partition_col
        self.scratch = scratch
        self.ckpt = JobCheckpoint(root, job_id)
        self.rows_per_file = max(1, rows_per_file)
        self.signature = signature

    def _write_unit_blooms(self, unit: int, entries) -> None:
        import pyarrow.parquet as pq

        rows = [(e.path, e.bloom) for e in entries if e.bloom]
        if not rows:
            return
        d = self.root / "_blooms" / "units" / self.ckpt.job_id
        d.mkdir(parents=True, exist_ok=True)
        tbl = pa.table(
            {
                "path": pa.array([r[0] for r in rows], pa.string()),
                "bloom": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        tmp = d / f".tmp-{uuid.uuid4().hex}.parquet"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, d / f"unit-{unit}.parquet")

    def _process_unit(self, spec: dict) -> dict:
        import time as _time

        from realtime_clickstream_lakehouse_ray.schema import conform_table
        from realtime_clickstream_lakehouse_ray.stages.writer import (
            write_partitioned,
        )

        unit = int(spec["unit"])
        existing = self.ckpt.read_unit(unit)
        if existing is not None and all(
            (self.root / a["path"]).is_file() for a in existing["adds"]
        ):
            return existing  # resume: bucket already gathered
        t0 = _time.perf_counter()
        tbl = read_fragments(self.scratch, spec["frags"])
        zk = np.asarray(tbl.column("zkey").combine_chunks())
        tbl = tbl.take(pa.array(np.argsort(zk, kind="stable")))
        tbl = conform_table(tbl, self.schema)  # drops zkey
        if self.physical_names:
            tbl = tbl.rename_columns(self.physical_names)
        n_chunks = max(1, round(tbl.num_rows / self.rows_per_file))
        step = -(-tbl.num_rows // n_chunks)
        entries = []
        for i in range(n_chunks):
            chunk = tbl.slice(i * step, step)
            if chunk.num_rows == 0:
                continue
            entries.extend(
                write_partitioned(
                    chunk,
                    self.root,
                    self.partition_col,
                    stats_cols=self.stats_cols,
                    # deterministic WITHIN a job (crash-rerun overwrites its
                    # own partial output) but namespaced BY job — without the
                    # job id, the next zorder's unit 0 would silently
                    # overwrite this snapshot's live unit-0 file
                    name_fn=lambda part, i=i: (
                        f"zs-{self.ckpt.job_id}-u{unit:05d}-c{i:02d}.parquet"
                    ),
                )
            )
        for e in entries:
            e.clustered = self.signature
        self._write_unit_blooms(unit, entries)
        record = {
            "unit": unit,
            "partition": entries[0].partition if entries else "",
            "inputs": spec["frags"],
            "unit_sec": round(_time.perf_counter() - t0, 3),
            "adds": [e.to_action() for e in entries],
            "removes": [],
            "rows": int(tbl.num_rows),
        }
        self.ckpt.write_unit(unit, record)
        return record

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        # run as stateless tasks: cap the pools in the task body (concurrent
        # tasks each spawn a full-size Arrow pool otherwise)
        pa.set_cpu_count(2)
        pa.set_io_thread_count(2)

        from realtime_clickstream_lakehouse_ray.state.log import FileEntry
        from realtime_clickstream_lakehouse_ray.stages.writer import (
            entries_to_table,
        )

        entries = []
        for spec_json in batch.column("spec").to_pylist():
            record = self._process_unit(json.loads(spec_json))
            entries.extend(FileEntry.from_action(a) for a in record["adds"])
        return entries_to_table(entries)
