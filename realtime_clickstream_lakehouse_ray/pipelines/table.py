"""The maintenance Table: Ray-Data-native ACID Parquet table with
compaction, Z-order clustering, MERGE INTO, snapshot expire and time travel.

This is the engine's restatement of the reference's lakehouse half — Delta
table semantics the reference gets from its Delta 1.2 JAR
(/root/reference/etl/glue_stream.py:339-349, README.md:83,176,194) — built
from scratch on the snapshot log (``state/log.py``), checkpoint manifests
(``state/checkpoint.py``) and Ray Data pipelines:

- ``append``  : Dataset -> conform -> partitioned file writes (actor pool)
                -> atomic snapshot commit (reference K2, glue_stream.py:304-354)
- ``scan``    : snapshot-pinned ``read_parquet`` over exactly the files of a
                version, with partition/stats file pruning + column pruning
- ``compact`` : driver-side bin packing over file *stats* (no data moved) ->
                per-bin copy-on-write rewrite in an actor pool -> commit.
                Zero shuffle: bins never cross partitions.
- ``zorder``  : zkey map_batches -> ``sort("zkey")`` (the one global range
                shuffle) -> size-targeted file writes -> commit
- ``merge``   : broadcast regime (source keys via ``ray.put``; stats-pruned
                copy-on-write deletes + partitioned append of the source) or
                hash-shuffle regime (groupby on the key, full rewrite)
- ``expire_snapshots`` / ``vacuum`` / ``rewrite_manifests`` / ``history``

Every maintenance job writes per-unit lineage records to
``_checkpoints/<job_id>/`` from inside the workers and commits with a
deterministic job id, so an interrupted job re-run resumes: finished units
are skipped, the commit is exactly-once, and a job whose commit already
landed is a no-op.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Iterable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from realtime_clickstream_lakehouse_ray.config import tune_context
from realtime_clickstream_lakehouse_ray.schema import TOKENS_SCHEMA, conform_table
from realtime_clickstream_lakehouse_ray.stages.rewrite import BinRewriter, make_spec_items
from realtime_clickstream_lakehouse_ray.stages.writer import (
    file_stats,
    make_file_writer,
    write_file_atomic,
    write_partitioned,
    write_slice_ref_task,
)
from realtime_clickstream_lakehouse_ray.stages.zkey import add_zkey
from realtime_clickstream_lakehouse_ray.state.checkpoint import JobCheckpoint
from realtime_clickstream_lakehouse_ray.state.log import (
    CommitConflict,
    FileEntry,
    SnapshotLog,
)

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024
# past this many range buckets the zorder scatter runs two-level (coarse
# ranges then grouped re-cut) — see stages/scatter.py module docstring
SCATTER_TWO_LEVEL_THRESHOLD = 4096


def _load_dv_keys(args: tuple) -> pa.Array:
    """Broadcast transform (functions/broadcast.get_broadcast): load the
    union of the scanned snapshot's deletion-vector key sets, once per
    worker process."""
    import pyarrow.parquet as pq

    root, dv_paths, key_col = args
    # Path join (not string concat): shallow-cloned entries carry ABSOLUTE
    # dv paths, which must win over the clone's root
    arrays = [
        pq.read_table(Path(root) / p, columns=[key_col])[key_col].combine_chunks()
        for p in dv_paths
    ]
    return pc.unique(pa.concat_arrays(arrays))


_INT_WIDTH = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}


def _type_widens(old: pa.DataType, new: pa.DataType) -> bool:
    """Iceberg-style safe type promotion: int upcasts within the signed
    family, float32 -> float64, and the same rules applied to list element
    types.  Everything else is NOT a widening."""
    if old in _INT_WIDTH and new in _INT_WIDTH:
        return _INT_WIDTH[new] > _INT_WIDTH[old]
    if old == pa.float32() and new == pa.float64():
        return True
    if pa.types.is_list(old) and pa.types.is_list(new):
        return _type_widens(old.value_type, new.value_type)
    return False


def _dedup_keep_latest(
    tbl: pa.Table, key_col: str, sequence_col: str | None = None
) -> pa.Table:
    """Keep ONE row per key: the LAST occurrence (MERGE keep-latest
    semantics), or — when ``sequence_col`` is given — the row with the
    HIGHEST sequence value (ties resolve to the later occurrence), the
    within-source half of ``SEQUENCE BY`` ordering."""
    keys = np.asarray(tbl.column(key_col))
    if sequence_col is not None:
        seq = np.asarray(tbl.column(sequence_col))
        pos = np.arange(len(keys), dtype=np.int64)
        order = np.lexsort((pos, seq, keys))  # by key, then seq, then pos
        k_sorted = keys[order]
        last = np.ones(len(keys), dtype=bool)
        if len(keys) > 1:
            last[:-1] = k_sorted[1:] != k_sorted[:-1]
        return tbl.take(pa.array(np.sort(order[last])))
    # np.unique keeps the first occurrence -> reverse so last wins
    _, idx = np.unique(keys[::-1], return_index=True)
    take = (len(keys) - 1) - idx
    return tbl.take(pa.array(np.sort(take)))


@ray.remote(num_returns=3)
def _prepare_merge_source(
    schema: pa.Schema,
    key_col: str,
    sequence_col: str | None,
    constraints: list[dict],
    file_key_stats: list[tuple[str, str | None, str | None]],
    blooms: dict[str, bytes],
    *blocks: pa.Table,
):
    """Broadcast-MERGE source preparation as a TASK, so the driver never
    holds source bytes OR source keys: conform + CHECK constraints +
    keep-latest dedup + min/max-key+Bloom FILE PRUNING all happen here.
    Returns

    - [0] the prepared source table (stays in the object store; the
      append slice tasks read it by ref),
    - [1] the rewrite units' key broadcast — an Arrow string array for
      membership modes (plasma-zero-copy per node), or the
      ``(sorted_keys, aligned_seqs)`` numpy pair for SEQUENCE BY,
    - [2] driver metadata that is FILE-COUNT-proportional only: the
      affected file paths plus row/byte counts for unit planning."""
    from realtime_clickstream_lakehouse_ray.functions.bloom import (
        bloom_any_match,
    )
    from realtime_clickstream_lakehouse_ray.functions.constraints import (
        check_batch,
    )
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
    from realtime_clickstream_lakehouse_ray.schema import conform_table

    live = [conform_table(b, schema) for b in blocks if b.num_rows]
    src = pa.concat_tables(live) if live else schema.empty_table()
    if constraints:
        check_batch(src, constraints, key_col=key_col)
    src = _dedup_keep_latest(src, key_col, sequence_col)
    key_arr = src.column(key_col).combine_chunks()
    keys = np.asarray(key_arr)
    order = np.argsort(keys)
    keys_sorted = keys[order]
    key_hashes = hash64(key_arr) if len(keys) else np.empty(0, np.uint64)
    # stats-based file pruning: a file can contain a match only if some
    # source key falls inside its [min_key, max_key] range AND (when the
    # file has a Bloom sidecar) some key probes positive — the bloom is
    # what keeps small-source MERGE cheap after Z-order scatters the key
    # ranges (min/max alone prunes nothing then)
    affected: list[str] = []
    for path, min_key, max_key in file_key_stats:
        if min_key is not None and max_key is not None:
            lo = np.searchsorted(keys_sorted, min_key, side="left")
            if lo >= len(keys_sorted) or keys_sorted[lo] > max_key:
                continue
        b = blooms.get(path)
        if b is not None and not bloom_any_match(b, key_hashes):
            continue
        affected.append(path)
    if sequence_col is not None:
        keys_payload: object = (keys_sorted, np.asarray(src.column(sequence_col))[order])
    else:
        keys_payload = key_arr
    meta = {
        "affected": affected,
        "n_rows": src.num_rows,
        "nbytes": src.nbytes,
    }
    return src, keys_payload, meta


def _tokens_as_binary(tok: pa.ListArray | pa.ChunkedArray) -> pa.LargeBinaryArray:
    """Each row's token array as ONE binary scalar (the raw little-endian
    int32 buffer) — the byte-exact row signature ``dedup_rows`` ships
    through its group shuffle instead of the list column itself (a flat
    binary column moves/sorts cheaper than list<int32>, and Ray's polars
    sort path chokes on parameterized list dtypes)."""
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    offsets = np.asarray(tok.offsets).astype(np.int64)
    lo, hi = int(offsets[0]), int(offsets[-1])
    vals = np.ascontiguousarray(np.asarray(tok.values)[lo:hi].astype(np.int32, copy=False))
    byte_offs = (offsets - lo) * 4  # int64 offsets: large_binary is overflow-safe
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(tok),
        [None, pa.py_buffer(byte_offs.tobytes()), pa.py_buffer(vals.tobytes())],
    )


def _dedup_group_losers(g: pa.Table) -> pa.Table:
    """One duplicate-fingerprint group of ``dedup_rows``: keep the min key
    per DISTINCT token content, emit every other key as a loser.  The
    byte-level comparison is what makes dedup_rows EXACT — two rows that
    collide on the 64-bit fold but differ in tokens both survive (and each
    content class still dedups within itself).  Groups are dup-proportional
    and tiny (the clone families), so the per-row Python dict is off the
    hot path by construction."""
    keys = g["key"].to_pylist()
    vals = g["tokens_bytes"].to_pylist()
    best: dict[bytes, str] = {}
    for k, v in zip(keys, vals):
        if v not in best or k < best[v]:
            best[v] = k
    losers = [k for k, v in zip(keys, vals) if best[v] != k]
    return pa.table({"key": pa.array(losers, type=pa.string())})


class Table:
    def __init__(
        self,
        root: str,
        schema: pa.Schema = TOKENS_SCHEMA,
        partition_col: str = "source",
        key_col: str = "doc_id",
        constraints: list[dict] | None = None,
        column_mapping: dict[str, str] | None = None,
        retired_physical: list[str] | None = None,
        stats_cols: Sequence[str] | None = None,
    ):
        self.root = Path(root)
        # ``schema`` is the LOGICAL schema (what users see on scan and
        # provide on append/merge).  ``column_mapping`` is the Delta
        # column-mapping (name mode) analog: logical name -> physical
        # parquet column name, identity entries omitted.  Physical names
        # never change once written, so rename/drop are metadata-only
        # commits — no file rewrite (Delta column-mapping semantics;
        # reference registry compatibility=BACKWARD admits field removal
        # on the read path, infra/terraform/modules/glue/main.tf:38-66).
        self.schema = schema
        self.partition_col = partition_col
        # partition-spec HISTORY (Iceberg partition evolution): index i is
        # the partition column files of spec i were written under; the
        # last entry is the current spec (== self.partition_col).
        self.partition_specs: list[str] = [partition_col]
        self.key_col = key_col
        self.constraints = list(constraints or [])
        self.column_mapping = dict(column_mapping or {})
        # physical names of DROPPED columns: still present in old files, so
        # a later re-add of the same logical name must take a fresh
        # physical name or stale bytes would resurface through null-fill
        self.retired_physical = list(retired_physical or [])
        # LOGICAL column names to keep generic per-file [min, max] stats
        # for (Delta dataSkippingNumIndexedCols analog) — what
        # scan(where=) prunes arbitrary-column predicates with; n_tok and
        # the key column are always indexed regardless
        self.stats_cols = tuple(stats_cols or ())
        self.log = SnapshotLog(self.root)

    # ---- column mapping (rename / drop without rewrite) -----------------
    @property
    def physical_schema(self) -> pa.Schema:
        """The logical schema with physical parquet names (identical when
        no rename has ever happened — the common case, zero overhead)."""
        if not self.column_mapping:
            return self.schema
        return pa.schema(
            [
                pa.field(self.column_mapping.get(f.name, f.name), f.type)
                for f in self.schema
            ]
        )

    def _physical_names(self) -> list[str] | None:
        """Positional physical names for a logically-conformed batch, or
        None when the mapping is identity (writers skip the rename)."""
        if not self.column_mapping:
            return None
        return [self.column_mapping.get(f.name, f.name) for f in self.schema]

    def _physical_stats_cols(self) -> tuple[str, ...]:
        """stats_cols translated to physical parquet names (what writers
        and file pruning key ``col_stats`` by)."""
        return tuple(
            self.column_mapping.get(c, c) for c in self.stats_cols
        )

    def _guard_stale_names(self, schema_names) -> None:
        """Incoming write data naming a RENAMED-AWAY column by its old
        (physical) name would be silently dropped as an extra while the
        new logical column null-fills — the one conform outcome that is
        always a user error after rename_column.  Reject it loudly."""
        if not self.column_mapping:
            return
        stale = {
            phys: logical
            for logical, phys in self.column_mapping.items()
            if phys not in self.schema.names
        }
        hit = [n for n in schema_names if n in stale]
        if hit:
            raise ValueError(
                "write data uses pre-rename column name(s) "
                + ", ".join(f"{n!r} (now {stale[n]!r})" for n in sorted(hit))
                + " — use the current logical names"
            )

    def _physical_constraints(self) -> list[dict]:
        """Constraint specs with column refs translated to physical names
        (for rewrite actors, which operate on raw physical batches)."""
        if not self.column_mapping:
            return self.constraints
        out = []
        for c in self.constraints:
            if c.get("kind") == "predicate":
                out.append(
                    {
                        **c,
                        "conds": [
                            {
                                **p,
                                "column": self.column_mapping.get(
                                    p["column"], p["column"]
                                ),
                            }
                            for p in c["conds"]
                        ],
                    }
                )
            elif c.get("column"):
                out.append(
                    {**c, "column": self.column_mapping.get(c["column"], c["column"])}
                )
            else:
                out.append(c)
        return out

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, root: str, **kwargs) -> "Table":
        t = cls(root, **kwargs)
        if t.constraints:
            from realtime_clickstream_lakehouse_ray.functions.constraints import (
                validate_spec,
            )

            t.constraints = [validate_spec(c) for c in t.constraints]
        t.log.log_dir.mkdir(parents=True, exist_ok=True)
        meta = {
            "schema": t.schema.serialize().to_pybytes().hex(),
            "partition_col": t.partition_col,
            "key_col": t.key_col,
            "constraints": t.constraints,
        }
        if t.column_mapping:
            meta["column_mapping"] = t.column_mapping
        if t.retired_physical:
            meta["retired_physical"] = t.retired_physical
        if t.stats_cols:
            meta["stats_cols"] = list(t.stats_cols)
        if len(t.partition_specs) > 1:
            meta["partition_specs"] = t.partition_specs
        meta_path = t.root / "_table.json"
        if not meta_path.exists():
            meta_path.write_text(json.dumps(meta))
        return t

    @classmethod
    def load(cls, root: str) -> "Table":
        meta = json.loads((Path(root) / "_table.json").read_text())
        schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(meta["schema"])))
        t = cls(
            root,
            schema=schema,
            partition_col=meta["partition_col"],
            key_col=meta["key_col"],
            constraints=meta.get("constraints"),
            column_mapping=meta.get("column_mapping"),
            retired_physical=meta.get("retired_physical"),
            stats_cols=meta.get("stats_cols"),
        )
        specs = meta.get("partition_specs")
        if specs:
            t.partition_specs = list(specs)
            t.partition_col = t.partition_specs[-1]
        return t

    def _persist_schema_meta(self) -> None:
        """Persist schema + column mapping atomically to ``_table.json``."""
        from realtime_clickstream_lakehouse_ray.state.log import atomic_replace

        meta_path = self.root / "_table.json"
        meta = json.loads(meta_path.read_text())
        meta["schema"] = self.schema.serialize().to_pybytes().hex()
        meta["constraints"] = self.constraints
        if self.column_mapping:
            meta["column_mapping"] = self.column_mapping
        else:
            meta.pop("column_mapping", None)
        if self.retired_physical:
            meta["retired_physical"] = self.retired_physical
        else:
            meta.pop("retired_physical", None)
        if self.stats_cols:
            meta["stats_cols"] = list(self.stats_cols)
        else:
            meta.pop("stats_cols", None)
        if len(self.partition_specs) > 1:
            meta["partition_specs"] = self.partition_specs
            meta["partition_col"] = self.partition_col
        atomic_replace(meta_path, json.dumps(meta))

    def _guard_identity_column(self, name: str, action: str) -> None:
        if name == self.key_col:
            raise ValueError(
                f"cannot {action} the key column {name!r}: deletion-vector "
                "sidecars, merge file-skipping stats and Bloom filters are "
                "keyed on its physical identity"
            )
        if name in self.partition_specs:
            raise ValueError(
                f"cannot {action} partition(-spec) column {name!r}: the "
                "hive directory layout and partition pruning are keyed on it"
            )
        for c in self.constraints:
            refs = {c["column"]} if c.get("column") else set()
            if c.get("kind") == "token_len":
                refs = {"tokens", "n_tok"}
            elif c.get("kind") == "predicate":
                refs = {p["column"] for p in c.get("conds", [])}
            if name in refs:
                raise ValueError(
                    f"cannot {action} {name!r}: referenced by constraint "
                    f"{c.get('name')!r} — drop_constraint() first"
                )

    def rename_column(self, old: str, new: str) -> None:
        """Rename a column WITHOUT rewriting any file (Delta column-mapping
        name mode): the physical parquet name is frozen at first write;
        only the logical-name -> physical-name mapping changes.  Scans and
        future writes translate at the edges (``_read_entries`` /
        writer-stage rename), so old and new files read identically."""
        if old not in self.schema.names:
            raise ValueError(f"unknown column {old!r}")
        if new in self.schema.names:
            raise ValueError(f"column {new!r} already exists")
        self._guard_identity_column(old, "rename")
        phys = self.column_mapping.pop(old, old)
        if phys != new:
            self.column_mapping[new] = phys
        idx = self.schema.get_field_index(old)
        f = self.schema.field(idx)
        self.schema = self.schema.set(idx, pa.field(new, f.type, f.nullable))
        if old in self.stats_cols:  # stats_cols are logical names
            self.stats_cols = tuple(
                new if c == old else c for c in self.stats_cols
            )
        self._persist_schema_meta()

    def drop_column(self, name: str) -> None:
        """Drop a column WITHOUT rewriting any file: the read path projects
        by the logical schema so the physical bytes simply stop being
        scanned; the next compact/zorder rewrite of a file sheds them
        physically.  The physical name is retired so a future add of the
        same logical name takes a fresh physical name (stale bytes in old
        files must never resurface)."""
        if name not in self.schema.names:
            raise ValueError(f"unknown column {name!r}")
        self._guard_identity_column(name, "drop")
        phys = self.column_mapping.pop(name, name)
        self.retired_physical.append(phys)
        self.stats_cols = tuple(c for c in self.stats_cols if c != name)
        self.schema = pa.schema(
            [f for f in self.schema if f.name != name]
        )
        self._persist_schema_meta()

    def evolve_partitioning(self, new_col: str) -> None:
        """Partition evolution (Iceberg spec evolution): FUTURE writes
        partition by ``new_col``; existing files keep their old hive layout
        untouched (no rewrite).  Every manifest entry records the spec id
        it was written under, so the planner prunes current-spec files by
        partition VALUE as before, keeps old-spec files in the plan, and
        row-filters them on the new column — and DML partition predicates
        turn into row-level conditions for old-spec files.  A full
        ``compact()`` or ``zorder()`` migrates old-spec files into the new
        layout (their bins split per new-partition value), so the table
        converges to the new spec through normal maintenance.

        ``new_col`` must be an existing, non-nested column; renaming a
        column that is (or ever was) a partition spec stays rejected."""
        if new_col == self.partition_col:
            raise ValueError(f"table is already partitioned by {new_col!r}")
        if new_col not in self.schema.names:
            raise ValueError(f"unknown column {new_col!r}")
        if new_col == self.key_col:
            raise ValueError("partitioning by the key column is degenerate")
        t = self.schema.field(new_col).type
        if pa.types.is_nested(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
            raise ValueError(f"cannot partition by non-scalar column {new_col!r}")
        self.partition_specs.append(new_col)
        self.partition_col = new_col
        self._persist_schema_meta()

    @property
    def current_spec(self) -> int:
        return len(self.partition_specs) - 1

    # ---- CHECK constraints ----------------------------------------------
    def _persist_constraints(self) -> None:
        from realtime_clickstream_lakehouse_ray.state.log import atomic_replace

        meta_path = self.root / "_table.json"
        meta = json.loads(meta_path.read_text())
        meta["constraints"] = self.constraints
        atomic_replace(meta_path, json.dumps(meta))

    def add_constraint(self, spec: dict, verify: bool = True) -> None:
        """Add a CHECK constraint (functions/constraints.py kinds).  With
        ``verify=True`` (Delta's ADD CONSTRAINT semantics) the CURRENT
        visible rows are validated distributed first — the constraint is
        only persisted if no committed row violates it."""
        from realtime_clickstream_lakehouse_ray.functions.constraints import (
            ConstraintViolation,
            check_batch,
            validate_spec,
        )

        spec = validate_spec(spec)
        if any(c["name"] == spec["name"] for c in self.constraints):
            raise ValueError(f"constraint {spec['name']!r} already exists")
        # constraint specs reference LOGICAL column names (they run on scan
        # output and on logically-named write data); a spec naming a column
        # that does not exist logically would KeyError deep in a rewrite
        refs = (
            {"tokens", "n_tok"} if spec["kind"] == "token_len"
            else {spec["column"]} if spec.get("column") else set()
        )
        missing = refs - set(self.schema.names)
        if missing:
            raise ValueError(
                f"constraint references missing column(s) {sorted(missing)} "
                "(renamed or dropped? constraints bind to logical names)"
            )
        if verify and self.version() > 0:
            key_col = self.key_col

            def _check(t: pa.Table) -> pa.Table:
                return check_batch(t, [spec], key_col=key_col)

            try:
                self.scan().map_batches(
                    _check, batch_format="pyarrow", zero_copy_batch=True
                ).count()  # raises ConstraintViolation on any violating row
            except Exception as e:  # unwrap Ray's task-error envelope
                import re as _re

                m = _re.search(r"CHECK constraint [^\n]*", str(e))
                if m:
                    raise ConstraintViolation(m.group(0)) from None
                raise
        self.constraints.append(spec)
        self._persist_constraints()

    def drop_constraint(self, name: str) -> None:
        before = len(self.constraints)
        self.constraints = [c for c in self.constraints if c["name"] != name]
        if len(self.constraints) == before:
            raise KeyError(f"no constraint named {name!r}")
        self._persist_constraints()

    def _constraint_stage(self, data):
        """Wrap incoming write data with the vectorized CHECK pass."""
        if not self.constraints:
            return data
        from realtime_clickstream_lakehouse_ray.functions.constraints import (
            check_batch,
        )

        specs = list(self.constraints)
        key_col = self.key_col
        if isinstance(data, pa.Table):
            return check_batch(data, specs, key_col=key_col)

        def _check(t: pa.Table) -> pa.Table:
            return check_batch(t, specs, key_col=key_col)

        return data.map_batches(_check, batch_format="pyarrow", zero_copy_batch=True)

    # ---- read side ----------------------------------------------------
    def version(self) -> int:
        return self.log.latest_version()

    def files(self, version: int | None = None) -> list[FileEntry]:
        return self.log.files(version)

    def history(self) -> list[dict[str, Any]]:
        return [
            {
                k: self.log.read_version(v).get(k)
                for k in ("version", "parent", "operation", "job_id", "base", "timestamp")
            }
            for v in self.log.versions()
        ]

    def stats(self, version: int | None = None) -> dict[str, Any]:
        files = self.files(version)
        per_part: dict[str, dict[str, int]] = {}
        for f in files:
            d = per_part.setdefault(
                f.partition, {"files": 0, "rows": 0, "bytes": 0, "sum_tok": 0}
            )
            d["files"] += 1
            d["rows"] += f.rows
            d["bytes"] += f.bytes
            d["sum_tok"] += f.sum_tok or 0
        dv_rows = sum(f.dv_rows for f in files if f.dv)
        rows = sum(f.rows for f in files)
        return {
            "version": version if version is not None else self.version(),
            "files": len(files),
            "rows": rows,
            "bytes": sum(f.bytes for f in files),
            "sum_tok": sum(f.sum_tok or 0 for f in files),
            # merge-on-read bookkeeping: dv_rows counts tombstoned KEYS
            # (an upper bound on hidden rows); visible_rows is what a scan
            # returns when keys are unique (the table's merge contract)
            "dv_files": sum(1 for f in files if f.dv),
            "dv_rows": dv_rows,
            "visible_rows": rows - dv_rows,
            "partitions": per_part,
        }

    def metadata_table(self, kind: str, version: int | None = None) -> pa.Table:
        """Queryable metadata relations — the Delta ``DESCRIBE HISTORY`` /
        Iceberg ``.snapshots``/``.files``/``.partitions`` analog, derived
        from the manifest only (no data file is ever read):

        - ``"history"``: one row per snapshot (version, parent, operation,
          job_id, timestamp, n_files, rows, bytes).
        - ``"files"``: the snapshot's file inventory with pruning stats
          (path, partition, rows, bytes, min/max n_tok, min/max key,
          clustering signature, pending-DV flag).
        - ``"partitions"``: per-partition rollup (partition, n_files,
          rows, bytes, sum_tok)."""
        if kind == "history":
            rows = []
            for v in self.log.versions():
                p = self.log.read_version(v)
                fs = self.files(v)
                rows.append(
                    {
                        "version": p.get("version"),
                        "parent": p.get("parent"),
                        "operation": p.get("operation"),
                        "job_id": p.get("job_id"),
                        "timestamp": p.get("timestamp"),
                        "n_files": len(fs),
                        "rows": sum(f.rows for f in fs),
                        "bytes": sum(f.bytes for f in fs),
                    }
                )
            return pa.Table.from_pylist(rows)
        if kind == "files":
            return pa.Table.from_pylist(
                [
                    {
                        "path": f.path,
                        "partition": f.partition,
                        "rows": f.rows,
                        "bytes": f.bytes,
                        "min_n_tok": f.min_n_tok,
                        "max_n_tok": f.max_n_tok,
                        "min_key": f.min_key,
                        "max_key": f.max_key,
                        "clustered": f.clustered,
                        "has_dv": bool(f.dv),
                    }
                    for f in self.files(version)
                ]
            )
        if kind == "partitions":
            per_part = self.stats(version)["partitions"]
            return pa.Table.from_pylist(
                [
                    {
                        "partition": p,
                        "n_files": d["files"],
                        "rows": d["rows"],
                        "bytes": d["bytes"],
                        "sum_tok": d["sum_tok"],
                    }
                    for p, d in sorted(per_part.items())
                ]
            )
        raise ValueError(f"unknown metadata table {kind!r} (history|files|partitions)")

    # ---- per-file key Bloom sidecars -----------------------------------
    def _write_bloom_sidecar(self, version: int, entries: list[FileEntry]) -> None:
        """Persist per-file key Bloom filters for this commit's new files
        as a parquet sidecar (`_blooms/v<N>.parquet`).  Sidecars keep the
        JSON manifest small at 10^12-row scale; a missing sidecar (e.g.
        crash between commit and sidecar write, or files produced by the
        checkpointed rewrite path) only disables skipping — never breaks
        correctness."""
        import os as _os
        import uuid as _uuid

        import pyarrow.parquet as pq

        rows = [(e.path, e.bloom) for e in entries if e.bloom]
        if not rows:
            return
        tbl = pa.table(
            {
                "path": pa.array([r[0] for r in rows], pa.string()),
                "bloom": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        d = self.root / "_blooms"
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".tmp-{_uuid.uuid4().hex}.parquet"
        pq.write_table(tbl, tmp, compression="zstd")
        _os.replace(tmp, d / f"v{version:06d}.parquet")

    def blooms(self, version: int | None = None) -> dict[str, bytes]:
        """path -> Bloom bitset for the live files that have one.  Reads
        both version-level sidecars (driver-collected commits) and per-unit
        sidecars written by the checkpointed rewrite path; entries for
        non-live paths (rewritten files, uncommitted units) are filtered
        out and eventually garbage-collected by ``rewrite_manifests``."""
        import pyarrow.parquet as pq

        d = self.root / "_blooms"
        out: dict[str, bytes] = {}
        if d.is_dir():
            sidecars = sorted(d.glob("v*.parquet")) + sorted(
                d.glob("units/*/unit-*.parquet")
            )
            for f in sidecars:
                t = pq.read_table(f)
                out.update(zip(t["path"].to_pylist(), t["bloom"].to_pylist()))
        live = {f.path for f in self.files(version)}
        return {p: b for p, b in out.items() if p in live}

    def _plan_snapshot_files(
        self,
        version: int | None = None,
        as_of: float | None = None,
        tag: str | None = None,
        partitions: Sequence[str] | None = None,
        min_n_tok: int | None = None,
        max_n_tok: int | None = None,
        where: str | None = None,
    ) -> tuple[list[FileEntry], list[dict], list[str] | None]:
        """The read planner shared by ``scan`` and ``sql``: resolve the
        snapshot (version / timestamp / tag), fold a WHERE string into the
        stats-pruning hints, and prune the snapshot's file list by
        partition value, n_tok range, generic col_stats and key
        range+Bloom.  Returns ``(files, conds, part_row_filter)`` —
        ``conds`` is the parsed conjunction the caller must still apply
        row-level, ``part_row_filter`` the partition values old-layout
        files need row-filtered on (partition evolution)."""
        if sum(x is not None for x in (version, as_of, tag)) > 1:
            raise ValueError("pass at most one of version=, as_of=, tag=")
        if tag is not None:
            version = self.log.resolve_ref(tag)
        elif as_of is not None:
            version = self.log.version_at(as_of)
        conds: list[dict] = []
        _keys = None
        if where is not None:
            # SELECT-side filter pushdown through the same conjunctive
            # grammar as DML: partition/key/n_tok conditions prune FILES
            # from the plan below; the full conjunction then filters rows.
            conds, _keys, partitions, min_n_tok, max_n_tok, _resid = (
                self._plan_where(where, None, partitions, min_n_tok, max_n_tok)
            )
        files = self.files(version)
        part_row_filter: list[str] | None = None
        if partitions is not None:
            parts = set(partitions)
            cur_spec = self.current_spec
            kept, old_spec_files = [], []
            for f in files:
                if (f.spec or 0) == cur_spec:
                    if f.partition in parts:
                        kept.append(f)
                else:
                    # pre-evolution layout: its f.partition is a value of
                    # an OLD spec column — cannot prune by value; keep the
                    # file and row-filter on the current partition column
                    old_spec_files.append(f)
            files = kept + old_spec_files
            if old_spec_files:
                part_row_filter = sorted(parts)
        if min_n_tok is not None:
            files = [f for f in files if f.max_n_tok is None or f.max_n_tok >= min_n_tok]
        if max_n_tok is not None:
            files = [f for f in files if f.min_n_tok is None or f.min_n_tok <= max_n_tok]
        if conds:
            files = self._prune_by_col_stats(files, conds)
        if conds and _keys is not None:
            # key-equality conditions: min/max-key + Bloom file skipping,
            # the same pruning MERGE uses
            from realtime_clickstream_lakehouse_ray.functions.bloom import (
                bloom_any_match,
            )
            from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

            karr = sorted(_keys)
            blooms = self.blooms(version)
            kept = []
            for f in files:
                if f.min_key is not None and f.max_key is not None:
                    inside = [k for k in karr if f.min_key <= k <= f.max_key]
                    if not inside:
                        continue
                    b = blooms.get(f.path)
                    if b is not None and not bloom_any_match(
                        b, hash64(pa.array(inside, pa.string()))
                    ):
                        continue
                kept.append(f)
            files = kept
        return files, conds, part_row_filter

    def scan(
        self,
        version: int | None = None,
        columns: Sequence[str] | None = None,
        partitions: Sequence[str] | None = None,
        min_n_tok: int | None = None,
        max_n_tok: int | None = None,
        as_of: float | None = None,
        tag: str | None = None,
        apply_dvs: bool = True,
        where: str | None = None,
        **read_kwargs: Any,
    ) -> ray.data.Dataset:
        """Snapshot-pinned scan: plan ``read_parquet`` over exactly the files
        of ``version``; prune files by partition value and n_tok stats
        before any data is read (the engine's answer to the reference's
        ``parquet.filterPushdown`` at glue_stream.py:295-301).

        ``as_of`` is timestamp time travel (Delta ``timestampAsOf``,
        reference README.md:176): resolve the latest commit at or before
        the given UNIX timestamp.  ``tag`` reads a named-ref snapshot (see
        ``Table.tag``); ``version`` / ``as_of`` / ``tag`` are mutually
        exclusive.

        ``apply_dvs``: filter out keys tombstoned by merge-on-read DELETE
        (deletion-vector sidecars).  The union of the scanned files' DVs is
        broadcast once (``ray.put``) and each read task drops tombstoned
        keys vectorized — DV volume is bounded by deletes since the last
        rewrite touching those files (compact/zorder/merge/
        materialize_deletes all fold DVs in and drop them)."""
        files, conds, part_row_filter = self._plan_snapshot_files(
            version=version,
            as_of=as_of,
            tag=tag,
            partitions=partitions,
            min_n_tok=min_n_tok,
            max_n_tok=max_n_tok,
            where=where,
        )
        if conds:
            # push the pushable conditions into the Parquet fragment
            # scanner so ROW-GROUP statistics prune inside files too
            # (temporal columns skipped: their literals are strings and the
            # expression layer has no cast context; the row filter below
            # stays the correctness authority either way)
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                conds_to_dataset_filter,
            )

            pushable = [
                c
                for c in conds
                if not (
                    pa.types.is_timestamp(self.schema.field(c["column"]).type)
                    or pa.types.is_date(self.schema.field(c["column"]).type)
                )
            ]
            expr = conds_to_dataset_filter(pushable, self.column_mapping)
            # Ray's parquet fragment SAMPLER projects a single column and
            # binds the filter against that projection, so a filter is only
            # safe on unprojected scans (columns=None); projected scans
            # still get manifest + row-level filtering
            if expr is not None and columns is None:
                read_kwargs.setdefault("filter", expr)
        ds = self._read_entries(
            files, columns=columns, apply_dvs=apply_dvs, **read_kwargs
        )
        if conds:
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                predicate_mask,
            )

            if columns is not None:
                missing = [c["column"] for c in conds if c["column"] not in columns]
                if missing:
                    raise ValueError(
                        f"where references column(s) {sorted(set(missing))} "
                        "not in the columns= projection"
                    )

            def _filter(t: pa.Table) -> pa.Table:
                return t.filter(predicate_mask(t, conds))

            ds = ds.map_batches(
                _filter, batch_format="pyarrow", zero_copy_batch=True
            )
        if part_row_filter is not None:
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                predicate_mask,
            )

            pconds = [
                {
                    "column": self.partition_col,
                    "op": "in",
                    "value": part_row_filter,
                }
            ]
            keep_cols = list(columns) if columns else None
            if keep_cols is not None and self.partition_col not in keep_cols:
                raise ValueError(
                    "partitions= over a mixed-partition-spec snapshot needs "
                    f"the current partition column {self.partition_col!r} in "
                    "the columns= projection (old-layout files are "
                    "row-filtered on it)"
                )

            def _part_filter(t: pa.Table) -> pa.Table:
                return t.filter(predicate_mask(t, pconds))

            ds = ds.map_batches(
                _part_filter, batch_format="pyarrow", zero_copy_batch=True
            )
        return ds

    def sql(
        self,
        query: str,
        name: str = "t",
        version: int | None = None,
        as_of: float | None = None,
        tag: str | None = None,
        where: str | None = None,
        threads: int | None = None,
    ) -> pa.Table:
        """Ad-hoc SQL over a table snapshot — the reference's Athena
        consumer path (README.md:113; docs/architecture.md ``Athena
        -->|Query| S3``).  The snapshot is registered as view ``name``
        (default ``t``) with the LOGICAL schema (column mapping applied,
        deletion vectors filtered, partition-evolution row filters in
        place), and the query executes in an embedded DuckDB directly over
        the manifest-pruned Parquet file list (see pipelines/sqlread.py
        for the planning/execution split).  ``where=`` (engine conjunctive
        grammar) scopes the snapshot with full manifest pruning and is
        re-applied row-level; otherwise the query's own top-level WHERE is
        auto-extracted for pruning when it parses.  ``version`` /
        ``as_of`` / ``tag`` give SQL-over-time-travel."""
        from realtime_clickstream_lakehouse_ray.pipelines.sqlread import (
            table_sql,
        )

        return table_sql(
            self, query, name=name, version=version, as_of=as_of, tag=tag,
            where=where, threads=threads,
        )

    def sql_explain(
        self,
        query: str,
        version: int | None = None,
        as_of: float | None = None,
        tag: str | None = None,
        where: str | None = None,
    ) -> dict:
        """The plan ``sql`` would execute: pruned file list vs snapshot
        total, the pushdown conjunction used, and DV sidecars — the
        observability hook for asserting file pruning through the SQL
        path."""
        from realtime_clickstream_lakehouse_ray.pipelines.sqlread import (
            plan_sql_view,
        )

        return plan_sql_view(
            self, query, version=version, as_of=as_of, tag=tag, where=where
        )

    def _prune_by_col_stats(
        self, files: list[FileEntry], conds: list[dict]
    ) -> list[FileEntry]:
        """Generic-stats file skipping for scan(where=): drop any file whose
        recorded [min, max] for a condition's column PROVES no row can
        match.  Files without stats for a column (older than the stats_cols
        config, or a type without ordering) always survive — pruning is an
        optimization, correctness comes from the row filter."""
        if not any(f.col_stats for f in files):
            return files
        phys = self.column_mapping

        def canon(col: str, v):
            # temporal col_stats are stored as str(datetime) (ISO,
            # order-preserving — writer.file_stats); a valid but
            # NON-canonical literal ('2023-09-15 16:00' vs stored
            # '2023-09-15 16:00:00') sorts differently and would wrongly
            # prune files with matching rows, so cast-roundtrip the literal
            # through the column type into the same canonical string form
            # the stats use before any lexicographic comparison
            if not isinstance(v, str):
                return v
            try:
                t = self.schema.field(col).type
            except KeyError:
                return v
            if pa.types.is_timestamp(t) or pa.types.is_date(t):
                try:
                    return str(pa.scalar(v).cast(t).as_py())
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    return v
            return v

        def provably_empty(f: FileEntry) -> bool:
            cs = f.col_stats or {}
            for c in conds:
                rng = cs.get(phys.get(c["column"], c["column"]))
                if not rng:
                    continue
                lo, hi = rng
                op, v = c["op"], c["value"]
                v = canon(c["column"], v)
                vals = (
                    [canon(c["column"], x) for x in v] if op == "in" else [v]
                )
                if op not in ("=", "in", "<", "<=", ">", ">="):
                    continue
                # only compare like-kinded values (numbers with numbers,
                # strings with strings) — a kind mismatch cannot prune
                if not all(
                    isinstance(x, (int, float)) == isinstance(lo, (int, float))
                    and isinstance(x, str) == isinstance(lo, str)
                    for x in vals
                ):
                    continue
                if op in ("=", "in"):
                    if all(x < lo or x > hi for x in vals):
                        return True
                elif op == "<" and lo >= v:
                    return True
                elif op == "<=" and lo > v:
                    return True
                elif op == ">" and hi <= v:
                    return True
                elif op == ">=" and hi < v:
                    return True
            return False

        return [f for f in files if not provably_empty(f)]

    def _read_entries(
        self,
        files: list[FileEntry],
        columns: Sequence[str] | None = None,
        apply_dvs: bool = True,
        **read_kwargs: Any,
    ) -> ray.data.Dataset:
        """The scan's read plan over an explicit file-entry subset (shared
        by snapshot scans and the incremental-maintenance paths, so DV
        filtering and schema null-fill behave identically everywhere)."""
        if not files:
            empty = self.schema.empty_table()
            if columns:
                empty = empty.select(list(columns))
            return ray.data.from_arrow(empty)
        paths = [str(self.root / f.path) for f in files]
        # the table schema is passed explicitly so files written BEFORE a
        # schema evolution null-fill the added columns (Arrow dataset
        # behavior; reference mergeSchema=true at the sink,
        # glue_stream.py:345); with a column projection the schema must be
        # projected to the same subset or the reader rejects the mismatch
        dv_paths = (
            tuple(sorted({f.dv for f in files if f.dv})) if apply_dvs else ()
        )
        read_cols = list(columns) if columns else None
        drop_key_after = False
        if dv_paths and read_cols is not None and self.key_col not in read_cols:
            read_cols = read_cols + [self.key_col]  # needed for the DV filter
            drop_key_after = True
        # column-mapping: files carry PHYSICAL names; read with the physical
        # schema, then rename to logical right after the read so everything
        # downstream (DV filter, user pipelines, rewrites) sees one logical
        # namespace.  Identity mapping (the common case) skips all of this.
        phys_of = self.column_mapping
        if read_cols is None:
            read_kwargs.setdefault("schema", self.physical_schema)
            ds = ray.data.read_parquet(paths, **read_kwargs)
        elif all(c in self.schema.names for c in read_cols):
            # Project via an explicit schema with NO columns= argument: Ray's
            # parquet datasource decides column presence from the FIRST
            # fragment's physical schema only, which silently drops (or
            # schema-mismatches) a column added by schema evolution when the
            # snapshot mixes pre- and post-evolution files.  The Arrow
            # scanner projects AND null-fills by schema alone, uniformly per
            # fragment, and still prunes unrequested columns at the read.
            read_kwargs.setdefault(
                "schema",
                pa.schema(
                    [
                        pa.field(
                            phys_of.get(c, c),
                            self.schema.field(c).type,
                            self.schema.field(c).nullable,
                        )
                        for c in read_cols
                    ]
                ),
            )
            # files physically carry every column (the hive dirs are layout,
            # not the column's only home), so path-partition parsing is
            # unnecessary — and with no columns= argument Ray would re-add
            # the partition column the schema projection just pruned
            read_kwargs.setdefault("partitioning", None)
            ds = ray.data.read_parquet(paths, **read_kwargs)
        else:
            ds = ray.data.read_parquet(
                paths,
                columns=[phys_of.get(c, c) for c in read_cols],
                **read_kwargs,
            )
        if phys_of:
            # positional physical->logical rename right after the read —
            # metadata-only per block (no data copy)
            log_names = (
                [f.name for f in self.schema]
                if read_cols is None
                else list(read_cols)
            )

            def _to_logical(t: pa.Table) -> pa.Table:
                return t.rename_columns(log_names)

            ds = ds.map_batches(
                _to_logical, batch_format="pyarrow", zero_copy_batch=True
            )
        if dv_paths:
            ref = ray.put((str(self.root), dv_paths, self.key_col))
            key_col = self.key_col
            keep_cols = list(columns) if columns else None

            def drop_tombstones(t: pa.Table) -> pa.Table:
                from realtime_clickstream_lakehouse_ray.functions.broadcast import (
                    get_broadcast,
                )

                dead = get_broadcast(ref, _load_dv_keys)
                t = t.filter(pc.invert(pc.is_in(t[key_col], value_set=dead)))
                return t.select(keep_cols) if drop_key_after else t

            ds = ds.map_batches(
                drop_tombstones, batch_format="pyarrow", zero_copy_batch=True
            )
        return ds

    # ---- write side ----------------------------------------------------
    def _collect_stats(self, stats_ds: ray.data.Dataset) -> list[FileEntry]:
        rows = stats_ds.take_all()  # tiny: one row per written file
        return [FileEntry(**{k: r[k] for k in (
            "path", "partition", "rows", "bytes",
            "min_n_tok", "max_n_tok", "min_key", "max_key", "sum_tok", "bloom",
        )}, col_stats=(
            json.loads(r["col_stats"]) if r.get("col_stats") else None
        ), spec=self.current_spec) for r in rows]

    def _start_op(self) -> None:
        """Mark the start of a public op; the next commit computes the op's
        wall-clock duration from this (the observability surface a user
        alerts on — reference parity: CloudWatch job metrics, README
        monitoring section)."""
        import time as _time

        self._op_t0 = _time.perf_counter()

    def _op_metrics(self, adds: list[dict]) -> dict[str, Any]:
        import time as _time

        t0 = self.__dict__.pop("_op_t0", None)
        m: dict[str, Any] = {
            "rows_written": sum(a.get("rows") or 0 for a in adds),
            "bytes_written": sum(a.get("bytes") or 0 for a in adds),
        }
        if t0 is not None:
            m["duration_sec"] = round(_time.perf_counter() - t0, 3)
            if m["duration_sec"] > 0:
                m["rows_per_sec"] = round(m["rows_written"] / m["duration_sec"], 1)
        phases = self.__dict__.pop("_op_phases", None)
        if phases:
            m["phases"] = {k: round(v, 3) for k, v in phases.items()}
        return m

    def _phase(self, name: str, t0: float) -> float:
        """Record a named phase duration (seconds since ``t0``) into the
        next commit's metrics; returns a fresh timestamp for chaining."""
        import time as _time

        now = _time.perf_counter()
        self.__dict__.setdefault("_op_phases", {})[name] = now - t0
        return now

    def metrics(self) -> list[dict[str, Any]]:
        """Per-commit op metrics from the log: operation, wall-clock
        duration, files/rows/bytes written and removed, throughput.  This
        is the queryable per-op timing surface the reference delegates to
        CloudWatch dashboards (README monitoring claims); alerts hang off
        e.g. ``metrics()[-1]["duration_sec"]`` or a rows_per_sec floor."""
        out = []
        # path -> bytes, accumulated from add actions seen so far, so each
        # version's removes resolve to the bytes they freed (no data I/O)
        sizes: dict[str, int] = {}
        for v in self.log.versions():
            p = self.log.read_version(v)
            adds = [a for a in p.get("actions", []) if a.get("op") == "add"]
            rems = [a for a in p.get("actions", []) if a.get("op") == "remove"]
            bytes_removed = sum(sizes.get(a.get("path"), 0) for a in rems)
            for a in adds:
                sizes[a["path"]] = a.get("bytes") or 0
            row = {
                "version": v,
                "operation": p.get("operation"),
                "timestamp": p.get("timestamp"),
                "files_added": len(adds),
                "files_removed": len(rems),
                "bytes_removed": bytes_removed,
            }
            row.update(p.get("metrics") or {})
            row.setdefault("rows_written", sum(a.get("rows") or 0 for a in adds))
            row.setdefault("bytes_written", sum(a.get("bytes") or 0 for a in adds))
            if bytes_removed:
                # rewrite ops: how many bytes were written per byte retired
                row["write_amplification"] = round(
                    row["bytes_written"] / bytes_removed, 3
                )
            out.append(row)
        return out

    def _commit_with_rebase(
        self,
        adds: list[dict],
        removes: list[str],
        operation: str,
        parent: int,
        job_id: str | None,
        extra: dict | None = None,
    ) -> int:
        """Optimistic commit; on conflict, rebase if the files we remove are
        all still live in the new latest version (append-only interleaving),
        else fail — the Ray-native form of Delta's conflict detection."""
        extra = dict(extra or {})
        extra.setdefault("metrics", self._op_metrics(adds))
        actions = list(adds) + [{"op": "remove", "path": p} for p in removes]
        try:
            return self.log.commit(actions, operation, parent=parent, job_id=job_id, extra=extra)
        except CommitConflict:
            latest = self.log.latest_version()
            live = {f.path for f in self.files(latest)}
            if all(p in live for p in removes):
                return self.log.commit(actions, operation, parent=latest, job_id=job_id, extra=extra)
            raise

    def evolve_schema(self, new_fields: Iterable[pa.Field]) -> None:
        """Schema evolution, BACKWARD-compatible only (the reference's Glue
        registry sets compatibility=BACKWARD, glue/main.tf:38-66): ADD
        nullable columns, or WIDEN an existing column's type (int upcasts
        and float32→float64, including list element types — the Iceberg
        type-promotion set).  Renames and narrowing/incompatible changes
        are rejected.  Old files are never rewritten — the Arrow dataset
        scanner null-fills added columns and upcasts narrow fragments to
        the widened schema at read time (verified by pytest over a mixed
        pre/post-evolution snapshot)."""
        for f in new_fields:
            if f.name in self.schema.names:
                existing = self.schema.field(f.name)
                if existing.type == f.type:
                    continue
                if _type_widens(existing.type, f.type):
                    idx = self.schema.get_field_index(f.name)
                    self.schema = self.schema.set(
                        idx, pa.field(f.name, f.type)
                    )
                    continue
                raise ValueError(
                    f"incompatible evolution for {f.name!r}: "
                    f"{existing.type} -> {f.type}"
                )
            # physical-name allocation: if this logical name was ever used
            # as a physical name (a renamed-away or dropped column), the new
            # column must take a FRESH physical name — otherwise old files'
            # stale bytes would read back into the new column
            used = set(self.column_mapping.values()) | set(self.retired_physical)
            used |= {
                self.column_mapping.get(n, n)
                for n in self.schema.names
            }
            if f.name in used:
                k = 1
                while f"{f.name}__p{k}" in used:
                    k += 1
                self.column_mapping[f.name] = f"{f.name}__p{k}"
            self.schema = self.schema.append(pa.field(f.name, f.type))
        self._persist_schema_meta()

    def append(
        self,
        data: pa.Table | ray.data.Dataset,
        rows_per_file: int | None = None,
        concurrency: int | tuple[int, int] | None = None,
        extra: dict | None = None,
        merge_schema: bool = False,
        validate_tombstones: bool = True,
    ) -> int:
        """Append rows as new files + a new snapshot (reference K2 semantics:
        append-only, schema conformed, partitioned by the partition column).
        ``extra`` rides on the commit payload (e.g. ingest bookmarks);
        ``merge_schema=True`` widens the table schema with the data's new
        columns first (the sink's mergeSchema option, glue_stream.py:345).

        ``validate_tombstones``: when the snapshot carries merge-on-read
        deletion vectors, an appended row whose key is tombstoned would be
        hidden by the scan-side DV filter — re-introducing a deleted key
        must go through ``merge()``.  This guard (a vectorized ``is_in``
        per batch against the broadcast DV union, active ONLY while DVs
        exist) fails the append loudly instead of losing the rows."""
        self._start_op()
        dv_paths = tuple(sorted({f.dv for f in self.files() if f.dv}))
        if validate_tombstones and dv_paths:
            ref = ray.put((str(self.root), dv_paths, self.key_col))
            key_col = self.key_col

            def _guard(t: pa.Table) -> pa.Table:
                from realtime_clickstream_lakehouse_ray.functions.broadcast import (
                    get_broadcast,
                )

                dead = get_broadcast(ref, _load_dv_keys)
                hit = pc.sum(pc.is_in(t[key_col], value_set=dead)).as_py() or 0
                if hit:
                    raise ValueError(
                        f"append contains {hit} key(s) tombstoned by a "
                        "merge-on-read DELETE; upsert them via merge() or "
                        "materialize_deletes() first"
                    )
                return t

            if isinstance(data, pa.Table):
                if key_col in data.column_names:
                    _guard(data.select([key_col]))
            else:
                data = data.map_batches(
                    _guard, batch_format="pyarrow", zero_copy_batch=True
                )
        if merge_schema:
            incoming = (
                data.schema
                if isinstance(data, pa.Table)
                else data.schema().base_schema
            )
            new = [f for f in incoming if f.name not in self.schema.names]
            if new:
                self.evolve_schema(new)
        incoming_names = (
            data.column_names
            if isinstance(data, pa.Table)
            else [f.name for f in data.schema().base_schema]
        )
        self._guard_stale_names(incoming_names)
        if isinstance(data, pa.Table):
            data = ray.data.from_arrow(
                self._constraint_stage(conform_table(data, self.schema))
            )
        else:
            data = self._constraint_stage(data)
        stats_ds = data.map_batches(
            make_file_writer(
                str(self.root),
                self.schema,
                self.partition_col,
                physical_names=self._physical_names(),
                stats_cols=self._physical_stats_cols(),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=rows_per_file,
        )
        entries = self._collect_stats(stats_ds)
        # append-only commits remove nothing, so losing the optimistic race
        # is ALWAYS rebase-safe: retry against the new latest (Delta's
        # append conflict resolution; lets concurrent writer processes
        # interleave without coordination)
        actions = [e.to_action() for e in entries]
        extra = dict(extra or {})
        extra.setdefault("metrics", self._op_metrics(actions))
        for attempt in range(64):
            try:
                version = self.log.commit(actions, "append", job_id=None, extra=extra)
                break
            except CommitConflict:
                if attempt == 63:
                    raise
        self._write_bloom_sidecar(version, entries)
        return version

    # ---- compaction -----------------------------------------------------
    def plan_compaction_bins(
        self,
        files: list[FileEntry],
        target_file_bytes: int,
        job_tag: str,
    ) -> list[dict]:
        """Greedy per-partition bin packing over file *stats* only.

        Files already at/above ~90% of target size are left alone; the rest
        are packed in path order into bins of ≤ target bytes.  Bins with a
        single file are dropped (rewriting one small file buys nothing).
        Skew safety: a bin is bounded by ``target_file_bytes`` regardless of
        how hot the partition is, so no unit of work exceeds the target —
        hot partitions just produce more bins (more parallel units).

        CLUSTERING-PRESERVING: files are grouped by (partition, clustering
        signature), never mixing clustered with unclustered inputs; a bin
        of same-signature clustered files is re-keyed and zkey-sorted by
        its rewrite unit and the output KEEPS the signature — OPTIMIZE
        after Z-order tightens file counts without degrading the
        clustering (Delta's OPTIMIZE-preserves-liquid-clustering
        behavior), so ``zorder(incremental=True)`` stays a no-op."""
        cur_spec = self.current_spec
        by_group: dict[tuple[int, str, str | None], list[FileEntry]] = {}
        for f in files:
            # a file carrying a deletion vector is always eligible —
            # compaction is where pending MOR deletes get materialized;
            # an OLD-partition-spec file is always eligible too — compaction
            # is also where partition evolution migrates the layout
            old = (f.spec or 0) != cur_spec
            if f.bytes < target_file_bytes * 0.9 or f.dv or old:
                by_group.setdefault(
                    ((f.spec or 0), f.partition, f.clustered), []
                ).append(f)
        bins: list[dict] = []

        def _keep(spec_id: int, cur: list[FileEntry]) -> bool:
            if spec_id != cur_spec:
                return True  # single old-spec files still migrate
            return len(cur) > 1 or any(f.dv for f in cur)

        def _emit(spec_id: int, part: str, sig: str | None, cur: list[FileEntry]) -> None:
            spec = self._bin_spec(len(bins), part, cur, job_tag)
            if spec_id != cur_spec:
                # migration bin: the rewrite splits its output per CURRENT
                # partition value (rows move to the new hive layout);
                # clustering provenance is not preserved across specs
                spec["split_partition"] = True
            elif sig:
                spec.update(self._cluster_spec(sig, cur))
            bins.append(spec)

        for spec_id, part, sig in sorted(
            by_group, key=lambda k: (k[0], k[1], k[2] or "")
        ):
            # clustered (scatter-output) paths sort in bucket = zkey-range
            # order, so path-order packing keeps each bin range-local
            group = sorted(by_group[(spec_id, part, sig)], key=lambda f: f.path)
            cur: list[FileEntry] = []
            cur_bytes = 0
            for f in group:
                if cur and cur_bytes + f.bytes > target_file_bytes:
                    if _keep(spec_id, cur):
                        _emit(spec_id, part, sig, cur)
                    cur, cur_bytes = [], 0
                cur.append(f)
                cur_bytes += f.bytes
            if _keep(spec_id, cur):
                _emit(spec_id, part, sig, cur)
        return bins

    def _cluster_spec(self, signature: str, files: list[FileEntry]) -> dict:
        """Bin-spec fields a clustering-preserving rewrite needs to re-key
        and sort its rows: curve + dims parsed from the signature, n_tok
        bounds from the bin's own file stats."""
        curve, dims_csv = signature.split(":", 1)
        dims = tuple(d for d in dims_csv.split(",") if d != self.partition_col)
        bounds: dict[str, list[int]] = {}
        if "n_tok" in dims:
            mins = [f.min_n_tok for f in files if f.min_n_tok is not None]
            maxs = [f.max_n_tok for f in files if f.max_n_tok is not None]
            if mins and maxs:
                bounds["n_tok"] = [min(mins), max(maxs)]
        return {
            "signature": signature,
            "curve": curve,
            "zdims": list(dims),
            "bounds": bounds,
        }

    def _bin_spec(self, unit: int, part: str, files: list[FileEntry], tag: str) -> dict:
        # every bin is homogeneous in partition SPEC: a non-migration
        # rewrite of an old-layout file must stay in the OLD layout (its
        # partition value names the old spec's column), so the output path
        # derives from the input files' own spec column and the bin records
        # its spec_id for the add-entry tagging in _run_rewrite_units —
        # mixing claims (current spec id + old partition value) would make
        # scan(partitions=)/scoped compact prune the file by value and
        # silently drop rows
        spec_ids = {f.spec or 0 for f in files}
        if len(spec_ids) > 1:
            raise AssertionError(f"bin mixes partition specs {spec_ids}")
        spec_id = spec_ids.pop() if spec_ids else self.current_spec
        part_col = self.partition_specs[spec_id]
        spec = {
            "unit": unit,
            "partition": part,
            "spec_id": spec_id,
            "files": [f.path for f in files],
            "bytes": int(sum(f.bytes or 0 for f in files)),
            "out": f"{part_col}={part}/{tag}-bin{unit:06d}.parquet",
        }
        dvs = {f.path: f.dv for f in files if f.dv}
        if dvs:  # every rewrite materializes pending MOR deletes
            spec["dvs"] = dvs
        return spec

    def _run_rewrite_units(
        self,
        bins: list[dict],
        job_id: str,
        mode: str = "compact",
        keys_ref=None,
        concurrency: int | tuple[int, int] = (1, 16),
        sequence_col: str | None = None,
    ) -> dict[str, dict]:
        """Execute bin rewrites as an actor-pool Ray Data pipeline and return
        the authoritative per-unit lineage records from the checkpoint."""
        ckpt = JobCheckpoint(self.root, job_id)
        # LPT order: feed the pool biggest bins first so the straggler tail
        # is a small unit, not a big one — cuts makespan by up to max(unit)
        # at every pool size with zero cost (unit ids and outputs unchanged)
        bins = sorted(bins, key=lambda b: -b.get("bytes", 0))
        # one block per unit: from_items' default blocking packs several
        # units into one block = one actor task, so a block of LPT-ordered
        # big units becomes a straggler; per-unit blocks give the pool
        # true dynamic load balancing (work-stealing granularity = 1 unit)
        ds = ray.data.from_items(
            make_spec_items(bins), override_num_blocks=len(bins)
        )
        # FIXED-size pool sized to the unit count: an autoscaling pool
        # starting at one actor serializes short rewrite jobs (measured
        # ~20x on 20-unit jobs)
        ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
        if isinstance(concurrency, tuple):
            concurrency = max(1, min(len(bins), ncpu, concurrency[1]))
        ds.map_batches(
            BinRewriter,
            fn_constructor_kwargs=dict(
                root=str(self.root),
                # rewrite actors read raw PHYSICAL files and re-emit them:
                # physical schema + physically-translated constraint refs
                schema=self.physical_schema,
                job_id=job_id,
                mode=mode,
                keys_ref=keys_ref,
                key_col=self.key_col,
                partition_col=self.partition_col,
                constraints=self._physical_constraints(),
                stats_cols=self._physical_stats_cols(),
                sequence_col=(
                    self.column_mapping.get(sequence_col, sequence_col)
                    if sequence_col
                    else None
                ),
            ),
            batch_format="pyarrow",
            batch_size=1,
            concurrency=concurrency,
        ).count()  # consume; stats flow into the checkpoint manifest
        records = ckpt.list_units()
        if mode != "dv":  # DV units re-emit the ORIGINAL entry (keep spec)
            cur = self.current_spec
            # per-unit OUTPUT spec: a non-migration rewrite of old-layout
            # files stays in the old layout -> tag its adds with the INPUT
            # spec; only bins that actually re-lay rows under the current
            # partition column (compact split_partition migration bins, and
            # partition-changing UPDATEs, which split per current value)
            # take the current spec
            out_spec: dict[str, int] = {}
            for b in bins:
                if b.get("split_partition") or any(
                    r["column"] == self.partition_col
                    for r in b.get("rules", ())
                ):
                    out_spec[str(b["unit"])] = cur
                else:
                    out_spec[str(b["unit"])] = b.get("spec_id", cur)
            for uid, r in records.items():
                s = out_spec.get(uid, cur)
                if s:
                    for a in r.get("adds", []):
                        a.setdefault("spec", s)
        missing = {str(b["unit"]) for b in bins} - set(records)
        if missing:
            raise RuntimeError(f"units did not complete: {sorted(missing)[:10]}")
        return records

    def auto_optimize(
        self,
        small_file_bytes: int = 32 << 20,
        min_small_files: int = 8,
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        concurrency: int | tuple[int, int] = (1, 16),
    ) -> int | None:
        """Trigger-based OPTIMIZE (the Databricks auto-optimize policy):
        compact ONLY partitions holding at least ``min_small_files`` files
        under ``small_file_bytes`` — the decision is pure manifest-stats
        arithmetic (zero data I/O), so an ingest loop can call this after
        every append and pay for a rewrite only when a partition actually
        degraded.  Returns the new version, or None when no partition
        qualifies."""
        counts: dict[str, int] = {}
        for f in self.files():
            if f.bytes < small_file_bytes:
                counts[f.partition] = counts.get(f.partition, 0) + 1
        parts = sorted(p for p, c in counts.items() if c >= min_small_files)
        if not parts:
            return None
        return self.compact(
            target_file_bytes=target_file_bytes,
            partitions=parts,
            concurrency=concurrency,
        )

    def clustering_report(self) -> pa.Table:
        """Z-order/clustering effectiveness from manifest stats ONLY (no
        data read): per partition —

        - ``n_files`` and how many carry the current clustering signature;
        - ``avg_files_per_point`` = Σ file n_tok-range widths / partition
          span: the expected number of files a point query on the stats
          dimension must open (1.0 = perfectly disjoint ranges, ~n_files
          = fully overlapping, i.e. unclustered);
        - ``span`` of n_tok across the partition.

        This is the signal that tells an operator WHEN re-clustering pays
        (the analog of Delta's clustering metrics) — pair it with
        ``zorder(incremental=True)`` which acts only on drifted files."""
        rows = []
        by_part: dict[str, list[FileEntry]] = {}
        for f in self.files():
            by_part.setdefault(f.partition, []).append(f)
        for part in sorted(by_part):
            fs = by_part[part]
            stats = [
                (f.min_n_tok, f.max_n_tok)
                for f in fs
                if f.min_n_tok is not None and f.max_n_tok is not None
            ]
            if stats:
                lo = min(s[0] for s in stats)
                hi = max(s[1] for s in stats)
                # span+1 = number of representable n_tok points; a
                # single-value partition (hi == lo) then correctly reports
                # avg_files_per_point == n_files_with_stats, not n/2
                span = hi - lo
                widths = sum(s[1] - s[0] + 1 for s in stats)
                avg_cover = widths / (span + 1)
            else:
                # stat-less partitions: None (JSON null via the CLI), not
                # NaN — json.dumps would emit a non-standard NaN token
                span, avg_cover = 0, None
            rows.append(
                {
                    "partition": part,
                    "n_files": len(fs),
                    "n_clustered": sum(1 for f in fs if f.clustered),
                    "n_tok_span": int(span),
                    "avg_files_per_point": (
                        round(float(avg_cover), 3) if avg_cover is not None else None
                    ),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("partition", pa.string()),
                    ("n_files", pa.int64()),
                    ("n_clustered", pa.int64()),
                    ("n_tok_span", pa.int64()),
                    ("avg_files_per_point", pa.float64()),
                ]
            ),
        )

    def compact(
        self,
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        job_id: str | None = None,
        concurrency: int | tuple[int, int] = (1, 16),
        partitions: Sequence[str] | None = None,
        where: str | None = None,
    ) -> int | None:
        """Bin-packing small-file compaction (Delta OPTIMIZE equivalent).

        ``partitions`` scopes the job (Delta ``OPTIMIZE ... WHERE`` on the
        partition column): only files in the named partitions are planned
        and rewritten, everything else is untouched — at 100 TB compaction
        runs incrementally on the partitions the last ingest touched, never
        over the whole table.  ``where`` accepts the same scoping as a
        predicate string restricted to partition-column equality/IN
        conditions (``OPTIMIZE ... WHERE source = 'web'``).  A SCOPED
        compact targets current-partition-spec files only; old-layout
        files (partition evolution) migrate on a full, unscoped compact.

        Deterministic job id per parent version -> idempotent + resumable:
        rerunning after a crash skips finished bins (checkpoint manifest)
        and re-commits exactly once.  Returns the new version, or None when
        there is nothing to compact."""
        if where is not None:
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                parse_predicate,
            )

            pset: set[str] | None = None
            for c in parse_predicate(where):
                if c["column"] != self.partition_col or c["op"] not in ("=", "in"):
                    raise ValueError(
                        "compact(where=) supports partition-column "
                        "equality/IN conditions only (got "
                        f"{c['column']} {c['op']})"
                    )
                vs = {str(v) for v in (c["value"] if c["op"] == "in" else [c["value"]])}
                pset = vs if pset is None else (pset & vs)
            parts = set(partitions) if partitions is not None else None
            parts = pset if parts is None else (parts & (pset or set()))
            partitions = sorted(parts) if parts is not None else None
            if partitions == []:
                return None
        self._start_op()
        parent = self.version()
        if job_id is None:
            scope = "" if partitions is None else "-" + ",".join(sorted(partitions))
            job_id = f"compact-v{parent}{scope}"
        done = self.log.find_commit_by_job(job_id)
        if done is not None:
            return done
        # Idempotent rerun: if the CURRENT snapshot is itself the output of
        # a compact with this exact config, a rerun (e.g. after a crash
        # that landed AFTER the commit) converges as a no-op.  Without this
        # a rerun keeps re-packing sub-90%-of-target remainder files into
        # ever-fewer files — productive once, but "resume" must converge to
        # the already-committed state, not keep optimizing.
        cfg = {
            "target_file_bytes": int(target_file_bytes),
            "partitions": sorted(partitions) if partitions is not None else None,
        }
        parent_payload = self.log.read_version(parent) if parent else {}
        if (
            parent_payload.get("operation") == "compact"
            and parent_payload.get("config") == cfg
        ):
            return None
        t = __import__("time").perf_counter()
        files = self.files(parent)
        if partitions is not None:
            wanted = set(partitions)
            cur_spec = self.current_spec
            # scoped compact: current-layout files only (an old-spec file's
            # partition value names a different column; a FULL compact is
            # the migration path)
            files = [
                f
                for f in files
                if (f.spec or 0) == cur_spec and f.partition in wanted
            ]
        bins = self.plan_compaction_bins(files, target_file_bytes, job_id)
        if not bins:
            return None
        t = self._phase("plan", t)
        records = self._run_rewrite_units(bins, job_id, mode="compact", concurrency=concurrency)
        t = self._phase("rewrite_units", t)
        adds = [a for r in records.values() for a in r["adds"]]
        removes = [p for r in records.values() for p in r["removes"]]
        version = self._commit_with_rebase(
            adds, removes, "compact", parent, job_id,
            extra={"lineage": self._lineage_summary(records), "config": cfg},
        )
        JobCheckpoint(self.root, job_id).mark_committed(version)
        return version

    def _lineage_summary(self, records: dict[str, dict]) -> dict[str, Any]:
        per_part: dict[str, dict[str, int]] = {}
        for r in records.values():
            d = per_part.setdefault(
                r["partition"],
                {"units": 0, "input_files": 0, "output_files": 0, "rows": 0},
            )
            d["units"] += 1
            d["input_files"] += len(r.get("inputs", []))
            d["output_files"] += len(r.get("adds", []))
            d["rows"] += r.get("rows", 0)
        return per_part

    def dedup_rows(
        self,
        job_id: str | None = None,
        concurrency: int | tuple[int, int] = (1, 16),
        mode: str = "cow",
    ) -> int | None:
        """Exact in-place row dedup of the TABLE (the exact-dedup operator
        of the training-data family applied to the lakehouse payload):
        rows whose ``tokens`` arrays are byte-identical collapse to the one
        with the smallest key; the rest are DELETEd through the normal
        predicate-delete path (copy-on-write rewrite, or ``mode="mor"``
        deletion-vector tombstones for O(dups) write cost).

        Scale shape: fingerprints are computed per batch (one xor-fold
        over the flat token values per row — no Python loops), reduced by
        a (fingerprint -> min key, count) groupby whose output is
        DISTINCT-fingerprint-sized, and only the DUP-PROPORTIONAL loser
        key list returns to the driver.  Token text never shuffles; the
        delete reuses stats+Bloom file pruning.  Returns the new version,
        or None when the table has no duplicate rows."""
        from ray.data.aggregate import Count, Min

        from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

        def fp_stage(t: pa.Table) -> pa.Table:
            tok = t["tokens"].combine_chunks()
            offsets = np.asarray(tok.offsets).astype(np.int64)
            lo, hi = int(offsets[0]), int(offsets[-1])
            vals = np.asarray(tok.values)[lo:hi].astype(np.int64, copy=False)
            offs = offsets - lo
            lengths = offs[1:] - offs[:-1]
            h = hash64(pa.array(vals)) if len(vals) else np.empty(0, np.uint64)
            # order-sensitive fold: position-salted xor per document
            pos = (
                np.arange(len(vals), dtype=np.uint64)
                - np.repeat(offs[:-1], lengths).astype(np.uint64)
            )
            mixed = h ^ (pos * np.uint64(0x9E3779B97F4A7C15))
            fp = np.zeros(t.num_rows, dtype=np.uint64)
            if len(mixed):
                np.bitwise_xor.at(fp, np.repeat(
                    np.arange(t.num_rows, dtype=np.int64), lengths
                ), mixed)
            fp ^= lengths.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            return pa.table(
                {
                    "fp": pa.array(fp.astype(np.int64)),
                    "key": t[self.key_col],
                }
            )

        grouped = (
            self.scan(columns=[self.key_col, "tokens"])
            .map_batches(fp_stage, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("fp")
            .aggregate(Min("key", alias_name="winner"), Count(alias_name="n"))
        )
        # dup-proportional second pass: only fingerprints with n > 1 need
        # their member keys re-derived (broadcast the small dup-fp set)
        dup_blocks = [
            t.filter(pc.greater(t["n"], 1))
            for t in ray.get(grouped.to_arrow_refs())
            if t.num_rows and "fp" in t.column_names
        ]
        dup_tbl = pa.concat_tables(dup_blocks) if dup_blocks else None
        if dup_tbl is None or dup_tbl.num_rows == 0:
            return None
        dup_fps = np.sort(np.asarray(dup_tbl["fp"]).astype(np.int64))
        ref = ray.put(dup_fps)

        def losers_stage(t: pa.Table) -> pa.Table:
            from realtime_clickstream_lakehouse_ray.functions.broadcast import (
                get_broadcast,
            )

            fp = fp_stage(t)
            d = get_broadcast(ref)
            fps = np.asarray(fp["fp"]).astype(np.int64)
            idx = np.searchsorted(d, fps)
            in_r = idx < len(d)
            hit = np.zeros(len(fps), dtype=bool)
            hit[in_r] = d[idx[in_r]] == fps[in_r]
            # dup-fp members carry their token BYTES into the group check:
            # fingerprint equality alone must never delete a row (a 64-bit
            # collision at trillion-row scale is expected), so the loser
            # verdict is made on byte-identical token content per group
            return fp.append_column(
                "tokens_bytes", _tokens_as_binary(t["tokens"])
            ).filter(pa.array(hit))

        members = self.scan(columns=[self.key_col, "tokens"]).map_batches(
            losers_stage, batch_format="pyarrow", zero_copy_batch=True
        )
        # group the (dup-proportional) members by fingerprint; within each
        # group keep the min key PER DISTINCT TOKEN CONTENT and emit the
        # rest as losers — exact dedup even across fp collisions (rows that
        # merely share a fingerprint but differ in bytes are all kept)
        losers_ds = members.groupby("fp").map_groups(
            _dedup_group_losers, batch_format="pyarrow"
        )
        losers: list[str] = [
            k
            for t in ray.get(losers_ds.to_arrow_refs())
            if t.num_rows and "key" in t.column_names
            for k in t["key"].to_pylist()
        ]
        if not losers:
            return None
        return self.delete(
            keys=sorted(losers),
            job_id=job_id or f"dedup-v{self.version()}",
            concurrency=concurrency,
            mode=mode,
        )

    def materialize_deletes(
        self,
        job_id: str | None = None,
        concurrency: int | tuple[int, int] = (1, 16),
    ) -> int | None:
        """Rewrite exactly the files carrying merge-on-read deletion
        vectors, folding the tombstones in and clearing the DVs (Delta's
        ``REORG TABLE ... APPLY (PURGE)``).  Each file is its own rewrite
        unit (resumable, same actor-pool machinery as compact); untouched
        files are not read.  Returns the new version, or None when the
        snapshot has no DVs."""
        self._start_op()
        parent = self.version()
        job_id = job_id or f"materialize-dv-v{parent}"
        done = self.log.find_commit_by_job(job_id)
        if done is not None:
            return done
        dv_files = [f for f in self.files(parent) if f.dv]
        if not dv_files:
            return None
        bins = [
            self._bin_spec(i, f.partition, [f], job_id)
            for i, f in enumerate(sorted(dv_files, key=lambda f: (f.partition, f.path)))
        ]
        records = self._run_rewrite_units(
            bins, job_id, mode="compact", concurrency=concurrency
        )
        adds = [a for r in records.values() for a in r["adds"]]
        removes = [p for r in records.values() for p in r["removes"]]
        version = self._commit_with_rebase(
            adds, removes, "materialize_deletes", parent, job_id,
            extra={"lineage": self._lineage_summary(records)},
        )
        JobCheckpoint(self.root, job_id).mark_committed(version)
        return version

    # ---- z-order --------------------------------------------------------
    def zorder(
        self,
        dims: tuple[str, str, str] = ("source", "n_tok", "doc_id"),
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        job_id: str | None = None,
        curve: str = "z",  # "z" (Morton) or "hilbert"
        write_concurrency: int | tuple[int, int] | None = None,  # kept for API compat
        incremental: bool = False,
        method: str = "scatter",  # "scatter" (range exchange) or "sort"
        scatter_two_level_threshold: int | None = None,
    ) -> int | None:
        """Z-order clustering: zkey map_batches -> global range-partitioned
        sort -> size-targeted rewrite -> snapshot swap (remove all, add all).

        The sort is the engine's one intentional all-to-all shuffle; the
        partition column's hash occupies interleaved high bits so rows of
        one ``source`` land near each other and the writer's per-partition
        split stays cheap.  Atomic at the commit: an interrupted job leaves
        only orphan files (vacuumable) and resumes from the last committed
        snapshot; per-partition lineage is recorded in the checkpoint
        manifest at completion.

        ``method="scatter"`` (default): the all-to-all is executed as a
        disk-backed range-partition exchange (stages/scatter.py) — sample
        boundaries from a narrow dims-only read, scatter zkey-sorted runs
        into per-bucket Arrow IPC fragments under ``_scratch/<job>/``, then
        sort+write each bucket independently.  Two embarrassingly-parallel
        map phases instead of Ray's object-store sort shuffle (profiled:
        SortMap tasks spent 0.1-0.2 s sorting but 1.9 s wall; scaling
        efficiency 0.40-0.51 vs 0.84 for the shuffle-free compact over the
        same bytes), and the job becomes resumable at bucket granularity.
        ``method="sort"`` keeps the push-based ``Dataset.sort`` shuffle.

        ``incremental=True`` (the liquid-clustering direction): sort ONLY
        files not already clustered under this (curve, dims) signature —
        output files record their clustering provenance in the manifest, so
        re-clustering a 100-TB table after a 1% append shuffles 1% of the
        data, not all of it.  The table then holds multiple sorted runs;
        per-file zkey/stats ranges stay tight, so scan pruning and MERGE
        file-skipping keep their effect.  Returns None when every file is
        already clustered."""
        self._start_op()
        parent = self.version()
        # dims are LOGICAL names; the stock default still names the
        # canonical physical columns, so resolve each default dim that no
        # longer exists logically (renamed via column mapping) to its
        # current logical name — an explicit dims= with a stale name still
        # errors loudly downstream
        if self.column_mapping:
            phys2log = {v: k for k, v in self.column_mapping.items()}
            dims = tuple(
                phys2log.get(d, d) if d not in self.schema.names else d
                for d in dims
            )
        signature = f"{curve}:{','.join(dims)}"
        if job_id is None:
            tag = "zorder" if curve == "z" else f"zorder-{curve}"
            job_id = f"{tag}{'-inc' if incremental else ''}-v{parent}"
        done = self.log.find_commit_by_job(job_id)
        if done is not None:
            return done
        tune_context()  # polars sort path for the range shuffle
        # global bounds for integer dims come free from the file stats, so
        # every dim fills its full 21-bit slot in the interleave
        bounds: dict[str, tuple[int, int]] = {}
        all_files = self.files(parent)
        # Idempotent rerun: if every live file already carries this
        # (curve, dims) clustering signature the snapshot IS the output of
        # this op — a rerun (e.g. after a crash that landed AFTER the
        # commit) converges as a no-op instead of stacking a second
        # identical rewrite.  Applies to both regimes; the incremental
        # regime additionally narrows the input to unclustered files.
        if all_files and all(f.clustered == signature for f in all_files):
            return None
        stat_files = (
            [f for f in all_files if f.clustered != signature]
            if incremental
            else all_files
        )
        if not stat_files:
            return None  # every file already clustered under this signature
        if "n_tok" in dims and stat_files:
            mins = [f.min_n_tok for f in stat_files if f.min_n_tok is not None]
            maxs = [f.max_n_tok for f in stat_files if f.max_n_tok is not None]
            if mins and maxs:
                bounds["n_tok"] = (min(mins), max(maxs))
        # Delta semantics: ZORDER clusters WITHIN partitions — the
        # partition column LEADS the sort as itself (so each output file
        # holds one partition value and the per-partition writer never
        # fragments a batch into one sliver per source), and the remaining
        # dims are bit-interleaved behind it.  A fully-global interleave
        # (partition hashed into the key) mixes every partition into every
        # sorted batch and re-creates the small-file problem at write time
        # (measured: 24 MB target -> 3.5 MB mean files).
        zdims = tuple(d for d in dims if d != self.partition_col)
        # The partition leads the sort (Delta semantics: ZORDER clusters
        # WITHIN partitions), but as a rank folded into the HIGH bits of
        # the single uint64 key rather than a composite [string, zkey]
        # sort: the range shuffle's boundary sampler has full resolution
        # over one numeric column, where a leading low-cardinality string
        # collapses many sampled boundaries onto equal keys and skews the
        # reduce blocks (measured 5 MB-233 MB at 16 CPUs -> write straggler).
        part_rank: dict[str, int] | None = None
        if len(zdims) < len(dims):
            part_rank = {
                p: i
                for i, p in enumerate(sorted({f.partition for f in stat_files}))
            }
        if method == "scatter":
            return self._zorder_scatter(
                stat_files, zdims, bounds, curve, part_rank, signature,
                target_file_bytes, parent, job_id,
                two_level_threshold=scatter_two_level_threshold,
            )
        ds = self._read_entries(stat_files)
        ds = ds.map_batches(
            add_zkey,
            fn_kwargs=dict(
                dims=zdims,
                bounds=bounds,
                curve=curve,
                part_rank=part_rank,
                partition_col=self.partition_col,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # No pre-sort repartition: a non-shuffle repartition funnels every
        # block through ONE reduce task (measured: 15s serial for 2.25 GB)
        # — the push-based sort shuffle (tune_context) parallelizes fine on
        # many small blocks.  Output file sizing happens AFTER the sort:
        # the writer rebatches the sorted stream to ~target_file_bytes rows
        # per file (order-preserving, so per-file zkey/n_tok stats stay
        # tight).
        total_bytes = sum(f.bytes for f in stat_files) or 1
        total_rows = sum(f.rows for f in stat_files) or 1
        rows_per_file = max(1, int(total_rows * target_file_bytes / total_bytes))
        t = __import__("time").perf_counter()
        ds = ds.sort("zkey")
        stats_ds = ds.map_batches(
            make_file_writer(
                str(self.root),
                self.schema,
                self.partition_col,
                physical_names=self._physical_names(),
                stats_cols=self._physical_stats_cols(),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=rows_per_file,
        )
        entries = self._collect_stats(stats_ds)
        for e in entries:
            e.clustered = signature  # clustering provenance in the manifest
        t = self._phase("sort_write", t)
        removes = [f.path for f in stat_files]
        version = self._commit_with_rebase(
            [e.to_action() for e in entries], removes, "zorder", parent, job_id
        )
        self._write_bloom_sidecar(version, entries)
        # per-partition lineage for the completed job
        ckpt = JobCheckpoint(self.root, job_id)
        per_part: dict[str, dict] = {}
        for e in entries:
            d = per_part.setdefault(
                e.partition, {"output_files": [], "rows": 0, "sum_tok": 0}
            )
            d["output_files"].append(e.path)
            d["rows"] += e.rows
            d["sum_tok"] += e.sum_tok or 0
        for i, (part, d) in enumerate(sorted(per_part.items())):
            ckpt.write_unit(f"part-{part}", {"unit": i, "partition": part, **d, "adds": [], "removes": []})
        ckpt.mark_committed(version)
        return version

    def _zorder_scatter(
        self,
        stat_files: list[FileEntry],
        zdims: tuple[str, ...],
        bounds: dict[str, tuple[int, int]],
        curve: str,
        part_rank: dict[str, int] | None,
        signature: str,
        target_file_bytes: int,
        parent: int,
        job_id: str,
        two_level_threshold: int | None = None,
    ) -> int:
        """Scatter/gather body of ``zorder(method="scatter")`` — see
        ``stages/scatter.py`` for the exchange design and its multi-node
        partitioning assumptions.  Above ``two_level_threshold`` buckets
        (default ``SCATTER_TWO_LEVEL_THRESHOLD``) the scatter runs in two
        levels — coarse ranges first, then a grouped re-cut — bounding
        fragment count at O(blocks x sqrt(B)) instead of O(blocks x B)."""
        import shutil

        from realtime_clickstream_lakehouse_ray.stages.scatter import (
            GatherWriter,
            boundaries_from_sample,
            group_fragments_by_bytes,
            make_repartitioner,
            make_scatter_writer,
            sample_zkeys,
        )

        if two_level_threshold is None:
            two_level_threshold = SCATTER_TWO_LEVEL_THRESHOLD

        scratch = self.root / "_scratch" / job_id
        plan_path = scratch / "PLAN.json"
        total_bytes = sum(f.bytes for f in stat_files) or 1
        total_rows = sum(f.rows for f in stat_files) or 1
        rows_per_file = max(1, int(total_rows * target_file_bytes / total_bytes))
        n_buckets = max(1, -(-total_bytes // target_file_bytes))
        zkey_kwargs = dict(
            dims=zdims,
            bounds=bounds,
            curve=curve,
            part_rank=part_rank,
            partition_col=self.partition_col,
        )
        t = time.perf_counter()
        plan = None
        if plan_path.is_file():  # resume: scatter already completed
            try:
                cand = json.loads(plan_path.read_text())
                if all(
                    (scratch / p).is_file()
                    for fr in cand["frags"].values()
                    for p in fr
                ):
                    plan = cand
            except (json.JSONDecodeError, OSError, KeyError):
                plan = None
        if plan is None:
            shutil.rmtree(scratch, ignore_errors=True)
            # plan: boundaries from a narrow read (curve dims only — the
            # wide tokens column never leaves storage in this pass) over a
            # stride-spaced SUBSET of files: zkeys are hash-dominated, so a
            # file sample bounds the plan cost at 10^12 rows, and boundary
            # error only shifts bucket sizes (gather splits oversized
            # buckets into extra files — never a correctness issue)
            max_sample_files = max(16, 4 * int(n_buckets) // 10)
            stride = max(1, len(stat_files) // max_sample_files)
            sample_files = stat_files[:: stride]
            narrow = sorted({*zdims, self.partition_col})
            samples = [np.array([], dtype=np.uint64)]
            sample_ds = self._read_entries(sample_files, columns=narrow).map_batches(
                sample_zkeys,
                fn_kwargs=zkey_kwargs,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            for b in sample_ds.iter_batches(batch_format="pyarrow"):
                samples.append(np.asarray(b.column("zkey")))
            boundaries = boundaries_from_sample(
                np.concatenate(samples), int(n_buckets)
            )
            t = self._phase("plan", t)
            n_final = len(boundaries) + 1
            if n_final > two_level_threshold and len(boundaries) > 1:
                # TWO-LEVEL exchange: phase A into ~sqrt(B) coarse ranges,
                # phase B regroups each range's fragments to block size and
                # re-cuts against the FULL final boundary array (zkey rides
                # the fragments, so no re-key).  Total fragments across
                # both phases: O(blocks x sqrt(B)).
                fan = max(2, int(np.ceil(np.sqrt(n_final))))
                coarse_boundaries = boundaries[fan - 1:: fan]
                coarse_scratch = scratch / "_coarse"
                coarse_ds = self._read_entries(stat_files).map_batches(
                    make_scatter_writer(
                        scratch=str(coarse_scratch),
                        boundaries=coarse_boundaries,
                        **zkey_kwargs,
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                by_range: dict[int, list[dict]] = {}
                for row in coarse_ds.take_all():  # one row per coarse frag
                    by_range.setdefault(int(row["bucket"]), []).append(row)
                group_bytes = min(
                    128 << 20, max(1 << 20, target_file_bytes)
                )
                specs2 = [
                    {"frags": grp}
                    for rows in by_range.values()
                    for grp in group_fragments_by_bytes(rows, group_bytes)
                ]
                t = self._phase("scatter_coarse", t)
                frag_ds = ray.data.from_items(
                    make_spec_items(specs2)
                ).map_batches(
                    make_repartitioner(
                        coarse_scratch=str(coarse_scratch),
                        scratch=str(scratch),
                        boundaries=boundaries,
                        **zkey_kwargs,
                    ),
                    batch_format="pyarrow",
                    batch_size=1,
                )
                frags: dict[str, list[str]] = {}
                for row in frag_ds.take_all():
                    frags.setdefault(str(row["bucket"]), []).append(row["path"])
                shutil.rmtree(coarse_scratch, ignore_errors=True)
            else:
                # scatter: one embarrassingly-parallel pass over the data
                frag_ds = self._read_entries(stat_files).map_batches(
                    make_scatter_writer(
                        scratch=str(scratch), boundaries=boundaries, **zkey_kwargs
                    ),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                frags = {}
                for row in frag_ds.take_all():  # tiny: one row per fragment
                    frags.setdefault(str(row["bucket"]), []).append(row["path"])
            plan = {
                "boundaries": [int(x) for x in boundaries],
                "frags": frags,
                "rows_per_file": int(rows_per_file),
            }
            tmp = scratch / f".tmp-plan-{parent}"
            scratch.mkdir(parents=True, exist_ok=True)
            tmp.write_text(json.dumps(plan))
            import os as _os

            _os.replace(tmp, plan_path)
            t = self._phase("scatter", t)
        # gather: one unit per non-empty bucket, checkpoint-resumable
        specs = [
            {"unit": int(b), "frags": paths}
            for b, paths in sorted(plan["frags"].items(), key=lambda kv: int(kv[0]))
        ]
        ckpt = JobCheckpoint(self.root, job_id)
        if specs:
            # stateless tasks, not an actor pool: per-unit state is trivial
            # and tasks scale out instantly (no pool warm-up on short jobs)
            gather = GatherWriter(
                root=str(self.root),
                schema=self.schema,
                partition_col=self.partition_col,
                scratch=str(scratch),
                job_id=job_id,
                rows_per_file=int(plan["rows_per_file"]),
                signature=signature,
                physical_names=self._physical_names(),
                stats_cols=self._physical_stats_cols(),
            )
            ray.data.from_items(make_spec_items(specs)).map_batches(
                gather.__call__,
                batch_format="pyarrow",
                batch_size=1,
            ).count()  # consume; lineage flows into the checkpoint manifest
        records = {
            k: v for k, v in ckpt.list_units().items() if not k.startswith("part-")
        }
        missing = {str(s["unit"]) for s in specs} - set(records)
        if missing:
            raise RuntimeError(f"buckets did not complete: {sorted(missing)[:10]}")
        t = self._phase("gather", t)
        adds = [a for r in records.values() for a in r["adds"]]
        if self.current_spec:  # zorder rewrites land under the current spec
            for a in adds:
                a.setdefault("spec", self.current_spec)
        removes = [f.path for f in stat_files]
        version = self._commit_with_rebase(
            adds,
            removes,
            "zorder",
            parent,
            job_id,
            extra={"lineage": self._lineage_summary(records)},
        )
        # per-PARTITION lineage rollup alongside the per-bucket records
        # (north-rule contract: input files, output files, row counts and
        # token stats per partition in the checkpoint manifest)
        per_part: dict[str, dict] = {}
        for a in adds:
            d = per_part.setdefault(
                a["partition"], {"output_files": [], "rows": 0, "sum_tok": 0}
            )
            d["output_files"].append(a["path"])
            d["rows"] += a.get("rows") or 0
            d["sum_tok"] += a.get("sum_tok") or 0
        for i, (part, d) in enumerate(sorted(per_part.items())):
            ckpt.write_unit(
                f"part-{part}",
                {"unit": i, "partition": part, **d, "adds": [], "removes": []},
            )
        ckpt.mark_committed(version)
        shutil.rmtree(scratch, ignore_errors=True)
        return version

    # ---- MERGE INTO -----------------------------------------------------
    def merge(
        self,
        source: pa.Table | ray.data.Dataset,
        strategy: str = "auto",
        broadcast_max_rows: int = 2_000_000,
        job_id: str | None = None,
        concurrency: int | tuple[int, int] = (1, 16),
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        sequence_col: str | None = None,
        matched_condition: str | None = None,
        matched_action: str = "update",
        insert_unmatched: bool = True,
    ) -> int:
        """MERGE INTO (upsert) on ``key_col``: WHEN MATCHED UPDATE SET * /
        WHEN NOT MATCHED INSERT *; duplicate keys in the source resolve
        keep-latest (last row wins).

        ``sequence_col`` (Delta DLT ``APPLY CHANGES ... SEQUENCE BY``
        semantics, broadcast regime): a matched source row replaces the
        target row only when its sequence value is STRICTLY newer; stale
        (out-of-order) CDC events are suppressed — they neither overwrite
        the newer target row nor insert.  Within the source, duplicate
        keys resolve keep-highest-sequence.

        Matched-clause predicates (Delta ``WHEN MATCHED AND <cond> THEN
        UPDATE/DELETE``, broadcast regime): ``matched_condition`` is a
        conjunctive predicate string (functions/predicate.py grammar)
        evaluated on the TARGET row; with ``matched_action="update"``
        (default) a matched row is replaced only when it satisfies the
        condition (otherwise the target row stays and the source row is
        consumed without inserting); with ``matched_action="delete"`` a
        matched-and-satisfying row is deleted and matched source rows
        never insert.  ``insert_unmatched=False`` drops the WHEN NOT
        MATCHED INSERT clause: unmatched source keys are discarded.

        Broadcast regime (small source): source keys are ``ray.put`` once;
        target files are pruned by their min/max key stats and only files
        that can contain a matched key are rewritten copy-on-write (drop
        matched rows) by the actor pool; the deduped source is then appended
        partitioned.  Shuffle regime (large source): both sides tagged and
        hash-grouped on the key (``groupby.map_groups``), full table rewrite.
        """
        if matched_action not in ("update", "delete"):
            raise ValueError(f"unknown matched_action {matched_action!r}")
        when = None
        if (
            matched_condition is not None
            or matched_action != "update"
            or not insert_unmatched
        ):
            if sequence_col is not None:
                raise ValueError(
                    "matched-clause predicates do not compose with "
                    "sequence_col (per-key recency and per-row clauses "
                    "answer different questions — pick one)"
                )
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                parse_predicate,
            )

            conds: list[dict] = []
            if matched_condition is not None:
                conds = parse_predicate(matched_condition)
                for c in conds:
                    if c["column"] not in self.schema.names:
                        raise ValueError(
                            f"unknown column {c['column']!r} in matched_condition"
                        )
            when = {
                "conds": conds,
                "action": matched_action,
                "insert_unmatched": bool(insert_unmatched),
            }
        self._start_op()
        parent = self.version()
        src_is_table = isinstance(source, pa.Table)
        if src_is_table:
            self._guard_stale_names(source.column_names)
            use_broadcast = strategy != "shuffle"
        else:
            # lazy CHECK pass rides the dataset; conform/dedup happen in
            # the broadcast regime's prep task or the shuffle tag stage
            source = self._constraint_stage(source)
            n_src = source.count()
            use_broadcast = strategy == "broadcast" or (
                strategy == "auto" and n_src <= broadcast_max_rows
            )
        if sequence_col is not None and not use_broadcast:
            raise ValueError(
                "sequence_col requires the broadcast regime (pass "
                "strategy='broadcast' or a source under broadcast_max_rows); "
                "the shuffle regime's keep-winner resolution is positional"
            )
        if when is not None and not use_broadcast:
            raise ValueError(
                "matched-clause predicates require the broadcast regime "
                "(pass strategy='broadcast' or a source under "
                "broadcast_max_rows)"
            )
        if use_broadcast:
            return self._merge_broadcast(
                source, parent, job_id, concurrency, target_file_bytes,
                sequence_col=sequence_col, when=when,
                check_constraints=src_is_table,
            )
        if src_is_table:  # the broadcast prep task isn't in play: check here
            source = self._constraint_stage(conform_table(source, self.schema))
        return self._merge_shuffle(source, parent, job_id, concurrency)

    def _merge_broadcast(
        self,
        source: pa.Table | ray.data.Dataset,
        parent: int,
        job_id: str | None,
        concurrency: int | tuple[int, int],
        target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
        sequence_col: str | None = None,
        when: dict | None = None,
        check_constraints: bool = True,
    ) -> int:
        if job_id is None:
            job_id = f"merge-v{parent}"
            if when is not None:
                import hashlib

                sig = hashlib.md5(
                    json.dumps(when, sort_keys=True).encode()
                ).hexdigest()[:10]
                job_id = f"{job_id}-when-{sig}"
        done = self.log.find_commit_by_job(job_id)
        if done is not None:
            return done
        t = __import__("time").perf_counter()
        # source preparation (conform + CHECK + keep-latest dedup) AND the
        # min/max-key+Bloom file pruning run in a Ray task; the driver
        # receives FILE-COUNT-proportional metadata only — the prepared
        # table stays in the object store (append slices read it by ref)
        # and the rewrite key broadcast is the task's own return object
        # (driver-data-path-free: driver peak RSS tracks neither source
        # bytes nor source keys)
        if isinstance(source, ray.data.Dataset):
            blocks = source.to_arrow_refs()
        else:
            blocks = [ray.put(source)]
            del source
        snapshot_files = self.files(parent)
        prep_ref, keys_ref, meta_ref = _prepare_merge_source.remote(
            self.schema,
            self.key_col,
            sequence_col,
            list(self.constraints) if check_constraints else [],
            [(f.path, f.min_key, f.max_key) for f in snapshot_files],
            self.blooms(parent),
            *blocks,
        )
        del blocks
        try:
            meta = ray.get(meta_ref)
        except ray.exceptions.RayTaskError as e:  # unwrap the CHECK error
            from realtime_clickstream_lakehouse_ray.functions.constraints import (
                ConstraintViolation,
            )

            if isinstance(e.cause, ConstraintViolation):
                raise e.cause from None
            raise
        n_src_rows = int(meta["n_rows"])
        src_nbytes = int(meta["nbytes"])
        t = self._phase("source_prep", t)
        affected_paths = set(meta["affected"])
        affected: list[FileEntry] = [
            f for f in snapshot_files if f.path in affected_paths
        ]
        # bin-pack the affected files per partition (one output file per
        # bin): fewer, bigger rewrite units — a broadcast MERGE doubles as
        # compaction of the files it touches
        target = target_file_bytes
        # group by (spec, partition): old- and current-layout files can
        # share a partition VALUE but must never share a bin (the rewrite
        # output stays in its inputs' layout; _bin_spec enforces this)
        by_part: dict[tuple[int, str], list[FileEntry]] = {}
        for f in affected:
            by_part.setdefault(((f.spec or 0), f.partition), []).append(f)
        bins: list[dict] = []
        for spec_part in sorted(by_part):
            part = spec_part[1]
            cur: list[FileEntry] = []
            cur_bytes = 0
            for f in sorted(by_part[spec_part], key=lambda f: f.path):
                if cur and cur_bytes + f.bytes > target:
                    bins.append(self._bin_spec(len(bins), part, cur, job_id))
                    cur, cur_bytes = [], 0
                cur.append(f)
                cur_bytes += f.bytes
            if cur:
                bins.append(self._bin_spec(len(bins), part, cur, job_id))
        if when is not None:
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                translate_columns,
            )

            for b in bins:  # rewrite actors see PHYSICAL batches
                b["when_conds"] = translate_columns(
                    when["conds"], self.column_mapping
                )
                b["when_action"] = when["action"]
        t = self._phase("prune_plan", t)
        ckpt = JobCheckpoint(self.root, job_id)
        # launch the source append FIRST, as raw Ray tasks overlapped with
        # the rewrite stage below — the two touch disjoint files (rewrites
        # drop matched keys from existing files; the append writes brand-new
        # ones), so serializing them only adds a CPU-count-independent tail
        # (measured 1.6-14 s of the op at bench size).  The tasks slice the
        # PREPARED source by ref (coordinates ship, rows don't); names are
        # deterministic per (job_id, slice), so a crashed rerun overwrites
        # its partial output.
        src_unit = ckpt.read_unit("src-append")
        if src_unit is not None and not all(
            (self.root / a["path"]).is_file() for a in src_unit["adds"]
        ):
            src_unit = None  # checkpoint exists but files were vacuumed

        def _launch_src_append(drop_keys=None, keep_keys=None) -> list:
            n_units = max(1, int(src_nbytes / max(1, target_file_bytes)))
            step = -(-n_src_rows // n_units) if n_src_rows else 1
            # num_cpus=0: the broadcast-regime source is small by definition
            # (<= broadcast_max_rows), so these slice writes are seconds of
            # I/O-bound work — at num_cpus=1 the task group was monopolizing
            # every CPU slot ahead of the rewrite pool's FIXED-size actors
            # (Ray places FIFO), serializing "overlapped" work: measured
            # ~5 s of the merge wall at 4 CPUs / 2 M rows that vanished at
            # num_cpus=0, where the pool places instantly and the append
            # genuinely overlaps the rewrite.
            write_task = ray.remote(num_cpus=0)(write_slice_ref_task)
            drop_ref = (
                ray.put(np.array(sorted(drop_keys), dtype=object))
                if drop_keys
                else None
            )
            keep_ref = (
                ray.put(np.array(sorted(keep_keys), dtype=object))
                if keep_keys is not None
                else None
            )
            return [
                write_task.remote(
                    prep_ref,
                    i * step,
                    step,
                    str(self.root),
                    self.schema,
                    self.partition_col,
                    f"{job_id}-src-u{i:04d}",
                    self._physical_names(),
                    self._physical_stats_cols(),
                    drop_ref,
                    keep_ref,
                    self.key_col,
                )
                for i in range(n_units)
                if i * step < n_src_rows
            ]

        src_futures: list = []
        appended_rows = n_src_rows
        if src_unit is None and sequence_col is None and when is None:
            # overlap the source append with the rewrites (disjoint files)
            src_futures = _launch_src_append()
        records: dict[str, dict] = {}
        if bins:
            # keys_ref IS the prep task's keys return: an Arrow string
            # array for the membership modes (plasma-zero-copy per node),
            # the (sorted keys, aligned seqs) pair for SEQUENCE BY
            if when is not None:
                mode = "merge_when"
            elif sequence_col is None:
                mode = "delete_keys"
            else:
                mode = "merge_seq"
            records = self._run_rewrite_units(
                bins, job_id, mode=mode, keys_ref=keys_ref,
                concurrency=concurrency, sequence_col=sequence_col,
            )
        t = self._phase("rewrite_units", t)
        if src_unit is None and (sequence_col is not None or when is not None):
            # SEQUENCE BY / WHEN MATCHED AND: the append depends on the
            # rewrites' verdicts — source rows whose key a unit suppressed
            # (target newer, or matched without an applying clause) must
            # NOT be written, so the append launches after the pool drains
            # and the verdict key sets (matched-proportional) are applied
            # INSIDE the slice tasks
            suppressed: set = set()
            for r in records.values():
                suppressed.update(r.get("suppressed") or [])
            if when is not None and not when["insert_unmatched"]:
                # no WHEN NOT MATCHED clause: ONLY source rows whose
                # matched target row an UPDATE clause dropped may insert
                # (minus suppressed — under action='delete' every matched
                # key is suppressed, so nothing inserts at all)
                applied: set = set()
                for r in records.values():
                    applied.update(r.get("applied") or [])
                keep = sorted(applied - suppressed)
                src_futures = _launch_src_append(keep_keys=keep)
                appended_rows = len(keep)
            else:
                src_futures = _launch_src_append(drop_keys=suppressed)
                appended_rows = n_src_rows - len(suppressed)
        src_entries: list[FileEntry] = []
        if src_unit is None:
            entries = [e for part in ray.get(src_futures) for e in part]
            for e in entries:
                e.spec = self.current_spec
            src_entries = entries
            src_unit = {
                "unit": "src-append",
                "partition": "*",
                "inputs": [],
                "adds": [e.to_action() for e in entries],
                "removes": [],
                "rows": appended_rows,
            }
            ckpt.write_unit("src-append", src_unit)
        t = self._phase("src_append", t)
        adds = [a for r in records.values() for a in r["adds"]] + src_unit["adds"]
        removes = [p for r in records.values() for p in r["removes"]]
        version = self._commit_with_rebase(
            adds, removes, "merge", parent, job_id,
            extra={"lineage": self._lineage_summary({**records, "src": src_unit})},
        )
        # the src-append files' blooms (rewrite units persist theirs from
        # inside the actors; a resumed src-append skips this — safe, just
        # fewer skippable files until the next zorder)
        self._write_bloom_sidecar(version, src_entries)
        ckpt.mark_committed(version)
        return version

    def _merge_shuffle(
        self,
        source: ray.data.Dataset | pa.Table,
        parent: int,
        job_id: str | None,
        concurrency: int | tuple[int, int],
    ) -> int:
        """Hash-shuffle MERGE for large sources: tag priority + bucket,
        union, group by BUCKET (not key), keep the highest-priority row per
        key with one vectorized Arrow sort per bucket, rewrite the table.

        Grouping on ``hash(key) % B`` instead of the key itself costs B
        Python calls total rather than one per key (pathological over a
        full table) — the same shape as ``bucket_hash_join``
        (pipelines/relational.py)."""
        job_id = job_id or f"merge-v{parent}"
        done = self.log.find_commit_by_job(job_id)
        if done is not None:
            return done
        from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

        tune_context()  # groupby shuffle uses the sort path
        if isinstance(source, pa.Table):
            # keep-latest is well-defined driver-side; inside the shuffle the
            # per-key row order is not deterministic
            source = _dedup_keep_latest(conform_table(source, self.schema), self.key_col)
            source = ray.data.from_arrow(source)

        ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_buckets = max(8, ncpu * 2)
        key_col = self.key_col

        def _tag(prio: int):
            def fn(t: pa.Table) -> pa.Table:
                t = conform_table(t, self.schema)
                bucket = (hash64(t[key_col]) % np.uint64(num_buckets)).astype(np.int32)
                return t.append_column(
                    "__prio", pa.array(np.full(t.num_rows, prio, dtype=np.int8))
                ).append_column("__bucket", pa.array(bucket))
            return fn

        target = self.scan(version=parent).map_batches(
            _tag(0), batch_format="pyarrow", zero_copy_batch=True
        )
        src = source.map_batches(_tag(1), batch_format="pyarrow", zero_copy_batch=True)

        def keep_winner_bucket(group: pa.Table) -> pa.Table:
            # all keys of a bucket at once: Arrow C++ sort by (key, prio),
            # then keep each key's LAST row (max prio; source beats target)
            g = group.sort_by([(key_col, "ascending"), ("__prio", "ascending")])
            k = np.asarray(g[key_col])
            last = np.ones(len(k), dtype=bool)
            if len(k) > 1:
                last[:-1] = k[1:] != k[:-1]
            return g.filter(pa.array(last)).drop_columns(["__prio", "__bucket"])

        merged = target.union(src).groupby("__bucket").map_groups(
            keep_winner_bucket, batch_format="pyarrow"
        )
        stats_ds = merged.map_batches(
            make_file_writer(
                str(self.root),
                self.schema,
                self.partition_col,
                physical_names=self._physical_names(),
                stats_cols=self._physical_stats_cols(),
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=100_000,
        )
        entries = self._collect_stats(stats_ds)
        for e in entries:  # whole-table rewrite under the CURRENT layout
            e.spec = self.current_spec
        removes = [f.path for f in self.files(parent)]
        version = self._commit_with_rebase(
            [e.to_action() for e in entries], removes, "merge", parent, job_id
        )
        JobCheckpoint(self.root, job_id).mark_committed(version)
        return version

    # ---- DELETE ---------------------------------------------------------
    def _match_candidates(
        self,
        parent: int,
        keys: Sequence[str] | None,
        partitions: Sequence[str] | None,
        min_n_tok: int | None,
        max_n_tok: int | None,
    ) -> tuple[list[FileEntry], list[FileEntry]]:
        """Stats-prune the parent snapshot's files against a DML predicate
        (shared by DELETE and UPDATE): returns (whole, partial) — ``whole``
        files have EVERY row matching (metadata-only delete eligible;
        key predicates never qualify), ``partial`` files overlap and need a
        rewrite.  Pruning uses partition value, n_tok min/max stats, key
        min/max range and the per-file key Blooms — no data is read."""
        from realtime_clickstream_lakehouse_ray.functions.bloom import bloom_any_match
        from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

        # a bare string is the classic misuse (delete("k1") meaning one key,
        # or a SQL-ish predicate string); np.asarray would make it a 0-dim
        # object and fail obscurely inside np.sort — reject it up front
        if isinstance(keys, str) or isinstance(partitions, str):
            raise TypeError(
                "keys/partitions must be sequences of strings, not a bare "
                "string — pass keys=['k1'] (predicate strings are not "
                "supported; use min_n_tok/max_n_tok/partitions)"
            )
        key_arr = np.sort(np.asarray(keys, dtype=object)) if keys else None
        key_hashes = (
            hash64(pa.array(list(keys), type=pa.string())) if keys else None
        )
        blooms = self.blooms(parent) if keys else {}
        part_set = set(partitions) if partitions is not None else None

        cur_spec = self.current_spec
        whole_files: list[FileEntry] = []
        rewrite_files: list[FileEntry] = []
        for f in self.files(parent):
            is_cur = (f.spec or 0) == cur_spec
            if part_set is not None and is_cur and f.partition not in part_set:
                continue
            # old-spec file + partition predicate: cannot prune OR prove
            # full match by the (old-spec) partition value — always a
            # rewrite candidate; the caller adds a row-level partition
            # condition for it
            # n_tok range overlap test from stats
            if min_n_tok is not None and f.max_n_tok is not None and f.max_n_tok < min_n_tok:
                continue
            if max_n_tok is not None and f.min_n_tok is not None and f.min_n_tok > max_n_tok:
                continue
            if key_arr is not None:
                # key predicate: range + bloom prune, never metadata-only
                if f.min_key is not None and f.max_key is not None:
                    lo = np.searchsorted(key_arr, f.min_key, side="left")
                    if lo >= len(key_arr) or key_arr[lo] > f.max_key:
                        continue
                b = blooms.get(f.path)
                if b is not None and not bloom_any_match(b, key_hashes):
                    continue
                rewrite_files.append(f)
                continue
            fully = (
                (part_set is None or is_cur)
                and (min_n_tok is None or (f.min_n_tok is not None and f.min_n_tok >= min_n_tok))
                and (max_n_tok is None or (f.max_n_tok is not None and f.max_n_tok <= max_n_tok))
            )
            (whole_files if fully else rewrite_files).append(f)
        return whole_files, rewrite_files

    def update(
        self,
        set_rules: Sequence[dict],
        keys: Sequence[str] | None = None,
        partitions: Sequence[str] | None = None,
        min_n_tok: int | None = None,
        max_n_tok: int | None = None,
        job_id: str | None = None,
        concurrency: int | tuple[int, int] = (1, 16),
        where: str | None = None,
    ) -> int | None:
        """Predicate UPDATE (Delta ``UPDATE ... SET`` equivalent):
        copy-on-write rewrite of every file whose stats overlap the
        predicate, applying vectorized set-rules to the matched rows.

        ``set_rules``: list of ``{"column": c, "op": "set"|"add"|"suffix"|
        "prefix", "value": v}`` (JSON-serializable; applied in order by one
        ``pc.if_else`` each inside the rewrite actors).  Updating the
        PARTITION column is supported — the rewrite splits its output per
        new partition value, so rows move between partitions in one
        commit.  Updating the key column is rejected (that is a
        delete+insert; use ``merge``).  Table CHECK constraints are
        re-validated on every rewritten batch before any file is
        published.  Predicate = conjunction of keys / partitions / n_tok
        range, stats+Bloom-pruned exactly like DELETE; a stats false
        positive re-keeps the file untouched.  Deterministic job id ->
        idempotent + checkpoint-resumable like every maintenance op.

        Returns the new version, or None when nothing matches."""
        import hashlib

        rules = [dict(r) for r in set_rules]
        for r in rules:
            if set(r) != {"column", "op", "value"}:
                raise ValueError(f"malformed update rule {r!r}")
            if r["column"] not in self.schema.names:
                raise ValueError(f"unknown column {r['column']!r}")
            if r["column"] == self.key_col:
                raise ValueError("UPDATE of the key column is not supported; use merge()")
            if r["op"] not in ("set", "add", "suffix", "prefix"):
                raise ValueError(f"unknown update op {r['op']!r}")
        if not rules:
            raise ValueError("UPDATE needs at least one set rule")
        conds: list[dict] = []
        if where is not None:
            conds, keys, partitions, min_n_tok, max_n_tok, _ = self._plan_where(
                where, keys, partitions, min_n_tok, max_n_tok
            )  # UPDATE always rewrites matches, so residuals need no demotion
            if keys == [] or partitions == []:
                return None  # contradictory conjunction: empty match set

        self._start_op()
        parent = self.version()
        if job_id is None:
            payload = [rules, sorted(keys) if keys else None,
                       sorted(partitions) if partitions else None,
                       min_n_tok, max_n_tok]
            if conds:  # keep pre-WHERE job signatures stable
                payload.append(conds)
            sig = hashlib.md5(json.dumps(payload).encode()).hexdigest()[:10]
            job_id = f"update-v{parent}-{sig}"
        done = self.log.find_commit_by_job(job_id)
        if done is not None:
            return done

        whole, partial = self._match_candidates(
            parent, keys, partitions, min_n_tok, max_n_tok
        )
        candidates = whole + partial  # UPDATE always rewrites matches
        if not candidates:
            return None

        by_part: dict[str, list[FileEntry]] = {}
        for f in candidates:
            by_part.setdefault(f.partition, []).append(f)
        bins = []
        for part in sorted(by_part):
            for f in sorted(by_part[part], key=lambda f: f.path):
                spec = self._bin_spec(len(bins), part, [f], job_id)
                spec["min_n_tok"] = min_n_tok
                spec["max_n_tok"] = max_n_tok
                # rewrite actors see raw PHYSICAL batches: translate rule
                # column refs through the column mapping (identity when no
                # rename has happened)
                spec["rules"] = [
                    {**r, "column": self.column_mapping.get(r["column"], r["column"])}
                    for r in rules
                ]
                bin_conds = list(conds)
                if partitions is not None and (f.spec or 0) != self.current_spec:
                    # old-layout file under partition evolution: the
                    # partition predicate must apply row-level
                    bin_conds = bin_conds + [
                        {
                            "column": self.partition_col,
                            "op": "in",
                            "value": sorted(partitions),
                        }
                    ]
                if bin_conds:
                    from realtime_clickstream_lakehouse_ray.functions.predicate import (
                        translate_columns,
                    )

                    spec["where"] = translate_columns(bin_conds, self.column_mapping)
                bins.append(spec)
        keys_ref = ray.put(np.asarray(list(keys), dtype=object)) if keys else None
        records = self._run_rewrite_units(
            bins, job_id, mode="update_where", keys_ref=keys_ref,
            concurrency=concurrency,
        )
        adds = [a for r in records.values() for a in r["adds"]]
        removes = [p for r in records.values() for p in r["removes"]]
        if not adds and not removes:
            return None
        version = self._commit_with_rebase(
            adds, removes, "update", parent, job_id,
            extra={"lineage": self._lineage_summary(records)},
        )
        JobCheckpoint(self.root, job_id).mark_committed(version)
        return version

    def _plan_where(
        self,
        where: str,
        keys: Sequence[str] | None,
        partitions: Sequence[str] | None,
        min_n_tok: int | None,
        max_n_tok: int | None,
    ) -> tuple[list[dict], Sequence[str] | None, Sequence[str] | None, int | None, int | None, bool]:
        """Parse a conjunctive WHERE string and fold what the planner can
        prove into the stats-pruning hints (partition set, key set, n_tok
        range); everything else stays a row-level residual evaluated inside
        the rewrite actors.  Returns ``(conds, keys, partitions, min_n_tok,
        max_n_tok, has_residual)`` — ``has_residual`` means whole-file
        metadata-only deletes are off the table (stats alone cannot prove a
        file fully matches)."""
        from realtime_clickstream_lakehouse_ray.functions.predicate import (
            parse_predicate,
        )

        conds = parse_predicate(where)
        for c in conds:
            if c["column"] not in self.schema.names:
                raise ValueError(f"unknown column {c['column']!r} in WHERE")
        # the stats dimension is the logical column whose PHYSICAL name is
        # n_tok (identity unless renamed via column mapping)
        stats_col = next(
            (
                n
                for n in self.schema.names
                if self.column_mapping.get(n, n) == "n_tok"
            ),
            None,
        )
        has_residual = False
        for c in conds:
            col, op, v = c["column"], c["op"], c["value"]
            if col == self.partition_col and op == "=":
                vs = {str(v)}
                partitions = sorted(vs & set(partitions)) if partitions is not None else sorted(vs)
            elif col == self.partition_col and op == "in":
                vs = {str(x) for x in v}
                partitions = sorted(vs & set(partitions)) if partitions is not None else sorted(vs)
            elif col == self.key_col and op == "=":
                ks = {v}
                keys = sorted(ks & set(keys)) if keys is not None else sorted(ks)
            elif col == self.key_col and op == "in":
                ks = set(v)
                keys = sorted(ks & set(keys)) if keys is not None else sorted(ks)
            elif col == stats_col and op in ("=", "<", "<=", ">", ">=") and isinstance(v, int):
                if op in (">", ">="):
                    lo = v + 1 if op == ">" else v
                    min_n_tok = lo if min_n_tok is None else max(min_n_tok, lo)
                elif op in ("<", "<="):
                    hi = v - 1 if op == "<" else v
                    max_n_tok = hi if max_n_tok is None else min(max_n_tok, hi)
                else:  # "="
                    min_n_tok = v if min_n_tok is None else max(min_n_tok, v)
                    max_n_tok = v if max_n_tok is None else min(max_n_tok, v)
            else:
                # key-range / string comparisons / IS NULL / non-int values:
                # row-level only — a file's stats cannot prove full match
                has_residual = True
        return conds, keys, partitions, min_n_tok, max_n_tok, has_residual

    def delete(
        self,
        keys: Sequence[str] | None = None,
        partitions: Sequence[str] | None = None,
        min_n_tok: int | None = None,
        max_n_tok: int | None = None,
        job_id: str | None = None,
        concurrency: int | tuple[int, int] = (1, 16),
        mode: str = "cow",
        where: str | None = None,
    ) -> int | None:
        """Predicate DELETE (conjunction of the given conditions) — the
        Delta ``DELETE FROM`` capability.

        ``mode="cow"`` (default, copy-on-write) — two regimes per candidate
        file, decided from file STATS alone:
        - **metadata-only**: a file whose whole row range satisfies the
          predicate (its partition is in ``partitions`` and its
          [min_n_tok, max_n_tok] lies inside the range, with no key
          predicate) is dropped by a manifest ``remove`` — no data read.
        - **rewrite**: partially-matching files go through the same
          stats+Bloom-pruned actor-pool rewrite as MERGE's delete half.

        ``mode="mor"`` (merge-on-read, Delta/Iceberg deletion-vector
        analog) — KEY deletes only: instead of rewriting data files, each
        affected file gets a deletion-vector sidecar of its tombstoned
        keys; scans drop those keys, and any later rewrite touching the
        file (compact / zorder / merge / ``materialize_deletes``) folds
        the DV in and clears it.  O(matched keys) write cost instead of
        O(file bytes) — the right regime for small frequent deletes.
        Contract (key-addressed table): a tombstoned key becomes visible
        again via ``merge()`` (whose Bloom-pruned rewrite set necessarily
        covers the tombstoning files), NOT via raw ``append()`` of the
        same key — ``append(validate_tombstones=True)`` guards that edge.

        ``where``: a conjunctive predicate STRING (``"source = 'web' AND
        n_tok > 40 AND doc_id < 'doc-05'"``, grammar in
        ``functions/predicate.py``) — partition / key / n_tok-range
        conditions fold into the same stats pruning as the keyword args;
        anything else (key ranges, string comparisons, IS NULL) is
        evaluated row-level inside the rewrite actors.  Conditions on
        columns renamed via column mapping are translated to physical
        names automatically.

        Returns the new version, or None when nothing matches."""
        import hashlib

        if mode not in ("cow", "mor"):
            raise ValueError(f"unknown delete mode {mode!r}")
        if mode == "mor" and where is not None:
            raise ValueError(
                "mode='mor' tombstones KEYS only: WHERE predicates need "
                "mode='cow'"
            )
        if mode == "mor" and (keys is None or min_n_tok is not None or max_n_tok is not None):
            raise ValueError(
                "mode='mor' tombstones KEYS: pass keys=..., without n_tok "
                "range predicates (use mode='cow' for range deletes)"
            )
        if mode == "mor" and partitions is not None and len(self.partition_specs) > 1:
            raise ValueError(
                "mode='mor' with partitions= is not supported on a "
                "mixed-partition-spec table: a DV tombstone is row-blind "
                "and old-layout files need a row-level partition check — "
                "use mode='cow'"
            )
        conds: list[dict] = []
        has_residual = False
        if where is not None:
            conds, keys, partitions, min_n_tok, max_n_tok, has_residual = (
                self._plan_where(where, keys, partitions, min_n_tok, max_n_tok)
            )
            if keys == [] or partitions == []:
                return None  # contradictory conjunction: empty match set
        self._start_op()
        parent = self.version()
        if job_id is None:
            payload = [sorted(keys) if keys else None,
                       sorted(partitions) if partitions else None,
                       min_n_tok, max_n_tok, mode]
            if conds:  # keep pre-WHERE job signatures stable
                payload.append(conds)
            sig = hashlib.md5(json.dumps(payload).encode()).hexdigest()[:10]
            job_id = f"delete-v{parent}-{sig}"
        done = self.log.find_commit_by_job(job_id)
        if done is not None:
            return done

        whole_files, rewrite_files = self._match_candidates(
            parent, keys, partitions, min_n_tok, max_n_tok
        )
        if has_residual:
            # stats cannot prove any file fully matches a residual
            # condition: every candidate goes through the row-level rewrite
            rewrite_files = whole_files + rewrite_files
            whole_files = []

        if not whole_files and not rewrite_files:
            return None

        if mode == "mor":
            bins: list[dict] = []
            for f in sorted(rewrite_files, key=lambda f: (f.partition, f.path)):
                bins.append(
                    {
                        "unit": len(bins),
                        "partition": f.partition,
                        "files": [f.path],
                        "entry": f.to_action(),
                        "dv_out": f"_dv/{job_id}-unit{len(bins):06d}.parquet",
                    }
                )
            keys_ref = ray.put(np.asarray(list(keys), dtype=object))
            records = self._run_rewrite_units(
                bins, job_id, mode="dv", keys_ref=keys_ref, concurrency=concurrency
            )
            adds = [a for r in records.values() for a in r["adds"]]
            if not adds:
                return None  # stats/bloom false positives: no key present
            version = self._commit_with_rebase(
                adds, [], "delete", parent, job_id,
                extra={
                    "lineage": self._lineage_summary(records),
                    "delete_mode": "mor",
                },
            )
            JobCheckpoint(self.root, job_id).mark_committed(version)
            return version

        records: dict[str, dict] = {}
        if rewrite_files:
            by_part: dict[str, list[FileEntry]] = {}
            for f in rewrite_files:
                by_part.setdefault(f.partition, []).append(f)
            bins = []
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                translate_columns,
            )

            cur_spec = self.current_spec
            for part in sorted(by_part):
                for f in sorted(by_part[part], key=lambda f: f.path):
                    spec = self._bin_spec(len(bins), part, [f], job_id)
                    spec["min_n_tok"] = min_n_tok
                    spec["max_n_tok"] = max_n_tok
                    bin_conds = list(conds)
                    if partitions is not None and (f.spec or 0) != cur_spec:
                        # old-layout file: the partition predicate becomes
                        # a row-level condition on the CURRENT column
                        bin_conds = bin_conds + [
                            {
                                "column": self.partition_col,
                                "op": "in",
                                "value": sorted(partitions),
                            }
                        ]
                    if bin_conds:
                        # rewrite actors see PHYSICAL batches
                        spec["where"] = translate_columns(bin_conds, self.column_mapping)
                    bins.append(spec)
            keys_ref = (
                ray.put(np.asarray(list(keys), dtype=object)) if keys else None
            )
            records = self._run_rewrite_units(
                bins, job_id, mode="delete_where", keys_ref=keys_ref,
                concurrency=concurrency,
            )
        adds = [a for r in records.values() for a in r["adds"]]
        removes = [p for r in records.values() for p in r["removes"]] + [
            f.path for f in whole_files
        ]
        if not adds and not removes:
            return None
        version = self._commit_with_rebase(
            adds, removes, "delete", parent, job_id,
            extra={
                "lineage": self._lineage_summary(records),
                "metadata_only_deletes": [f.path for f in whole_files],
            },
        )
        JobCheckpoint(self.root, job_id).mark_committed(version)
        return version

    # ---- CHANGE DATA FEED ------------------------------------------------
    def changes(
        self,
        from_version: int | None = None,
        to_version: int | None = None,
        num_buckets: int | None = None,
        from_tag: str | None = None,
        to_tag: str | None = None,
        from_ts: float | None = None,
        to_ts: float | None = None,
    ) -> ray.data.Dataset:
        """Change Data Feed: the net row-level difference between two
        snapshots (Delta CDF / ``table_changes`` equivalent — the reference
        gets this from its Delta JAR; README.md:176 frames retention/PITR
        around it).  Returns a Dataset with the table schema plus
        ``_change_type`` in {insert, delete, update_preimage,
        update_postimage}.

        Unlike Delta (which writes CDC sidecars at commit time), the feed
        is derived after the fact from the snapshots alone, so it works
        across ANY commit range with zero write-path overhead:

        - file-level diff first (driver, stats only): only files whose
          (path, deletion-vector) signature appears on exactly one side
          are read at all — a compaction/zorder-only range reads the
          rewritten files but nothing else, and an append-only range reads
          only the appended files;
        - both sides stream through one hash-bucket shuffle on the key
          (the ``_merge_shuffle`` shape: B vectorized group calls, never
          one per key);
        - within a bucket, rewrite-only rows cancel by (key, row-content
          hash) multiset difference — ``table_row_hash`` is vectorized
          over all columns including the token lists — and surviving rows
          classify as update (key on both sides), insert or delete.
        """
        if from_tag is not None:
            from_version = self.log.resolve_ref(from_tag)
        elif from_ts is not None:
            from_version = self.log.version_at(from_ts)
        if from_version is None:
            raise ValueError("pass one of from_version=, from_tag=, from_ts=")
        if to_tag is not None:
            to_version = self.log.resolve_ref(to_tag)
        elif to_ts is not None:
            to_version = self.log.version_at(to_ts)
        to_version = self.version() if to_version is None else to_version
        old_all = {(f.path, f.dv): f for f in self.files(from_version)}
        new_all = {(f.path, f.dv): f for f in self.files(to_version)}
        old_files = [f for sig, f in sorted(old_all.items()) if sig not in new_all]
        new_files = [f for sig, f in sorted(new_all.items()) if sig not in old_all]

        out_schema = self.schema.append(pa.field("_change_type", pa.string()))
        if not old_files and not new_files:
            return ray.data.from_arrow(out_schema.empty_table())

        from realtime_clickstream_lakehouse_ray.functions.hashing import (
            hash64,
            table_row_hash,
        )

        tune_context()  # groupby shuffle uses the sort path
        ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
        B = num_buckets or max(8, ncpu * 2)
        key_col = self.key_col
        schema = self.schema

        def _tag(side: int):
            def fn(t: pa.Table) -> pa.Table:
                t = conform_table(t, schema)
                bucket = (hash64(t[key_col]) % np.uint64(B)).astype(np.int32)
                rh = table_row_hash(t).astype(np.int64)
                return (
                    t.append_column("__side", pa.array(np.full(t.num_rows, side, np.int8)))
                    .append_column("__rowhash", pa.array(rh))
                    .append_column("__bucket", pa.array(bucket))
                )

            return fn

        olds = self._read_entries(old_files).map_batches(
            _tag(0), batch_format="pyarrow", zero_copy_batch=True
        )
        news = self._read_entries(new_files).map_batches(
            _tag(1), batch_format="pyarrow", zero_copy_batch=True
        )

        def diff_bucket(group: pa.Table) -> pa.Table:
            g = group.sort_by(
                [(key_col, "ascending"), ("__rowhash", "ascending"), ("__side", "ascending")]
            )
            n = g.num_rows
            if n == 0:
                return out_schema.empty_table()
            k = g[key_col].combine_chunks()
            rh = np.asarray(g["__rowhash"])
            side = np.asarray(g["__side"])
            key_change = np.ones(n, dtype=bool)
            if n > 1:
                key_change[1:] = ~np.asarray(
                    pc.equal(k.slice(1), k.slice(0, n - 1))
                )
            run_start = key_change.copy()
            if n > 1:
                run_start[1:] |= rh[1:] != rh[:-1]
            run_id = np.cumsum(run_start) - 1
            n_runs = int(run_id[-1]) + 1 if n else 0
            n_old = np.bincount(run_id, weights=(side == 0), minlength=n_runs).astype(np.int64)
            n_new = np.bincount(run_id, weights=(side == 1), minlength=n_runs).astype(np.int64)
            run_first = np.zeros(n_runs, dtype=np.int64)
            run_first[run_id[run_start]] = np.flatnonzero(run_start)
            pos = np.arange(n, dtype=np.int64) - run_first[run_id]
            net = n_new - n_old
            # identical rows cancel pairwise; keep the surplus only
            keep = np.where(
                side == 0,
                pos < -net[run_id],  # old surplus -> delete candidates
                (pos - n_old[run_id]) < net[run_id],  # new surplus -> inserts
            )
            # classify: a key with surviving rows on BOTH sides is an update
            key_id = np.cumsum(key_change) - 1
            n_keys = int(key_id[-1]) + 1 if n else 0
            old_kept = np.bincount(key_id, weights=keep & (side == 0), minlength=n_keys)
            new_kept = np.bincount(key_id, weights=keep & (side == 1), minlength=n_keys)
            both = (old_kept > 0) & (new_kept > 0)
            labels = np.where(
                side == 0,
                np.where(both[key_id], "update_preimage", "delete"),
                np.where(both[key_id], "update_postimage", "insert"),
            )
            out = g.filter(pa.array(keep)).drop_columns(["__side", "__rowhash", "__bucket"])
            # Ray's sort/groupby may widen list columns; pin the output to
            # the declared table schema so the feed is type-stable
            out = conform_table(out, schema)
            return out.append_column("_change_type", pa.array(labels[keep]))

        return (
            olds.union(news)
            .groupby("__bucket")
            .map_groups(diff_bucket, batch_format="pyarrow")
        )

    def apply_changes(
        self,
        feed: pa.Table | ray.data.Dataset,
        job_id: str | None = None,
    ) -> int | None:
        """Consume a change data feed (the output of ``changes()``) to
        replicate another table's commits onto this one — the CDC-apply
        half of Delta's ``MERGE INTO target USING table_changes(...)``
        replication recipe.  Upserts (``insert`` + ``update_postimage``
        rows) apply through ``merge()``; ``delete`` rows apply as a key
        DELETE; ``update_preimage`` rows are informational and dropped.
        Net effect: ``source.scan() == replica.scan()`` after applying
        ``source.changes(v_last_synced)`` — the incremental-sync loop a
        downstream mirror runs instead of re-copying the table."""
        key_col = self.key_col
        if isinstance(feed, pa.Table):
            feed = ray.data.from_arrow(feed) if feed.num_rows else None
        if feed is None:
            return None

        schema = self.schema

        def _upserts(t: pa.Table) -> pa.Table:
            if "_change_type" not in t.column_names:  # empty groupby block
                return schema.empty_table()
            return t.filter(
                pc.is_in(
                    t["_change_type"],
                    value_set=pa.array(["insert", "update_postimage"]),
                )
            ).drop_columns(["_change_type"])

        def _key_rows(t: pa.Table) -> pa.Table:
            # tiny projection: (key, is_delete/is_upsert flags) per row
            if "_change_type" not in t.column_names:  # empty groupby block
                return pa.table(
                    {
                        key_col: pa.array([], pa.string()),
                        "__is_delete": pa.array([], pa.bool_()),
                    }
                )
            ct = t["_change_type"]
            keep = pc.is_in(
                ct, value_set=pa.array(["delete", "insert", "update_postimage"])
            )
            t = t.filter(keep)
            return pa.table(
                {
                    key_col: t[key_col],
                    "__is_delete": pc.equal(t["_change_type"], "delete"),
                }
            )

        # the upsert side stays a STREAM into merge (its shuffle regime
        # handles feeds that don't fit the driver); only the (small)
        # key+flag projection is collected, to compute net deletes —
        # an updated key appears as preimage+postimage, so a key is dead
        # only if it has a delete row and no postimage/insert row
        keyflags = pa.concat_tables(
            [
                b
                for b in ray.get(
                    feed.map_batches(
                        _key_rows, batch_format="pyarrow", zero_copy_batch=True
                    ).to_arrow_refs()
                )
                if b.num_rows
            ]
            or [pa.table({key_col: pa.array([], pa.string()),
                          "__is_delete": pa.array([], pa.bool_())})]
        )
        is_del = np.asarray(keyflags["__is_delete"])
        keys_np = np.asarray(keyflags[key_col])
        dead = sorted(set(keys_np[is_del]) - set(keys_np[~is_del]))
        n_upserts = int((~is_del).sum())
        version = None
        if n_upserts:
            upserts = feed.map_batches(
                _upserts, batch_format="pyarrow", zero_copy_batch=True
            )
            version = self.merge(
                upserts, job_id=None if job_id is None else f"{job_id}-upsert"
            )
        if dead:
            v = self.delete(
                keys=dead,
                job_id=None if job_id is None else f"{job_id}-delete",
            )
            version = v if v is not None else version
        return version

    # ---- RESTORE --------------------------------------------------------
    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` as a NEW commit (Delta
        RESTORE semantics): the restored state becomes the latest snapshot
        while history is preserved — time travel to the undone versions
        still works until they expire.  Purely a manifest operation: adds
        = the target version's file set, removes = files live now but not
        then; no data is read or written (restored files still exist
        unless vacuumed — a vacuumed version cannot be restored)."""
        target = {f.path: f for f in self.files(version)}
        missing = [p for p in target if not (self.root / p).is_file()]
        if missing:
            raise FileNotFoundError(
                f"cannot restore v{version}: {len(missing)} files vacuumed, "
                f"e.g. {missing[0]}"
            )
        current = {f.path for f in self.files()}
        adds = [f.to_action() for p, f in sorted(target.items()) if p not in current]
        removes = [p for p in sorted(current) if p not in target]
        return self.log.commit(
            adds + [{"op": "remove", "path": p} for p in removes],
            "restore",
            job_id=f"restore-to-v{version}-from-v{self.version()}",
            extra={"restored_version": version},
        )

    # ---- named refs (tags) -------------------------------------------------
    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under a name (Iceberg tag analog; the reference's
        Delta layer exposes the same retention idea via checkpointed
        versions, README.md:176).  Tagged snapshots survive
        ``expire_snapshots`` (consolidated into self-contained base islands)
        and ``vacuum`` never reclaims their files; read one back with
        ``scan(tag=name)``.  Returns the pinned version."""
        v = self.version() if version is None else version
        self.log.set_ref(name, v)
        return v

    def tags(self) -> dict[str, int]:
        return self.log.refs()

    def drop_tag(self, name: str) -> None:
        """Remove a tag; the snapshot becomes subject to normal retention
        at the NEXT ``expire_snapshots`` (nothing is deleted here)."""
        self.log.delete_ref(name)

    # ---- CLONE ------------------------------------------------------------
    def clone(self, target_root: str, version: int | None = None) -> "Table":
        """Shallow CLONE (Delta ``CREATE TABLE ... SHALLOW CLONE`` analog):
        a new table whose first snapshot references this table's data files
        (and deletion vectors) by ABSOLUTE path — zero data copied, O(file
        count) manifest write.  Every subsequent op on the clone rewrites
        copy-on-write into the clone's own root, so the tables diverge
        without ever touching each other's files; the clone's ``vacuum``
        globs only under its own root, so external source files can never
        be reclaimed by the clone.  The source's per-file Bloom sidecars
        are carried over (re-keyed to the absolute paths) so MERGE/DELETE
        file-skipping works on the clone from the first commit.

        Same caveat as Delta: vacuuming or expiring the SOURCE table can
        remove files a shallow clone still references — promote a clone
        with ``compact()`` (rewrites everything locally) before retiring
        the source."""
        v = self.version() if version is None else version
        src_root = self.root.resolve()
        t = Table.create(
            target_root,
            schema=self.schema,
            partition_col=self.partition_col,
            key_col=self.key_col,
            constraints=self.constraints,
            column_mapping=self.column_mapping,
            retired_physical=self.retired_physical,
            stats_cols=self.stats_cols,
        )
        if len(self.partition_specs) > 1:
            t.partition_specs = list(self.partition_specs)
            t.partition_col = self.partition_col
            t._persist_schema_meta()
        src_files = self.files(v)
        adds = []
        for f in src_files:
            a = f.to_action()
            a["path"] = str(src_root / f.path)
            if f.dv:
                a["dv"] = str(src_root / f.dv)
            adds.append(a)
        new_v = t.log.commit(
            adds,
            "clone",
            job_id=f"clone-v{v}-of-{src_root}",
            extra={"cloned_from": str(src_root), "source_version": v},
        )
        live = self.blooms(v)
        if live:
            import os as _os
            import uuid as _uuid

            import pyarrow.parquet as pq

            d = t.root / "_blooms"
            d.mkdir(parents=True, exist_ok=True)
            paths = sorted(live)
            tbl = pa.table(
                {
                    "path": pa.array([str(src_root / p) for p in paths], pa.string()),
                    "bloom": pa.array([live[p] for p in paths], pa.binary()),
                }
            )
            tmp = d / f".tmp-{_uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, tmp, compression="zstd")
            _os.replace(tmp, d / f"v{new_v:06d}.parquet")
        return t

    # ---- retention ------------------------------------------------------
    def rewrite_manifests(self, version: int | None = None) -> None:
        """Consolidate a version's manifest into base form (no replay) and
        collapse the Bloom sidecars to one file covering only live paths
        (stale entries for rewritten files otherwise accumulate forever)."""
        v = version if version is not None else self.version()
        self.log.materialize_version(v)
        live = self.blooms(v)
        d = self.root / "_blooms"
        if not d.is_dir():
            return
        old = sorted(d.glob("v*.parquet"))
        import shutil as _shutil

        units_dir = d / "units"
        if live:
            import os as _os
            import uuid as _uuid

            import pyarrow.parquet as pq

            tbl = pa.table(
                {
                    "path": pa.array(sorted(live), pa.string()),
                    "bloom": pa.array([live[p] for p in sorted(live)], pa.binary()),
                }
            )
            tmp = d / f".tmp-{_uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, tmp, compression="zstd")
            _os.replace(tmp, d / f"v{v:06d}.parquet")
        for f in old:
            if f.name != f"v{v:06d}.parquet":
                f.unlink(missing_ok=True)
        if units_dir.is_dir():
            _shutil.rmtree(units_dir, ignore_errors=True)

    def expire_snapshots(
        self, keep_last: int | None = None, older_than: float | None = None
    ) -> list[int]:
        """Snapshot retention: count-based (``keep_last``) and/or age-based
        (``older_than`` UNIX seconds — the Delta ``logRetentionDuration`` /
        Iceberg ``expire_snapshots(older_than=...)`` analog)."""
        return self.log.expire(keep_last, older_than=older_than)

    DEFAULT_VACUUM_MIN_AGE = 24 * 3600.0

    def vacuum(
        self, dry_run: bool = False, min_age_seconds: float | None = None
    ) -> list[str]:
        """Delete data files referenced by NO retained snapshot (post-expire
        garbage + crashed-job orphans).  ``min_age_seconds`` guards files an
        in-flight job may be about to commit; the default (24 h, mirroring
        Delta's retention-guard stance) means a vacuum run concurrent with
        an in-flight maintenance job can never delete that job's
        not-yet-committed output — pass ``0.0`` explicitly for scratch
        tables where immediate reclamation is wanted."""
        if min_age_seconds is None:
            min_age_seconds = self.DEFAULT_VACUUM_MIN_AGE
        referenced: set[str] = set()
        for v in self.log.versions():
            try:
                for f in self.files(v):
                    referenced.add(f.path)
                    if f.dv:
                        referenced.add(f.dv)
            except FileNotFoundError:
                continue
        removed: list[str] = []
        now = time.time()
        candidates = list(self.root.glob(f"{self.partition_col}=*/*.parquet")) + list(
            self.root.glob("_dv/*.parquet")  # superseded/expired deletion vectors
        )
        for p in candidates:
            rel = str(p.relative_to(self.root))
            # .tmp-* files are half-written leftovers of a crashed writer
            # (temp + rename protocol) — never referenced, always garbage
            if rel in referenced and not p.name.startswith(".tmp-"):
                continue
            if now - p.stat().st_mtime < min_age_seconds:
                continue
            removed.append(rel)
            if not dry_run:
                p.unlink()
        # crashed-job scatter scratch: ``_zorder_scatter`` stages per-bucket
        # IPC fragments under _scratch/<job_id> and removes them on commit;
        # a SIGKILL between the scatter phase and the commit orphans the
        # whole directory.  A COMMITTED job's leftover scratch (crash after
        # commit, before cleanup) is garbage immediately; an uncommitted
        # job's scratch is a resumable in-flight plan, so it only falls to
        # the age guard (a rerun inside the window resumes it instead).
        import shutil as _shutil

        scratch_root = self.root / "_scratch"
        if scratch_root.is_dir():
            for d in sorted(scratch_root.iterdir()):
                if not d.is_dir():
                    continue
                committed = self.log.find_commit_by_job(d.name) is not None
                newest = max(
                    (p.stat().st_mtime for p in d.rglob("*") if p.is_file()),
                    default=d.stat().st_mtime,
                )
                if committed or now - newest >= min_age_seconds:
                    removed.append(str(d.relative_to(self.root)))
                    if not dry_run:
                        _shutil.rmtree(d, ignore_errors=True)
        return sorted(removed)
