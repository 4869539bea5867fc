"""Stateful actor-pool stages that rewrite data files copy-on-write.

These are the engine's equivalent of the rewrite work Delta's OPTIMIZE /
MERGE do inside Spark tasks (capabilities the reference delegates to its
Delta 1.2 JAR — SURVEY.md §2.12).  Each unit of work is a *bin*: a set of
co-located input files in one partition that is read, transformed and
written back as exactly one deterministic output file.  Units run as an
actor pool over a tiny dataset of JSON bin descriptors
(``ray.data.from_items(...).map_batches(BinRewriter, ...)``) — the data
plane (reading the Parquet, filtering, writing) happens inside the actor,
bounded by the bin's target byte size, so no shuffle is needed and the
driver only ever sees stats rows.

Resumability: before doing any work a unit consults the job's checkpoint
manifest (``state/checkpoint.py``); a unit whose lineage record exists and
whose output file is present is skipped and its recorded stats re-emitted.
Output files are written temp + rename to a per-unit deterministic path, so
a crashed half-write is invisible and a retried unit simply overwrites.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from realtime_clickstream_lakehouse_ray.schema import conform_table
from realtime_clickstream_lakehouse_ray.stages.writer import (
    entries_to_table,
    file_stats,
    write_file_atomic,
)
from realtime_clickstream_lakehouse_ray.state.checkpoint import JobCheckpoint
from realtime_clickstream_lakehouse_ray.state.log import FileEntry

SPEC_SCHEMA = pa.schema([("spec", pa.string())])


def apply_update_rules(tbl: pa.Table, mask: pa.Array, rules: list[dict]) -> pa.Table:
    """Vectorized UPDATE ... SET: one ``pc.if_else`` per rule, masked rows
    get the new value, the rest pass through unchanged.  Rules are
    JSON-serializable dicts (they ride inside the bin spec):
    ``{"column": c, "op": "set"|"add"|"suffix"|"prefix", "value": v}``."""
    for r in rules:
        col = tbl[r["column"]]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        op, v = r["op"], r["value"]
        if op == "set":
            new = pa.scalar(v, type=col.type)
        elif op == "add":
            new = pc.cast(pc.add(col, v), col.type)
        elif op == "suffix":
            new = pc.binary_join_element_wise(col, pa.scalar(str(v)), "")
        elif op == "prefix":
            new = pc.binary_join_element_wise(pa.scalar(str(v)), col, "")
        else:
            raise ValueError(f"unknown update op {op!r}")
        updated = pc.if_else(mask, new, col)
        tbl = tbl.set_column(
            tbl.column_names.index(r["column"]), r["column"], pc.cast(updated, col.type)
        )
    return tbl


def make_spec_items(bins: list[dict]) -> list[dict]:
    """Bin descriptors -> rows for ray.data.from_items (JSON-encoded so the
    block schema stays a single string column)."""
    return [{"spec": json.dumps(b)} for b in bins]


class BinRewriter:
    """Actor: read a bin's input files, apply a transform, write one output
    file, persist the unit's lineage record, emit stats rows.

    ``mode``:
      - ``"compact"``  — concatenate inputs (bin-packing compaction)
      - ``"delete_keys"`` — drop rows whose key is in the broadcast key set
        (the copy-on-write half of MERGE INTO); a bin whose inputs contain
        no matching key re-emits the original file untouched (no rewrite,
        ``unchanged=True`` in the lineage record).
      - ``"merge_seq"`` — SEQUENCE BY merge: ``keys_ref`` holds
        ``(sorted_keys, aligned_seqs)``; a matched target row is dropped
        ONLY when the source's sequence is strictly newer than the target
        row's (``sequence_col``); matched-but-stale keys are reported in
        the unit record's ``suppressed`` list so the driver withholds
        those source rows from the append — the out-of-order-CDC guard
        (Delta DLT ``APPLY CHANGES ... SEQUENCE BY`` semantics).
    """

    def __init__(
        self,
        root: str,
        schema: pa.Schema,
        job_id: str,
        mode: str = "compact",
        keys_ref=None,  # ray.ObjectRef: sorted key array, or (keys, seqs)
        key_col: str = "doc_id",
        partition_col: str = "source",
        constraints: list[dict] | None = None,
        sequence_col: str | None = None,
        stats_cols: tuple[str, ...] = (),
    ):
        # each pool actor caps its Arrow thread pool: N actors x default
        # 32-thread pools oversubscribe the node and *degrade* with more
        # actors (measured: merge 12s@8cpus -> 44s@32cpus before the cap)
        pa.set_cpu_count(2)
        pa.set_io_thread_count(2)
        self.root = Path(root)
        self.schema = schema
        self.ckpt = JobCheckpoint(root, job_id)
        self.mode = mode
        self.key_col = key_col
        self.partition_col = partition_col
        self.constraints = constraints or []
        self.sequence_col = sequence_col
        self.stats_cols = tuple(stats_cols)
        self.keys = None
        self.seq_keys = None
        if keys_ref is not None:
            import ray

            # fetched + converted ONCE per actor (broadcast small side);
            # an Arrow array arrives plasma-zero-copy (the merge prep task
            # returns the key column directly)
            got = ray.get(keys_ref)
            if mode == "merge_seq":
                self.seq_keys = (np.asarray(got[0]), np.asarray(got[1]))
            elif isinstance(got, (pa.Array, pa.ChunkedArray)):
                self.keys = (
                    got.combine_chunks()
                    if isinstance(got, pa.ChunkedArray)
                    else got
                )
            else:
                self.keys = pa.array(got)

    # -- helpers ----------------------------------------------------------

    def _write_unit_bloom(self, unit, path: str, bloom: bytes) -> None:
        import os
        import uuid

        d = self.root / "_blooms" / "units" / self.ckpt.job_id
        d.mkdir(parents=True, exist_ok=True)
        tbl = pa.table(
            {
                "path": pa.array([path], pa.string()),
                "bloom": pa.array([bloom], pa.binary()),
            }
        )
        tmp = d / f".tmp-{uuid.uuid4().hex}.parquet"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, d / f"unit-{unit}.parquet")

    def _read_bin(self, files: list[str], dvs: dict[str, str] | None = None) -> pa.Table:
        """Read a bin's files, applying each file's deletion vector (if the
        spec carries one) so every rewrite materializes pending merge-on-read
        deletes — rewritten files come out clean and drop their DV entry."""
        tables = []
        for f in files:
            # memory_map=True: under the tmpfs multi-writer page artifact
            # (BASELINE.md) a microbench showed 1.6-1.9x faster N-way
            # parallel reads of N-writer-fresh files (mmap faults pages in
            # place instead of copying); on quiet windows it is neutral,
            # and on local filesystems it never hurts.
            t = pq.read_table(self.root / f, memory_map=True)
            dv_path = (dvs or {}).get(f)
            if dv_path:
                dead = pq.read_table(
                    self.root / dv_path, columns=[self.key_col], memory_map=True
                )
                t = t.filter(
                    pc.invert(
                        pc.is_in(t[self.key_col], value_set=dead[self.key_col].combine_chunks())
                    )
                )
            # conform PER FILE: a bin can mix pre- and post-evolution files
            # (added columns, widened types) whose schemas concat_tables
            # cannot merge even with promotion (e.g. list<int32> vs
            # list<int64>); after conforming, every part is identical
            tables.append(conform_table(t, self.schema))
        return pa.concat_tables(tables)

    def _emit(self, record: dict) -> list[FileEntry]:
        return [FileEntry.from_action(a) for a in record["adds"]]

    def _process_unit(self, spec: dict) -> dict:
        import time as _time

        unit = spec["unit"]
        existing = self.ckpt.read_unit(unit)
        if existing is not None and all(
            (self.root / a["path"]).is_file()
            and (not a.get("dv") or (self.root / a["dv"]).is_file())
            for a in existing["adds"]
        ):
            return existing  # resume: unit already done, reuse its outputs

        t_unit = _time.perf_counter()

        def _stamp(record: dict) -> dict:
            # per-unit wall time in the lineage record: the observability
            # hook for straggler diagnosis (unit_sec spread per job)
            record["unit_sec"] = round(_time.perf_counter() - t_unit, 3)
            return record

        if self.mode == "dv":
            record = _stamp(self._process_dv_unit(spec))
            self.ckpt.write_unit(unit, record)
            return record
        tbl = self._read_bin(spec["files"], spec.get("dvs"))
        removes = list(spec["files"])
        if self.mode == "merge_seq":
            record = _stamp(self._process_merge_seq_unit(spec, tbl, removes))
            self.ckpt.write_unit(unit, record)
            return record
        if self.mode == "merge_when":
            record = _stamp(self._process_merge_when_unit(spec, tbl, removes))
            self.ckpt.write_unit(unit, record)
            return record
        if self.mode in ("delete_keys", "delete_where", "update_where"):
            mask = self._predicate_mask(tbl, spec)
            n_match = pc.sum(mask).as_py() or 0
            # a bin carrying deletion vectors must always rewrite, even on a
            # stats false positive: _read_bin already folded the DV in, and
            # keeping the file unchanged would leave the tombstones pending
            # (and hide the source row this rewrite is reintroducing)
            if n_match == 0 and not spec.get("dvs"):
                # stats-range false positive: keep the file(s) as-is
                record = {
                    "unit": unit,
                    "partition": spec["partition"],
                    "inputs": spec["files"],
                    "unchanged": True,
                    "adds": [],
                    "removes": [],
                    "rows": tbl.num_rows,
                }
                self.ckpt.write_unit(unit, _stamp(record))
                return record
            if self.mode == "update_where":
                record = _stamp(self._write_update_unit(spec, tbl, mask, removes))
                self.ckpt.write_unit(unit, record)
                return record
            tbl = tbl.filter(pc.invert(mask))

        if self.mode == "compact" and spec.get("split_partition") and tbl.num_rows:
            # partition-evolution migration bin: rows were written under an
            # OLD partition spec; split the rewrite's output per CURRENT
            # partition value so the bin lands in the new hive layout.
            # Deterministic names (one file per partition value under the
            # unit's base name) keep the crash-rerun overwrite property.
            from realtime_clickstream_lakehouse_ray.stages.writer import (
                write_partitioned,
            )

            base = Path(spec["out"]).name[:-8]  # strip ".parquet"
            entries = write_partitioned(
                tbl,
                self.root,
                self.partition_col,
                name_fn=lambda part: f"{base}-mig.parquet",
                stats_cols=self.stats_cols,
            )
            adds = []
            for i, fe in enumerate(entries):
                adds.append(fe.to_action())
                if fe.bloom is not None:
                    self._write_unit_bloom(f"{unit}-m{i}", fe.path, fe.bloom)
            record = {
                "unit": unit,
                "partition": spec["partition"],
                "inputs": spec["files"],
                "unchanged": False,
                "adds": adds,
                "removes": removes,
                "rows": tbl.num_rows,
            }
            self.ckpt.write_unit(unit, _stamp(record))
            return record

        if self.mode == "compact" and spec.get("signature") and tbl.num_rows:
            # clustering-preserving compact: re-key the bin under its
            # inputs' (curve, dims) signature and sort, so the output file
            # is itself clustered and KEEPS the signature — OPTIMIZE after
            # Z-order never silently degrades the layout
            from realtime_clickstream_lakehouse_ray.stages.zkey import add_zkey

            keyed = add_zkey(
                tbl,
                tuple(spec["zdims"]),
                {k: tuple(v) for k, v in (spec.get("bounds") or {}).items()},
                spec["curve"],
                None,
                self.partition_col,
            )
            order = np.argsort(
                np.asarray(keyed["zkey"].combine_chunks()), kind="stable"
            )
            tbl = tbl.take(pa.array(order))
        out_rel = spec["out"]
        if tbl.num_rows == 0:
            adds = []
        else:
            nbytes = write_file_atomic(tbl, self.root / out_rel)
            fe = file_stats(
                tbl, out_rel, spec["partition"], nbytes,
                stats_cols=self.stats_cols,
            )
            if self.mode == "compact" and spec.get("signature"):
                fe.clustered = spec["signature"]
            adds = [fe.to_action()]
            if fe.bloom is not None:
                # per-unit Bloom sidecar: the lineage record is JSON and
                # must stay small, so the bitset rides a parquet next to
                # the version-level sidecars (Table.blooms reads both)
                self._write_unit_bloom(unit, fe.path, fe.bloom)
        record = {
            "unit": unit,
            "partition": spec["partition"],
            "inputs": spec["files"],
            "unchanged": False,
            "adds": adds,
            "removes": removes,
            "rows": tbl.num_rows,
        }
        self.ckpt.write_unit(unit, _stamp(record))
        return record

    def _process_merge_seq_unit(
        self, spec: dict, tbl: pa.Table, removes: list[str]
    ) -> dict:
        """SEQUENCE BY merge unit: drop a matched target row only when the
        source's sequence value is STRICTLY newer; matched-but-stale keys
        are reported as ``suppressed`` (the driver withholds those source
        rows from the append, so the older source row never replaces the
        newer target row — out-of-order CDC events cannot regress state)."""
        keys_sorted, seqs = self.seq_keys
        tkeys = np.asarray(tbl[self.key_col])
        idx = np.searchsorted(keys_sorted, tkeys)
        in_r = idx < len(keys_sorted)
        matched = np.zeros(len(tkeys), dtype=bool)
        matched[in_r] = keys_sorted[idx[in_r]] == tkeys[in_r]
        drop = np.zeros(len(tkeys), dtype=bool)
        if matched.any():
            tseq = np.asarray(tbl[self.sequence_col])
            drop[matched] = seqs[idx[matched]] > tseq[matched]
        suppressed = np.unique(tkeys[matched & ~drop]).tolist()
        if not drop.any() and not spec.get("dvs"):
            record = {
                "unit": spec["unit"],
                "partition": spec["partition"],
                "inputs": spec["files"],
                "unchanged": True,
                "adds": [],
                "removes": [],
                "rows": tbl.num_rows,
                "suppressed": suppressed,
            }
            return record
        out = tbl.filter(pa.array(~drop))
        adds = []
        if out.num_rows:
            nbytes = write_file_atomic(out, self.root / spec["out"])
            fe = file_stats(
                out, spec["out"], spec["partition"], nbytes,
                stats_cols=self.stats_cols,
            )
            adds = [fe.to_action()]
            if fe.bloom is not None:
                self._write_unit_bloom(spec["unit"], fe.path, fe.bloom)
        return {
            "unit": spec["unit"],
            "partition": spec["partition"],
            "inputs": spec["files"],
            "unchanged": False,
            "adds": adds,
            "removes": removes,
            "rows": out.num_rows,
            "suppressed": suppressed,
        }

    def _process_merge_when_unit(
        self, spec: dict, tbl: pa.Table, removes: list[str]
    ) -> dict:
        """Conditioned-MERGE unit (Delta ``WHEN MATCHED AND <cond> THEN
        UPDATE/DELETE``): a matched target row is dropped only when it
        satisfies the clause predicate (``when_conds``, physical names);
        the record reports per-key verdicts so the driver controls the
        source append —

        - ``applied``: matched keys whose row the clause dropped (for
          ``update`` these are the keys whose source rows DO insert when
          the NOT-MATCHED insert is off);
        - ``suppressed``: matched keys whose source row must NOT insert
          (clause-false keys under ``update``; ALL matched keys under
          ``delete`` — a matched-DELETE consumes its source row)."""
        from realtime_clickstream_lakehouse_ray.functions.predicate import (
            predicate_mask,
        )

        action = spec.get("when_action", "update")
        matched = pc.is_in(tbl[self.key_col], value_set=self.keys)
        cond = (
            predicate_mask(tbl, spec["when_conds"])
            if spec.get("when_conds")
            else pa.array(np.ones(tbl.num_rows, dtype=bool))
        )
        drop = pc.and_(matched, cond)
        m = np.asarray(matched)
        d = np.asarray(drop)
        tkeys = np.asarray(tbl[self.key_col])
        applied = np.unique(tkeys[d]).tolist()
        if action == "delete":
            suppressed = np.unique(tkeys[m]).tolist()
        else:
            suppressed = np.unique(tkeys[m & ~d]).tolist()
        if not d.any() and not spec.get("dvs"):
            return {
                "unit": spec["unit"],
                "partition": spec["partition"],
                "inputs": spec["files"],
                "unchanged": True,
                "adds": [],
                "removes": [],
                "rows": tbl.num_rows,
                "applied": applied,
                "suppressed": suppressed,
            }
        out = tbl.filter(pc.invert(drop))
        adds = []
        if out.num_rows:
            nbytes = write_file_atomic(out, self.root / spec["out"])
            fe = file_stats(
                out, spec["out"], spec["partition"], nbytes,
                stats_cols=self.stats_cols,
            )
            adds = [fe.to_action()]
            if fe.bloom is not None:
                self._write_unit_bloom(spec["unit"], fe.path, fe.bloom)
        return {
            "unit": spec["unit"],
            "partition": spec["partition"],
            "inputs": spec["files"],
            "unchanged": False,
            "adds": adds,
            "removes": removes,
            "rows": out.num_rows,
            "applied": applied,
            "suppressed": suppressed,
        }

    def _predicate_mask(self, tbl: pa.Table, spec: dict) -> pa.Array:
        """Row mask for the unit's predicate.  ``delete_keys`` is the MERGE
        delete half (key set only); the ``*_where`` modes take the
        conjunction of key-set (optional) and n_tok range (optional);
        partition predicates are resolved at planning time (a file is
        all-in or all-out)."""
        if self.mode == "delete_keys":
            return pc.is_in(tbl[self.key_col], value_set=self.keys)
        mask = pa.array(np.ones(tbl.num_rows, dtype=bool))
        if self.keys is not None:
            mask = pc.and_(mask, pc.is_in(tbl[self.key_col], value_set=self.keys))
        lo, hi = spec.get("min_n_tok"), spec.get("max_n_tok")
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(tbl["n_tok"], lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(tbl["n_tok"], hi))
        if spec.get("where"):
            # WHERE-string residual conditions (column refs already
            # translated to physical names by the planner); re-applying the
            # plan-extracted conditions here is an idempotent conjunction
            from realtime_clickstream_lakehouse_ray.functions.predicate import (
                predicate_mask,
            )

            mask = pc.and_(mask, predicate_mask(tbl, spec["where"]))
        return mask

    def _write_update_unit(
        self, spec: dict, tbl: pa.Table, mask: pa.Array, removes: list[str]
    ) -> dict:
        """UPDATE: apply the unit's set-rules to the matched rows, enforce
        the table's CHECK constraints on the result, and write the output —
        split per partition value when a rule rewrote the partition column
        (a partition-changing UPDATE moves rows between partitions)."""
        from realtime_clickstream_lakehouse_ray.functions.constraints import (
            check_batch,
        )

        upd = apply_update_rules(tbl, mask, spec["rules"])
        if self.constraints:
            check_batch(upd, self.constraints, key_col=self.key_col)
        out_base = spec["out"]
        adds = []
        part_col = self.partition_col
        touches_partition = any(r["column"] == part_col for r in spec["rules"])
        parts = (
            pc.unique(upd[part_col]).to_pylist()
            if touches_partition
            else [spec["partition"]]
        )
        for i, part in enumerate(sorted(map(str, parts))):
            sub = (
                upd.filter(pc.equal(upd[part_col], part))
                if touches_partition
                else upd
            )
            if sub.num_rows == 0:
                continue
            out_rel = (
                f"{part_col}={part}/{Path(out_base).name[:-8]}-p{i:03d}.parquet"
                if touches_partition
                else out_base
            )
            nbytes = write_file_atomic(sub, self.root / out_rel)
            fe = file_stats(
                sub, out_rel, part, nbytes, stats_cols=self.stats_cols
            )
            adds.append(fe.to_action())
            if fe.bloom is not None:
                self._write_unit_bloom(f"{spec['unit']}-{i}", fe.path, fe.bloom)
        return {
            "unit": spec["unit"],
            "partition": spec["partition"],
            "inputs": spec["files"],
            "unchanged": False,
            "adds": adds,
            "removes": removes,
            "rows": upd.num_rows,
        }

    def _process_dv_unit(self, spec: dict) -> dict:
        """Merge-on-read DELETE: tombstone the unit's matching keys in a
        deletion-vector sidecar instead of rewriting the data file.  The
        file's manifest entry is re-added with ``dv``/``dv_rows`` set (same
        path, same stats); the data file itself is untouched."""
        import os
        import uuid

        entry = spec["entry"]
        path = entry["path"]
        keys = pq.read_table(self.root / path, columns=[self.key_col], memory_map=True)[
            self.key_col
        ].combine_chunks()
        hit = pc.unique(keys.filter(pc.is_in(keys, value_set=self.keys)))
        old_dv = entry.get("dv")
        dead = hit
        if old_dv:
            prev = pq.read_table(
                self.root / old_dv, columns=[self.key_col], memory_map=True
            )[self.key_col]
            dead = pc.unique(pa.concat_arrays([hit, prev.combine_chunks()]))
        if len(hit) == 0:
            record = {
                "unit": spec["unit"],
                "partition": spec["partition"],
                "inputs": [path],
                "unchanged": True,
                "adds": [],
                "removes": [],
                "rows": 0,
            }
            return record
        out_rel = spec["dv_out"]
        out = self.root / out_rel
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = out.parent / f".tmp-{uuid.uuid4().hex}"
        pq.write_table(pa.table({self.key_col: dead.sort()}), tmp, compression="zstd")
        os.replace(tmp, out)
        add = dict(entry)
        add["dv"] = out_rel
        add["dv_rows"] = len(dead)
        add["op"] = "add"
        return {
            "unit": spec["unit"],
            "partition": spec["partition"],
            "inputs": [path],
            "unchanged": False,
            "adds": [add],
            "removes": [],
            "rows": len(hit),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        entries: list[FileEntry] = []
        for spec_json in batch.column("spec").to_pylist():
            record = self._process_unit(json.loads(spec_json))
            entries.extend(self._emit(record))
        return entries_to_table(entries)
