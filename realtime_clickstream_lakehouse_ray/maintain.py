"""Maintenance job CLI — the engine's restatement of the reference's Glue
job entry point (``run_glue_job``, /root/reference/etl/glue_stream.py:375-426):
resolve args -> session -> plan -> run ops -> verify -> log runtime.

Run via ``ray job submit -- python -m realtime_clickstream_lakehouse_ray.maintain
--table /path/tokens --ops compact,zorder,merge,expire`` (or directly; a
local session is created only if none exists — the driver/bench own theirs).

Exit code 0 on success; each op commits independently, so a crashed run
resumes from the last committed snapshot (checkpoint manifests skip
finished units).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Run maintenance ops on a tokens table")
    p.add_argument(
        "--table",
        required=True,
        help="table root directory, or a catalog table NAME when --catalog "
        "is given",
    )
    p.add_argument(
        "--catalog",
        help="catalog root directory (state/catalog.py registry — the Glue "
        "Data Catalog analog); makes --table resolve by name",
    )
    p.add_argument(
        "--ops",
        default="compact,zorder",
        help="comma list: compact,auto-optimize,zorder,merge,update,delete (supports --where),dedup-rows,evolve-partitioning,materialize-deletes,restore,rewrite-manifests,changes,tag,drop-tag,metrics,clustering-report,expire,vacuum",
    )
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument(
        "--compact-partitions",
        help="comma list scoping the compact op (OPTIMIZE ... WHERE analog)",
    )
    p.add_argument(
        "--tag-name",
        help="snapshot name for the tag / drop-tag ops (tagged snapshots "
        "survive expire + vacuum)",
    )
    p.add_argument(
        "--tag-version", type=int, default=None,
        help="version to tag (default: current)",
    )
    p.add_argument(
        "--zorder-incremental",
        action="store_true",
        help="cluster only files not already clustered under the current signature",
    )
    p.add_argument("--merge-source", help="parquet file/dir with the MERGE source rows")
    p.add_argument(
        "--merge-sequence-col",
        help="SEQUENCE BY column for the merge op: matched rows are "
        "replaced only by strictly-newer source rows (out-of-order CDC "
        "events are suppressed)",
    )
    p.add_argument("--delete-partitions", help="comma list for the delete op")
    p.add_argument("--delete-min-n-tok", type=int, default=None)
    p.add_argument("--delete-max-n-tok", type=int, default=None)
    p.add_argument(
        "--delete-keys-file",
        help="newline-separated doc_id list for a key delete",
    )
    p.add_argument(
        "--delete-mode",
        default="cow",
        choices=["cow", "mor"],
        help="cow = copy-on-write rewrite; mor = deletion-vector tombstones",
    )
    p.add_argument(
        "--partition-by",
        help="new partition column for the evolve-partitioning op "
        "(metadata-only; compaction migrates the layout)",
    )
    p.add_argument(
        "--where",
        help="conjunctive predicate string for the delete/update ops "
        "(DELETE FROM ... WHERE analog; see functions/predicate.py for "
        "the grammar)",
    )
    p.add_argument(
        "--update-rules",
        help='JSON list of set-rules for the update op, e.g. '
        '\'[{"column":"source","op":"suffix","value":"-u"}]\'',
    )
    p.add_argument(
        "--changes-from",
        type=int,
        default=None,
        help="from-version for the changes op (change data feed row counts)",
    )
    p.add_argument("--keep-last", type=int, default=3, help="snapshots kept by expire")
    p.add_argument(
        "--expire-older-than-seconds", type=float, default=None,
        help="age-based retention for expire: versions committed more than "
        "this many seconds ago expire (combines with --keep-last, keeping "
        "the MORE conservative set)",
    )
    p.add_argument("--restore-version", type=int, default=None, help="target for the restore op")
    p.add_argument(
        "--vacuum-min-age-seconds",
        type=float,
        default=None,
        help="age guard for vacuum (default: the table's 24h safety guard)",
    )
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    from realtime_clickstream_lakehouse_ray.config import cap_worker_thread_pools

    cap_worker_thread_pools()  # before ray.init: workers inherit the env
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from realtime_clickstream_lakehouse_ray.config import tune_context
    from realtime_clickstream_lakehouse_ray.pipelines.table import Table

    tune_context()
    if args.catalog:
        from realtime_clickstream_lakehouse_ray.state.catalog import Catalog

        table = Catalog(args.catalog).table(args.table)
    else:
        table = Table.load(args.table)
    t0 = time.perf_counter()
    v_start = table.version()
    results: dict[str, object] = {}
    for op in [o.strip() for o in args.ops.split(",") if o.strip()]:
        if op == "compact":
            results[op] = table.compact(
                target_file_bytes=args.target_file_mb << 20,
                partitions=(
                    [x.strip() for x in args.compact_partitions.split(",")]
                    if args.compact_partitions
                    else None
                ),
            )
        elif op == "zorder":
            results[op] = table.zorder(
                target_file_bytes=args.target_file_mb << 20,
                incremental=args.zorder_incremental,
            )
        elif op == "merge":
            if not args.merge_source:
                p.error("--merge-source required for the merge op")
            import pyarrow.parquet as pq

            results[op] = table.merge(
                pq.read_table(args.merge_source),
                sequence_col=args.merge_sequence_col,
            )
        elif op == "delete":
            if not (
                args.delete_partitions
                or args.delete_keys_file
                or args.delete_min_n_tok is not None
                or args.delete_max_n_tok is not None
                or args.where
            ):
                p.error(
                    "delete op needs --where / --delete-partitions / "
                    "--delete-keys-file / --delete-min-n-tok / "
                    "--delete-max-n-tok"
                )
            keys = None
            if args.delete_keys_file:
                keys = [
                    k.strip()
                    for k in Path(args.delete_keys_file).read_text().splitlines()
                    if k.strip()
                ]
            results[op] = table.delete(
                keys=keys,
                partitions=(
                    [x.strip() for x in args.delete_partitions.split(",")]
                    if args.delete_partitions
                    else None
                ),
                min_n_tok=args.delete_min_n_tok,
                max_n_tok=args.delete_max_n_tok,
                mode=args.delete_mode,
                where=args.where,
            )
        elif op == "update":
            if not args.update_rules:
                p.error("--update-rules required for the update op")
            results[op] = table.update(
                json.loads(args.update_rules),
                partitions=(
                    [x.strip() for x in args.delete_partitions.split(",")]
                    if args.delete_partitions
                    else None
                ),
                min_n_tok=args.delete_min_n_tok,
                max_n_tok=args.delete_max_n_tok,
                where=args.where,
            )
        elif op == "changes":
            if args.changes_from is None:
                p.error("--changes-from required for the changes op")
            import numpy as np

            feed = table.changes(args.changes_from)
            counts: dict[str, int] = {}
            for b in feed.iter_batches(batch_format="pyarrow"):
                if b.num_rows:
                    vals, ns = np.unique(
                        np.asarray(b["_change_type"]), return_counts=True
                    )
                    for t_, n_ in zip(vals, ns):
                        counts[str(t_)] = counts.get(str(t_), 0) + int(n_)
            results[op] = counts
        elif op == "evolve-partitioning":
            if not args.partition_by:
                p.error("--partition-by required for evolve-partitioning")
            table.evolve_partitioning(args.partition_by)
            results[op] = table.partition_col
        elif op == "dedup-rows":
            results[op] = table.dedup_rows(mode=args.delete_mode)
        elif op == "materialize-deletes":
            results[op] = table.materialize_deletes()
        elif op == "restore":
            if args.restore_version is None:
                p.error("--restore-version required for the restore op")
            results[op] = table.restore(args.restore_version)
        elif op == "rewrite-manifests":
            table.rewrite_manifests()
            results[op] = table.version()
        elif op == "expire":
            older = (
                time.time() - args.expire_older_than_seconds
                if args.expire_older_than_seconds is not None
                else None
            )
            results[op] = table.expire_snapshots(
                keep_last=args.keep_last, older_than=older
            )
        elif op == "tag":
            if not args.tag_name:
                p.error("--tag-name required for the tag op")
            results[op] = table.tag(args.tag_name, version=args.tag_version)
        elif op == "drop-tag":
            if not args.tag_name:
                p.error("--tag-name required for the drop-tag op")
            table.drop_tag(args.tag_name)
            results[op] = table.tags()
        elif op == "auto-optimize":
            results[op] = table.auto_optimize(
                target_file_bytes=args.target_file_mb << 20
            )
        elif op == "clustering-report":
            results[op] = table.clustering_report().to_pylist()
        elif op == "metrics":
            results[op] = table.metrics()
        elif op == "vacuum":
            results[op] = len(
                table.vacuum(min_age_seconds=args.vacuum_min_age_seconds)
            )
        else:
            p.error(f"unknown op: {op}")

    # per-op phase timing surface (Table.metrics() rides the snapshot log):
    # a human-readable table on stderr — where a slow job spent its time —
    # and the same rows machine-readable in the status JSON
    op_metrics = [
        {
            "version": r["version"],
            "operation": r["operation"],
            "duration_sec": r.get("duration_sec"),
            "rows_per_sec": r.get("rows_per_sec"),
            "phases": r.get("phases") or {},
        }
        for r in table.metrics()
        if r["version"] > v_start
    ]
    for r in op_metrics:
        phases = " ".join(f"{k}={v:.3f}s" for k, v in r["phases"].items())
        dur = f"{r['duration_sec']:.3f}s" if r["duration_sec"] is not None else "-"
        print(
            f"[metrics] v{r['version']} {r['operation']}: total={dur}"
            + (f"  {phases}" if phases else ""),
            file=sys.stderr,
        )

    # post-write verification (reference K3, glue_stream.py:357-372):
    # every file of the final snapshot must exist with consistent stats
    missing = [f.path for f in table.files() if not (table.root / f.path).is_file()]
    status = {
        "table": str(table.root),
        "version": table.version(),
        "ops": results,
        "rows": table.stats()["rows"],
        "missing_files": missing,
        "op_metrics": op_metrics,
        "runtime_sec": round(time.perf_counter() - t0, 3),
    }
    print(json.dumps(status))
    return 0 if not missing else 1


if __name__ == "__main__":
    sys.exit(main())
