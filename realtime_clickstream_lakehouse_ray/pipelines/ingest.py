"""Composed click-ingest job: the reference's primary pipeline end to end.

The reference's processing path (SURVEY.md §3.2; ``run_glue_job``,
/root/reference/etl/glue_stream.py:375-426) drains everything currently in
the stream (``trigger(availableNow=True)``), validates/enriches/conforms,
and appends to a partitioned Delta table exactly once per micro-batch
(streaming checkpoint + Glue job bookmark, glue_stream.py:344 +
glue/main.tf:90).  This module is that job on Ray Data:

- "the stream" = the set of JSON-lines files visible under ``paths`` right
  now (availableNow semantics — drain and stop);
- the bookmark = ``source_files`` recorded on every ingest commit; files
  already named by ANY committed ingest are skipped, so reruns and crashed
  reruns are exactly-once at file granularity;
- validate → enrich → conform → reject-split is the vectorized chain in
  ``sources/clicks.py`` (M1-M9);
- the sink is a snapshot-committed engine Table partitioned by
  ``event_date`` (reference K2: ``partitionBy("event_date")`` Delta append)
  with per-file stats in the commit, and reject counts on the commit
  payload (reference M1's 400-path, kept as data).
"""

from __future__ import annotations

from pathlib import Path

import ray.data

from realtime_clickstream_lakehouse_ray.sources.clicks import (
    OUT_SCHEMA,
    read_click_json,
    split_rejects,
)
from realtime_clickstream_lakehouse_ray.pipelines.table import Table

CLICKS_PARTITION_COL = "event_date"
CLICKS_KEY_COL = "request_id"


def clicks_table(root: str) -> Table:
    """Create-or-load the clicks table (OUT_SCHEMA, event_date-partitioned)."""
    if (Path(root) / "_table.json").exists():
        return Table.load(root)
    return Table.create(
        root,
        schema=OUT_SCHEMA,
        partition_col=CLICKS_PARTITION_COL,
        key_col=CLICKS_KEY_COL,
        # data-skipping index on the event timestamp: day partitions give
        # coarse pruning, event_ts [min, max] lets scan(where=) skip files
        # WITHIN a day for narrow time-range reads
        stats_cols=("event_ts",),
    )


def ingested_files(table: Table) -> set[str]:
    """The job bookmark: union of source_files over all committed ingests."""
    out: set[str] = set()
    for v in table.log.versions():
        out.update(table.log.read_version(v).get("source_files", []))
    return out


def ingest_clicks(
    paths: str | list[str],
    table_root: str,
    ingest_ts: str = "1970-01-01T00:00:00Z",
    rows_per_file: int | None = None,
    max_files_per_trigger: int | None = None,
) -> dict:
    """Drain currently-visible click JSON files into the clicks table.

    ``max_files_per_trigger`` bounds one micro-batch (the Spark
    ``maxFilesPerTrigger`` option the reference's availableNow trigger
    composes with, glue_stream.py trigger config): at most that many
    not-yet-ingested files commit per call, oldest-path-first, so a
    backlogged bucket drains in bounded-size exactly-once commits instead
    of one giant job — call in a loop until ``files == 0`` to drain.

    Returns ``{version, files, rows, rejects, remaining}``; a rerun over
    the same files is a no-op (``version`` None, ``files`` 0) — the
    bookmark makes ingestion exactly-once per input file even across
    crashes, because the bookmark and the data files land in one atomic
    commit.
    """
    if isinstance(paths, (str, Path)):
        p = Path(paths)
        files = sorted(str(f) for f in p.glob("*.json*")) if p.is_dir() else [str(p)]
    else:
        files = sorted(str(f) for f in paths)

    table = clicks_table(table_root)
    todo = sorted(set(files) - ingested_files(table))
    remaining = 0
    if max_files_per_trigger is not None:
        if max_files_per_trigger < 1:
            raise ValueError("max_files_per_trigger must be >= 1")
        remaining = max(0, len(todo) - max_files_per_trigger)
        todo = todo[:max_files_per_trigger]
    if not todo:
        return {"version": None, "files": 0, "rows": 0, "rejects": 0,
                "remaining": 0}

    ds = read_click_json(todo, ingest_ts=ingest_ts)
    valid, rejects = split_rejects(ds)
    n_rejects = rejects.count()
    rows_before = table.stats()["rows"]
    # appending zero valid rows still commits: the bookmark must advance so
    # all-malformed files are not re-parsed forever
    version = table.append(
        valid,
        rows_per_file=rows_per_file,
        extra={"source_files": todo, "rejects": n_rejects},
    )
    return {
        "version": version,
        "files": len(todo),
        "rows": table.stats(version)["rows"] - rows_before,
        "rejects": n_rejects,
        "remaining": remaining,
    }


def ingest_clicks_continuous(
    paths: str | list[str],
    table_root: str,
    interval_seconds: float = 10.0,
    max_triggers: int | None = None,
    stop_after_idle_triggers: int | None = None,
    max_files_per_trigger: int | None = None,
    ingest_ts: str = "1970-01-01T00:00:00Z",
    rows_per_file: int | None = None,
    on_trigger=None,
) -> list[dict]:
    """processingTime-style micro-batch loop: repeatedly drain the source
    directory at a fixed cadence — the one streaming trigger mode the
    availableNow job (``ingest_clicks``) does not cover (Spark
    ``trigger(processingTime=...)`` vs the reference's
    ``trigger(availableNow=True)``, glue_stream.py:347).

    Each trigger is one exactly-once micro-batch: ``ingest_clicks`` with
    the per-commit file bookmark, bounded by ``max_files_per_trigger``.
    Cadence is ANCHORED (Spark semantics): trigger k fires at
    ``start + k * interval``; a batch that overruns its slot is followed
    immediately, the loop never drifts.  A SIGKILL mid-trigger loses at
    most the uncommitted batch — the rerun's bookmark skips every file a
    committed trigger already named.

    Stopping (any may be combined; at least one bound is required so the
    loop cannot be silently infinite in library use):
    - ``max_triggers``: hard trigger-count bound;
    - ``stop_after_idle_triggers``: stop after N consecutive triggers that
      found nothing to ingest (the drain-then-park pattern);
    - ``on_trigger(index, result) -> False``: caller veto (also the test
      hook for dropping new files between triggers).

    Returns the per-trigger result dicts (``ingest_clicks`` shape)."""
    import time

    if max_triggers is None and stop_after_idle_triggers is None:
        raise ValueError(
            "bound the loop: pass max_triggers and/or stop_after_idle_triggers"
        )
    results: list[dict] = []
    idle_run = 0
    start = time.monotonic()
    k = 0
    while True:
        res = ingest_clicks(
            paths,
            table_root,
            ingest_ts=ingest_ts,
            rows_per_file=rows_per_file,
            max_files_per_trigger=max_files_per_trigger,
        )
        results.append(res)
        idle_run = idle_run + 1 if res["files"] == 0 else 0
        k += 1
        if on_trigger is not None and on_trigger(k - 1, res) is False:
            break
        if max_triggers is not None and k >= max_triggers:
            break
        if (
            stop_after_idle_triggers is not None
            and idle_run >= stop_after_idle_triggers
        ):
            break
        if res["remaining"] == 0:  # nothing queued: hold the cadence
            next_fire = start + k * interval_seconds
            delay = next_fire - time.monotonic()
            if delay > 0:
                time.sleep(delay)
    return results
