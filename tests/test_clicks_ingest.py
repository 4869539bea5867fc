"""Click-event JSON ingest conformance (reference M1/M2/M4/M7/M9 semantics
on the exact CLICK_SCHEMA payload, FIXTURES.md §3 edge rows included)."""

import json

import pyarrow as pa
import pytest

from realtime_clickstream_lakehouse_ray.schema import CLICK_SCHEMA
from realtime_clickstream_lakehouse_ray.sources.clicks import (
    OUT_SCHEMA,
    read_click_json,
    sample_collector,
    split_rejects,
)

CANONICAL = {
    "element": "button-signup",
    "page": "/landing-page",
    "userAgent": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "timestamp": "2023-09-15T14:30:45Z",
    "ingest_ts": "2023-09-15T14:30:46Z",
    "request_id": "test-req-123",
}


@pytest.fixture(scope="module")
def events_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("clicks")
    rows = [
        json.dumps(CANONICAL),
        json.dumps({**CANONICAL, "element": None}),  # -> "unknown"
        json.dumps({**CANONICAL, "timestamp": "2023-09-15T14:30:45.123Z"}),  # millis
        json.dumps({k: v for k, v in CANONICAL.items() if k != "timestamp"}),  # fallback
        "{this is not json",  # reject path
        json.dumps({"page": "/only-page"}),  # missing most fields -> null-fill
    ]
    f = d / "events.jsonl"
    f.write_text("\n".join(rows))
    return str(f)


def test_ingest_valid_and_reject_split(events_file):
    from realtime_clickstream_lakehouse_ray.util import to_arrow_table

    ds = read_click_json(events_file, ingest_ts="2024-01-01T00:00:00Z")
    valid, rejects = split_rejects(ds)
    vt = to_arrow_table(valid)
    assert vt.num_rows == 5
    assert rejects.count() == 1
    assert vt.schema == OUT_SCHEMA  # M9: byte-stable output projection


def test_conformance_semantics(events_file):
    from realtime_clickstream_lakehouse_ray.util import to_arrow_table

    ds = read_click_json(events_file, ingest_ts="2024-01-01T00:00:00Z")
    valid, _ = split_rejects(ds)
    vt = to_arrow_table(valid).sort_by("page")
    rows = vt.to_pylist()
    by_page = {}
    for r in rows:
        by_page.setdefault(r["page"], []).append(r)
    only = by_page["/only-page"][0]
    assert only["element"] == "unknown"  # M4 default partition key
    assert only["userAgent"] is None  # M9 typed null-fill
    assert only["ingest_ts"] == "2024-01-01T00:00:00Z"  # M2 enrichment
    assert only["request_id"].startswith("req-")
    landing = by_page["/landing-page"]
    ts = {str(r["event_ts"]) for r in landing}
    assert "2023-09-15 14:30:45" in ts  # M7 ISO parse
    assert "2023-09-15 14:30:45.123000" in ts  # [.SSS] variant
    assert "2023-09-15 14:30:46" in ts  # fallback -> ingest_ts chain
    assert all(str(r["event_date"]) == "2023-09-15" for r in landing)  # M8


def test_sample_collector(events_file):
    ds = read_click_json(events_file)
    sample = sample_collector(ds, n=3)
    assert len(sample) == 3 and all("status" in r for r in sample)


def test_click_schema_matches_fixture():
    assert [f.name for f in CLICK_SCHEMA] == [
        "element", "page", "userAgent", "timestamp", "ingest_ts", "request_id",
    ]
    assert all(f.type == pa.string() for f in CLICK_SCHEMA)


def test_composed_ingest_job_bookmark_and_partitioning(tmp_path_factory):
    """The reference's primary pipeline end-to-end: drain available files ->
    validate/enrich/conform -> event_date-partitioned table append, with
    exactly-once file-granular bookmark semantics (ingest.py)."""
    from realtime_clickstream_lakehouse_ray.pipelines import ingest
    from realtime_clickstream_lakehouse_ray.util import to_arrow_table

    d = tmp_path_factory.mktemp("ingestjob")
    f1 = d / "a.jsonl"
    f1.write_text(
        "\n".join(
            [
                json.dumps(CANONICAL),
                json.dumps({**CANONICAL, "timestamp": "2023-09-16T01:02:03Z"}),
                "{broken",
            ]
        )
    )
    root = str(d / "clicks_table")

    r1 = ingest.ingest_clicks([str(f1)], root, ingest_ts="2024-01-01T00:00:00Z")
    assert r1["files"] == 1 and r1["rows"] == 2 and r1["rejects"] == 1

    # rerun over the same files: bookmark makes it a no-op
    r2 = ingest.ingest_clicks([str(f1)], root)
    assert r2 == {"version": None, "files": 0, "rows": 0, "rejects": 0,
                  "remaining": 0}

    # new file arrives: only it is drained (availableNow incremental)
    f2 = d / "b.jsonl"
    f2.write_text(json.dumps({**CANONICAL, "timestamp": "2023-09-17T00:00:00Z"}))
    r3 = ingest.ingest_clicks([str(f1), str(f2)], root)
    assert r3["files"] == 1 and r3["rows"] == 1

    table = ingest.clicks_table(root)
    st = table.stats()
    assert st["rows"] == 3
    # Hive-style event_date partitions from the timestamp chain
    assert set(st["partitions"]) == {"2023-09-15", "2023-09-16", "2023-09-17"}
    # partition pruning at the read
    sub = to_arrow_table(table.scan(partitions=["2023-09-16"]))
    assert sub.num_rows == 1
    # snapshot commit carries the bookmark + reject lineage
    v1 = table.log.read_version(r1["version"])
    assert v1["source_files"] == [str(f1)] and v1["rejects"] == 1


def test_ingest_bookmark_survives_snapshot_expiry(tmp_path_factory):
    """Snapshot expiry consolidates the oldest retained version; the fold
    in ``SnapshotLog.materialize_version`` must carry every expired
    version's ``source_files`` so a rerun stays a no-op (no duplicate
    ingestion after retention maintenance)."""
    from realtime_clickstream_lakehouse_ray.pipelines import ingest

    d = tmp_path_factory.mktemp("ingestexp")
    files = []
    for i in range(3):
        f = d / f"part{i}.jsonl"
        f.write_text(json.dumps({**CANONICAL, "timestamp": f"2023-09-1{5 + i}T00:00:00Z"}))
        files.append(str(f))
    root = str(d / "clicks_table")

    for f in files:  # three separate ingest commits
        assert ingest.ingest_clicks([f], root)["files"] == 1

    table = ingest.clicks_table(root)
    expired = table.expire_snapshots(keep_last=1)
    assert expired  # the first two ingest commits' payloads are gone

    # bookmark survives the consolidation: full rerun is a no-op
    r = ingest.ingest_clicks(files, root)
    assert r == {"version": None, "files": 0, "rows": 0, "rejects": 0,
                 "remaining": 0}
    assert ingest.clicks_table(root).stats()["rows"] == 3

    # and a rewrite_manifests on its own also keeps it
    table.rewrite_manifests()
    r2 = ingest.ingest_clicks(files, root)
    assert r2["files"] == 0


def test_schema_inference_fallback_reader(tmp_path):
    """S3 (glue_stream.py:148-160): a well-formed file with an unexpected
    shape is read via inferred schema instead of being rejected."""
    from realtime_clickstream_lakehouse_ray.sources.clicks import (
        infer_click_keys,
        read_click_json_auto,
        read_click_json_infer,
    )

    # unexpected-but-well-formed shape: zero registry fields present
    f = tmp_path / "odd.jsonl"
    f.write_text(
        "\n".join(
            [
                json.dumps({"evt": "click", "target": "#buy", "meta": {"x": 1}}),
                json.dumps({"evt": "scroll", "pos": 42}),
                "{broken",
            ]
        )
    )
    keys = infer_click_keys([str(f)])
    assert keys == ["evt", "meta", "pos", "target"]

    ds, mode = read_click_json_auto([str(f)])
    assert mode == "inferred"
    out = ds.to_pandas()
    assert len(out) == 3
    # inferred extras ride as string columns (M9 normalization for nested)
    assert out.loc[0, "evt"] == "click" and out.loc[0, "meta"] == '{"x": 1}'
    assert out.loc[1, "pos"] == "42"
    # malformed line still hits the reject path, enrichment still applies
    assert list(out["status"]) == ["valid", "valid", "malformed"]
    assert out["request_id"].notna().all()

    # a registry-shaped file keeps the strict reader
    g = tmp_path / "ok.jsonl"
    g.write_text(json.dumps(CANONICAL))
    _, mode2 = read_click_json_auto([str(g)])
    assert mode2 == "registry"

    # explicit inferred read of a registry-shaped file: no extra columns,
    # same enrichment
    out2 = read_click_json_infer([str(g)]).to_pandas()
    assert out2.loc[0, "status"] == "valid"


def test_vectorized_parse_matches_perline_path(monkeypatch):
    """The block-parse fast path (pyarrow.json) must be byte-identical to
    the tolerant per-line path on any all-valid batch, and must refuse
    batches it cannot represent exactly (malformed lines, non-string
    fields) so they take the per-line path."""
    import realtime_clickstream_lakehouse_ray.sources.clicks as C

    valid = [
        json.dumps(CANONICAL),
        json.dumps({**CANONICAL, "element": None}),
        json.dumps({**CANONICAL, "timestamp": "2023-09-15T14:30:45.123Z"}),
        json.dumps({k: v for k, v in CANONICAL.items() if k != "timestamp"}),
        json.dumps({"page": "/only-page"}),
        json.dumps({"page": "/x", "extra_field": "ride-along"}),
    ]
    batch = pa.table({"text": pa.array(valid, pa.string())})
    assert C._parse_lines_vectorized(valid) is not None
    fast = C.parse_click_lines(batch, ingest_ts="2024-01-01T00:00:00Z")
    monkeypatch.setattr(C, "_parse_lines_vectorized", lambda lines: None)
    slow = C.parse_click_lines(batch, ingest_ts="2024-01-01T00:00:00Z")
    assert fast.equals(slow)
    monkeypatch.undo()

    # refusal cases -> per-line path handles them as rejects / normalizes
    assert C._parse_lines_vectorized(valid + ["{broken"]) is None
    assert C._parse_lines_vectorized(['{"element": 7}']) is None
    assert C._parse_lines_vectorized([]) is None

    # fractional seconds, minute resolution, date-only, impossible date,
    # garbage: vectorized M7 chain must match old per-row numpy semantics
    lines = [
        json.dumps({"timestamp": t})
        for t in (
            "2024-03-01T10:00:01.123Z",
            "2024-03-01T10:00+00:00",
            "2024-03-01",
            "2024-13-99T00:00:00",
            "garbage",
        )
    ]
    out = C.parse_click_lines(
        pa.table({"text": pa.array(lines, pa.string())}),
        ingest_ts="2024-06-01T00:00:00Z",
    )
    got = [str(v) for v in out.column("event_ts").to_pylist()]
    assert got == [
        "2024-03-01 10:00:01.123000",
        "2024-03-01 10:00:00",
        "2024-03-01 00:00:00",
        "2024-06-01 00:00:00",
        "2024-06-01 00:00:00",
    ]


def test_max_files_per_trigger_bounded_microbatches(tmp_path_factory):
    """maxFilesPerTrigger analog: a backlog drains in bounded exactly-once
    commits, oldest-path-first, and the loop converges."""
    import json as _json

    from realtime_clickstream_lakehouse_ray.pipelines import ingest

    d = tmp_path_factory.mktemp("ingest_mft")
    files = []
    for i in range(7):
        f = d / f"part-{i:02d}.jsonl"
        f.write_text(_json.dumps({**CANONICAL, "element": f"e{i}"}))
        files.append(str(f))
    root = str(d / "clicks_table")

    r1 = ingest.ingest_clicks(files, root, max_files_per_trigger=3)
    assert r1["files"] == 3 and r1["remaining"] == 4
    r2 = ingest.ingest_clicks(files, root, max_files_per_trigger=3)
    assert r2["files"] == 3 and r2["remaining"] == 1
    r3 = ingest.ingest_clicks(files, root, max_files_per_trigger=3)
    assert r3["files"] == 1 and r3["remaining"] == 0
    r4 = ingest.ingest_clicks(files, root, max_files_per_trigger=3)
    assert r4["files"] == 0

    table = ingest.clicks_table(root)
    assert table.stats()["rows"] == 7
    # three micro-batch commits, each exactly-once per input file
    assert table.version() == 3


def test_event_ts_stats_skipping(tmp_path_factory):
    """The clicks table indexes event_ts (stats_cols): a narrow time-range
    scan(where=) prunes files WITHIN a day partition and the row filter
    agrees with a brute-force pandas check."""
    import json as _json

    from realtime_clickstream_lakehouse_ray.pipelines import ingest
    from realtime_clickstream_lakehouse_ray.functions.predicate import (
        parse_predicate,
    )
    from realtime_clickstream_lakehouse_ray.util import to_arrow_table

    d = tmp_path_factory.mktemp("ingest_ts_stats")
    files = []
    for h in (1, 9, 17):  # three files, disjoint hour ranges, same day
        f = d / f"h{h:02d}.jsonl"
        f.write_text(
            "\n".join(
                _json.dumps(
                    {**CANONICAL, "timestamp": f"2023-09-15T{h:02d}:{m:02d}:00Z"}
                )
                for m in range(5)
            )
        )
        files.append(str(f))
    root = str(d / "clicks_table")
    for f in files:  # one commit per file -> three prunable files
        ingest.ingest_clicks([f], root)

    t = ingest.clicks_table(root)
    assert all(f.col_stats and "event_ts" in f.col_stats for f in t.files())
    pred = "event_ts >= '2023-09-15 16:00:00'"
    pruned = t._prune_by_col_stats(t.files(), parse_predicate(pred))
    # only files whose recorded range can reach 16:00 survive the plan
    assert 0 < len(pruned) < len(t.files())
    assert all(f.col_stats["event_ts"][1] >= "2023-09-15 16:00:00" for f in pruned)
    got = to_arrow_table(t.scan(where=pred))
    assert got.num_rows == 5
    assert min(got["event_ts"].to_pylist()).hour == 17


def test_continuous_trigger_loop_drains_growing_directory(tmp_path_factory):
    """processingTime-style loop (ingest_clicks_continuous): a growing
    directory drains across >= 3 triggers, one exactly-once commit per
    non-empty trigger, arrivals between triggers are picked up, and the
    loop parks after the configured idle run."""
    from realtime_clickstream_lakehouse_ray.pipelines import ingest

    d = tmp_path_factory.mktemp("continuous")
    root = str(d / "clicks_table")

    def drop(name, n_rows, day):
        rows = [
            json.dumps({**CANONICAL, "timestamp": f"2023-09-{day:02d}T0{i}:00:00Z"})
            for i in range(n_rows)
        ]
        (d / name).write_text("\n".join(rows))

    drop("a.jsonl", 2, 15)
    drop("b.jsonl", 3, 16)

    def on_trigger(i, res):
        if i == 1:  # a late arrival lands between triggers 2 and 3
            drop("c.jsonl", 1, 17)
        return True

    results = ingest.ingest_clicks_continuous(
        str(d),
        root,
        interval_seconds=0.0,
        max_files_per_trigger=1,  # one file per micro-batch
        stop_after_idle_triggers=2,
        on_trigger=on_trigger,
    )
    busy = [r for r in results if r["files"]]
    idle = [r for r in results if not r["files"]]
    assert len(busy) == 3  # a, b, then the late c
    assert [r["rows"] for r in busy] == [2, 3, 1]
    assert len(idle) == 2  # parked after the idle run
    table = ingest.clicks_table(root)
    assert table.stats()["rows"] == 6
    # one commit per non-empty trigger, each with ITS OWN bookmark slice
    seen: list[str] = []
    for r in busy:
        files = table.log.read_version(r["version"])["source_files"]
        assert len(files) == 1
        seen += files
    assert len(set(seen)) == 3
    # a fresh loop over the drained directory is pure idle — exactly-once
    again = ingest.ingest_clicks_continuous(
        str(d), root, interval_seconds=0.0, stop_after_idle_triggers=1
    )
    assert all(r["files"] == 0 for r in again)
    assert table.stats()["rows"] == 6


def test_continuous_trigger_crash_mid_run_resumes_exactly_once(tmp_path_factory):
    """SIGKILL the continuous loop mid-drain (a separate process), rerun
    it, and require exactly-once: every input row lands exactly one time,
    and no source file is named by two commits."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from realtime_clickstream_lakehouse_ray.pipelines import ingest

    d = tmp_path_factory.mktemp("continuous_crash")
    root = str(d / "clicks_table")
    n_files, rows_per = 12, 4
    for i in range(n_files):
        rows = [
            json.dumps({**CANONICAL, "timestamp": f"2023-09-15T{h:02d}:0{i % 6}:00Z"})
            for h in range(rows_per)
        ]
        (d / f"f{i:03d}.jsonl").write_text("\n".join(rows))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import sys; sys.path.insert(0, \"@REPO@\")\n"
        "import ray\n"
        "ray.init(address='local', num_cpus=2, include_dashboard=False,\n"
        "         logging_level='ERROR')\n"
        "from realtime_clickstream_lakehouse_ray.pipelines import ingest\n"
        "ingest.ingest_clicks_continuous(\"@DIR@\", \"@ROOT@\",\n"
        "    interval_seconds=0.0, max_files_per_trigger=1, max_triggers=@N@)\n"
    ).replace("@REPO@", repo).replace("@DIR@", str(d)).replace(
        "@ROOT@", root
    ).replace("@N@", str(n_files))
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        cwd=repo, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    # kill as soon as at least one trigger has committed
    deadline = time.time() + 120
    while time.time() < deadline:
        if (d / "clicks_table" / "_log").is_dir() and any(
            (d / "clicks_table" / "_log").iterdir()
        ):
            break
        if proc.poll() is not None:
            break
        time.sleep(0.05)
    killed_midway = proc.poll() is None
    if killed_midway:
        os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()

    # resume: drain whatever the killed run left behind
    ingest.ingest_clicks_continuous(
        str(d), root, interval_seconds=0.0, stop_after_idle_triggers=1
    )
    table = ingest.clicks_table(root)
    assert table.stats()["rows"] == n_files * rows_per
    seen: list[str] = []
    for v in table.log.versions():
        seen += table.log.read_version(v).get("source_files", [])
    assert len(seen) == len(set(seen)) == n_files  # no file ingested twice


def test_continuous_trigger_composes_with_auto_optimize(tmp_path_factory):
    """The production loop shape: every trigger drains a micro-batch and
    then lets auto_optimize decide (pure manifest arithmetic) whether the
    touched partitions degraded enough to compact — ingest and maintenance
    in ONE loop, the reference's job+OPTIMIZE cadence composed."""
    from realtime_clickstream_lakehouse_ray.pipelines import ingest

    d = tmp_path_factory.mktemp("cont_opt")
    root = str(d / "clicks_table")
    for i in range(6):  # six tiny files, same event_date partition
        (d / f"f{i}.jsonl").write_text(
            json.dumps({**CANONICAL, "timestamp": f"2023-09-15T0{i}:00:00Z"})
        )

    compactions = []

    def on_trigger(i, res):
        if res["files"]:
            v = ingest.clicks_table(root).auto_optimize(
                small_file_bytes=1 << 20, min_small_files=5,
                target_file_bytes=1 << 20,
            )
            if v is not None:
                compactions.append(v)
        return True

    ingest.ingest_clicks_continuous(
        str(d), root, interval_seconds=0.0, max_files_per_trigger=2,
        stop_after_idle_triggers=1, on_trigger=on_trigger,
    )
    table = ingest.clicks_table(root)
    assert table.stats()["rows"] == 6
    assert len(compactions) >= 1  # the small-file threshold tripped once
    # compaction collapsed the partition's file count
    assert table.stats()["files"] < 6
    # and a fresh loop is a pure no-op (bookmark + converged OPTIMIZE)
    again = ingest.ingest_clicks_continuous(
        str(d), root, interval_seconds=0.0, stop_after_idle_triggers=1,
        on_trigger=on_trigger,
    )
    assert all(r["files"] == 0 for r in again)
