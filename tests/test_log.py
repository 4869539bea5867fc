"""Snapshot log: commit atomicity, replay, conflicts, manifest rewrite, expiry."""

import json

import pytest

from realtime_clickstream_lakehouse_ray.state.log import (
    CommitConflict,
    FileEntry,
    SnapshotLog,
)


def _add(path, part="web", rows=10):
    return FileEntry(path=path, partition=part, rows=rows, bytes=100).to_action()


def test_commit_and_replay(tmp_path):
    log = SnapshotLog(tmp_path)
    assert log.latest_version() == 0
    assert log.files() == []
    v1 = log.commit([_add("source=web/a.parquet")], "append")
    assert v1 == 1
    v2 = log.commit([_add("source=web/b.parquet")], "append")
    v3 = log.commit(
        [_add("source=web/c.parquet"), {"op": "remove", "path": "source=web/a.parquet"}],
        "compact",
        job_id="compact-v2",
    )
    assert [f.path for f in log.files(v1)] == ["source=web/a.parquet"]
    assert sorted(f.path for f in log.files(v2)) == [
        "source=web/a.parquet",
        "source=web/b.parquet",
    ]
    assert sorted(f.path for f in log.files(v3)) == [
        "source=web/b.parquet",
        "source=web/c.parquet",
    ]
    assert log.find_commit_by_job("compact-v2") == v3
    assert log.find_commit_by_job("nope") is None


def test_commit_conflict(tmp_path):
    log1, log2 = SnapshotLog(tmp_path), SnapshotLog(tmp_path)
    log1.commit([_add("source=web/a.parquet")], "append")
    # both plan against version 1; second writer must lose
    log1.commit([_add("source=web/b.parquet")], "append", parent=1)
    with pytest.raises(CommitConflict):
        log2.commit([_add("source=web/c.parquet")], "append", parent=1)


def test_manifest_rewrite_preserves_state(tmp_path):
    log = SnapshotLog(tmp_path)
    log.commit([_add("source=web/a.parquet")], "append")
    log.commit([_add("source=web/b.parquet"), {"op": "remove", "path": "source=web/a.parquet"}], "compact")
    before = sorted(f.path for f in log.files(2))
    log.materialize_version(2)
    payload = log.read_version(2)
    assert payload["base"] and payload["consolidated"]
    assert sorted(f.path for f in log.files(2)) == before
    # replay of a later commit on top of the base still works
    log.commit([_add("source=web/c.parquet")], "append")
    assert sorted(f.path for f in log.files(3)) == before + ["source=web/c.parquet"]


def test_expire_keeps_recent_versions_readable(tmp_path):
    log = SnapshotLog(tmp_path)
    for i in range(6):
        log.commit([_add(f"source=web/f{i}.parquet")], "append")
    state5 = sorted(f.path for f in log.files(5))
    expired = log.expire(keep_last=2)
    assert expired == [1, 2, 3, 4]
    assert log.versions() == [5, 6]
    assert sorted(f.path for f in log.files(5)) == state5
    assert len(log.files(6)) == 6
    with pytest.raises(FileNotFoundError):
        log.files(3)


def test_atomic_publish_leaves_no_temp(tmp_path):
    log = SnapshotLog(tmp_path)
    log.commit([_add("source=web/a.parquet")], "append")
    leftovers = [p for p in log.log_dir.iterdir() if p.name.startswith(".tmp")]
    assert leftovers == []
    payload = json.loads((log.log_dir / f"{1:014d}.json").read_text())
    assert payload["operation"] == "append"


def test_expire_older_than(tmp_path):
    """Age-based retention (Iceberg expire_snapshots(older_than=...)):
    versions committed before the threshold expire, tagged versions
    survive as islands, the latest always stays."""
    from realtime_clickstream_lakehouse_ray.pipelines.table import Table
    from realtime_clickstream_lakehouse_ray.sources.synth import gen_tokens_chunk

    t = Table.create(str(tmp_path / "age"))
    for i in range(5):
        t.append(gen_tokens_chunk(i, i * 10, 10))
    ts = {v: t.log.read_version(v)["timestamp"] for v in t.log.versions()}
    t.tag("pin-v2", 2)

    expired = t.expire_snapshots(older_than=ts[4])
    assert expired == [1, 3]  # v2 tagged, v4 at threshold, v5 latest
    assert set(t.log.versions()) == {2, 4, 5}
    # both retention axes together keep the MORE conservative set
    t2 = Table.create(str(tmp_path / "both"))
    for i in range(4):
        t2.append(gen_tokens_chunk(i, i * 10, 10))
    ts2 = {v: t2.log.read_version(v)["timestamp"] for v in t2.log.versions()}
    # keep_last=1 alone would expire v1-v3; older_than=ts2[2] alone would
    # expire only v1 -> the union keeps v2..v4
    assert t2.expire_snapshots(keep_last=1, older_than=ts2[2]) == [1]
    assert set(t2.log.versions()) == {2, 3, 4}
