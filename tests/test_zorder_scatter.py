"""Scatter/gather Z-order exchange (stages/scatter.py): correctness vs the
sort path, bucket-granular crash resume, and the job-namespaced output
names that keep back-to-back jobs from overwriting each other's files."""

import pyarrow as pa
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import build_synthetic_table
from realtime_clickstream_lakehouse_ray.state.checkpoint import JobCheckpoint

N_ROWS = 6_000
TARGET = 256 << 10


def _rows(table, **kw):
    return sorted(
        table.scan(**kw).take_all(), key=lambda r: r["doc_id"]
    )


@pytest.fixture()
def table(tmp_path, ray_session):
    root = str(tmp_path / "tokens")
    build_synthetic_table(root, N_ROWS, rows_per_file=500)
    return Table.load(root)


def test_scatter_matches_sort_rowset(table):
    pre = _rows(table)
    v_scatter = table.zorder(target_file_bytes=TARGET, method="scatter")
    post = _rows(table)
    assert [r["doc_id"] for r in pre] == [r["doc_id"] for r in post]
    assert all(
        list(a["tokens"]) == list(b["tokens"]) for a, b in zip(pre, post)
    )
    # same row set through the sort path on the already-clustered table
    table.zorder(target_file_bytes=TARGET, method="sort")
    post2 = _rows(table)
    assert [r["doc_id"] for r in post] == [r["doc_id"] for r in post2]
    # clustering provenance recorded on every scatter-path file
    files_at_scatter = table.files(v_scatter)
    assert all(f.clustered == "z:source,n_tok,doc_id" for f in files_at_scatter)


def test_back_to_back_jobs_preserve_time_travel(table):
    """Regression: gather output names must be namespaced by job — without
    it, job B's unit 0 overwrites job A's live unit-0 file in place."""
    pre = _rows(table)
    v1 = table.zorder(target_file_bytes=TARGET)
    v2 = table.zorder(target_file_bytes=TARGET, curve="hilbert")
    assert v2 == v1 + 1
    assert table.scan(version=v1).count() == N_ROWS
    assert table.scan(version=v2).count() == N_ROWS
    mid = _rows(table, version=v1)
    assert all(
        a["doc_id"] == b["doc_id"] and list(a["tokens"]) == list(b["tokens"])
        for a, b in zip(pre, mid)
    )


def test_crash_before_commit_resumes_from_plan_and_buckets(table, monkeypatch):
    parent = table.version()
    job = f"zorder-v{parent}"
    pre = _rows(table)

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(Table, "_commit_with_rebase", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        table.zorder(target_file_bytes=TARGET, job_id=job)
    monkeypatch.undo()

    # scatter plan + finished bucket units survived the crash
    scratch = table.root / "_scratch" / job
    assert (scratch / "PLAN.json").is_file()
    bucket_units = {
        k: v
        for k, v in JobCheckpoint(table.root, job).list_units().items()
        if not k.startswith("part-")
    }
    assert bucket_units

    fresh = Table.load(str(table.root))
    v = fresh.zorder(target_file_bytes=TARGET, job_id=job)
    assert v == parent + 1
    post = _rows(fresh)
    assert len(post) == N_ROWS
    assert all(
        a["doc_id"] == b["doc_id"] and list(a["tokens"]) == list(b["tokens"])
        for a, b in zip(pre, post)
    )
    assert not scratch.exists()  # scratch reclaimed after commit
    # per-partition lineage rollup present
    parts = {
        r["partition"]
        for k, r in JobCheckpoint(fresh.root, job).list_units().items()
        if k.startswith("part-")
    }
    assert parts == set(fresh.stats()["partitions"])


def test_two_level_scatter_matches_single_level(tmp_path, ray_session):
    """Force the bucket count over the two-level threshold (tiny
    target_file_bytes + threshold=4): the coarse-then-recut exchange must
    produce the IDENTICAL row set and token arrays as single-level on a
    twin table, record the scatter_coarse phase, and bound the gather
    fan-in to the final-bucket layout."""
    root_a = str(tmp_path / "a" / "tokens")
    root_b = str(tmp_path / "b" / "tokens")
    build_synthetic_table(root_a, N_ROWS, rows_per_file=500)
    build_synthetic_table(root_b, N_ROWS, rows_per_file=500)
    ta, tb = Table.load(root_a), Table.load(root_b)
    tiny = 64 << 10  # -> dozens of buckets at this corpus size
    va = ta.zorder(target_file_bytes=tiny, scatter_two_level_threshold=4)
    vb = tb.zorder(target_file_bytes=tiny, scatter_two_level_threshold=10**9)
    assert va is not None and vb is not None
    ma = [r for r in ta.metrics() if r["operation"] == "zorder"][-1]
    mb = [r for r in tb.metrics() if r["operation"] == "zorder"][-1]
    assert "scatter_coarse" in ma.get("phases", {})
    assert "scatter_coarse" not in mb.get("phases", {})
    ra, rb = _rows(ta), _rows(tb)
    assert [r["doc_id"] for r in ra] == [r["doc_id"] for r in rb]
    assert all(
        list(a["tokens"]) == list(b["tokens"]) for a, b in zip(ra, rb)
    )
    # identical final FILE layout too: both exchanges cut on the same
    # sampled boundaries, so per-file row counts must agree
    sizes_a = sorted(f.rows for f in ta.files(va))
    sizes_b = sorted(f.rows for f in tb.files(vb))
    assert sizes_a == sizes_b


def test_incremental_scatter_clusters_only_new_files(table):
    v1 = table.zorder(target_file_bytes=TARGET)
    assert table.zorder(target_file_bytes=TARGET, incremental=True) is None
    # append unclustered data; incremental run touches only those files
    from realtime_clickstream_lakehouse_ray.sources.synth import gen_tokens_chunk

    extra = gen_tokens_chunk(9_000, N_ROWS, 500, seed=7)
    table.append(extra)
    clustered_before = {f.path for f in table.files() if f.clustered}
    v2 = table.zorder(target_file_bytes=TARGET, incremental=True)
    assert v2 is not None
    after = table.files()
    assert clustered_before <= {f.path for f in after}
    assert all(f.clustered for f in after)
    assert table.scan().count() == N_ROWS + 500
