"""End-to-end core slice: synthesize -> append -> commit -> scan (golden
equality, pruning, time travel) — SURVEY.md §7 step 1."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    SOURCES,
    build_synthetic_table,
    expected_tokens_table,
    gen_tokens_chunk,
)
from tests.util import assert_tokens_equal, collect_sorted

N_ROWS = 2_000
ROWS_PER_FILE = 100


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    root = tmp_path_factory.mktemp("tbl") / "tokens"
    return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)


def test_append_commit_and_rowcount(table):
    assert table.version() == 1
    st = table.stats()
    assert st["rows"] == N_ROWS
    assert st["files"] > 8  # deliberately many small files
    assert set(st["partitions"]) <= set(SOURCES)


def test_scan_golden_equality(table):
    got = collect_sorted(table.scan())
    expect = expected_tokens_table(N_ROWS, ROWS_PER_FILE).sort_by("doc_id").combine_chunks()
    assert_tokens_equal(got, expect)
    assert got.column("source").equals(expect.column("source"))


def test_stats_match_data(table):
    got = collect_sorted(table.scan())
    assert table.stats()["sum_tok"] == pc.sum(got.column("n_tok")).as_py()


def test_scan_partition_pruning(table):
    got = collect_sorted(table.scan(partitions=["web"]))
    assert pc.all(pc.equal(got.column("source"), "web")).as_py()
    full = collect_sorted(table.scan())
    n_web = pc.sum(pc.equal(full.column("source"), "web").cast(pa.int64())).as_py()
    assert got.num_rows == n_web
    # pruning happened at planning time: fewer files scanned than total
    web_files = [f for f in table.files() if f.partition == "web"]
    assert len(web_files) < len(table.files())


def test_scan_column_pruning(table):
    ds = table.scan(columns=["doc_id", "n_tok"])
    assert set(ds.schema().names) == {"doc_id", "n_tok"}


def test_scan_stats_range_pruning(table):
    files_all = len(table.files())
    ds = table.scan(min_n_tok=4000)
    # most files have max_n_tok << 4000 -> they are pruned from the plan
    pruned = [
        f for f in table.files() if f.max_n_tok is not None and f.max_n_tok >= 4000
    ]
    assert len(pruned) <= files_all
    assert ds.count() >= 0


def test_time_travel_after_second_append(table):
    v1 = table.version()
    extra = gen_tokens_chunk(9_999, 1_000_000, 50)
    v2 = table.append(extra)
    assert v2 == v1 + 1
    assert table.stats(v2)["rows"] == N_ROWS + 50
    assert table.stats(v1)["rows"] == N_ROWS  # old snapshot still intact
    got_v1 = collect_sorted(table.scan(version=v1))
    expect = expected_tokens_table(N_ROWS, ROWS_PER_FILE).sort_by("doc_id").combine_chunks()
    assert_tokens_equal(got_v1, expect)


def test_load_roundtrip(table):
    t2 = Table.load(str(table.root))
    assert t2.schema == table.schema
    assert t2.version() == table.version()
