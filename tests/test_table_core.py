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


class TestSchemaEvolution:
    """mergeSchema parity (reference sink option, glue_stream.py:345) with
    BACKWARD compatibility (registry setting, glue/main.tf:38-66)."""

    def test_append_merge_schema_adds_nullable_column(self, tmp_path_factory):
        import pyarrow as pa

        from realtime_clickstream_lakehouse_ray.pipelines.table import Table
        from realtime_clickstream_lakehouse_ray.util import to_arrow_table

        root = str(tmp_path_factory.mktemp("evolve") / "tokens")
        t = build_synthetic_table(root, 2_000, rows_per_file=500)
        rows_v1 = t.stats()["rows"]
        new = pa.table(
            {
                "doc_id": pa.array([f"doc-n{i}" for i in range(3)]),
                "tokens": pa.array([[1], [2, 3], [4]], pa.list_(pa.int32())),
                "n_tok": pa.array([1, 2, 1], pa.int32()),
                "source": pa.array(["web"] * 3),
                "lang": pa.array(["en", "fr", "en"]),
            }
        )
        t.append(new, merge_schema=True)
        assert "lang" in t.schema.names
        # reload from disk: evolution is durable
        t2 = Table.load(root)
        assert "lang" in t2.schema.names
        out = to_arrow_table(t2.scan()).sort_by("doc_id")
        assert out.num_rows == rows_v1 + 3
        langs = out["lang"].to_pylist()
        assert langs.count(None) == rows_v1  # old files null-fill
        assert sorted(x for x in langs if x) == ["en", "en", "fr"]
        # maintenance after evolution unifies files under the new schema
        t2.compact(target_file_bytes=1 << 20)
        out2 = to_arrow_table(t2.scan()).sort_by("doc_id")
        assert out2["lang"].to_pylist() == out["lang"].to_pylist()
        assert out2.schema.field("lang").type == pa.string()

    def test_projected_scan_over_mixed_schema_files(self, tmp_path_factory):
        """A COLUMN-PROJECTED scan must null-fill an evolved column even
        when the snapshot mixes pre- and post-evolution files and the
        read plan's first fragment predates the evolution (regression:
        Ray's parquet datasource infers column presence from the first
        fragment only, so the projected read used to schema-mismatch)."""
        import pyarrow as pa

        from realtime_clickstream_lakehouse_ray.util import to_arrow_table

        root = str(tmp_path_factory.mktemp("evolve_proj") / "tokens")
        t = build_synthetic_table(root, 2_000, rows_per_file=100)  # many old files
        t.evolve_schema([pa.field("lang", pa.string())])
        new = pa.table(
            {
                "doc_id": pa.array([f"doc-n{i}" for i in range(3)]),
                "tokens": pa.array([[1], [2, 3], [4]], pa.list_(pa.int32())),
                "n_tok": pa.array([1, 2, 1], pa.int32()),
                "source": pa.array(["web"] * 3),
                "lang": pa.array(["en", "fr", "en"]),
            }
        )
        t.append(new)
        out = to_arrow_table(t.scan(columns=["doc_id", "lang"])).sort_by("doc_id")
        assert out.column_names == ["doc_id", "lang"]
        langs = out["lang"].to_pylist()
        assert langs.count(None) == 2_000 and len(langs) == 2_003
        assert out.schema.field("lang").type == pa.string()

    def test_incompatible_evolution_rejected(self, tmp_path_factory):
        import pyarrow as pa
        import pytest as _pytest

        root = str(tmp_path_factory.mktemp("evolve2") / "tokens")
        t = build_synthetic_table(root, 500, rows_per_file=500)
        with _pytest.raises(ValueError, match="incompatible"):
            t.evolve_schema([pa.field("n_tok", pa.string())])
        # narrowing is not a widening
        with _pytest.raises(ValueError, match="incompatible"):
            t.evolve_schema([pa.field("n_tok", pa.int16())])

    def test_type_widening_evolution(self, tmp_path_factory):
        """Iceberg-style type promotion: widen n_tok int32->int64 and
        tokens list<int32> -> list<int64>; old (narrow) files upcast at
        scan time, new appends carry the wide types, values and token
        arrays are unchanged, and a post-evolution compact unifies the
        physical files under the wide schema."""
        import pyarrow as pa

        from realtime_clickstream_lakehouse_ray.pipelines.table import Table
        from realtime_clickstream_lakehouse_ray.util import to_arrow_table

        root = str(tmp_path_factory.mktemp("widen") / "tokens")
        t = build_synthetic_table(root, 1_000, rows_per_file=200)
        before = to_arrow_table(t.scan()).sort_by("doc_id")
        t.evolve_schema(
            [
                pa.field("n_tok", pa.int64()),
                pa.field("tokens", pa.list_(pa.int64())),
            ]
        )
        t2 = Table.load(root)  # durable
        assert t2.schema.field("n_tok").type == pa.int64()
        assert t2.schema.field("tokens").type == pa.list_(pa.int64())
        new = pa.table(
            {
                "doc_id": pa.array(["doc-wide0"]),
                "tokens": pa.array([[2**40]], pa.list_(pa.int64())),
                "n_tok": pa.array([1], pa.int64()),
                "source": pa.array(["web"]),
            }
        )
        t2.append(new)
        out = to_arrow_table(t2.scan()).sort_by("doc_id")
        assert out.schema.field("n_tok").type == pa.int64()
        assert out.schema.field("tokens").type == pa.list_(pa.int64())
        assert out.num_rows == before.num_rows + 1
        old_part = out.filter(
            pa.compute.invert(pa.compute.equal(out["doc_id"], "doc-wide0"))
        ).sort_by("doc_id")
        assert old_part["tokens"].to_pylist() == before["tokens"].to_pylist()
        assert old_part["n_tok"].to_pylist() == before["n_tok"].to_pylist()
        wide_row = out.filter(pa.compute.equal(out["doc_id"], "doc-wide0"))
        assert wide_row["tokens"].to_pylist() == [[2**40]]  # needs int64
        t2.compact(target_file_bytes=1 << 20)
        out2 = to_arrow_table(t2.scan()).sort_by("doc_id")
        assert out2["tokens"].to_pylist() == out.sort_by("doc_id")["tokens"].to_pylist()
