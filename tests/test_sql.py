"""Ad-hoc SQL read surface (Table.sql): the reference's Athena consumer
path (README.md:113, docs/architecture.md) re-expressed as engine-planned
DuckDB execution over the snapshot-pruned Parquet file list — manifest
pruning, column mapping, DV anti-join, time travel and partition-evolution
row filters all flow through the same planner scan() uses."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.sqlread import (
    conds_to_sql,
    extract_pushdown_where,
)
from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    expected_tokens_table,
)

N_ROWS = 1_200
RPF = 100


def _full(t):
    import ray

    return pa.concat_tables(
        [b for b in ray.get(t.scan().to_arrow_refs()) if b.num_rows]
    ).sort_by("doc_id")


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sql") / "tokens")
    return build_synthetic_table(root, N_ROWS, RPF)


class TestPushdownExtraction:
    def test_simple_where(self):
        q = "SELECT count(*) FROM t WHERE source = 'web' AND n_tok > 10"
        assert extract_pushdown_where(q) == "source = 'web' AND n_tok > 10"

    def test_where_stops_at_clause_keywords(self):
        q = (
            "SELECT source, count(*) FROM t WHERE n_tok > 10 "
            "GROUP BY source ORDER BY source LIMIT 3"
        )
        assert extract_pushdown_where(q) == "n_tok > 10"

    def test_unparseable_or_multiple_wheres(self):
        assert extract_pushdown_where("SELECT * FROM t") is None
        assert (
            extract_pushdown_where(
                "SELECT * FROM t WHERE n_tok > 1 OR n_tok < 0"
            )
            is None
        )
        assert (
            extract_pushdown_where(
                "SELECT * FROM (SELECT * FROM t WHERE a = 1) WHERE b = 2"
            )
            is None
        )

    def test_conds_roundtrip(self):
        from realtime_clickstream_lakehouse_ray.functions.predicate import (
            parse_predicate,
        )

        where = (
            "source = 'web' AND n_tok >= 10 AND doc_id IN ('a', 'b''c') "
            "AND note IS NULL AND other IS NOT NULL"
        )
        sql = conds_to_sql(parse_predicate(where))
        assert parse_predicate(sql.replace('"', "")) == parse_predicate(where)


class TestSqlBasics:
    def test_aggregate_matches_scan(self, table):
        full = _full(table)
        got = table.sql(
            "SELECT source, count(*) AS n, sum(n_tok) AS s FROM t "
            "GROUP BY source ORDER BY source"
        )
        exp = (
            full.group_by("source")
            .aggregate([("doc_id", "count"), ("n_tok", "sum")])
            .sort_by("source")
        )
        assert got["n"].to_pylist() == exp["doc_id_count"].to_pylist()
        assert got["s"].to_pylist() == exp["n_tok_sum"].to_pylist()

    def test_filtered_count_and_file_pruning(self, table):
        full = _full(table)
        q = "SELECT count(*) AS n FROM t WHERE source = 'web'"
        ex = table.sql_explain(q)
        assert ex["pushdown_where"] == "source = 'web'"
        assert 0 < ex["n_files"] < ex["n_files_snapshot"]
        assert all(p.startswith("source=web/") for p in ex["files"])
        n = table.sql(q)["n"][0].as_py()
        assert n == pc.sum(pc.equal(full["source"], "web")).as_py() > 0

    def test_explicit_where_scopes_without_query_text(self, table):
        full = _full(table)
        n = table.sql(
            "SELECT count(*) AS n FROM t", where="source = 'web' AND n_tok > 64"
        )["n"][0].as_py()
        exp = pc.sum(
            pc.and_(
                pc.equal(full["source"], "web"), pc.greater(full["n_tok"], 64)
            )
        ).as_py()
        assert n == exp > 0

    def test_list_column_and_view_name(self, table):
        got = table.sql(
            "SELECT doc_id, len(tokens) AS lt, n_tok FROM tok "
            "ORDER BY doc_id LIMIT 5",
            name="tok",
        )
        assert got["lt"].to_pylist() == got["n_tok"].to_pylist()
        with pytest.raises(ValueError, match="bare identifier"):
            table.sql("SELECT 1", name="bad name; DROP")

    def test_join_against_registered_view(self, table):
        # self-join through the view: top duplicate-length pairs per source
        got = table.sql(
            "SELECT a.source, count(*) AS pairs FROM t a JOIN t b "
            "ON a.source = b.source AND a.n_tok = b.n_tok "
            "AND a.doc_id < b.doc_id GROUP BY a.source ORDER BY a.source"
        )
        assert got.num_rows > 0


class TestSqlSnapshots:
    def test_time_travel_and_dv(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("sqltt") / "tokens")
        t = build_synthetic_table(root, 600, 100)
        full = _full(t)
        v0 = t.version()
        dead = full["doc_id"].to_pylist()[:7]
        t.delete(keys=dead, mode="mor")  # deletion vectors, no rewrite
        now = t.sql("SELECT count(*) AS n FROM t")["n"][0].as_py()
        then = t.sql("SELECT count(*) AS n FROM t", version=v0)["n"][0].as_py()
        assert (then, now) == (600, 593)
        # tombstoned keys are invisible to SQL
        got = t.sql(
            "SELECT count(*) AS n FROM t WHERE doc_id IN ("
            + ", ".join(f"'{k}'" for k in dead)
            + ")"
        )
        assert got["n"][0].as_py() == 0
        t.tag("pre", version=v0)
        assert t.sql("SELECT count(*) AS n FROM t", tag="pre")["n"][0].as_py() == 600

    def test_column_mapping_and_schema_evolution(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("sqlmap") / "tokens")
        t = build_synthetic_table(root, 300, 100)
        t.rename_column("n_tok", "length")
        t.evolve_schema([pa.field("extra", pa.int64())])
        got = t.sql(
            "SELECT max(length) AS m, count(extra) AS ce, count(*) AS n FROM t"
        )
        assert got["n"][0].as_py() == 300
        assert got["ce"][0].as_py() == 0  # typed NULL for the new column
        assert got["m"][0].as_py() > 0
        # physical name is NOT visible logically
        with pytest.raises(Exception):
            t.sql("SELECT n_tok FROM t")

    def test_partition_evolution_row_filter(self, tmp_path_factory):
        from tests.test_partition_evolution import SCHEMA, _batch

        root = str(tmp_path_factory.mktemp("sqlevo") / "tokens")
        t = Table.create(root, schema=SCHEMA)
        t.append(_batch(0, 100))
        t.evolve_partitioning("region")
        t.append(_batch(100, 100))
        # region predicate: current-spec files prune by value, old-layout
        # files row-filter — SQL must see BOTH layouts' r-east rows
        got = t.sql(
            "SELECT count(*) AS n FROM t WHERE region = 'r-east'"
        )["n"][0].as_py()
        exp = pa.concat_tables([_batch(0, 100), _batch(100, 100)])
        assert got == pc.sum(pc.equal(exp["region"], "r-east")).as_py() == 100

    def test_empty_snapshot(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("sqlempty") / "tokens")
        t = Table.create(root)
        got = t.sql("SELECT count(*) AS n, max(n_tok) AS m FROM t")
        assert got["n"][0].as_py() == 0

    def test_alias_in_where_falls_back(self, table):
        # DuckDB allows SELECT aliases in WHERE; the extractor's cond would
        # reference a non-table column — pushdown silently disables and
        # the query still answers correctly
        got = table.sql(
            "SELECT n_tok * 2 AS dbl FROM t WHERE dbl > 50 LIMIT 5"
        )
        assert all(v > 50 for v in got["dbl"].to_pylist())


class TestPredicateSurfacesAgree:
    """Property: for random conjunctions from the engine grammar, the
    THREE predicate surfaces return identical row sets —
    ``scan(where=)`` (manifest pruning + row filter), ``sql()`` (pruned
    DuckDB view, WHERE auto-extracted) and raw DuckDB over the table's
    parquet files (ground truth).  One shared table; hypothesis drives
    the predicate space (in/out-of-range literals, multi-conjunct,
    every comparison op)."""

    _table = None

    @classmethod
    def get_table(cls, tmp_root):
        if cls._table is None:
            cls._table = build_synthetic_table(str(tmp_root / "tokens"), 600, 60)
        return cls._table

    def test_random_conjunctions(self, tmp_path_factory):
        import duckdb
        import ray
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        t = self.get_table(tmp_path_factory.mktemp("sqlprop"))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW raw AS SELECT * FROM "
            f"parquet_scan('{t.root}/source=*/*.parquet')"
        )

        int_cond = st.tuples(
            st.just("n_tok"),
            st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
            st.integers(min_value=-5, max_value=5000),
        )
        src_cond = st.tuples(
            st.just("source"),
            st.sampled_from(["=", "!=", "in"]),
            st.sampled_from(["web", "books", "chat", "nope"]),
        )
        doc_cond = st.tuples(
            st.just("doc_id"),
            st.sampled_from(["<", ">=", "="]),
            st.sampled_from(
                ["doc-000000000050", "doc-000000000599", "doc-zzz", "doc-000000000000"]
            ),
        )

        def render(c):
            col, op, v = c
            if op == "in":
                return f"{col} IN ('{v}', 'web')"
            return f"{col} {op} {v!r}" if isinstance(v, str) else f"{col} {op} {v}"

        @settings(
            max_examples=15,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(conds=st.lists(st.one_of(int_cond, src_cond, doc_cond), min_size=1, max_size=3))
        def check(conds):
            where = " AND ".join(render(c) for c in conds)
            exp = sorted(
                r[0]
                for r in con.execute(
                    f"SELECT doc_id FROM raw WHERE {where}"
                ).fetchall()
            )
            cols = sorted({"doc_id"} | {c[0] for c in conds})
            got_scan = sorted(
                k
                for b in ray.get(
                    t.scan(columns=cols, where=where).to_arrow_refs()
                )
                if b.num_rows
                for k in b["doc_id"].to_pylist()
            )
            got_sql = sorted(
                t.sql(f"SELECT doc_id FROM t WHERE {where}")["doc_id"].to_pylist()
            )
            assert got_scan == exp, where
            assert got_sql == exp, where

        check()
