"""Predicate-string DML: DELETE FROM ... WHERE / UPDATE ... WHERE with the
safe conjunctive grammar (functions/predicate.py) — plan-level stats
pruning for partition/key/n_tok conditions, row-level residuals inside the
rewrite actors, column-mapping translation for renamed columns."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.functions.predicate import (
    parse_predicate,
    predicate_mask,
)
from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    expected_tokens_table,
)

N_ROWS = 1_500
ROWS_PER_FILE = 100


def _fresh(tmp_path_factory, name) -> Table:
    root = tmp_path_factory.mktemp(name) / "tokens"
    return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)


def _collect(ds) -> pa.Table:
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tbls).sort_by("doc_id").combine_chunks()


def _expected() -> pa.Table:
    return (
        expected_tokens_table(N_ROWS, ROWS_PER_FILE)
        .sort_by("doc_id")
        .combine_chunks()
    )


def _collect_rows(ds) -> int:
    import ray

    return sum(t.num_rows for t in ray.get(ds.to_arrow_refs()))


class TestParser:
    def test_full_grammar(self):
        conds = parse_predicate(
            "source = 'web' AND n_tok >= 10 AND n_tok < 500 AND "
            "doc_id IN ('a', 'b''c') AND score != 1.5 AND flag = TRUE AND "
            "note IS NULL AND other IS NOT NULL"
        )
        assert conds == [
            {"column": "source", "op": "=", "value": "web"},
            {"column": "n_tok", "op": ">=", "value": 10},
            {"column": "n_tok", "op": "<", "value": 500},
            {"column": "doc_id", "op": "in", "value": ["a", "b'c"]},
            {"column": "score", "op": "!=", "value": 1.5},
            {"column": "flag", "op": "=", "value": True},
            {"column": "note", "op": "is_null", "value": None},
            {"column": "other", "op": "is_not_null", "value": None},
        ]

    @pytest.mark.parametrize(
        "bad",
        [
            "a = 1 OR b = 2",          # OR rejected
            "NOT a = 1",               # NOT rejected
            "lower(a) = 'x'",          # function call -> parses as column then (
            "a + 1 = 2",               # arithmetic
            "a = ",                    # dangling op
            "a IN ()",                 # empty IN
            "a = 1 AND",               # dangling AND
            "",                        # empty
            "a ~ 'x'",                 # unknown operator
        ],
    )
    def test_rejects_everything_else(self, bad):
        with pytest.raises(ValueError):
            parse_predicate(bad)

    def test_mask_null_semantics(self):
        t = pa.table({"x": pa.array([1, None, 3], pa.int64())})
        m = predicate_mask(t, parse_predicate("x > 1"))
        # SQL WHERE: NULL comparison keeps the row OUT (not an error)
        assert m.to_pylist() == [False, False, True]


class TestDeleteWhere:
    def test_stats_plus_residual_conjunction(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dml_del")
        exp = _expected()
        pred = (
            pc.equal(exp["source"], "web").to_numpy(zero_copy_only=False)
            & (np.asarray(exp["n_tok"]) > 40)
            & (np.asarray(exp["doc_id"]).astype(str) < "doc-000000000900")
        )
        assert pred.any() and not pred.all()
        v = t.delete(
            where="source = 'web' AND n_tok > 40 "
            "AND doc_id < 'doc-000000000900'"
        )
        assert v is not None
        got = _collect(t.scan())
        keep = exp.filter(pa.array(~pred))
        assert got.num_rows == keep.num_rows
        assert got["doc_id"].equals(keep["doc_id"])
        assert got["tokens"].equals(keep["tokens"].cast(got["tokens"].type))

    def test_partition_only_predicate_is_metadata_only(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dml_del_meta")
        v = t.delete(where="source = 'web'")
        assert v is not None
        payload = t.log.read_version(v)
        assert payload["metadata_only_deletes"], (
            "a pure partition predicate must drop whole files by manifest "
            "remove, not rewrite them"
        )
        got = _collect(t.scan())
        assert "web" not in set(got["source"].to_pylist())

    def test_contradictory_predicate_is_noop(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dml_del_noop")
        v0 = t.version()
        assert t.delete(where="source = 'web' AND source = 'chat'") is None
        assert t.version() == v0

    def test_idempotent_rerun(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dml_del_idem")
        pred = "n_tok > 100 AND doc_id >= 'doc-000000000500'"
        v = t.delete(where=pred, job_id="del-where-1")
        assert v is not None
        # same-job rerun (crash-rerun path) short-circuits to the commit
        assert t.delete(where=pred, job_id="del-where-1") == v
        # a FRESH job over the already-deleted predicate matches nothing
        assert t.delete(where=pred) is None
        assert t.version() == v

    def test_mor_rejects_where(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dml_del_morrej")
        with pytest.raises(ValueError, match="mode='cow'"):
            t.delete(where="n_tok > 10", mode="mor")

    def test_renamed_column_in_where(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dml_del_renamed")
        t.rename_column("n_tok", "length")
        exp = _expected()
        pred = np.asarray(exp["n_tok"]) > 100
        # SELECT-side pushdown resolves the renamed stats column too
        pre = _collect(t.scan(where="length > 100"))
        assert pre.num_rows == int(pred.sum())
        v = t.delete(where="length > 100")
        assert v is not None
        got = _collect(t.scan())
        assert got.num_rows == int((~pred).sum())
        assert pc.max(got["length"]).as_py() <= 100


class TestUpdateWhere:
    def test_update_with_residual_predicate(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dml_upd")
        exp = _expected()
        pred = (
            pc.equal(exp["source"], "chat").to_numpy(zero_copy_only=False)
            & (np.asarray(exp["doc_id"]).astype(str) >= "doc-000000000700")
        )
        assert pred.any()
        v = t.update(
            set_rules=[{"column": "n_tok", "op": "set", "value": -7}],
            where="source = 'chat' AND doc_id >= 'doc-000000000700'",
        )
        assert v is not None
        got = _collect(t.scan())
        hit = got.filter(pc.equal(got["n_tok"], -7))
        assert hit.num_rows == int(pred.sum())
        assert set(hit["source"].to_pylist()) == {"chat"}
        # untouched rows keep their token arrays byte-for-byte
        assert got["tokens"].equals(exp["tokens"].cast(got["tokens"].type))


class TestScanWhere:
    """SELECT-side filter pushdown: scan(where=...) prunes FILES via the
    same planner as DML (partition / n_tok stats / key Bloom) and filters
    rows with the full conjunction."""

    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        return _fresh(tmp_path_factory, "scan_where")

    def test_rows_match_brute_force(self, table):
        exp = _expected()
        pred = (
            pc.equal(exp["source"], "web").to_numpy(zero_copy_only=False)
            & (np.asarray(exp["n_tok"]) > 40)
            & (np.asarray(exp["doc_id"]).astype(str) < "doc-000000000900")
        )
        got = _collect(
            table.scan(
                where="source = 'web' AND n_tok > 40 "
                "AND doc_id < 'doc-000000000900'"
            )
        )
        keep = exp.filter(pa.array(pred))
        assert got.num_rows == keep.num_rows
        assert got["doc_id"].equals(keep["doc_id"])

    def test_key_equality_prunes_files(self, table):
        # a single-key predicate must read at most the files whose
        # key-range can contain it — with ROWS_PER_FILE=100-sized files
        # that is a small fraction of the table
        got = _collect(table.scan(where="doc_id = 'doc-000000000042'"))
        assert got.num_rows == 1
        assert got["doc_id"].to_pylist() == ["doc-000000000042"]

    def test_partition_pruning_via_where(self, table):
        got = _collect(table.scan(where="source IN ('web', 'chat')"))
        assert set(got["source"].to_pylist()) <= {"web", "chat"}
        exp = _expected()
        want = pc.sum(
            pc.is_in(exp["source"], value_set=pa.array(["web", "chat"]))
        ).as_py()
        assert got.num_rows == want

    def test_where_with_projection_requires_columns(self, table):
        with pytest.raises(ValueError, match="not in the columns"):
            table.scan(columns=["doc_id"], where="n_tok > 5")
        got = _collect(
            table.scan(columns=["doc_id", "n_tok"], where="n_tok > 4000")
        )
        assert got.column_names == ["doc_id", "n_tok"]
        assert pc.min(got["n_tok"]).as_py() > 4000


class TestParserPropertyVsDuckDB:
    """Property: for random conjunctions over a random table, the engine's
    predicate_mask must keep exactly the rows DuckDB's WHERE keeps —
    including NULL comparison semantics."""

    def test_random_conjunctions_match_duckdb(self):
        import duckdb
        from hypothesis import given, settings, strategies as st

        cols = {
            "a": st.one_of(st.none(), st.integers(-5, 5)),
            "b": st.one_of(st.none(), st.sampled_from(["x", "y", "z", "w'q"])),
            "c": st.one_of(
                st.none(),
                st.floats(-2, 2, allow_nan=False).map(lambda v: round(v, 3)),
            ),
        }
        ops = ["=", "!=", "<", "<=", ">", ">="]

        def lit_for(col):
            if col == "a":
                return st.integers(-5, 5)
            if col == "b":
                return st.sampled_from(["x", "y", "z", "w'q"])
            return st.floats(-2, 2, allow_nan=False).map(lambda v: round(v, 3))

        cond = st.sampled_from(list(cols)).flatmap(
            lambda c: st.one_of(
                st.tuples(st.just(c), st.sampled_from(ops), lit_for(c)),
                st.tuples(
                    st.just(c),
                    st.just("in"),
                    st.lists(lit_for(c), min_size=1, max_size=3),
                ),
                st.tuples(
                    st.just(c),
                    st.sampled_from(["is_null", "is_not_null"]),
                    st.none(),
                ),
            )
        )
        rows = st.lists(
            st.fixed_dictionaries(cols), min_size=0, max_size=30
        )

        def sql_lit(v):
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            if isinstance(v, float):
                return repr(v)
            return str(v)

        def to_sql(c, op, v):
            if op == "in":
                return f"{c} IN (" + ", ".join(sql_lit(x) for x in v) + ")"
            if op == "is_null":
                return f"{c} IS NULL"
            if op == "is_not_null":
                return f"{c} IS NOT NULL"
            return f"{c} {op} {sql_lit(v)}"

        @settings(max_examples=150, deadline=None)
        @given(rows=rows, conds=st.lists(cond, min_size=1, max_size=4))
        def check(rows, conds):
            t = pa.table(
                {
                    "a": pa.array([r["a"] for r in rows], pa.int64()),
                    "b": pa.array([r["b"] for r in rows], pa.string()),
                    "c": pa.array([r["c"] for r in rows], pa.float64()),
                }
            )
            where = " AND ".join(to_sql(*c) for c in conds)
            parsed = parse_predicate(where)
            got = t.filter(predicate_mask(t, parsed))
            con = duckdb.connect()
            con.register("t", t)
            exp = con.execute(
                f"SELECT * FROM t WHERE {where}"
            ).arrow()
            assert got.num_rows == exp.num_rows, where

            def rows_of(t):
                # multiset compare: DuckDB does not guarantee scan order
                def key(r):
                    return tuple(
                        (x is None, str(type(x)), x if x is not None else 0)
                        for x in r
                    )

                return sorted(
                    zip(*(t[c].to_pylist() for c in ("a", "b", "c"))), key=key
                )

            assert rows_of(got) == rows_of(exp), where

        check()


class TestColStatsSkipping:
    """Generic per-column file stats (stats_cols config, Delta
    dataSkippingNumIndexedCols analog): scan(where=) must PRUNE files whose
    recorded [min, max] proves no match, across append and rewrite paths,
    and keep working after a rename."""

    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("colstats") / "scored")
        schema = pa.schema(
            [
                pa.field("doc_id", pa.string()),
                pa.field("tokens", pa.list_(pa.int32())),
                pa.field("n_tok", pa.int32()),
                pa.field("source", pa.string()),
                pa.field("score", pa.float64()),
            ]
        )
        t = Table.create(root, schema=schema, stats_cols=("score",))
        # four appends with DISJOINT score ranges -> 4 prunable files
        for i in range(4):
            t.append(
                pa.table(
                    {
                        "doc_id": [f"d-{i}-{j}" for j in range(50)],
                        "tokens": pa.array(
                            [[i, j] for j in range(50)], pa.list_(pa.int32())
                        ),
                        "n_tok": pa.array([2] * 50, pa.int32()),
                        "source": ["web"] * 50,
                        "score": pa.array(
                            [i * 10.0 + j / 10 for j in range(50)], pa.float64()
                        ),
                    }
                )
            )
        return t

    def test_stats_recorded_and_pruned(self, table):
        files = table.files()
        assert all(f.col_stats and "score" in f.col_stats for f in files)
        # predicate matching ONLY the last range must plan 1 of 4 files
        pruned = table._prune_by_col_stats(
            files, parse_predicate("score >= 30")
        )
        assert len(pruned) == 1
        got = _collect(table.scan(where="score >= 30"))
        assert got.num_rows == 50
        assert all(v >= 30 for v in got["score"].to_pylist())
        # IN-list entirely outside every range plans zero files
        assert (
            table._prune_by_col_stats(files, parse_predicate("score = 999"))
            == []
        )
        assert _collect_rows(table.scan(where="score = 999")) == 0

    def test_stats_survive_compact_rewrite(self, table):
        table.compact(target_file_bytes=1 << 30)  # everything into one bin
        files = table.files()
        assert all(f.col_stats and "score" in f.col_stats for f in files)
        lo = min(f.col_stats["score"][0] for f in files)
        hi = max(f.col_stats["score"][1] for f in files)
        assert lo == 0.0 and hi == 34.9

    def test_pruning_after_rename(self, table):
        table.rename_column("score", "quality")
        assert table.stats_cols == ("quality",)
        ds = table.scan(where="quality < 1")
        got = _collect(ds)
        assert got.num_rows == 10
        # new appends record stats under the FROZEN physical name
        table.append(
            pa.table(
                {
                    "doc_id": ["z-1"],
                    "tokens": pa.array([[1]], pa.list_(pa.int32())),
                    "n_tok": pa.array([1], pa.int32()),
                    "source": ["web"],
                    "quality": pa.array([99.0], pa.float64()),
                }
            )
        )
        newest = table.files()[-1]
        assert set(newest.col_stats) == {"score"}
        assert (
            len(
                table._prune_by_col_stats(
                    table.files(), parse_predicate("quality > 90")
                )
            )
            == 1
        )


def test_scan_where_composes_with_deletion_vectors(tmp_path_factory):
    """Pushed-down fragment filters + the DV tombstone stage are both
    row-level conjunctive filters — their composition must equal brute
    force."""
    t = _fresh(tmp_path_factory, "dml_where_dv")
    exp = _expected()
    dead = [f"doc-{i:012d}" for i in range(0, N_ROWS, 11)]
    t.delete(keys=dead, mode="mor")
    pred = (np.asarray(exp["n_tok"]) > 100) & ~np.isin(
        np.asarray(exp["doc_id"]).astype(str), dead
    )
    got = _collect(t.scan(where="n_tok > 100"))
    assert got.num_rows == int(pred.sum())
    assert not set(dead) & set(got["doc_id"].to_pylist())


class TestTemporalStatsPruning:
    """col_stats pruning on timestamp columns must canonicalize predicate
    literals before lexicographic comparison: '2023-09-15 16:00' vs stored
    '2023-09-15 16:00:00' previously sorted below the file min and wrongly
    pruned a file with matching rows."""

    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("ts_stats") / "events")
        schema = pa.schema(
            [
                pa.field("doc_id", pa.string()),
                pa.field("tokens", pa.list_(pa.int32())),
                pa.field("n_tok", pa.int32()),
                pa.field("source", pa.string()),
                pa.field("event_ts", pa.timestamp("us")),
            ]
        )
        t = Table.create(root, schema=schema, stats_cols=("event_ts",))
        from datetime import datetime

        for day in (14, 15, 16):  # three files, one day each
            t.append(
                pa.table(
                    {
                        "doc_id": [f"d-{day}-{h:02d}" for h in range(24)],
                        "tokens": pa.array(
                            [[day, h] for h in range(24)], pa.list_(pa.int32())
                        ),
                        "n_tok": pa.array([2] * 24, pa.int32()),
                        "source": ["web"] * 24,
                        "event_ts": pa.array(
                            [datetime(2023, 9, day, h, 0, 0) for h in range(24)],
                            pa.timestamp("us"),
                        ),
                    }
                )
            )
        return t

    def test_noncanonical_literal_not_wrongly_pruned(self, table):
        # '16:00' is a valid timestamp literal whose string form sorts
        # BELOW the stored '...00:00:00' min; it must still match the
        # 16:00:00 row on day 15
        got = _collect(table.scan(where="event_ts = '2023-09-15 16:00'"))
        assert got["doc_id"].to_pylist() == ["d-15-16"]
        # and the plan still prunes to the single covering file
        pruned = table._prune_by_col_stats(
            table.files(), parse_predicate("event_ts = '2023-09-15 16:00'")
        )
        assert len(pruned) == 1

    def test_canonical_literals_still_prune(self, table):
        files = table.files()
        assert (
            table._prune_by_col_stats(
                files, parse_predicate("event_ts > '2023-09-16 23:00:00'")
            )
            == []
        )
        pruned = table._prune_by_col_stats(
            files, parse_predicate("event_ts >= '2023-09-16'")
        )
        assert len(pruned) == 1
        got = _collect(table.scan(where="event_ts >= '2023-09-16'"))
        assert got.num_rows == 24
