"""Unit tests for the round-2 relational extensions: set operators,
the regime-choosing planner join, the one-pass ROLLUP, and the keyed
interval-overlap join (oracle parity runs separately in
test_oracle_parity.py — these cover regime equality and edge cases the
sf0.01 fixtures don't reach)."""

import numpy as np
import pyarrow as pa
import ray.data

from realtime_clickstream_lakehouse_ray.pipelines.relational import (
    auto_hash_join,
    broadcast_hash_join,
    bucket_hash_join,
    orders_rollup,
    set_op,
)

SF_DIR = "/root/testdata/sf0.01"


def _ds(tbl: pa.Table) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl)


class TestSetOp:
    def test_intersect_and_except(self):
        import ray

        a = _ds(pa.table({"k": pa.array([1, 2, 2, 3, 5], pa.int64())}))
        b = _ds(pa.table({"k": pa.array([2, 3, 3, 4], pa.int64())}))
        inter = set_op(a, b, "k", "intersect")
        exc = set_op(a, b, "k", "except")
        got_i = sorted(
            x
            for t in ray.get(inter.to_arrow_refs())
            if t.num_rows
            for x in t["k"].to_pylist()
        )
        got_e = sorted(
            x
            for t in ray.get(exc.to_arrow_refs())
            if t.num_rows
            for x in t["k"].to_pylist()
        )
        assert got_i == [2, 3]
        assert got_e == [1, 5]

    def test_distinct_semantics_and_empty_side(self):
        import ray

        a = _ds(pa.table({"k": pa.array([7, 7, 7], pa.int64())}))
        b = _ds(pa.table({"k": pa.array([], pa.int64())}))
        got = [
            x
            for t in ray.get(set_op(a, b, "k", "except").to_arrow_refs())
            if t.num_rows
            for x in t["k"].to_pylist()
        ]
        assert got == [7]  # duplicates collapse; empty b is a no-op
        got_i = [
            x
            for t in ray.get(set_op(a, b, "k", "intersect").to_arrow_refs())
            if t.num_rows
            for x in t["k"].to_pylist()
        ]
        assert got_i == []

    def test_string_keys(self):
        import ray

        a = _ds(pa.table({"k": pa.array(["x", "y", "z"])}))
        b = _ds(pa.table({"k": pa.array(["y", "w"])}))
        got = sorted(
            x
            for t in ray.get(set_op(a, b, "k", "intersect").to_arrow_refs())
            if t.num_rows
            for x in t["k"].to_pylist()
        )
        assert got == ["y"]


class TestAutoJoin:
    def _norm(self, ds):
        import ray

        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        t = pa.concat_tables(parts, promote_options="default")
        cols = sorted(t.column_names)
        return t.select(cols).sort_by([(c, "ascending") for c in cols]).to_pydict()

    def test_regimes_agree(self):
        sup = ray.data.read_parquet(
            f"{SF_DIR}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        nat = ray.data.read_parquet(
            f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        bc = broadcast_hash_join(sup, nat, "s_nationkey", "n_nationkey")
        bk = bucket_hash_join(sup, nat, "s_nationkey", "n_nationkey", how="inner")
        assert self._norm(bc) == self._norm(bk)

    def test_planner_picks_by_threshold(self):
        sup = ray.data.read_parquet(
            f"{SF_DIR}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
        nat = ray.data.read_parquet(
            f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        # tiny threshold forces the bucketed regime; result must not change
        forced = auto_hash_join(sup, nat, "s_nationkey", "n_nationkey",
                                broadcast_threshold_bytes=1)
        default = auto_hash_join(sup, nat, "s_nationkey", "n_nationkey")
        assert self._norm(forced) == self._norm(default)


class TestRollup:
    def test_levels_are_consistent(self):
        out = orders_rollup(SF_DIR)
        status = out["o_orderstatus"].to_pylist()
        prio = out["o_orderpriority"].to_pylist()
        n = np.asarray(out["n"])
        cents = np.asarray(out["sum_cents"])
        fine = [(s, p) for s, p in zip(status, prio) if s is not None and p is not None]
        assert len(fine) == len(set(fine))
        total_rows = [i for i, (s, p) in enumerate(zip(status, prio)) if s is None]
        assert len(total_rows) == 1
        i_tot = total_rows[0]
        fine_idx = [
            i for i, (s, p) in enumerate(zip(status, prio))
            if s is not None and p is not None
        ]
        assert n[fine_idx].sum() == n[i_tot]
        assert cents[fine_idx].sum() == cents[i_tot]
        # per-status level sums the fine level
        lvl1 = {
            status[i]: (n[i], cents[i])
            for i in range(len(n))
            if status[i] is not None and prio[i] is None
        }
        for s, (ns, cs) in lvl1.items():
            idx = [i for i in fine_idx if status[i] == s]
            assert n[idx].sum() == ns and cents[idx].sum() == cs
