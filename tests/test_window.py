"""Window-function family + exact distributed quantiles: property checks
against pandas/numpy on randomized in-memory data (oracle parity vs
DuckDB is covered by test_oracle_parity.py; these pin the operator
semantics independent of the test tables)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from realtime_clickstream_lakehouse_ray.pipelines.quantile import quantile_disc_by
from realtime_clickstream_lakehouse_ray.pipelines.window import grouped_topk


def _rand_df(seed: int, n: int = 5_000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": rng.integers(0, 97, n),
            "val": np.round(rng.normal(1000.0, 250.0, n), 2),
            "tie1": rng.integers(0, 1_000_000, n),
            "tie2": np.arange(n),
        }
    )


class TestGroupedTopK:
    def test_matches_pandas_reference(self, ray_session):
        df = _rand_df(7)
        ds = ray.data.from_pandas(df).repartition(8)
        got = (
            grouped_topk(
                ds, key="key", order_by=["val", "tie1", "tie2"],
                ascending=[False, True, True], k=3,
            )
            .to_pandas()
            .sort_values(["key", "val", "tie1", "tie2"],
                         ascending=[True, False, True, True], ignore_index=True)
        )
        exp = (
            df.sort_values(["key", "val", "tie1", "tie2"],
                           ascending=[True, False, True, True])
            .groupby("key", sort=True)
            .head(3)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)

    def test_partial_stage_bounds_shuffle_rows(self, ray_session):
        # every key appears in every batch -> shuffle input is <= k * keys * batches
        df = _rand_df(11)
        ds = ray.data.from_pandas(df).repartition(4)
        out = grouped_topk(
            ds, key="key", order_by=["val", "tie1", "tie2"],
            ascending=[False, True, True], k=1,
        ).to_pandas()
        assert len(out) == df["key"].nunique()


class TestOrderedPrefixSum:
    def test_matches_pandas_window(self, ray_session):
        from realtime_clickstream_lakehouse_ray.functions.prefix import (
            ordered_prefix_sum,
        )

        rng = np.random.default_rng(23)
        n = 4_000
        df = pd.DataFrame(
            {
                "oid": rng.permutation(n),  # unique, unsorted order keys
                "grp": rng.choice(["a", "b", "c", "d"], n),
                "v": rng.integers(1, 500, n),
            }
        )
        ds = ray.data.from_pandas(df).repartition(16)
        got = (
            ordered_prefix_sum(ds, "oid", "v", "grp")
            .to_pandas()
            .sort_values("oid", ignore_index=True)
        )
        exp = df.sort_values("oid", ignore_index=True)
        exp["cum"] = exp.groupby("grp")["v"].cumsum()
        pd.testing.assert_series_equal(
            got["cum"].astype("int64"), exp["cum"].astype("int64"), check_names=False
        )


class TestQuantileDisc:
    def test_matches_numpy_rank_convention(self, ray_session):
        df = _rand_df(13)
        df["grp"] = np.where(df["key"] % 3 == 0, "a", np.where(df["key"] % 3 == 1, "b", "c"))
        ds = ray.data.from_pandas(df[["grp", "val"]]).repartition(8)
        got = quantile_disc_by(
            ds, value_col="val", group_col="grp", qs={"p50": 0.5, "p99": 0.99}
        ).to_pandas().set_index("grp")
        for g, sub in df.groupby("grp"):
            v = np.sort(sub["val"].to_numpy())
            for name, q in (("p50", 0.5), ("p99", 0.99)):
                exp = v[max(1, int(np.ceil(q * len(v)))) - 1]  # ceil(q*n), 1-based
                assert got.loc[g, name] == exp, (g, name)

    def test_handles_nulls_and_negatives(self, ray_session):
        vals = [None, -5.0, -1.5, 0.0, 2.5, float("nan"), 7.0]
        t = pa.table({"grp": ["g"] * len(vals), "val": pa.array(vals, type=pa.float64())})
        ds = ray.data.from_arrow(t)
        got = quantile_disc_by(ds, "val", "grp", {"p50": 0.5}).to_pandas()
        # non-null/non-nan: [-5.0, -1.5, 0.0, 2.5, 7.0]; rank ceil(0.5*5)=3 -> 0.0
        assert got["p50"].iloc[0] == 0.0


def test_sliding_counts_peer_and_boundary(tmp_path):
    """RANGE-frame semantics: rows at the SAME ts count each other (peers),
    and the window is inclusive at exactly -window_s."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from realtime_clickstream_lakehouse_ray.pipelines import window as W

    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [
        (0, 1, base),                      # t0
        (1, 1, base),                      # peer of t0
        (2, 1, base + np.timedelta64(1800, "s")),   # exactly window edge
        (3, 1, base + np.timedelta64(3601, "s")),   # outside all windows
        (4, 2, base),                      # other user
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([pd.Timestamp(r[2]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": ["view"] * 5,
                "value": pa.array([0.0] * 5),
                "props": ['{"k": 1}'] * 5,
            }
        ),
        tmp_path / "events.parquet",
    )
    out = W.events_sliding_counts(str(tmp_path)).to_pandas().set_index("event_id")
    assert out.loc[0, "n_win"] == 2 and out.loc[1, "n_win"] == 2  # peers
    assert out.loc[2, "n_win"] == 3  # includes both at exactly -1800s
    assert out.loc[3, "n_win"] == 1
    assert out.loc[4, "n_win"] == 1


class TestOrderedPrefixMax:
    def test_matches_pandas_cummax_shift(self, ray_session):
        from realtime_clickstream_lakehouse_ray.functions.prefix import (
            PREFIX_MAX_NONE,
            ordered_prefix_max,
        )

        rng = np.random.default_rng(11)
        n = 20_000
        df = pd.DataFrame(
            {
                "okey": rng.permutation(n).astype(np.int64),
                "v": rng.integers(-(10**9), 10**9, n),
            }
        )
        got = (
            ordered_prefix_max(
                ray.data.from_pandas(df).repartition(16),
                order_col="okey", value_col="v", out_col="wm",
            )
            .to_pandas()
            .sort_values("okey", ignore_index=True)
        )
        exp = df.sort_values("okey", ignore_index=True)
        wm = exp["v"].cummax().shift(1)
        exp_wm = wm.fillna(PREFIX_MAX_NONE).astype(np.int64)
        assert (got["wm"].to_numpy() == exp_wm.to_numpy()).all()


class TestWatermarkFilter:
    def test_matches_pandas_reference(self, tmp_path, ray_session):
        """Late-event gate vs a pandas replay of the same jittered arrival
        order; the fixture's random timestamps guarantee genuine drops."""
        from realtime_clickstream_lakehouse_ray.pipelines import window as W

        rng = np.random.default_rng(5)
        n = 3_000
        eid = np.arange(n, dtype=np.int64)
        base = np.datetime64("2024-03-01T00:00:00", "us")
        ts = base + rng.integers(0, 86_400 * 30, n) * np.timedelta64(1_000_000, "us")
        tbl = pa.table(
            {
                "event_id": pa.array(eid),
                "ts": pa.array(ts),
                "user_id": pa.array(rng.integers(0, 50, n)),
                "event_type": pa.array(["view"] * n),
                "value": pa.array(np.zeros(n)),
                "props": pa.array(["{}"] * n),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        late_after_s = 21_600
        got = (
            W.events_watermark_filter(str(tmp_path), late_after_s=late_after_s)
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        jit = ((eid % 100000007) * 2654435761) % 4294967296 % 101
        order = np.lexsort((eid, eid + jit - 50))
        ts_us = ts.astype("datetime64[us]").astype(np.int64)[order]
        wm = pd.Series(ts_us).cummax().shift(1)
        keep_sorted = wm.isna() | (ts_us >= wm - late_after_s * 1_000_000)
        kept_ids = np.sort(eid[order][keep_sorted.to_numpy()])
        n_dropped = n - len(kept_ids)
        assert 0 < n_dropped < n  # fixture exercises the drop path
        assert (got["event_id"].to_numpy() == kept_ids).all()


class TestUserPaths:
    def test_matches_pandas_reference(self, ray_session):
        from realtime_clickstream_lakehouse_ray.pipelines import window as W

        sf = "/root/testdata/sf0.001"
        got = W.events_user_paths(sf, k=20).to_pandas()
        ev = pd.read_parquet(
            sf + "/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
        ).sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        et = ev["event_type"].to_numpy().astype(object)
        uid = ev["user_id"].to_numpy()
        same = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        p = et[:-2][same] + ">" + et[1:-1][same] + ">" + et[2:][same]
        exp = (
            pd.Series(p).value_counts().rename_axis("path").reset_index(name="n")
            .sort_values(["n", "path"], ascending=[False, True], ignore_index=True)
            .head(20)
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.astype({"n": "int64"})
        )
