"""Window-function operators (ROW_NUMBER / LAG / grouped top-k / exact
COUNT DISTINCT) as Ray-Data-native pipelines.

The reference's latent SQL surface (Athena-on-Delta, README.md:113)
includes analytic window functions; Ray Data has no window operator, so
this module implements the engine's windowed family on the same bucketed
template as ``clickstream.events_sessionize`` / ``events_asof_join``:

    ONE shuffle keyed on ``hash(partition_key) % B`` co-locates every row
    of a partition key in one bucket group; inside each group the window
    is computed for ALL keys at once with a single vectorized sort +
    boundary diff — B Python calls total, never one per key.

Partitioning assumption (documented per the task list): all rows of one
key land in one bucket (guaranteed by hashing the key); a hot key skews
only its own bucket, and bucket count scales with the cluster.

``grouped_topk`` additionally runs a per-batch PARTIAL top-k before the
shuffle (each input batch can contribute at most k rows per key seen in
it), so the all-to-all moves O(k · distinct_keys) rows, not the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from realtime_clickstream_lakehouse_ray.config import tune_context
from realtime_clickstream_lakehouse_ray.functions.hashing import hash64


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    tune_context()
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _num_buckets() -> int:
    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, ncpu)


def _tag_bucket(t: pa.Table, key: str, num_buckets: int) -> pa.Table:
    bucket = (hash64(t[key]) % np.uint64(num_buckets)).astype(np.int32)
    return t.append_column("__bucket", pa.array(bucket))


def _group_starts(sorted_keys: np.ndarray) -> np.ndarray:
    """Indices where a new key run begins in a key-sorted array."""
    n = len(sorted_keys)
    new = np.ones(n, dtype=bool)
    if n > 1:
        new[1:] = sorted_keys[1:] != sorted_keys[:-1]
    return np.nonzero(new)[0]


# ---------------------------------------------------------------------------
def events_user_rank(sf_dir: str) -> ray.data.Dataset:
    """ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id):
    one bucket shuffle, then every user in a bucket is ranked with a
    single mergesort + run-boundary arange — no per-user Python."""
    num_buckets = _num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        return _tag_bucket(
            t.select(["event_id", "user_id", "ts"]), "user_id", num_buckets
        )

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        n = len(g)
        starts = _group_starts(uid)
        sizes = np.diff(np.append(starts, n))
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes) + 1
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "user_id": uid, "rn": rn}
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
def customer_order_lag(sf_dir: str) -> ray.data.Dataset:
    """LAG() window: for each order, whole days since the same customer's
    previous order (orders with no predecessor are dropped, matching the
    oracle's ``WHERE days_since_prev IS NOT NULL``).  ``o_orderdate`` is
    midnight-aligned, so the day diff is exact integer arithmetic."""
    num_buckets = _num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        return _tag_bucket(
            t.select(["o_orderkey", "o_custkey", "o_orderdate"]),
            "o_custkey",
            num_buckets,
        )

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort", ignore_index=True
        )
        cust = g["o_custkey"].to_numpy()
        ts_us = g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        same_cust = np.zeros(n, dtype=bool)
        days = np.zeros(n, dtype=np.int64)
        if n > 1:
            same_cust[1:] = cust[1:] == cust[:-1]
            days[1:] = (ts_us[1:] - ts_us[:-1]) // 86_400_000_000
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy()[same_cust],
                "o_custkey": cust[same_cust],
                "days_since_prev": days[same_cust],
            }
        )

    return (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(lag_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
def grouped_topk(
    ds: ray.data.Dataset,
    key: str,
    order_by: list[str],
    ascending: list[bool],
    k: int,
) -> ray.data.Dataset:
    """Top-k rows per key (deterministic: ``order_by`` must be a total
    order).  Scale shape: per-batch PARTIAL top-k (each batch emits ≤ k
    rows per key it contains — pandas C sort + groupby.head, no Python
    per key) → ONE shuffle of the reduced set keyed on ``hash(key) % B``
    → identical vectorized top-k per bucket."""
    num_buckets = _num_buckets()
    sort_cols = [key, *order_by]
    sort_asc = [True, *ascending]

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        return g.groupby(key, sort=False).head(k)

    def tag(t: pa.Table) -> pa.Table:
        return _tag_bucket(t, key, num_buckets)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return partial(g).drop(columns="__bucket").reset_index(drop=True)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(final, batch_format="pandas")
    )


def top_lineitems_per_supplier(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Grouped top-k showcase: per supplier, the k highest-value lineitems
    (ties broken by orderkey, linenumber — a total order, so the result is
    deterministic and oracle-comparable)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"],
    )
    return grouped_topk(
        ds,
        key="l_suppkey",
        order_by=["l_extendedprice", "l_orderkey", "l_linenumber"],
        ascending=[False, True, True],
        k=k,
    )


# ---------------------------------------------------------------------------
def daily_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT user_id) per day, without shuffling raw rows
    twice: bucket by ``hash(user_id)`` (a user lives wholly in one bucket,
    so per-bucket distinct pairs never double-count), emit per-bucket
    partial counts per date, then a tiny date-keyed Sum finalize."""
    num_buckets = _num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        pairs = pa.table(
            {"event_date": t["ts"].cast(pa.date32()), "user_id": t["user_id"]}
        )
        # per-batch combiner: collapse duplicate (date, user) pairs early
        # (Arrow C++ hash-groupby with no measures = vectorized DISTINCT)
        distinct = pa.TableGroupBy(pairs, ["event_date", "user_id"]).aggregate([])
        return _tag_bucket(distinct, "user_id", num_buckets)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g[["event_date", "user_id"]].drop_duplicates()
        out = pairs.groupby("event_date", sort=False).size().reset_index(name="n_users")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return (
        _read(sf_dir, "events", columns=["ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .groupby("event_date")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


# ---------------------------------------------------------------------------
def events_sliding_counts(sf_dir: str, window_s: int = 1800) -> ray.data.Dataset:
    """Sliding RANGE-frame window: per event, how many events the same user
    produced in the preceding ``window_s`` seconds (inclusive of peers at
    the same timestamp — SQL ``RANGE BETWEEN w PRECEDING AND CURRENT ROW``
    semantics).

    Same one-shuffle bucket template as the other windows; inside a bucket
    ALL users' frames are counted with two global ``np.searchsorted`` calls
    over a composite (segment, time) key — per-user segments are kept
    disjoint by offsetting each segment onto its own key band, so no
    Python loop over users exists."""
    num_buckets = _num_buckets()
    window_us = int(window_s) * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        return _tag_bucket(
            t.select(["event_id", "user_id", "ts"]), "user_id", num_buckets
        )

    def win_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        starts = _group_starts(uid)
        sizes = np.diff(np.append(starts, n))
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        ts0 = ts_us - (ts_us.min() if n else 0)
        band = (ts0.max() if n else 0) + window_us + 2
        key = seg_id * band + ts0
        lo = np.searchsorted(key, key - window_us, side="left")
        hi = np.searchsorted(key, key, side="right")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": uid,
                "n_win": (hi - lo).astype(np.int64),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(win_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
def events_watermark_filter(sf_dir: str, late_after_s: int = 21600) -> ray.data.Dataset:
    """Streaming late-data gate: drop every event whose event time trails
    the watermark — the maximum event time over all EARLIER-ARRIVING
    events, any user — by more than ``late_after_s`` seconds.  This is the
    allowed-lateness semantics of a streaming engine's event-time window
    (the reference's Spark Structured Streaming job relies on
    ``withWatermark``-style bounds implicitly via availableNow batches).

    The events table records event time only, so arrival order is
    simulated by a deterministic integer jitter permutation
    (``arr = event_id + hash(event_id) % 101 - 50`` — a locally shuffled,
    globally ordered stream, the realistic shape of a distributed
    ingest); the identical integer expression runs in the SQL oracle, so
    the check is exact.

    Scale shape: the watermark is the engine's ordered-prefix-MAX
    primitive (``functions.prefix.ordered_prefix_max``) — ONE narrow sort
    of (okey, ts_us) + two streaming passes with a #blocks-row driver
    summary — followed by a stateless vectorized gate.  Nothing about the
    stream is held on the driver."""
    from realtime_clickstream_lakehouse_ray.functions.prefix import (
        PREFIX_MAX_NONE,
        ordered_prefix_max,
    )

    late_us = int(late_after_s) * 1_000_000

    def tag(t: pa.Table) -> pa.Table:
        eid = np.asarray(t["event_id"]).astype(np.int64)
        if len(eid) and (eid.min() < 0 or eid.max() >= (1 << 31)):
            raise ValueError(
                "events_watermark_filter requires event_id in [0, 2^31) "
                "(the arrival key packs (arr, event_id) into int64)"
            )
        jit = ((eid % 100000007) * 2654435761) % 4294967296 % 101
        arr = eid + jit - 50
        ts_us = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "ts_us": pa.array(ts_us),
                "okey": pa.array(arr * (1 << 31) + eid),
            }
        )

    tagged = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"]).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True
    )
    with_wm = ordered_prefix_max(tagged, order_col="okey", value_col="ts_us", out_col="wm")

    def gate(t: pa.Table) -> pa.Table:
        wm = np.asarray(t["wm"])
        ts_us = np.asarray(t["ts_us"])
        keep = (wm == PREFIX_MAX_NONE) | (ts_us >= wm - late_us)
        return t.filter(pa.array(keep)).select(["event_id", "user_id", "ts"])

    return with_wm.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
def events_user_paths(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Sequential pattern mining: the ``k`` most common 3-step event-type
    paths users walk (consecutive triples in each user's event-time
    order; ties on count break by path string, so the set is exact).

    Scale shape: the same one-bucket-shuffle template as the other
    windows; inside a bucket, triples are counted with NO per-row string
    work — event types factorize to small integer codes, a triple packs
    into one int (cardinality ≤ |types|³), and only the ≤|types|³
    DISTINCT triples are ever rendered back to strings.  Per-bucket
    partial counts shuffle (#buckets × ≤|types|³ tiny rows) into one
    ``groupby(path).sum``, then the repo's exact distributed top-k."""
    from realtime_clickstream_lakehouse_ray.pipelines.relational import topk

    num_buckets = _num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        return _tag_bucket(
            t.select(["event_id", "user_id", "ts", "event_type"]),
            "user_id",
            num_buckets,
        )

    def paths_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"path": pd.Series([], dtype=object),
                              "n_part": pd.Series([], dtype=np.int64)})
        if len(g) < 3:
            return empty
        g = g.sort_values(
            ["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True
        )
        uid = g["user_id"].to_numpy()
        codes, types = pd.factorize(g["event_type"])
        same = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        idx = np.flatnonzero(same)
        if not len(idx):
            return empty
        c = len(types)
        packed = (codes[idx] * c + codes[idx + 1]) * c + codes[idx + 2]
        uniq, cnt = np.unique(packed, return_counts=True)
        t1, rest = np.divmod(uniq, c * c)
        t2, t3 = np.divmod(rest, c)
        tarr = types.to_numpy().astype(object)
        path = tarr[t1] + ">" + tarr[t2] + ">" + tarr[t3]  # ≤|types|³ rows
        return pd.DataFrame({"path": path, "n_part": cnt.astype(np.int64)})

    counts = (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(paths_bucket, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n_part", alias_name="n"))
    )
    return topk(counts, keys=[("n", "descending"), ("path", "ascending")], k=k)


def customer_cumulative_spend(sf_dir: str) -> ray.data.Dataset:
    """Running total per customer — SQL ``SUM(spend) OVER (PARTITION BY
    o_custkey ORDER BY o_orderdate, o_orderkey)`` — on the distributed
    ordered-prefix-sum primitive (``functions/prefix.py``): ONE narrow
    sort over (order key, custkey, cents), then two streaming passes
    (per-block group partials -> driver offset table -> per-block
    vectorized cumsum).  No per-key Python, no per-row state.

    The composite ORDER BY packs into one int64 sort key
    ``epoch_days * 2^32 + o_orderkey`` — bounds asserted explicitly (a
    clear error beats silent wraparound; cf. ADVICE on int packing).
    Spend is exact integer cents (``round(price*100)``), so the running
    sums are associative and reproducible at any block split."""
    from realtime_clickstream_lakehouse_ray.functions.prefix import ordered_prefix_sum

    def prep(t: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.days_between(pa.scalar(0).cast(pa.timestamp("us")), t["o_orderdate"]),
            pa.int64(),
        )
        key = np.asarray(t["o_orderkey"], dtype=np.int64)
        d = np.asarray(days, dtype=np.int64)
        if len(key) and (key.min() < 0 or key.max() >= 2**32 or d.max() >= 2**30):
            raise ValueError(
                "customer_cumulative_spend: o_orderkey must fit uint32 and "
                "o_orderdate in [1970, ~2^30 days) for the packed sort key"
            )
        cents = np.rint(np.asarray(t["o_totalprice"]) * 100.0).astype(np.int64)
        return pa.table(
            {
                "__ord": pa.array((d << np.int64(32)) | key),
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "spend_cents": pa.array(cents),
            }
        )

    ds = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return ordered_prefix_sum(
        ds, order_col="__ord", value_col="spend_cents", by_col="o_custkey",
        out_col="cum_spend_cents",
    ).select_columns(["o_custkey", "o_orderkey", "cum_spend_cents"])


def events_tumbling_counts(
    sf_dir: str, window_s: int = 3600
) -> ray.data.Dataset:
    """Tumbling (fixed, non-overlapping) window aggregate — the streaming
    GROUP BY window companion to the sliding-window op: per (user,
    1-hour window) event count and value total.  The window id is pure
    integer arithmetic on the timestamp (``epoch_us // window``), so no
    shuffle template is needed at all: per-batch arrow partial
    aggregation, then ONE groupby over the already-collapsed partials —
    value totals ride the exact cents grid for a bit-identical oracle."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    win_us = np.int64(window_s) * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        cents = np.rint(np.asarray(t["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        g = (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "window_id": pa.array(ts // win_us),
                    "cents": pa.array(cents),
                }
            )
            .group_by(["user_id", "window_id"])
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "window_id": g["window_id"],
                "cents_part": g["cents_sum"].cast(pa.int64()),
                "n_part": g["cents_count"].cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_id"])
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("cents_part", alias_name="cents"),
        )
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_id": t["window_id"],
                "n": t["n"].combine_chunks().cast(pa.int64()),
                "sum_value": pc.divide(
                    t["cents"].combine_chunks().cast(pa.float64()), 100.0
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def events_hopping_counts(
    sf_dir: str, window_s: int = 3600, hop_s: int = 900
) -> ray.data.Dataset:
    """Hopping-window aggregate (overlapping fixed windows, the third of
    the streaming-window trio with sliding and tumbling): window ``w``
    covers ``[w*hop, w*hop + window)``, so each event belongs to exactly
    ``window/hop`` windows — a vectorized repeat-explode per batch (the
    flat_map step), partial counts per (user, window) collapsed per batch
    before the ONE groupby."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    win_us = np.int64(window_s) * 1_000_000
    hop_us = np.int64(hop_s) * 1_000_000

    def explode_partial(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        users = np.asarray(t["user_id"]).astype(np.int64)
        # windows w with w*hop <= ts < w*hop + window
        w_hi = ts // hop_us  # inclusive
        w_lo = (ts - win_us) // hop_us + 1  # inclusive
        counts = (w_hi - w_lo + 1).astype(np.int64)
        rep_u = np.repeat(users, counts)
        w = (
            np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
            + np.repeat(w_lo, counts)
        )
        g = (
            pa.table({"user_id": pa.array(rep_u), "window_id": pa.array(w)})
            .group_by(["user_id", "window_id"])
            .aggregate([("window_id", "count")])
        )
        return pa.table(
            {
                "user_id": g["user_id"],
                "window_id": g["window_id"],
                "n_part": g["window_id_count"].cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(explode_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "window_id"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_id": t["window_id"],
                "n": t["n"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def events_user_ntile(sf_dir: str, n_tiles: int = 4) -> ray.data.Dataset:
    """NTILE(n) OVER (PARTITION BY user_id ORDER BY ts, event_id) — the
    equal-frequency binning window function (the partition-wise form of
    quantile bucketing a curriculum sampler uses).  Same bucketed template
    as ``events_user_rank``; the tile for EVERY user in a bucket comes
    from one vectorized closed-form over the 0-based rank:

        q, r = divmod(n_rows_of_user, n_tiles)
        tile(rank) = rank // (q+1)              if rank <  r*(q+1)
                     r + (rank - r*(q+1)) // q  otherwise

    which is exactly SQL NTILE's "first r tiles get one extra row"."""
    num_buckets = _num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        return _tag_bucket(
            t.select(["event_id", "user_id", "ts"]), "user_id", num_buckets
        )

    def ntile_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort", ignore_index=True)
        uid = g["user_id"].to_numpy()
        n = len(g)
        starts = _group_starts(uid)
        sizes = np.diff(np.append(starts, n))
        rank0 = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        size = np.repeat(sizes, sizes)
        q, r = size // n_tiles, size % n_tiles
        cut = r * (q + 1)
        big = rank0 < cut
        tile = np.where(
            big,
            rank0 // np.maximum(q + 1, 1),
            r + (rank0 - cut) // np.maximum(q, 1),
        ) + 1
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": uid,
                "tile": tile.astype(np.int64),
            }
        )

    return (
        _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(ntile_bucket, batch_format="pandas")
    )
