"""Relational pipelines over the TPC-H-ish test tables.

The reference exposes its wide relational surface (joins / aggregates /
sorts) only as latent Athena-on-Delta capability (SURVEY.md §2.5-§2.7,
README.md:113); this module makes those operators first-class Ray Data
pipelines, following the scale rules:

- column pruning at the read (``read_parquet(columns=...)``);
- vectorized pyarrow.compute kernels inside ``map_batches``;
- **partial aggregation** inside ``map_batches`` before the shuffle for
  high-cardinality rollups;
- **broadcast joins** for small dimension tables (``ray.put`` once, dict /
  arrow lookup per batch inside the stage — no shuffle);
- hash-shuffle ``Dataset.join`` only when both sides are large.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from realtime_clickstream_lakehouse_ray.config import tune_context


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    tune_context()
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _e(col, scale: int) -> pa.Array:
    """Lift a fixed-decimal double column onto its exact integer grid
    (price/qty/discount columns carry ≤2 decimals): int64(rint(x*scale)).

    Derived measures are then computed in exact int64 arithmetic and only
    divided back to double at the very end, with the same expression shape
    the DuckDB oracle uses — so both engines produce bit-identical doubles
    and the driver's value-hash comparison is robust (float sums in
    different orders are NOT)."""
    vals = np.asarray(col, dtype=np.float64)
    return pa.array(np.rint(vals * scale).astype(np.int64))


# ---------------------------------------------------------------------------
def q1_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 shape: filter -> computed measures -> grouped aggregate.

    The measures (disc_price, charge) are computed vectorized per batch;
    the groupby shuffles only the (tiny) per-batch rows, keyed on a
    4-value composite key."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )

    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def measures(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        # exact integer-grid arithmetic: qty/price/disc/tax carry 2 decimals
        qty_e2 = np.asarray(_e(t["l_quantity"], 100))
        price_e2 = np.asarray(_e(t["l_extendedprice"], 100))
        disc_e2 = np.asarray(_e(t["l_discount"], 100))
        tax_e2 = np.asarray(_e(t["l_tax"], 100))
        dp_e4 = price_e2 * (100 - disc_e2)  # disc_price * 1e4, exact
        charge_e6 = dp_e4 * (100 + tax_e2)  # charge * 1e6, exact
        # partial (per-batch) combine before the shuffle
        part = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_e2": pa.array(qty_e2),
                "price_e2": pa.array(price_e2),
                "disc_e2": pa.array(disc_e2),
                "dp_e4": pa.array(dp_e4),
                "charge_e6": pa.array(charge_e6),
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty_e2", "sum"), ("price_e2", "sum"), ("disc_e2", "sum"),
                ("dp_e4", "sum"), ("charge_e6", "sum"), ("qty_e2", "count"),
            ]
        )
        return part.rename_columns(
            ["l_returnflag", "l_linestatus", "s_qty", "s_price", "s_disc",
             "s_dp", "s_charge", "n"]
        )

    def finalize(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"]).astype(np.float64)
        s_qty = np.asarray(t["s_qty"]).astype(np.float64)
        s_price = np.asarray(t["s_price"]).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pa.array(s_qty / 100.0),
                "sum_base_price": pa.array(s_price / 100.0),
                "sum_disc_price": pa.array(np.asarray(t["s_dp"]).astype(np.float64) / 10000.0),
                "sum_charge": pa.array(np.asarray(t["s_charge"]).astype(np.float64) / 1000000.0),
                "avg_qty": pa.array(s_qty / 100.0 / n),
                "avg_price": pa.array(s_price / 100.0 / n),
                "avg_disc": pa.array(np.asarray(t["s_disc"]).astype(np.float64) / 100.0 / n),
                "count_order": t["n"],
            }
        )

    return (
        ds.map_batches(measures, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("s_qty", alias_name="s_qty"),
            Sum("s_price", alias_name="s_price"),
            Sum("s_disc", alias_name="s_disc"),
            Sum("s_dp", alias_name="s_dp"),
            Sum("s_charge", alias_name="s_charge"),
            Sum("n", alias_name="n"),
        )
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["l_returnflag", "l_linestatus"])
    )


# ---------------------------------------------------------------------------
def revenue_filter_project(sf_dir: str) -> ray.data.Dataset:
    """M5-style projection + vectorized filter + computed column: 1996 Q1
    lineitems with their discounted revenue (row-level output)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1996-04-01", "us"))

    def fn(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        t = t.filter(keep)
        dp_e4 = np.asarray(_e(t["l_extendedprice"], 100)) * (
            100 - np.asarray(_e(t["l_discount"], 100))
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": pa.array(dp_e4.astype(np.float64) / 10000.0),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
def region_supplier_rollup(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join chain supplier -> nation -> region (both dims tiny):
    the dimension tables are put in the object store ONCE and each batch
    does a vectorized dictionary lookup — no shuffle at all (SURVEY.md
    §2.5 broadcast regime)."""
    nation = pa.concat_tables(ray.get(_read(sf_dir, "nation").to_arrow_refs()))
    region = pa.concat_tables(ray.get(_read(sf_dir, "region").to_arrow_refs()))
    n2r = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())
    )
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    lookup_ref = ray.put(
        {int(nk): r2name[rk] for nk, rk in n2r.items()}
    )

    def _dense_names(lut: dict) -> np.ndarray:
        size = max(lut) + 1
        return np.array([lut.get(i, "") for i in range(size)], dtype=object)

    def join_dims(t: pa.Table) -> pa.Table:
        # stateless task; the lookup is fetched + densified once per
        # worker process (functions/broadcast.py), so parallelism is not
        # capped by an actor-pool size
        from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

        names = get_broadcast(lookup_ref, _dense_names)
        nk = np.asarray(t["s_nationkey"])
        return pa.table(
            {
                "r_name": pa.array(names[nk]),
                "acct_e2": _e(t["s_acctbal"], 100),
            }
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": t["r_name"],
                "n_suppliers": t["n_suppliers"],
                "sum_acctbal": pa.array(np.asarray(t["s_acct"]).astype(np.float64) / 100.0),
            }
        )

    return (
        _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
        .map_batches(join_dims, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("r_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("acct_e2", alias_name="s_acct"),
        )
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
        .sort("r_name")
    )


# ---------------------------------------------------------------------------
def topk(ds: ray.data.Dataset, keys: list[tuple[str, str]], k: int) -> ray.data.Dataset:
    """Distributed exact top-k without a global sort: each block keeps its
    local top-k (Arrow C++ ``sort_by``), the <=k-per-block survivors are
    coalesced to one block and re-sorted.  Moves O(k x n_blocks) rows
    instead of range-partitioning the whole dataset — at 100 TB the
    difference between a ~KB exchange and an all-to-all shuffle.  Exact
    only under a total order, so ``keys`` must include a tiebreaker."""

    def local(t: pa.Table) -> pa.Table:
        return t.sort_by(keys).slice(0, k)

    parts = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    return parts.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def top_customers_by_revenue(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Pre-aggregate orders per customer (partial combine inside
    map_batches), shuffle only the partials, broadcast-join customer names,
    then top-k: the canonical skew-safe rollup shape."""

    def partial(t: pa.Table) -> pa.Table:
        # combine within the batch before the shuffle (exact e2 integers)
        return (
            pa.table({"o_custkey": t["o_custkey"], "tp_e2": _e(t["o_totalprice"], 100)})
            .group_by("o_custkey")
            .aggregate([("tp_e2", "sum"), ("tp_e2", "count")])
            .rename_columns(["o_custkey", "p_sum", "p_cnt"])
        )

    partials = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = partials.groupby("o_custkey").aggregate(
        Sum("p_sum", alias_name="rev_e2"), Sum("p_cnt", alias_name="n_orders")
    )

    cust = pa.concat_tables(
        ray.get(_read(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_arrow_refs())
    )
    cust_ref = ray.put(cust)

    def _sorted_lookup(c: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        keys = np.asarray(c["c_custkey"])
        order = np.argsort(keys)
        return keys[order], np.asarray(c["c_name"])[order]

    def add_name(t: pa.Table) -> pa.Table:
        # stateless task; broadcast lookup fetched + sorted once per worker
        from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

        keys, names = get_broadcast(cust_ref, _sorted_lookup)
        idx = np.searchsorted(keys, np.asarray(t["o_custkey"]))
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "revenue": pa.array(np.asarray(t["rev_e2"]).astype(np.float64) / 100.0),
                "n_orders": t["n_orders"],
                "c_name": pa.array(names[idx]),
            }
        )

    named = agg.map_batches(add_name, batch_format="pyarrow", zero_copy_batch=True)
    return topk(named, [("revenue", "descending"), ("o_custkey", "ascending")], k)


# ---------------------------------------------------------------------------
def order_priority_counts(sf_dir: str) -> ray.data.Dataset:
    """Simple grouped count + min/max over orders (aggregate coverage)."""
    return (
        _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
        .groupby("o_orderpriority")
        .aggregate(
            Count(alias_name="n"),
            Min("o_totalprice", alias_name="min_price"),
            Max("o_totalprice", alias_name="max_price"),
        )
        .sort("o_orderpriority")
    )


# ---------------------------------------------------------------------------
def bucket_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
    num_buckets: int | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Explicit partitioned hash join: add ``bucket = hash(key) % B`` to
    both sides, union, group by bucket, pandas-merge the two sides inside
    each bucket group.  ``how`` is ``inner`` | ``left`` | ``outer`` |
    ``semi`` | ``anti`` (the semi/anti forms emit left columns only, via a
    vectorized per-bucket ``isin`` membership test — no row expansion;
    ``left``/``outer`` keep unmatched rows with the other side's columns
    null — FULL OUTER is safe per bucket because BOTH sides of a key hash
    to the same bucket, so an unmatched row is unmatched globally).

    B python calls total (one per bucket), not one per key — and the only
    shuffle moves each row once, keyed by bucket.  This replaces
    ``Dataset.join`` whose aggregator actors measured 10-20x slower on
    this workload (161s vs ~8s for 600k x 150k rows at 32 CPUs)."""
    import pandas as pd

    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
    from realtime_clickstream_lakehouse_ray.schema import conform_table

    if num_buckets is None:
        ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_buckets = max(4, ncpu)

    l_schema, r_schema = left.schema().base_schema, right.schema().base_schema
    left_cols = list(l_schema.names)
    right_cols = list(r_schema.names)
    superset = pa.schema(
        [l_schema.field(c) for c in left_cols]
        + [r_schema.field(c) for c in right_cols if c not in left_cols]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )
    # Fixed output schema per block: integer columns stay int64 even when an
    # outer/left merge null-fills them (pandas nullable dtypes round-trip to
    # Arrow ints exactly — no int->float64 coercion that would corrupt keys
    # above 2^53 or leave mixed int64/float64 schemas across buckets).
    if how in ("inner", "left", "outer"):
        out_schema = pa.schema(
            [l_schema.field(c) for c in left_cols]
            + [r_schema.field(c) for c in right_cols if c not in left_cols]
        )
    else:  # semi / anti emit left columns only
        out_schema = pa.schema([l_schema.field(c) for c in left_cols])

    def tag(side: int, key: str):
        def fn(t: pa.Table) -> pa.Table:
            bucket = (hash64(t[key]) % np.uint64(num_buckets)).astype(np.int32)
            t = t.append_column("__bucket", pa.array(bucket)).append_column(
                "__side", pa.array(np.full(len(t), side, dtype=np.int8))
            )
            return conform_table(t, superset)  # null-fill the other side's cols

        return fn

    lt = left.map_batches(tag(0, left_on), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag(1, right_on), batch_format="pyarrow", zero_copy_batch=True)

    _nullable = {
        pa.int64(): pd.Int64Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.int8(): pd.Int8Dtype(),
    }

    def merge_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas(types_mapper=_nullable.get)
        l = df.loc[df["__side"] == 0, left_cols]
        r = df.loc[df["__side"] == 1, right_cols]
        if how in ("inner", "left", "outer"):
            out = l.merge(r, left_on=left_on, right_on=right_on, how=how)
        else:
            member = l[left_on].isin(r[right_on])
            out = l[member] if how == "semi" else l[~member]
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return lt.union(rt).groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow"
    )


def order_revenue_join(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Large-large hash join: lineitem revenue rolled up per order, joined
    to orders, top-k by revenue — in ONE shuffle.

    Both sides are tagged with ``bucket = hash(key) % B`` (lineitem is
    pre-combined per key inside each batch first), unioned, and grouped by
    the bucket; inside each bucket group the residual per-key aggregate and
    the join both run as Arrow C++ kernels (``group_by`` + Acero
    ``Table.join``).  Compared to ``groupby(key).aggregate`` followed by a
    bucketed join, this halves the all-to-all exchanges and replaces a
    600k-row sort-by-key with a sort by a B-value int32 — the groupby
    shuffle was 4x the cost of the join itself at sf0.1."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)

    def tag_li(t: pa.Table) -> pa.Table:
        dp_e4 = np.asarray(_e(t["l_extendedprice"], 100)) * (
            100 - np.asarray(_e(t["l_discount"], 100))
        )
        part = (
            pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": pa.array(dp_e4)})
            .group_by("l_orderkey")
            .aggregate([("rev_e4", "sum")])
            .rename_columns(["l_orderkey", "rev_e4"])
        )
        bucket = (hash64(part["l_orderkey"]) % np.uint64(num_buckets)).astype(np.int32)
        return part.append_column("__bucket", pa.array(bucket)).append_column(
            "o_orderpriority", pa.nulls(len(part), pa.string())
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        bucket = (hash64(t["o_orderkey"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "l_orderkey": t["o_orderkey"],
                "rev_e4": pa.nulls(len(t), pa.int64()),
                "__bucket": pa.array(bucket),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(tag_li, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_bucket(g: pa.Table) -> pa.Table:
        side_orders = pc.is_valid(g["o_orderpriority"])
        rev = (
            g.filter(pc.invert(side_orders))
            .select(["l_orderkey", "rev_e4"])
            .group_by("l_orderkey")
            .aggregate([("rev_e4", "sum")])
            .rename_columns(["l_orderkey", "rev_e4"])
        )
        od = g.filter(side_orders).select(["l_orderkey", "o_orderpriority"])
        j = rev.join(od, keys="l_orderkey", join_type="inner")
        return pa.table(
            {
                "o_orderkey": j["l_orderkey"],
                "o_orderpriority": j["o_orderpriority"],
                "revenue": pa.array(
                    np.asarray(j["rev_e4"]).astype(np.float64) / 10000.0
                ),
            }
        )

    joined = li.union(orders).groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow"
    )
    return topk(joined, [("revenue", "descending"), ("o_orderkey", "ascending")], k)


# ---------------------------------------------------------------------------
def top_orders(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Top-k over orders (per-block partial top-k, tiny final merge)."""
    return topk(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"]),
        [("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        k,
    )


def distinct_mktsegments(sf_dir: str) -> pa.Table:
    """Set op: distinct values (``Dataset.unique`` -> tiny table)."""
    vals = _read(sf_dir, "customer", columns=["c_mktsegment"]).unique("c_mktsegment")
    return pa.table({"c_mktsegment": pa.array(sorted(vals))})


# ---------------------------------------------------------------------------
def part_price_bands(sf_dir: str) -> ray.data.Dataset:
    """Range join (custom operator Ray Data lacks; task-list item alongside
    as-of join): each part matched to the price band whose
    [lo, hi) interval contains its retail price.

    The band table is tiny (the usual shape for range joins against
    dimension intervals), so this is the broadcast regime: bands ship once
    via the closure, and each batch resolves every row with ONE
    ``np.searchsorted`` over the sorted interval starts — no shuffle at
    all.  The DuckDB oracle is the equivalent non-equi ``BETWEEN`` join."""
    # deterministic 10-band grid over [900, 1000): lo = 900 + 10*i
    lo = np.arange(900.0, 1000.0, 10.0)

    def band(t: pa.Table) -> pa.Table:
        price = np.asarray(t["p_retailprice"]).astype(np.float64)
        # inner-join semantics: rows outside [lo[0], lo[-1]+10) match no
        # band interval and are DROPPED (mirrors the oracle's BETWEEN join;
        # without the mask, searchsorted would silently clamp out-of-range
        # prices into the edge bands)
        in_range = (price >= lo[0]) & (price < lo[-1] + 10.0)
        t = t.filter(pa.array(in_range))
        price = price[in_range]
        idx = np.searchsorted(lo, price, side="right") - 1
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "band_lo": pa.array(lo[idx]),
                "band_hi": pa.array(lo[idx] + 10.0),
                "p_retailprice": t["p_retailprice"],
            }
        )

    return _read(sf_dir, "part", columns=["p_partkey", "p_retailprice"]).map_batches(
        band, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
def q3_shipping_priority(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """TPC-H Q3 shape: 3-table join (customer ⋈ orders ⋈ lineitem) with
    selective filters, rollup, top-k.

    Composition of the engine's join regimes: the customer side collapses
    to a broadcast KEY SET after its segment filter (semi-join), the
    filtered orders (small fraction) broadcast as a lookup, and lineitem —
    the big side — streams through one partial-rollup ``map_batches`` and
    a single groupby on ``l_orderkey``.  Both build sides run their
    filters DISTRIBUTED (``map_batches``) and only the surviving keys are
    collected for broadcast — the driver never holds an unfiltered table.
    Measures ride the exact integer grid (see ``_e``) so the oracle
    comparison is bit-identical."""
    cutoff = pa.scalar(np.datetime64("1995-03-15", "us"))

    # build side 1: BUILDING-segment customer keys (distributed filter,
    # collect the small surviving key column only)
    cust_keys = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
                ["c_custkey"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    building = np.sort(
        np.concatenate(
            [np.asarray(t["c_custkey"]) for t in ray.get(cust_keys.to_arrow_refs())]
            or [np.array([], dtype=np.int64)]
        )
    )
    bld_ref = ray.put(building)

    # build side 2: pre-cutoff orders of those customers (distributed
    # date filter + broadcast semi-join; collect only the survivors)
    def filter_orders(t: pa.Table) -> pa.Table:
        keys = ray.get(bld_ref)
        t = t.filter(pc.less(t["o_orderdate"], cutoff))
        ck = np.asarray(t["o_custkey"])
        idx = np.searchsorted(keys, ck)
        ok = np.zeros(len(t), dtype=bool)
        in_r = idx < len(keys)
        ok[in_r] = keys[idx[in_r]] == ck[in_r]
        return t.filter(pa.array(ok)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        )

    orders = pa.concat_tables(
        ray.get(
            _read(
                sf_dir,
                "orders",
                columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
            )
            .map_batches(filter_orders, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        )
    )
    if orders.num_rows == 0:
        # empty-guard: no qualifying orders -> empty result (searchsorted
        # over an empty key array would otherwise index at -1)
        return ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "o_orderpriority": pa.array([], pa.string()),
                }
            )
        )
    okeys = np.asarray(orders["o_orderkey"])
    order_ref = ray.put(
        (
            np.sort(okeys),
            np.asarray(orders["o_orderdate"])[np.argsort(okeys)],
            np.asarray(orders["o_orderpriority"])[np.argsort(okeys)],
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        keys, dates, prios = ray.get(order_ref)
        lk = np.asarray(t["l_orderkey"])
        idx = np.searchsorted(keys, lk)
        ok = (idx < len(keys)) & (keys[np.minimum(idx, len(keys) - 1)] == lk)
        t = t.filter(pa.array(ok))
        if not t.num_rows:
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "rev_e4": pa.array([], pa.int64()),
                }
            )
        dp_e4 = np.asarray(_e(t["l_extendedprice"], 100)) * (
            100 - np.asarray(_e(t["l_discount"], 100))
        )
        return (
            pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": pa.array(dp_e4)})
            .group_by("l_orderkey")
            .aggregate([("rev_e4", "sum")])
            .rename_columns(["l_orderkey", "rev_e4"])
        )

    def finalize(t: pa.Table) -> pa.Table:
        keys, dates, prios = ray.get(order_ref)
        lk = np.asarray(t["l_orderkey"])
        idx = np.searchsorted(keys, lk)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": pa.array(np.asarray(t["s"]).astype(np.float64) / 10000.0),
                "o_orderdate": pa.array(dates[idx]),
                "o_orderpriority": pa.array(prios[idx]),
            }
        )

    rolled = (
        _read(
            sf_dir,
            "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("rev_e4", alias_name="s"))
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
    )
    return topk(
        rolled,
        [("revenue", "descending"), ("o_orderdate", "ascending"), ("l_orderkey", "ascending")],
        k,
    )


def customers_without_orders(sf_dir: str, min_total: float = 400_000.0) -> ray.data.Dataset:
    """Distributed ANTI join: customers with no order above ``min_total``
    (TPC-H Q22 shape).  The order-side filter runs as a pruned distributed
    read + ``map_batches`` predicate; the anti semantics ride the bucketed
    hash join (``how="anti"``) — one shuffle, each row moved once, the
    membership test vectorized per bucket.  No driver-side data path."""
    customers = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])

    def hi_value(t: pa.Table) -> pa.Table:
        mask = pc.greater(t["o_totalprice"], pa.scalar(min_total))
        return t.filter(mask).select(["o_custkey"])

    hi_orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        hi_value, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucket_hash_join(
        customers, hi_orders, "c_custkey", "o_custkey", how="anti"
    )


def customer_order_counts(sf_dir: str) -> ray.data.Dataset:
    """LEFT OUTER join + grouped rollup: every customer with their order
    count and total spend (0 for customers with no orders) — the classic
    left-join-aggregate the reference expresses as a Spark outer join.

    Shape (the ``order_revenue_join`` fused pattern): the fact side is
    pre-combined per key inside each batch (partial aggregate BEFORE the
    shuffle, so at most one row per distinct custkey per batch moves),
    both sides are tagged with ``hash(custkey) % B`` and unioned, and ONE
    bucket-keyed shuffle delivers a key's customer row and all its
    partials to the same group — where the residual combine, the left
    join and the null-fill all run as vectorized kernels.  A customer is
    finalized exactly once because its key lives in exactly one bucket.
    Spend stays on the exact e2 integer grid until the final divide so
    the DuckDB oracle matches bit-for-bit."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)

    def tag_cust(t: pa.Table) -> pa.Table:
        bucket = (hash64(t["c_custkey"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "spent_e2": pa.nulls(len(t), pa.int64()),
                "n_orders": pa.nulls(len(t), pa.int64()),
                "__bucket": pa.array(bucket),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        part = (
            pa.table(
                {"c_custkey": t["o_custkey"], "spent_e2": _e(t["o_totalprice"], 100)}
            )
            .group_by("c_custkey")
            .aggregate([("spent_e2", "sum"), ("spent_e2", "count")])
            .rename_columns(["c_custkey", "spent_e2", "n_orders"])
        )
        bucket = (hash64(part["c_custkey"]) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "c_custkey": part["c_custkey"],
                "c_name": pa.nulls(len(part), pa.string()),
                "spent_e2": part["spent_e2"],
                "n_orders": part["n_orders"],
                "__bucket": pa.array(bucket),
            }
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]).map_batches(
        tag_cust, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        tag_orders, batch_format="pyarrow", zero_copy_batch=True
    )

    def merge_bucket(g: pa.Table) -> pa.Table:
        is_cust = pc.is_valid(g["c_name"])
        c = g.filter(is_cust)
        agg = (
            g.filter(pc.invert(is_cust))
            .select(["c_custkey", "spent_e2", "n_orders"])
            .group_by("c_custkey")
            .aggregate([("spent_e2", "sum"), ("n_orders", "sum")])
            .rename_columns(["c_custkey", "spent_e2", "n_orders"])
        )
        keys = np.asarray(agg["c_custkey"]).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        spent = np.asarray(agg["spent_e2"]).astype(np.int64)[order]
        n = np.asarray(agg["n_orders"]).astype(np.int64)[order]
        ck = np.asarray(c["c_custkey"]).astype(np.int64)
        if len(keys):
            idx = np.searchsorted(keys, ck)
            hit = (idx < len(keys)) & (keys[np.minimum(idx, len(keys) - 1)] == ck)
            spent_c = np.where(hit, spent[np.minimum(idx, len(keys) - 1)], 0)
            n_c = np.where(hit, n[np.minimum(idx, len(keys) - 1)], 0)
        else:
            spent_c = np.zeros(len(ck), dtype=np.int64)
            n_c = np.zeros(len(ck), dtype=np.int64)
        return pa.table(
            {
                "c_custkey": c["c_custkey"],
                "c_name": c["c_name"],
                "n_orders": pa.array(n_c.astype(np.int64)),
                "total_spent": pa.array(spent_c.astype(np.float64) / 100.0),
            }
        )

    return cust.union(orders).groupby("__bucket").map_groups(
        merge_bucket, batch_format="pyarrow"
    )


def cheapest_supplier_per_part(sf_dir: str) -> ray.data.Dataset:
    """Grouped ARGMIN with attribute join-back (TPC-H Q2 shape): for every
    part, the supplier of its cheapest lineitem (ties broken by smallest
    suppkey).  Ray Data's aggregate set has Min but no ArgMin — this is the
    two-stage partial-argmin pattern:

    1. per-batch vectorized first-per-key (lexsort by key, price, supp) —
       at most one row per distinct partkey per batch survives;
    2. one shuffle keyed by ``hash(partkey) % B``, then the identical
       vectorized first-per-key per bucket (all keys of a bucket in one
       Python call, never one per key).

    Price rides the exact e2 grid; the reconstructed ``e2 / 100.0`` double
    equals DuckDB's ``round(price*100)/100.0`` bit-for-bit."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_buckets = max(4, ncpu)

    def argmin_rows(t: pa.Table) -> pa.Table:
        part = np.asarray(t["l_partkey"]).astype(np.int64)
        supp = np.asarray(t["l_suppkey"]).astype(np.int64)
        price = np.asarray(_e(t["l_extendedprice"], 100))
        order = np.lexsort((supp, price, part))
        p = part[order]
        first = np.ones(len(p), dtype=bool)
        first[1:] = p[1:] != p[:-1]
        keep = order[first]
        return pa.table(
            {
                "l_partkey": pa.array(part[keep]),
                "l_suppkey": pa.array(supp[keep]),
                "price_e2": pa.array(price[keep]),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        t = argmin_rows(t)
        bucket = (hash64(t["l_partkey"]) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("__bucket", pa.array(bucket))

    def final_bucket(g: pa.Table) -> pa.Table:
        out = argmin_rows(
            pa.table(
                {
                    "l_partkey": g["l_partkey"],
                    "l_suppkey": g["l_suppkey"],
                    "l_extendedprice": pc.divide(
                        pc.cast(g["price_e2"], pa.float64()), 100.0
                    ),
                }
            )
        )
        return pa.table(
            {
                "l_partkey": out["l_partkey"],
                "l_suppkey": out["l_suppkey"],
                "min_price": pa.array(
                    np.asarray(out["price_e2"]).astype(np.float64) / 100.0
                ),
            }
        )

    return (
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(final_bucket, batch_format="pyarrow")
    )


def q5_nation_revenue(
    sf_dir: str, region: str = "ASIA", date_lo: str = "1996-01-01", date_hi: str = "1998-01-01"
) -> ray.data.Dataset:
    """TPC-H Q5 shape: lineitem ⋈ supplier ⋈ nation ⋈ region with a date
    filter, revenue per nation.  The dimension chain (supplier → nation →
    region, all small by nature) is densified on the driver and broadcast
    ONCE — each fact batch does one vectorized gather + filter + partial
    per-nation combine, so the final shuffle moves ≤ |nations| rows per
    batch.  Revenue stays on the exact e4 integer grid until the divide."""
    supplier = pa.concat_tables(
        ray.get(_read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_arrow_refs())
    )
    nation = pa.concat_tables(ray.get(_read(sf_dir, "nation").to_arrow_refs()))
    reg = pa.concat_tables(ray.get(_read(sf_dir, "region").to_arrow_refs()))
    rk = {
        int(k): v
        for k, v in zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
    }
    n_name = {}
    for nk, nrk, nm in zip(
        nation["n_nationkey"].to_pylist(),
        nation["n_regionkey"].to_pylist(),
        nation["n_name"].to_pylist(),
    ):
        if rk[int(nrk)] == region:
            n_name[int(nk)] = nm
    # dense supplier -> nation-name map ('' = supplier outside the region)
    s2n_ref = ray.put(
        (
            np.asarray(supplier["s_suppkey"]).astype(np.int64),
            np.asarray(supplier["s_nationkey"]).astype(np.int64),
            n_name,
        )
    )

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def _dense(args) -> np.ndarray:
        skeys, snations, names = args
        size = int(skeys.max()) + 1
        out = np.full(size, "", dtype=object)
        out[skeys] = [names.get(int(nk), "") for nk in snations]
        return out

    def partial(t: pa.Table) -> pa.Table:
        from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

        names = get_broadcast(s2n_ref, _dense)
        t = t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        )
        supp = np.asarray(t["l_suppkey"]).astype(np.int64)
        nname = names[supp]
        keep = nname != ""
        rev_e4 = (
            np.asarray(_e(t["l_extendedprice"], 100))
            * (100 - np.asarray(_e(t["l_discount"], 100)))
        )[keep]
        return (
            pa.table(
                {
                    "n_name": pa.array(nname[keep].astype(str)),
                    "rev_e4": pa.array(rev_e4),
                }
            )
            .group_by("n_name")
            .aggregate([("rev_e4", "sum")])
            .rename_columns(["n_name", "rev_e4"])
        )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t["n_name"],
                "revenue": pa.array(np.asarray(t["s"]).astype(np.float64) / 10000.0),
            }
        )

    return (
        _read(
            sf_dir,
            "lineitem",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("rev_e4", alias_name="s"))
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
        .sort("revenue", descending=True)
    )


def urgent_order_lineitems(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Bloom-prefiltered SEMI join: lineitems whose order is 1-URGENT.

    The 100-TB shape for "filter a huge fact table by a selective key set
    from another table": a fixed-size Bloom filter of the build-side keys
    is assembled DISTRIBUTED (per-batch partial bitmaps over the filtered
    orders, OR-merged on the driver — each partial is a constant ~128 KB
    regardless of data size), broadcast once via ``ray.put``, and probed
    vectorized inside every lineitem batch.  The ~1%-false-positive
    survivors (a small fraction of the fact table) then go through the
    exact bucketed semi join, so the result is exact while the all-to-all
    moves only the pre-pruned rows.  Same prune-then-verify shape the
    MERGE path uses for file skipping (functions/bloom.py).

    Reference analog: Athena-on-Delta semi-join surface
    (/root/reference/README.md:113); the Bloom-prune regime is this
    engine's scale path, exercised end-to-end here.
    """
    from realtime_clickstream_lakehouse_ray.functions.bloom import (
        DEFAULT_K,
        bloom_might_contain,
        build_bloom,
    )
    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    m_bits = 1 << 20  # fixed geometry so per-batch partials OR-merge

    def urgent_keys(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
        return t.filter(mask).select(["o_orderkey"])

    build = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).map_batches(
        urgent_keys, batch_format="pyarrow", zero_copy_batch=True
    )

    def partial_bloom(t: pa.Table) -> pa.Table:
        bits = build_bloom(hash64(t["o_orderkey"]), m=m_bits)
        return pa.table({"bloom": pa.array([bits], pa.large_binary())})

    # OR-merge the constant-size partials on the driver (bytes, not rows).
    partials = build.map_batches(
        partial_bloom, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    merged = np.zeros(m_bits // 64, dtype=np.uint64)
    for row in partials:
        merged |= np.frombuffer(row["bloom"], dtype=np.uint64)
    bloom_ref = ray.put(merged.tobytes())

    def prune(t: pa.Table) -> pa.Table:
        bloom = get_broadcast(bloom_ref)
        return t.filter(bloom_might_contain(bloom, hash64(t["l_orderkey"]), k=DEFAULT_K))

    probe = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    # exact verify: bucketed semi join over the pruned survivors only
    return bucket_hash_join(
        probe, build, "l_orderkey", "o_orderkey", num_buckets=num_buckets, how="semi"
    )


# ---------------------------------------------------------------------------
def orders_rollup(sf_dir: str) -> pa.Table:
    """GROUPING SETS / ``GROUP BY ROLLUP(o_orderstatus, o_orderpriority)``
    in ONE pass over the data (multi-level aggregation, the Athena-on-Delta
    reporting shape the reference's latent SQL surface implies,
    /root/reference/README.md:113).

    The scan computes per-batch partials at the FINEST grain only; every
    coarser level (per-status, grand total) derives from the tiny finest
    aggregate — |status| x |priority| rows — on the driver.  At 100 TB the
    data is read once and the rollup costs one small groupby, never one
    scan per grouping set.  Sums ride the exact integer cent grid (``_e``)
    so all levels hash-match DuckDB bit-for-bit."""
    import pandas as pd

    ds = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "o_orderstatus": t["o_orderstatus"],
                    "o_orderpriority": t["o_orderpriority"],
                    "cents": _e(t["o_totalprice"], 100),
                }
            )
            .group_by(["o_orderstatus", "o_orderpriority"])
            .aggregate([("cents", "sum"), ("cents", "count")])
        )
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "o_orderpriority": g["o_orderpriority"],
                "cents_part": g["cents_sum"].cast(pa.int64()),
                "n_part": g["cents_count"].cast(pa.int64()),
            }
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("n_part", alias_name="n"), Sum("cents_part", alias_name="sum_cents"))
        .to_pandas()
    )
    lvl1 = (
        fine.groupby("o_orderstatus", as_index=False)[["n", "sum_cents"]]
        .sum()
        .assign(o_orderpriority=None)
    )
    total = pd.DataFrame(
        {
            "o_orderstatus": [None],
            "o_orderpriority": [None],
            "n": [fine["n"].sum()],
            "sum_cents": [fine["sum_cents"].sum()],
        }
    )
    cols = ["o_orderstatus", "o_orderpriority", "n", "sum_cents"]
    out = pd.concat([fine[cols], lvl1[cols], total[cols]], ignore_index=True)
    return pa.table(
        {
            "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
            "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
            "n": pa.array(out["n"].astype("int64")),
            "sum_cents": pa.array(out["sum_cents"].astype("int64")),
        }
    )


# ---------------------------------------------------------------------------
def set_op(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    key: str,
    how: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Distributed ``INTERSECT`` / ``EXCEPT`` (DISTINCT set semantics) on a
    single key column — the SQL set operators Ray Data has no verb for.

    Each side pre-collapses per batch to DISTINCT keys (so the shuffle
    moves at most vocabulary-sized partials, not rows), both sides tag
    ``bucket = hash(key) % B`` and union into ONE shuffle; inside each
    bucket group membership resolves for all keys at once with two
    ``np.unique`` calls + ``np.intersect1d`` / ``np.setdiff1d``.
    Partitioning assumption: all copies of one key land in one bucket
    (guaranteed by hashing the key), so per-bucket set algebra is exact."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

    if how not in ("intersect", "except"):
        raise ValueError(f"how must be 'intersect' or 'except', got {how!r}")
    if num_buckets is None:
        ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_buckets = max(4, ncpu)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            u = pc.unique(t[key].combine_chunks())
            # SQL set operators treat NULL as ONE distinct value (NULL
            # INTERSECT NULL yields NULL).  A null key can't go through
            # hash64/np.unique, so it is routed deterministically to bucket 0
            # and resolved by presence flags in `resolve`.
            nulls = pc.is_null(u)
            valid = u.drop_null()
            bucket = (hash64(valid) % np.uint64(num_buckets)).astype(np.int32)
            if pc.any(nulls).as_py():
                valid = pa.concat_arrays([valid, pa.array([None], u.type)])
                bucket = np.append(bucket, np.int32(0))
            return pa.table(
                {
                    key: valid,
                    "__bucket": pa.array(bucket),
                    "__side": pa.array(np.full(len(valid), side, dtype=np.int8)),
                }
            )

        return fn

    at = a.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True)
    bt = b.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)

    def resolve(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        col = g[key].combine_chunks()
        isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
        ua = np.unique(np.asarray(col.filter(pa.array((side == 0) & ~isnull))))
        ub = np.unique(np.asarray(col.filter(pa.array((side == 1) & ~isnull))))
        out = np.intersect1d(ua, ub) if how == "intersect" else np.setdiff1d(ua, ub)
        arr = pa.array(out, g.schema.field(key).type)
        null_a = bool(isnull[side == 0].any())
        null_b = bool(isnull[side == 1].any())
        keep_null = (
            (null_a and null_b) if how == "intersect" else (null_a and not null_b)
        )
        if keep_null:
            arr = pa.concat_arrays([arr, pa.array([None], arr.type)])
        return pa.table({key: arr})

    return at.union(bt).groupby("__bucket").map_groups(
        resolve, batch_format="pyarrow"
    )


def _event_users(sf_dir: str, event_type: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return ds.map_batches(
        lambda t, et=event_type: t.filter(pc.equal(t["event_type"], et)).select(
            ["user_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _collect_keys(ds: ray.data.Dataset, key: str, dtype: pa.DataType) -> pa.Table:
    """Schema-stable collect for key-only set-op results: an all-empty
    result still carries its column (Ray's union/groupby can emit
    schemaless empty bundles, which would drop the column on
    ``to_pandas``)."""
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({key: pa.array([], dtype)})
    return pa.concat_tables(parts)


def purchasing_clickers(sf_dir: str) -> pa.Table:
    """INTERSECT: distinct users who clicked AND purchased."""
    out = set_op(
        _event_users(sf_dir, "click"), _event_users(sf_dir, "purchase"),
        "user_id", "intersect",
    )
    return _collect_keys(out, "user_id", pa.int64())


def urgent_only_customers(sf_dir: str) -> pa.Table:
    """EXCEPT: customers with an urgent order but NO low-priority one —
    the set-difference operator over two filtered scans of one table."""

    def keys(priority: str) -> ray.data.Dataset:
        return _read(
            sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
        ).map_batches(
            lambda t, p=priority: t.filter(
                pc.equal(t["o_orderpriority"], p)
            ).select(["o_custkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return _collect_keys(
        set_op(keys("1-URGENT"), keys("5-LOW"), "o_custkey", "except"),
        "o_custkey",
        pa.int64(),
    )


# ---------------------------------------------------------------------------
@ray.remote
def _build_broadcast_frame(schema: pa.Schema, *parts: pa.Table):
    """Concat the build side's blocks into the broadcast DataFrame — runs
    as a task so the driver never holds table bytes (blocks arrive
    plasma-zero-copy; only this worker pays the pandas conversion).  Empty
    blocks are skipped (a zero-block build side would crash
    pa.concat_tables); a fully empty side falls back to a typed empty
    frame."""
    live = [t for t in parts if t.num_rows]
    if live:
        return pa.concat_tables(live).to_pandas()
    return schema.empty_table().to_pandas()


def broadcast_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
) -> ray.data.Dataset:
    """Broadcast (map-side) inner hash join: the right side fully
    materializes ONCE, ships to the object store via ``ray.put``, and every
    left batch resolves matches with one vectorized pandas merge — zero
    shuffle.  Only correct to *choose* when the right side is small; that
    decision belongs to ``auto_hash_join`` below."""
    import pandas as pd

    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

    # build-side collect happens INSIDE a Ray task: the driver only ever
    # handles block ObjectRefs and the task's result ref, never table
    # bytes (the engine's driver-data-path-free invariant).  The task's
    # return value IS the broadcast object — its ref feeds get_broadcast
    # exactly like a ray.put ref would.
    ref = _build_broadcast_frame.remote(
        right.schema().base_schema, *right.to_arrow_refs()
    )

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        r = get_broadcast(ref)
        return df.merge(r, left_on=left_on, right_on=right_on, how="inner")

    return left.map_batches(probe, batch_format="pandas")


DEFAULT_BROADCAST_BYTES = 64 << 20  # past this, ship-per-node beats a shuffle no more


def auto_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> ray.data.Dataset:
    """Regime-choosing inner join (the engine's small planner): estimate the
    build side's bytes from dataset metadata (``size_bytes()`` reads parquet
    footers, never data) and pick

    - BROADCAST when the build side fits comfortably in a worker heap —
      one ``ray.put``, zero shuffle; or
    - the explicit bucketed hash join (one shuffle moving each row once)
      when it does not.

    This is the decision Spark's AQE makes with
    ``autoBroadcastJoinThreshold``; here it is explicit, testable, and
    based on file-footer stats so planning costs no I/O."""
    est = right.size_bytes()
    if est is not None and est <= broadcast_threshold_bytes:
        return broadcast_hash_join(left, right, left_on, right_on)
    return bucket_hash_join(left, right, left_on, right_on, how="inner")


def supplier_nation_roster(sf_dir: str) -> ray.data.Dataset:
    """Planner-driven join demo: supplier ⋈ nation through
    ``auto_hash_join`` — nation's footer says ~KB, so the broadcast regime
    is chosen (the bucketed regime is equality-tested in pytest)."""
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    out = auto_hash_join(sup, nat, "s_nationkey", "n_nationkey")
    return out.map_batches(
        lambda t: t.select(["s_suppkey", "s_name", "n_name"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q4_priority_check(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q4 shape: EXISTS semi-join — orders in a date window that
    have at least one returned lineitem, counted per priority.  The
    EXISTS runs as the bucketed hash join's ``semi`` regime (vectorized
    per-bucket ``isin``, no row expansion), the build side pre-collapsed
    to distinct order keys per batch so the shuffle moves keys, not
    lineitems."""
    lo = np.datetime64("1996-01-01T00:00:00", "us").astype("int64")
    hi = np.datetime64("1996-04-01T00:00:00", "us").astype("int64")

    def order_filter(t: pa.Table) -> pa.Table:
        d = np.asarray(t["o_orderdate"]).astype("datetime64[us]").astype(np.int64)
        return t.filter(pa.array((d >= lo) & (d < hi))).select(
            ["o_orderkey", "o_orderpriority"]
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(order_filter, batch_format="pyarrow", zero_copy_batch=True)

    def returned_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table(
            {"l_orderkey": pc.unique(t["l_orderkey"].combine_chunks())}
        )

    keys = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"]).map_batches(
        returned_keys, batch_format="pyarrow", zero_copy_batch=True
    )
    hits = bucket_hash_join(orders, keys, "o_orderkey", "l_orderkey", how="semi")
    return (
        hits.groupby("o_orderpriority")
        .aggregate(Count(alias_name="order_count"))
        .map_batches(
            lambda t: pa.table(
                {
                    "o_orderpriority": t["o_orderpriority"],
                    "order_count": t["order_count"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6 shape: the pure scan-filter-aggregate — discount-band
    revenue over a ship-date year, reduced to ONE row.  Per-batch partial
    sums on the exact integer grid; the driver adds a handful of int64
    partials (the smallest possible collect)."""
    lo = np.datetime64("1996-01-01T00:00:00", "us").astype("int64")
    hi = np.datetime64("1997-01-01T00:00:00", "us").astype("int64")

    def partial(t: pa.Table) -> pa.Table:
        d = np.asarray(t["l_shipdate"]).astype("datetime64[us]").astype(np.int64)
        disc = np.asarray(_e(t["l_discount"], 100))
        qty = np.asarray(_e(t["l_quantity"], 100))
        price = np.asarray(_e(t["l_extendedprice"], 100))
        keep = (d >= lo) & (d < hi) & (disc >= 5) & (disc <= 7) & (qty < 2400)
        return pa.table(
            {"rev_e4": pa.array([int((price[keep] * disc[keep]).sum())], pa.int64())}
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    total = int(parts["rev_e4"].sum()) if len(parts) else 0
    return pa.table({"revenue": pa.array([total / 10000.0], pa.float64())})


def priority_customer_matrix(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join: per-customer urgent-order count vs low-priority
    count, keeping customers that appear on only one side (NULL the
    other).  Each side pre-aggregates per batch (partial counts) into a
    tiny per-customer relation; the outer join itself is the bucketed
    hash join — safe per bucket since both sides of a key co-locate."""

    def side(priority: str, out: str) -> ray.data.Dataset:
        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["o_orderpriority"], priority))
            g = (
                pa.table({"c": t["o_custkey"]})
                .group_by("c")
                .aggregate([("c", "count")])
            )
            return pa.table(
                {"o_custkey": g["c"], "n_part": g["c_count"].cast(pa.int64())}
            )

        return (
            _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("o_custkey")
            .aggregate(Sum("n_part", alias_name=out))
        )

    urgent = side("1-URGENT", "n_urgent")
    low = side("5-LOW", "n_low").map_batches(
        lambda t: t.rename_columns(["c_low", "n_low"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = bucket_hash_join(urgent, low, "o_custkey", "c_low", how="outer")

    def finish(t: pa.Table) -> pa.Table:
        # bucket_hash_join emits true nullable int64 columns, so the key
        # coalesce stays on the integer domain (no float64 round-trip that
        # would corrupt custkeys above 2^53)
        cust = pc.coalesce(
            t["o_custkey"].combine_chunks(), t["c_low"].combine_chunks()
        ).cast(pa.int64())
        return pa.table(
            {
                "custkey": cust,
                "n_urgent": t["n_urgent"].combine_chunks().cast(pa.int64()),
                "n_low": t["n_low"].combine_chunks().cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
