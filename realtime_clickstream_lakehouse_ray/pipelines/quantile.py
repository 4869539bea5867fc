"""Exact distributed quantiles (DuckDB ``quantile_disc`` semantics) via
two-pass histogram refinement — no global sort, no driver-side data.

Algorithm (the classic distributed-selection shape; cf. external
selection / M-of-N median refinement in the database literature):

1. **Pass 1 (one scan):** map each double to its order-preserving uint64
   bit pattern (sign-flip trick) and histogram the top ``BIN_BITS`` bits
   per group — a ``(group, bin) -> count`` partial per batch, combined by
   a tiny Ray groupby-Sum.  The histogram is value-range-free (no
   min/max pre-scan) and its size is bounded by distinct occupied bins,
   not rows.
2. **Driver (small data only):** cumulate per-group bin counts; for each
   requested quantile q the discrete rank is ``ceil(q*n)`` (1-based,
   DuckDB's quantile_disc convention), which pins the one candidate bin
   holding that order statistic.
3. **Pass 2 (one scan):** filter to rows whose (group, bin) is a
   candidate (broadcast set, no shuffle), collect only those values —
   expected ``n / 2^BIN_BITS`` rows per group — sort per (group, bin) and
   index the exact order statistic.

The result is the ACTUAL data value (no interpolation), so it matches
the SQL oracle byte-for-byte.  At 100 TB the driver holds only occupied
bins (≤ 2^20 per group) and candidate-bin values (~n/2^20 per group);
both scans stream.  Nulls/NaNs are excluded, matching SQL aggregate
semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from realtime_clickstream_lakehouse_ray.config import tune_context

BIN_BITS = 20  # histogram on the top 20 bits of the flipped double


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    tune_context()
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _flip_bits(vals: np.ndarray) -> np.ndarray:
    """Order-preserving double -> uint64: negative values flip all bits,
    non-negative flip only the sign bit (IEEE-754 total order)."""
    bits = vals.astype(np.float64).view(np.uint64)
    mask = np.where(
        bits >> np.uint64(63),
        np.uint64(0xFFFFFFFFFFFFFFFF),
        np.uint64(0x8000000000000000),
    )
    return bits ^ mask


def quantile_disc_by(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    qs: dict[str, float],
) -> pa.Table:
    """Exact discrete quantiles of ``value_col`` per ``group_col`` value.

    Returns a small in-memory table ``(group_col, *qs.keys())`` — one row
    per group, one column per named quantile.  ``qs`` maps output column
    name -> q in (0, 1]."""
    shift = np.uint64(64 - BIN_BITS)

    def hist_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[value_col]))
        vals = np.asarray(t[value_col], dtype=np.float64)
        ok = ~np.isnan(vals)
        grp = np.asarray(t[group_col])[ok]
        bins = (_flip_bits(vals[ok]) >> shift).astype(np.int64)
        df = pd.DataFrame({"grp": grp, "bin": bins})
        out = df.groupby(["grp", "bin"], sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["grp", "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # occupied bins only — small by construction
    )

    # -- driver: locate the candidate bin per (group, quantile) -----------
    candidates: set[tuple[object, int]] = set()
    # (group, bin) -> count of values in strictly earlier bins (for pass-2 indexing)
    prior: dict[tuple[object, int], int] = {}
    targets: list[tuple[object, str, int, int]] = []  # (grp, qname, bin, rank)
    for grp, gdf in hist.groupby("grp", sort=False):
        gdf = gdf.sort_values("bin", ignore_index=True)
        counts = gdf["cnt"].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for qname, q in qs.items():
            rank = max(1, int(np.ceil(q * n)))  # 1-based, quantile_disc
            i = int(np.searchsorted(cum, rank, side="left"))
            b = int(gdf["bin"].iloc[i])
            candidates.add((grp, b))
            prior[(grp, b)] = int(cum[i]) - int(counts[i])
            targets.append((grp, qname, b, rank))

    cand_df = pd.DataFrame(sorted(candidates), columns=["grp", "bin"])
    cand_ref = ray.put(cand_df)

    def collect_candidates(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)  # tiny broadcast table, local fetch
        t = t.filter(pc.is_valid(t[value_col]))
        vals = np.asarray(t[value_col], dtype=np.float64)
        ok = ~np.isnan(vals)
        vals = vals[ok]
        grp = np.asarray(t[group_col])[ok]
        bins = (_flip_bits(vals) >> shift).astype(np.int64)
        df = pd.DataFrame({"grp": grp, "bin": bins, "val": vals})
        keep = df.merge(cands, on=["grp", "bin"], how="inner")  # C hash join
        return pa.Table.from_pandas(keep, preserve_index=False)

    cand_rows = ds.map_batches(
        collect_candidates, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # ~n / 2^BIN_BITS rows per group — small by construction

    sorted_bins = {
        key: np.sort(sub["val"].to_numpy())
        for key, sub in cand_rows.groupby(["grp", "bin"], sort=False)
    }
    rows: dict[object, dict[str, float]] = {}
    for grp, qname, b, rank in targets:
        vals = sorted_bins[(grp, b)]
        rows.setdefault(grp, {})[qname] = float(vals[rank - prior[(grp, b)] - 1])
    groups = sorted(rows)
    return pa.table(
        {
            group_col: pa.array(groups),
            **{
                qname: pa.array([rows[g][qname] for g in groups], type=pa.float64())
                for qname in qs
            },
        }
    )


def order_price_winsorized(sf_dir: str) -> ray.data.Dataset:
    """Winsorization — the quantile primitive reused as a TRANSFORM:
    clamp each order's value to its priority's exact [p05, p95] band
    (the outlier-capping step run before stats or loss-weighted
    training).  Two streaming scans compute the cuts
    (``quantile_disc_by``), the tiny per-group cut table broadcasts once,
    and the clamp itself is one stateless vectorized pass — no shuffle.
    quantile_disc returns ACTUAL data values, so the clamped output is
    float-arithmetic-free and bit-exact against the SQL oracle."""
    import ray as _ray

    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    cuts = quantile_disc_by(
        ds,
        value_col="o_totalprice",
        group_col="o_orderpriority",
        qs={"lo": 0.05, "hi": 0.95},
    )
    grp = np.asarray(cuts["o_orderpriority"]).astype(object)
    order = np.argsort(grp)
    ref = _ray.put(
        (
            grp[order],
            np.asarray(cuts["lo"])[order],
            np.asarray(cuts["hi"])[order],
        )
    )

    def clamp(t: pa.Table) -> pa.Table:
        g, lo, hi = get_broadcast(ref)
        keys = np.asarray(t["o_orderpriority"]).astype(object)
        idx = np.searchsorted(g, keys)
        vals = np.asarray(t["o_totalprice"], dtype=np.float64)
        out = np.minimum(np.maximum(vals, lo[idx]), hi[idx])
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "price_w": pa.array(out),
            }
        )

    return ds.map_batches(clamp, batch_format="pyarrow", zero_copy_batch=True)


def order_price_quantiles(sf_dir: str) -> pa.Table:
    """Per-priority exact p50/p90/p99 of order value — the engine's
    distributed-selection showcase (two streaming scans, no sort)."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    return quantile_disc_by(
        ds,
        value_col="o_totalprice",
        group_col="o_orderpriority",
        qs={"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
