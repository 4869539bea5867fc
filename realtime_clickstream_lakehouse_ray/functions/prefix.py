"""Distributed ordered prefix sums (the engine's windowed running-total
primitive: SQL ``SUM(v) OVER (PARTITION BY g ORDER BY o)``).

Shape: ONE narrow sort (only the order/value/group columns shuffle — the
caller projects before calling) + two streaming passes over the sorted
blocks:

  pass 1  per-block partial sums per group + the block's min order key
          (a handful of rows per block — collected to the driver, the
          size of any aggregate);
  driver  blocks tile disjoint order-key ranges after a global sort, so
          ordering the block summaries by min key and cumulating per
          group yields each block's starting offset;
  pass 2  per-block vectorized group cumsum (pandas C kernel) + the
          broadcast offset for (block, group).

Requires ``order_col`` values to be globally unique (doc_id here) so
equal keys cannot straddle a block boundary.  With ``batch_size=None``
each map_batches batch IS one block, so both passes see identical
batch boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def ordered_prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    by_col: str,
    out_col: str = "cum",
) -> ray.data.Dataset:
    """Inclusive running total of ``value_col`` per ``by_col`` group in
    global ``order_col`` order; appends ``out_col`` (int64)."""
    sorted_ds = ds.sort(order_col).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"__min_order": pa.array([], type=pa.int64()),
                 "__by": pa.array([], type=pa.string()),
                 "__sum": pa.array([], type=pa.int64())}
            )
        df = pd.DataFrame(
            {"by": np.asarray(t[by_col]), "v": np.asarray(t[value_col])}
        )
        sums = df.groupby("by", sort=False)["v"].sum()
        mo = int(np.asarray(t[order_col]).min())
        return pa.table(
            {
                "__min_order": pa.array([mo] * len(sums), type=pa.int64()),
                "__by": pa.array(sums.index.astype(str)),
                "__sum": pa.array(sums.to_numpy().astype(np.int64)),
            }
        )

    summaries = (
        sorted_ds.map_batches(
            block_summary, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .to_pandas()  # num_blocks x num_groups rows — small by construction
        .sort_values("__min_order", kind="mergesort", ignore_index=True)
    )
    offsets: dict[tuple[int, str], int] = {}
    running: dict[str, int] = {}
    for mo, by, s in summaries.itertuples(index=False):
        offsets[(int(mo), str(by))] = running.get(str(by), 0)
        running[str(by)] = running.get(str(by), 0) + int(s)
    off_ref = ray.put(offsets)

    def add_cum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        offs = ray.get(off_ref)
        mo = int(np.asarray(t[order_col]).min())
        df = pd.DataFrame(
            {"by": np.asarray(t[by_col]), "v": np.asarray(t[value_col])}
        )
        cum = df.groupby("by", sort=False)["v"].cumsum().to_numpy().astype(np.int64)
        codes, uniques = pd.factorize(df["by"])
        base_per_group = np.array(
            [offs[(mo, str(u))] for u in uniques], dtype=np.int64
        )  # loop over distinct groups in the block, not rows
        return t.append_column(out_col, pa.array(cum + base_per_group[codes]))

    return sorted_ds.map_batches(
        add_cum, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


#: "no predecessor" marker emitted by :func:`ordered_prefix_max` — callers
#: treat it as SQL NULL (the window frame is empty).
PREFIX_MAX_NONE = np.iinfo(np.int64).min


def ordered_prefix_max(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    out_col: str = "wm",
) -> ray.data.Dataset:
    """EXCLUSIVE global running maximum of ``value_col`` in ``order_col``
    order (SQL ``MAX(v) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING)``) — the streaming-watermark primitive.  Appends
    ``out_col`` (int64; ``PREFIX_MAX_NONE`` where the frame is empty).

    Same shape as :func:`ordered_prefix_sum`: ONE narrow sort, a per-block
    (min order key, block max) summary pass (#blocks rows on the driver),
    then a per-block vectorized ``np.maximum.accumulate`` seeded with the
    exclusive running max of the preceding blocks' maxima.  ``order_col``
    values must be globally unique so equal keys cannot straddle blocks."""
    sorted_ds = ds.sort(order_col).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"__min_order": pa.array([], type=pa.int64()),
                 "__max": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "__min_order": pa.array(
                    [int(np.asarray(t[order_col]).min())], type=pa.int64()
                ),
                "__max": pa.array(
                    [int(np.asarray(t[value_col]).max())], type=pa.int64()
                ),
            }
        )

    summaries = (
        sorted_ds.map_batches(
            block_summary, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .to_pandas()  # one row per block
        .sort_values("__min_order", kind="mergesort", ignore_index=True)
    )
    carries: dict[int, int] = {}
    running = PREFIX_MAX_NONE
    for mo, mx in summaries.itertuples(index=False):
        carries[int(mo)] = running
        running = max(running, int(mx))
    carry_ref = ray.put(carries)

    def add_wm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        carry = ray.get(carry_ref)[int(np.asarray(t[order_col]).min())]
        v = np.asarray(t[value_col]).astype(np.int64)
        incl = np.maximum.accumulate(v)
        excl = np.empty(len(v), dtype=np.int64)
        excl[0] = carry
        if len(v) > 1:
            excl[1:] = np.maximum(incl[:-1], carry)
        return t.append_column(out_col, pa.array(excl))

    return sorted_ds.map_batches(
        add_wm, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
