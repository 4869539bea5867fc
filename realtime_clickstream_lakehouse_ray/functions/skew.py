"""Salted repartitioning for hot-key shuffles (north-rule skew handling).

A ``groupby(key)`` with few, hot key values (the reference's partition key
``element`` defaults to "unknown" — a hot shard BY DESIGN,
click_handler.py:164) concentrates each hot key's entire row set on one
reducer.  Salting shards the shuffle key to ``(key, salt)`` so no single
reducer sees a hot key's full volume, then collapses the per-salt
partials — at most ``|keys| x n_salts`` rows — in a second, trivially
small aggregation.

For ALGEBRAIC aggregates the engine usually prefers per-batch
pre-combining (see q1_pricing_summary), which moves even less data; the
salted form is the tool for the cases pre-combining can't cover (per-key
work in ``map_groups``, combiners that don't fit map_batches, or simply a
hot ``groupby`` someone already wrote).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from realtime_clickstream_lakehouse_ray.functions.hashing import splitmix64


def add_salt(ds: ray.data.Dataset, n_salts: int = 32, seed: int = 17) -> ray.data.Dataset:
    """Append a deterministic ``__salt`` in [0, n_salts): a hash of the
    row position within its batch (stable per execution plan, no RNG)."""

    def fn(t: pa.Table) -> pa.Table:
        pos = np.arange(len(t), dtype=np.uint64)
        salt = (splitmix64(pos + np.uint64(seed)) % np.uint64(n_salts)).astype(np.int32)
        return t.append_column("__salt", pa.array(salt))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def salted_counts(
    ds: ray.data.Dataset, key: str, n_salts: int = 32, alias: str = "n"
) -> ray.data.Dataset:
    """``groupby(key).count()`` with salted repartitioning: stage 1 shards
    the shuffle across ``(key, salt)`` reducers, stage 2 sums the tiny
    per-salt partials per key."""
    partials = (
        add_salt(ds, n_salts=n_salts)
        .groupby([key, "__salt"])
        .aggregate(Count(alias_name="__pn"))
    )
    return (
        partials.select_columns([key, "__pn"])
        .groupby(key)
        .aggregate(Sum("__pn", alias_name=alias))
    )
