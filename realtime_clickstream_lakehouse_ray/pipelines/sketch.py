"""Mergeable cardinality sketches (HyperLogLog) as Ray-Data pipelines.

Why a sketch family: at 10^12-sequence scale an exact COUNT DISTINCT over
a high-cardinality key (user ids, doc fingerprints) is an all-to-all
shuffle of every distinct value; an HLL register table is a CONSTANT-size
(2^p rows) mergeable summary that each batch can produce locally and a
tiny groupby-Max can combine — the canonical partial-then-finalize shape
(reference analog: the Athena/Spark ``approx_count_distinct`` surface the
lakehouse exposes, /root/reference/README.md:113).

Determinism contract: the hash is the murmur3 32-bit finalizer (public
domain; full avalanche — a plain multiplicative hash measured +80% HLL
bias on sequential ids) — chosen because DuckDB can evaluate the SAME
arithmetic in plain SQL (``xor`` + ``//`` shifts + HUGEINT multiply mod
2^32; ``bin()`` for the leading-zero count), so the register table itself
is oracle-checked integer-exact, not just "close".  The float estimate is
derived from the registers on the driver (they are 2^p rows — trivially
small) and property-tested against the exact count in pytest.

Scale shape: per-batch partial registers (<= 2^p rows emitted per batch,
usually far fewer) -> groupby(bucket).Max — the only shuffle moves
O(batches * 2^p) tiny rows, never the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max

from realtime_clickstream_lakehouse_ray.config import tune_context

# 2^P registers; W = 32 - P remaining bits feed the leading-zero rank.
HLL_P = 10
HLL_M = 1 << HLL_P
_W = 32 - HLL_P
_MOD32 = np.uint64(0xFFFFFFFF)


def fmix32(x: np.ndarray) -> np.ndarray:
    """Vectorized murmur3 32-bit finalizer — every step is expressible in
    ANSI SQL over non-negative ints (xor / integer-divide shifts / multiply
    mod 2^32), which is what makes the registers oracle-checkable."""
    h = x.astype(np.uint64) & _MOD32
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(2246822507)) & _MOD32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(3266489909)) & _MOD32
    h ^= h >> np.uint64(16)
    return h


def _hll_partial(t: pa.Table) -> pa.Table:
    """Per-batch HLL partial: (bucket, max_rho) for buckets seen in the
    batch.  Pure numpy; the frexp exponent IS the bit length because every
    ``rem`` (< 2^22) converts to float64 exactly."""
    uid = np.asarray(t["user_id"].cast(pa.int64()), dtype=np.int64)
    if len(uid) and (int(uid.min()) < 0 or int(uid.max()) > 0xFFFFFFFF):
        raise ValueError("hll hash requires keys in [0, 2^32)")
    hv = fmix32(uid.astype(np.uint64))
    bucket = (hv >> np.uint64(_W)).astype(np.int64)
    rem = (hv & np.uint64((1 << _W) - 1)).astype(np.int64)
    _, bit_len = np.frexp(rem.astype(np.float64))
    rho = (_W + 1) - bit_len.astype(np.int64)  # rem == 0 -> frexp exp 0 -> W+1
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    seen = np.nonzero(regs)[0]
    return pa.table(
        {
            "bucket": pa.array(seen, pa.int64()),
            "max_rho": pa.array(regs[seen], pa.int64()),
        }
    )


def hll_user_registers(sf_dir: str) -> ray.data.Dataset:
    """HLL(p=10) register table over ``events.user_id``: one row per
    non-empty register, ``(bucket, max_rho)``, integer-exact vs the SQL
    oracle.  Buckets no key hashed into are absent (both sides agree)."""
    tune_context()
    return (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(_hll_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


def hll_estimate(registers: pa.Table, p: int = HLL_P) -> float:
    """Flajolet-et-al HLL estimator with the small-range (linear counting)
    correction, computed driver-side from the (tiny) register table."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    b = np.asarray(registers["bucket"], dtype=np.int64)
    regs[b] = np.asarray(registers["max_rho"], dtype=np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
