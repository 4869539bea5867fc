"""Vectorized per-file Bloom filters over the table key column.

Why: after Z-order clustering the key dimension is hashed, so a file's
[min_key, max_key] range spans nearly the whole key space and range-based
MERGE pruning stops working.  A per-file Bloom filter restores skipping:
a small MERGE source touches only files that (probably) contain a
matching key, instead of copy-on-write-rewriting the entire table.
(Delta/Iceberg ship the same idea as per-file bloom indexes; see
SURVEY.md §2.12.)

Layout: ``bits_per_key`` bits per indexed key (default 10 -> ~1% false
positives at k=4), stored as little-endian packed bytes.  Membership uses
double hashing — ``idx_i = (h1 + i*h2) mod m`` — over one splitmix64-
derived pair per key, so build and probe are pure numpy over the whole
key array at once (no per-key Python).

False positives cost one unnecessary file rewrite (correct, wasteful);
false negatives are impossible by construction.
"""

from __future__ import annotations

import numpy as np

from realtime_clickstream_lakehouse_ray.functions.hashing import splitmix64

DEFAULT_BITS_PER_KEY = 10
DEFAULT_K = 4


def _probe_indices(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing from one u64 hash per key."""
    h1 = hashes.astype(np.uint64)
    h2 = splitmix64(h1) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def build_bloom(
    hashes: np.ndarray,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    k: int = DEFAULT_K,
    m: int | None = None,
) -> bytes:
    """Packed Bloom bitset for the given u64 key hashes.

    Pass a fixed ``m`` (bit count, multiple of 64) when building PARTIAL
    blooms across batches that will be OR-merged — all partials must share
    one geometry for the bitwise union to be a valid filter."""
    n = max(len(hashes), 1)
    if m is None:
        m = ((n * bits_per_key + 63) // 64) * 64  # round to u64 words
    elif m % 64:
        raise ValueError("fixed bloom size m must be a multiple of 64 bits")
    bits = np.zeros(m // 64, dtype=np.uint64)
    if len(hashes):
        idx = _probe_indices(np.asarray(hashes, dtype=np.uint64), m, k).reshape(-1)
        np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & np.int64(63)).astype(np.uint64))
    return bits.tobytes()


def bloom_might_contain(bloom: bytes, hashes: np.ndarray, k: int = DEFAULT_K) -> np.ndarray:
    """Boolean mask: which of ``hashes`` might be in the filter."""
    bits = np.frombuffer(bloom, dtype=np.uint64)
    m = len(bits) * 64
    if m == 0 or not len(hashes):
        return np.zeros(len(hashes), dtype=bool)
    idx = _probe_indices(np.asarray(hashes, dtype=np.uint64), m, k)
    probe = (bits[idx >> 6] >> (idx & np.int64(63)).astype(np.uint64)) & np.uint64(1)
    return probe.all(axis=1)


def bloom_any_match(bloom: bytes, hashes: np.ndarray, k: int = DEFAULT_K) -> bool:
    """True if ANY of ``hashes`` might be present (the merge-prune test)."""
    return bool(bloom_might_contain(bloom, hashes, k=k).any())
