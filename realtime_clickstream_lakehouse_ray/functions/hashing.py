"""Deterministic vectorized 64-bit hashing.

Z-order keys, dedup content hashes and salted repartition keys all need a
hash that is (a) stable across worker processes (Python's builtin ``hash``
is salted per process — unusable), and (b) vectorized.  Primary path is
polars' xxhash64 (deterministic for a given polars build, vectorized in
Rust); fallback is a pure-numpy FNV-1a over the Arrow string buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _as_array(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    if isinstance(arr, np.ndarray):
        return pa.array(arr)
    return arr


def _fnv1a_strings(arr: pa.Array) -> np.ndarray:
    """Pure-numpy FNV-1a over a string array's value buffer (fallback path).

    Sequential in byte position but vectorized across rows per position, so
    cost is O(max_len) numpy ops — acceptable for short keys like doc_id.
    """
    arr = arr.cast(pa.large_binary()) if not pa.types.is_large_binary(arr.type) else arr
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    out = np.full(len(arr), _FNV_OFFSET, dtype=np.uint64)
    max_len = int(lengths.max()) if len(lengths) else 0
    for i in range(max_len):
        mask = lengths > i
        idx = offsets[:-1][mask] + i
        out[mask] = (out[mask] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
    return out


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — mixes integer keys to uniform u64."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hash64(arr, seed: int = 0) -> np.ndarray:
    """Stable vectorized 64-bit hash of a string/int Arrow array -> uint64."""
    arr = _as_array(arr)
    if pa.types.is_integer(arr.type):
        vals = np.asarray(arr.cast(pa.int64())).astype(np.uint64)
        return splitmix64(vals + np.uint64(seed))
    try:
        import polars as pl

        s = pl.Series("h", pl.from_arrow(arr))
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    except Exception:  # pragma: no cover - fallback when polars unavailable
        h = _fnv1a_strings(arr)
        return splitmix64(h + np.uint64(seed)) if seed else h
