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
import pyarrow.compute as pc

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


def _hash_list_column(arr: pa.Array) -> np.ndarray:
    """Order-sensitive 64-bit hash of a list<int> column, one value per
    row: each element is mixed with its position inside the list, the
    per-row hash is the wrapping segment-sum (cumsum-diff, O(n)) of the
    element hashes, finalized with the list length."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = np.asarray(arr.offsets).astype(np.int64)
    lengths = offsets[1:] - offsets[:-1]
    vals = np.asarray(arr.values.cast(pa.int64())).astype(np.uint64)
    pos = np.arange(len(vals), dtype=np.uint64)
    if len(lengths):
        pos -= np.repeat(offsets[:-1].astype(np.uint64), lengths)
    elem = splitmix64(vals ^ (pos * np.uint64(0x9E3779B97F4A7C15)))
    cs = np.zeros(len(vals) + 1, dtype=np.uint64)
    np.cumsum(elem, out=cs[1:])  # uint64 cumsum wraps mod 2^64 (intended)
    seg = cs[offsets[1:]] - cs[offsets[:-1]]
    return splitmix64(seg ^ lengths.astype(np.uint64))


def table_row_hash(tbl: pa.Table, columns: list[str] | None = None) -> np.ndarray:
    """Deterministic vectorized per-row content hash over ``columns``
    (default: all) -> uint64.  Used by the change-data-feed diff to cancel
    rewrite-only rows: two rows hash equal iff (modulo 64-bit collisions,
    and the CDF pairs this with key equality) their column values are
    equal.  Handles int/string/list<int>/date/timestamp/float columns;
    null validity is mixed in so null and 0 never collide."""
    h = np.full(tbl.num_rows, np.uint64(0x51_7C_C1_B7_27_22_0A_95), dtype=np.uint64)
    for i, name in enumerate(columns or tbl.column_names):
        col = tbl[name]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        t = col.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            ch = _hash_list_column(col)
        elif pa.types.is_floating(t):
            ch = splitmix64(np.asarray(col.cast(pa.float64())).view(np.uint64))
        elif pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
            ch = hash64(col, seed=i + 1)
        else:  # ints, date/timestamp/bool -> int64
            filled = col.cast(pa.int64()).fill_null(0)
            ch = splitmix64(np.asarray(filled).astype(np.uint64) + np.uint64(i + 1))
        if col.null_count:
            ch = ch ^ (np.asarray(pc.is_null(col)).astype(np.uint64) * np.uint64(0xA5A5A5A5A5A5A5A5))
        h = splitmix64(h ^ ch ^ np.uint64(i * 0x100000001B3))
    return h
