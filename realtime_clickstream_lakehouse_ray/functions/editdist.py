"""Pair-vectorized Levenshtein distance (the similarity-join verify kernel).

The classic DP has a sequential dependency along the row
(``dp[i][j-1] + 1``), which normally forces a per-cell Python loop.  The
trick used here keeps the whole computation vectorized ACROSS PAIRS and
across ``j``: the insertion term ``min_{l<=j}(m[l] + (j-l))`` is a running
minimum of ``m[l] - l`` (one ``np.minimum.accumulate`` per row), so the
full matrix costs O(Lmax) numpy passes over a ``[P, L+1]`` block — ~16
passes for short keys, independent of the number of pairs P.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def to_char_matrix(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string/binary array -> (uint8 [n, Lmax] zero-padded matrix,
    int64 [n] byte lengths), built from the value buffers without a
    per-row Python loop."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    big = arr.cast(pa.large_binary())
    offsets = np.frombuffer(
        big.buffers()[1], dtype=np.int64, count=len(big) + 1, offset=big.offset * 8
    )
    data = np.frombuffer(big.buffers()[2], dtype=np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    n = len(big)
    lmax = int(lengths.max()) if n else 0
    mat = np.zeros((n, lmax), dtype=np.uint8)
    row = np.repeat(np.arange(n), lengths)
    col = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(lengths) - lengths, lengths
    )
    mat[row, col] = data[np.repeat(offsets[:-1], lengths) + col]
    return mat, lengths


def levenshtein_pairs(
    a_mat: np.ndarray,
    a_len: np.ndarray,
    b_mat: np.ndarray,
    b_len: np.ndarray,
) -> np.ndarray:
    """Levenshtein distance for P (a, b) pairs given padded char matrices.

    All int32; ~O(Lmax) vectorized passes total.  Returns int32 [P]."""
    p = a_mat.shape[0]
    if p == 0:
        return np.zeros(0, dtype=np.int32)
    lmax = max(a_mat.shape[1], b_mat.shape[1], 1)
    if a_mat.shape[1] < lmax:
        a_mat = np.pad(a_mat, ((0, 0), (0, lmax - a_mat.shape[1])))
    if b_mat.shape[1] < lmax:
        b_mat = np.pad(b_mat, ((0, 0), (0, lmax - b_mat.shape[1])))
    a_len = a_len.astype(np.int64)
    b_len = b_len.astype(np.int64)
    j_idx = np.arange(lmax + 1, dtype=np.int32)
    prev = np.tile(j_idx, (p, 1))  # dp[0][j] = j
    res = np.where(a_len == 0, b_len, -1).astype(np.int32)
    rows = np.arange(p)
    for i in range(1, int(a_len.max()) + 1 if len(a_len) else 1):
        cost = (a_mat[:, i - 1 : i] != b_mat).astype(np.int32)  # [p, lmax]
        e = np.empty((p, lmax + 1), dtype=np.int32)
        e[:, 0] = i
        # substitution/deletion candidates for j = 1..lmax
        e[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        # insertion closure: cur[j] = min_{l<=j} (e[l] + (j-l))
        cur = np.minimum.accumulate(e - j_idx, axis=1) + j_idx
        done = a_len == i
        if done.any():
            res[done] = cur[rows[done], b_len[done]]
        prev = cur
    return res


# ---- deletion-neighborhood (SymSpell-style) blocking ----------------------
_POW_BASE = np.uint64(1099511628211)


def _pow_table(n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = 0xCBF29CE484222325
    for i in range(n):
        out[i] = acc
        acc = (acc * int(_POW_BASE)) & 0xFFFFFFFFFFFFFFFF  # u64 wraparound
    return out


def deletion_variant_hashes(
    mat: np.ndarray, lens: np.ndarray, k: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """u64 hashes of every <= k-deletion variant of each row.

    Completeness (the SymSpell property): if ``lev(a, b) <= k`` then some
    common subsequence reachable by <= k deletions from EACH side exists
    (drop the substituted/inserted chars of any optimal alignment), so the
    two variant sets intersect.  Hash collisions only ADD candidates — the
    DP verify keeps the join exact — so a 64-bit polynomial hash replaces
    materializing variant strings.

    Vectorized: rows are grouped by length; for each deletion pattern
    (O(L^k/k!) patterns per length) the variant hash for ALL rows of that
    length is one masked dot product against the power table.  Returns
    (hashes [V], row_index [V]) with per-row duplicate variants removed.
    """
    n, lmax = mat.shape
    if n == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64)
    pows = _pow_table(lmax + 1)
    out_h: list[np.ndarray] = []
    out_r: list[np.ndarray] = []
    lens = lens.astype(np.int64)
    for length in np.unique(lens):
        length = int(length)
        rows = np.nonzero(lens == length)[0]
        sub = mat[rows, :length].astype(np.uint64)
        import itertools

        patterns: list[tuple[int, ...]] = [
            pat
            for size in range(min(k, length) + 1)
            for pat in itertools.combinations(range(length), size)
        ]
        row_hashes = np.empty((len(rows), len(patterns)), dtype=np.uint64)
        for c, pat in enumerate(patterns):
            keep = np.ones(length, dtype=bool)
            for p in pat:
                keep[p] = False
            kept = sub[:, keep]
            # poly-hash with (value+1) so a zero byte is distinguishable
            row_hashes[:, c] = ((kept + np.uint64(1)) * pows[: kept.shape[1]]).sum(
                axis=1, dtype=np.uint64
            ) + np.uint64(kept.shape[1])
        # drop duplicate variants within a row (equal chars deleted at
        # different positions) — sort each row then diff
        srt = np.sort(row_hashes, axis=1)
        first = np.ones_like(srt, dtype=bool)
        first[:, 1:] = srt[:, 1:] != srt[:, :-1]
        ridx = np.repeat(rows, first.sum(axis=1))
        out_h.append(srt[first])
        out_r.append(ridx)
    return np.concatenate(out_h), np.concatenate(out_r)
