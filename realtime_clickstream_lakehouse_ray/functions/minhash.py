"""MinHash / SimHash kernels for near-duplicate detection, vectorized.

MinHash: per document, ``sig_i = min over shingles of h_i(shingle)`` for
``n_perm`` universal-hash permutations ``h_i(x) = a_i * x + b_i (mod 2^64)``
over one base hash of each shingle — computed as ``np.minimum.reduceat``
per permutation over the flattened shingle-hash array (no per-doc loops).
LSH banding: the signature is cut into ``n_bands`` bands of ``r`` rows;
each band is hashed to one bucket key, and documents sharing any
(band, bucket) are candidate pairs (the classic banding scheme from
Broder / MMDS ch.3).

SimHash: 64-bit signature where bit j is the sign of the sum over word
hashes of ±1 at bit j; near-dups have small Hamming distance.  Banding a
64-bit simhash into 4×16-bit bands guarantees (pigeonhole) that any pair
within Hamming distance 3 collides in at least one band.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from realtime_clickstream_lakehouse_ray.functions.hashing import hash64, splitmix64
from realtime_clickstream_lakehouse_ray.functions.textstats import normalize_list_array


def shingle_hashes(words: pa.ListArray, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Word k-gram hashes per document.

    Returns (flat_hashes, doc_lengths): ``flat_hashes`` concatenates each
    document's shingle hashes; a doc with fewer than k words contributes
    one whole-doc shingle.  Combining adjacent word hashes uses rotate-xor
    chains so shingles are order-sensitive."""
    words = normalize_list_array(words)
    offsets = np.asarray(words.offsets).astype(np.int64)
    lengths = offsets[1:] - offsets[:-1]
    wh = hash64(words.values)
    n_sh = np.maximum(lengths - (k - 1), 1)
    # hash of k consecutive word hashes, vectorized across the flat array
    combo = wh.copy()
    for j in range(1, k):
        shifted = np.roll(wh, -j)
        combo = (combo << np.uint64(5)) ^ (combo >> np.uint64(59)) ^ shifted
    # valid shingle positions: within-doc windows only
    doc_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    pos_in_doc = np.arange(len(wh), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    valid = pos_in_doc < np.repeat(np.maximum(lengths - (k - 1), 1), lengths)
    return combo[valid], n_sh


def minhash_signatures(
    flat: np.ndarray, n_per_doc: np.ndarray, n_perm: int = 128, seed: int = 7
) -> np.ndarray:
    """(n_docs, n_perm) uint64 signature matrix via universal hashing."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=n_perm, dtype=np.uint64)
    starts = np.zeros(len(n_per_doc), dtype=np.int64)
    np.cumsum(n_per_doc[:-1], out=starts[1:])
    sigs = np.empty((len(n_per_doc), n_perm), dtype=np.uint64)
    for i in range(n_perm):  # loop over permutations (128), not rows
        h = flat * a[i] + b[i]
        sigs[:, i] = np.minimum.reduceat(h, starts)
    return sigs


def band_keys(sigs: np.ndarray, n_bands: int = 32) -> np.ndarray:
    """(n_docs, n_bands) uint64 bucket keys: hash of each band's rows."""
    n_docs, n_perm = sigs.shape
    r = n_perm // n_bands
    bands = sigs[:, : n_bands * r].reshape(n_docs, n_bands, r)
    key = np.zeros((n_docs, n_bands), dtype=np.uint64)
    for j in range(r):
        key = splitmix64(key ^ bands[:, :, j])
    return key


def simhash(words: pa.ListArray) -> np.ndarray:
    """64-bit SimHash per document from its word hashes (bit-count votes)."""
    words = normalize_list_array(words)
    offsets = np.asarray(words.offsets).astype(np.int64)
    lengths = offsets[1:] - offsets[:-1]
    wh = hash64(words.values)
    bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
    votes = 2 * bits - 1  # ±1 per bit
    starts = offsets[:-1]
    sums = np.add.reduceat(votes, starts, axis=0) if len(wh) else np.zeros((len(lengths), 64), np.int32)
    sig = (sums > 0).astype(np.uint64)
    return (sig << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


def minhash_perm_params(n_perm: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic universal-hash parameters (a_i odd, b_i) for the
    SQL-replicable minhash: derived via splitmix64 so both engines can
    inline the SAME literal table (the oracle receives them as VALUES)."""
    idx = np.arange(n_perm, dtype=np.uint64)
    a = splitmix64(idx) | np.uint64(1)
    b = splitmix64(idx + np.uint64(1000))
    return a, b


def minhash_md5_signatures(
    words: pa.ListArray, n_perm: int = 16, n: int = 3, nhex: int = 12
) -> tuple[np.ndarray, np.ndarray]:
    """SQL-replicable MinHash: per document, ``sig_i = min over DISTINCT
    word n-grams of ((a_i * h48(gram) + b_i) mod 2^64) >> 16`` where
    ``h48`` is the first 12 md5 hex chars of the gram string — every step
    (md5, HUGEINT mod-2^64 affine, min, shift) is exact integer arithmetic
    DuckDB replays.  Gram construction matches the oracle: 3-word joins
    for docs with >= 3 words, else the whole doc joined.

    Returns ``(doc_index_per_row, sig_matrix)`` where ``sig_matrix`` is
    (n_docs, n_perm) int64 (the >>16 keeps values BIGINT-safe)."""
    import hashlib

    from realtime_clickstream_lakehouse_ray.functions.textstats import _segments

    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    n_docs = len(lengths)
    flat = words.values
    total = len(flat)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    # distinct grams per doc (string form, md5-hashed with a per-batch memo)
    gram_doc: list[np.ndarray] = []
    gram_hash: list[np.ndarray] = []
    if total >= n:
        parts = [flat.slice(j, total - (n - 1)) for j in range(n)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = doc_idx[: total - (n - 1)] == doc_idx[n - 1:]
        idx = np.flatnonzero(valid)
        if len(idx):
            gs = joined.take(pa.array(idx)).to_pylist()
            memo: dict[str, int] = {}
            hv = np.fromiter(
                (
                    memo.setdefault(
                        s, int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16)
                    )
                    for s in gs
                ),
                dtype=np.uint64,
                count=len(idx),
            )
            gram_doc.append(doc_idx[: total - (n - 1)][idx])
            gram_hash.append(hv)
    short = lengths < n
    if short.any():
        joined_docs = pc.binary_join(words, " ")
        sidx = np.flatnonzero(short)
        hv = np.fromiter(
            (
                int(
                    hashlib.md5((joined_docs[int(i)].as_py() or "").encode())
                    .hexdigest()[:nhex],
                    16,
                )
                for i in sidx
            ),
            dtype=np.uint64,
            count=len(sidx),
        )
        gram_doc.append(sidx.astype(np.int64))
        gram_hash.append(hv)
    if not gram_doc:
        return np.arange(0, dtype=np.int64), np.zeros((n_docs, n_perm), np.int64)
    d = np.concatenate(gram_doc)
    h = np.concatenate(gram_hash)
    # distinct within doc
    order = np.lexsort((h, d))
    d, h = d[order], h[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    d, h = d[keep], h[keep]
    a, b = minhash_perm_params(n_perm)
    sigs = np.empty((n_docs, n_perm), dtype=np.int64)
    present = np.zeros(n_docs, dtype=bool)
    present[d] = True
    for i in range(n_perm):
        v = h * a[i] + b[i]  # uint64 wrap == mod 2^64
        mins = np.full(n_docs, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        np.minimum.at(mins, d, v)
        sigs[:, i] = (mins >> np.uint64(16)).astype(np.int64)
    sigs[~present] = 0  # docs with no grams (empty text)
    return d, sigs


def simhash_md5(words: pa.ListArray, nbits: int = 48, nhex: int = 12) -> np.ndarray:
    """SQL-replicable SimHash: per-bit ±1 votes over md5-derived word
    hashes (``md5_word_hashes``), majority sign per bit, ``nbits``-wide
    reassembly.  Every step is integer arithmetic DuckDB reproduces
    exactly, so (doc_id, sig) is an oracle-checkable relation — unlike the
    xxhash64-based :func:`simhash`, which stays the fast non-oracle path."""
    from realtime_clickstream_lakehouse_ray.functions.textstats import md5_word_hashes

    words = normalize_list_array(words)
    offsets = np.asarray(words.offsets).astype(np.int64)
    lengths = offsets[1:] - offsets[:-1]
    wh = md5_word_hashes(words.values, nhex=nhex)
    if not len(wh):
        return np.zeros(len(lengths), dtype=np.uint64)
    bits = ((wh[:, None] >> np.arange(nbits, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
    votes = 2 * bits - 1  # ±1 per bit
    sums = np.add.reduceat(votes, offsets[:-1], axis=0)
    sig = (sums > 0).astype(np.uint64)
    return (sig << np.arange(nbits, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    # popcount via numpy bit tricks
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def exact_jaccard(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Exact Jaccard of two shingle-hash sets (verification step)."""
    ua, ub = np.unique(set_a), np.unique(set_b)
    inter = len(np.intersect1d(ua, ub, assume_unique=True))
    union = len(ua) + len(ub) - inter
    return inter / union if union else 1.0


def ngram_hashes_distinct(
    words: pa.ListArray, n: int = 3
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-document DISTINCT word n-gram hashes with exact doc-boundary
    handling: unlike ``shingle_hashes`` (whose whole-doc fallback for short
    docs can mix in the neighboring document's words via ``np.roll``),
    positions past a document's end contribute 0 to the rotate-xor chain,
    so the same text always maps to the same gram set in any batch — the
    determinism the exact-Jaccard oracle comparison needs.

    A doc with fewer than ``n`` words contributes one whole-doc gram; an
    empty doc contributes none.  Returns ``(flat_hashes, doc_index,
    distinct_count_per_doc)`` where ``flat_hashes`` is deduplicated within
    each document and ``doc_index[i]`` is the owning doc's position in the
    batch.
    """
    words = normalize_list_array(words)
    offsets = np.asarray(words.offsets).astype(np.int64)
    starts, lengths = offsets[:-1], offsets[1:] - offsets[:-1]
    wh = hash64(words.values)
    total = len(wh)
    pos = np.arange(total, dtype=np.int64)
    doc_end = np.repeat(offsets[1:], lengths)
    combo = wh.copy()
    for j in range(1, n):
        shifted = np.roll(wh, -j)
        inbounds = (pos + j) < doc_end
        combo = (
            (combo << np.uint64(5))
            ^ (combo >> np.uint64(59))
            ^ np.where(inbounds, shifted, np.uint64(0))
        )
    n_g = np.where(lengths == 0, 0, np.maximum(lengths - (n - 1), 1))
    pos_in_doc = pos - np.repeat(starts, lengths)
    valid = pos_in_doc < np.repeat(n_g, lengths)
    g = combo[valid]
    d = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)[valid]
    order = np.lexsort((g, d))
    g, d = g[order], d[order]
    if len(g):
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
        g, d = g[keep], d[keep]
    counts = np.bincount(d, minlength=len(lengths)).astype(np.int64)
    return g, d, counts
