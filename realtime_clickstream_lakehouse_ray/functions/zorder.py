"""Z-order (Morton) bit-interleave keys, vectorized in numpy.

The engine's Z-ORDER clustering (a Delta OSS capability the reference
delegates to its Delta 1.2 JAR — see SURVEY.md §2.12) computes a 63-bit
Morton key over up to three dimensions and range-sorts on it
(``Dataset.sort`` = Ray's range-partitioned sort shuffle).  Per the north
star, the default dimensions for the tokens table are
``(hash64(source), n_tok, hash64(doc_id))``.
"""

from __future__ import annotations

import numpy as np

_M21 = np.uint64(0x1FFFFF)


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each u64 so consecutive bits are 3 apart."""
    x = x & _M21
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits so consecutive bits are 2 apart."""
    x = x & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def top_bits(x: np.ndarray, bits: int) -> np.ndarray:
    """Keep the top ``bits`` bits of uniform u64 values (for hashed dims)."""
    return x >> np.uint64(64 - bits)


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two 32-bit dims into a 64-bit Morton key."""
    return _part1by1(a) | (_part1by1(b) << np.uint64(1))


def morton3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Interleave three 21-bit dims into a 63-bit Morton key.

    Inputs must already be reduced to 21 significant bits (use ``top_bits``
    for hashed dimensions; small ordered ints like ``n_tok`` fit directly).
    """
    return _part1by2(a) | (_part1by2(b) << np.uint64(1)) | (_part1by2(c) << np.uint64(2))


def hilbert3(x: np.ndarray, y: np.ndarray, z: np.ndarray, bits: int = 21) -> np.ndarray:
    """3-D Hilbert index (63-bit) of 21-bit coords, vectorized.

    Skilling's axes->transpose algorithm (J. Skilling, "Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004) with the per-element
    conditionals turned into numpy masks, then bit-interleave of the
    transpose form (X[0] most significant within each triplet).  Unlike
    Morton order, consecutive Hilbert indices always differ by one unit
    step in exactly one dimension — verified exhaustively in tests.
    """
    n = 3
    X = [x.astype(np.uint64), y.astype(np.uint64), z.astype(np.uint64)]
    M = np.uint64(1) << np.uint64(bits - 1)

    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            mask = (X[i] & Q) != 0
            t = (X[0] ^ X[i]) & P
            t = np.where(mask, np.uint64(0), t)
            inv = np.where(mask, P, np.uint64(0))
            X[0] = X[0] ^ inv ^ t
            if i:
                X[i] = X[i] ^ t
        Q >>= np.uint64(1)

    for i in range(1, n):
        X[i] = X[i] ^ X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > np.uint64(1):
        flip = (X[n - 1] & Q) != 0
        t = np.where(flip, t ^ (Q - np.uint64(1)), t)
        Q >>= np.uint64(1)
    for i in range(n):
        X[i] = X[i] ^ t
    # transpose -> index: X[0]'s bit is the most significant of each triplet
    return _part1by2(X[2]) | (_part1by2(X[1]) << np.uint64(1)) | (
        _part1by2(X[0]) << np.uint64(2)
    )
