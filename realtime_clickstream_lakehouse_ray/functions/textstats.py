"""Vectorized text-analysis kernels for the documents table.

All kernels are Arrow/numpy-vectorized: per-document ragged reductions use
``np.*.reduceat`` over the word ListArray's offsets — never a Python loop
over rows in a hot path.  Cross-engine-exact outputs (counts, md5) are
used by the oracle-checked queries; heuristic outputs (language id,
rolling fingerprints) are rows-only checked.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from realtime_clickstream_lakehouse_ray.functions.hashing import hash64

STOPWORDS = ("the", "a")  # must stay in sync with the SQL oracle's list
_EN_HINTS = frozenset(
    "the a of and to in is was for on as with that it by this".split()
)


def split_words(text: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    words = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text))
    return words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words


def normalize_list_array(
    words: pa.ListArray | pa.ChunkedArray,
) -> pa.ListArray:
    """Rebase a possibly sliced/chunked list array so offsets start at 0 and
    ``.values`` holds exactly the in-slice child elements.

    A sliced (non-zero-offset) ListArray keeps ABSOLUTE offsets over the
    FULL child buffer, so flat kernels that align ``np.repeat(...,
    lengths)`` with ``.values``, or ``reduceat`` over ``offsets[:-1]``,
    would mis-attribute out-of-slice children (e.g. fold trailing words
    into the last doc's signature).  Latent for in-pipeline inputs —
    ``split_words`` returns fresh arrays — but every flat-kernel
    entrypoint normalizes first so external/sliced callers are safe too."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = np.asarray(words.offsets).astype(np.int64)
    values = words.values
    lo = int(offsets[0]) if len(offsets) else 0
    hi = int(offsets[-1]) if len(offsets) else 0
    if lo == 0 and hi == len(values):
        return words
    large = pa.types.is_large_list(words.type)
    cls = pa.LargeListArray if large else pa.ListArray
    mask = pc.is_null(words) if words.null_count else None
    return cls.from_arrays(
        pa.array(offsets - lo, type=pa.int64() if large else pa.int32()),
        values.slice(lo, hi - lo),
        mask=mask,
    )


def _segments(words: pa.ListArray) -> tuple[np.ndarray, np.ndarray]:
    offsets = np.asarray(words.offsets).astype(np.int64)
    return offsets[:-1], offsets[1:] - offsets[:-1]


def word_counts(words: pa.ListArray) -> np.ndarray:
    return np.asarray(pc.list_value_length(words)).astype(np.int64)


def unique_word_counts(words: pa.ListArray) -> np.ndarray:
    """Distinct words per document: sort (doc, word-hash) pairs once, count
    boundaries per segment — O(n log n) vectorized, no per-row sets."""
    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    n_docs = len(lengths)
    flat_hash = hash64(words.values)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    order = np.lexsort((flat_hash, doc_idx))
    dh, hh = doc_idx[order], flat_hash[order]
    new = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        new[1:] = (dh[1:] != dh[:-1]) | (hh[1:] != hh[:-1])
    out = np.zeros(n_docs, dtype=np.int64)
    np.add.at(out, dh, new.astype(np.int64))
    return out


def stopword_counts(words: pa.ListArray, stopwords=STOPWORDS) -> np.ndarray:
    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    hits = np.asarray(
        pc.is_in(words.values, value_set=pa.array(list(stopwords)))
    ).astype(np.int64)
    n_docs = len(lengths)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    out = np.zeros(n_docs, dtype=np.int64)
    np.add.at(out, doc_idx, hits)
    return out


def language_scores(words: pa.ListArray) -> np.ndarray:
    """Heuristic language id: ratio of English-hint words.  The test corpus
    is English word soup, so the classifier is a thresholded hint ratio;
    a real deployment would plug an n-gram model into the same stage."""
    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    hits = np.asarray(
        pc.is_in(words.values, value_set=pa.array(sorted(_EN_HINTS)))
    ).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    out = np.zeros(len(lengths), dtype=np.int64)
    np.add.at(out, doc_idx, hits)
    return out / np.maximum(lengths, 1)


def quality_mask(t: pa.Table) -> np.ndarray:
    """The corpus quality gate as a reusable batch mask (the SAME rule as
    ``text.text_stats``' ``quality_ok`` and its SQL oracle): 10 <= word
    count <= 1000 and stopword ratio < 0.5.  Stateless — a pure function
    of the row's text — so composed pipelines reapply it per stage
    instead of broadcasting a corpus-sized id set."""
    words = split_words(t["text"])
    n_words = word_counts(words)
    n_stop = stopword_counts(words)
    ratio = n_stop.astype(np.float64) / np.maximum(n_words, 1)
    return (n_words >= 10) & (n_words <= 1000) & (ratio < 0.5)


def md5_fingerprints(text: pa.Array) -> pa.Array:
    """Content fingerprint = md5 hex of the utf8 text (oracle: DuckDB
    ``md5(text)``).  md5 is inherently per-row; this runs in an actor-pool
    stage so the cost amortizes across the pool, and the per-row work is a
    C call on a memoryview, not Python string munging."""
    arr = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    buf = arr.cast(pa.large_binary())
    offsets = np.frombuffer(buf.buffers()[1], dtype=np.int64, count=len(buf) + 1, offset=buf.offset * 8)
    data = memoryview(buf.buffers()[2])
    return pa.array(
        [hashlib.md5(data[offsets[i]: offsets[i + 1]]).hexdigest() for i in range(len(buf))]
    )


def md5_word_hashes(arr: pa.Array, nhex: int = 12) -> np.ndarray:
    """First ``nhex`` hex chars of md5 per string -> uint64, memoized per
    DISTINCT value within the batch (natural text repeats words heavily,
    so the per-row md5 C call runs once per distinct word).  The point of
    md5 here is SQL replicability: DuckDB computes the identical value as
    ``CAST('0x' || substr(md5(x), 1, nhex) AS BIGINT)`` — the same
    cross-engine-exact-hash pattern ``winnow_fingerprint_md5`` uses."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    vals = np.asarray(arr, dtype=object)
    u, inv = np.unique(vals, return_inverse=True)
    hu = np.fromiter(
        (int(hashlib.md5(s.encode()).hexdigest()[:nhex], 16) for s in u),
        dtype=np.uint64,
        count=len(u),
    )
    return hu[inv]


def rolling_fingerprint(words: pa.ListArray, window: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: min of rolling-window hashes of
    the word-hash sequence (vectorized via a strided min over windows)."""
    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    wh = hash64(words.values)
    # rolling combine: h[i] ^ rot(h[i+1]) ... within window, approximated by
    # pairwise mix of adjacent hashes then segment-min (stable + vectorized)
    mixed = wh.copy()
    for shift in range(1, min(window, 4)):
        nxt = np.roll(wh, -shift)
        mixed = mixed ^ (nxt << np.uint64(shift)) ^ (nxt >> np.uint64(64 - shift))
    if not len(mixed):
        return np.zeros(len(lengths), dtype=np.uint64)
    return np.minimum.reduceat(mixed, starts)


def winnow_fingerprint_md5(words: pa.ListArray) -> np.ndarray:
    """Winnowing-style content fingerprint, ORACLE-EXACT: min over the
    document's 3-word-shingle md5 values (first 15 hex chars -> int64,
    so it fits BIGINT on both engines).  Shingle construction is
    vectorized (three shifted slices of the flat word array joined by
    one Arrow kernel; cross-document windows masked out); the md5 itself
    is the only per-shingle Python call — md5 is what DuckDB can
    replicate byte-for-byte.  At the 100-TB design point swap in
    ``rolling_fingerprint`` (same shape, xxhash-fast, not
    SQL-replicable)."""
    import hashlib

    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    n_docs = len(lengths)
    flat = words.values
    n = len(flat)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    out = np.full(n_docs, np.iinfo(np.int64).max, dtype=np.int64)
    if n >= 3:
        a = flat.slice(0, n - 2)
        b = flat.slice(1, n - 2)
        c = flat.slice(2, n - 2)
        sh = pc.binary_join_element_wise(a, b, c, " ")
        valid = doc_idx[: n - 2] == doc_idx[2:]
        idx = np.flatnonzero(valid)
        if len(idx):
            sh_valid = sh.take(pa.array(idx))
            vals = np.fromiter(
                (
                    int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    for s in sh_valid.to_pylist()
                ),
                dtype=np.int64,
                count=len(idx),
            )
            np.minimum.at(out, doc_idx[: n - 2][idx], vals)
    short = lengths < 3
    if short.any():
        joined = pc.binary_join(words, " ")
        for i in np.flatnonzero(short):
            s = joined[int(i)].as_py() or ""
            out[i] = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    return out


def word_char_totals(words: pa.ListArray) -> np.ndarray:
    """Total characters across a document's words (excludes whitespace) —
    the numerator of Gopher's mean-word-length rule.  One segment-sum over
    the flat word-length array."""
    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    wl = np.asarray(pc.utf8_length(words.values)).astype(np.int64)
    out = np.zeros(len(lengths), dtype=np.int64)
    if len(wl):
        doc_idx = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        np.add.at(out, doc_idx, wl)
    return out


def top_word_counts(words: pa.ListArray) -> np.ndarray:
    """Occurrence count of each document's most frequent word — the
    numerator of the repeated-token (Gopher "most common word") rule.

    Sort (doc, word-hash) once, derive run lengths, then take the max run
    per document — O(n log n) vectorized, no per-row Counter."""
    words = normalize_list_array(words)
    starts, lengths = _segments(words)
    n_docs = len(lengths)
    out = np.zeros(n_docs, dtype=np.int64)
    flat = hash64(words.values)
    n = len(flat)
    if n == 0:
        return out
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    order = np.lexsort((flat, doc_idx))
    dh, hh = doc_idx[order], flat[order]
    new = np.ones(n, dtype=bool)
    new[1:] = (dh[1:] != dh[:-1]) | (hh[1:] != hh[:-1])
    run_starts = np.flatnonzero(new)
    run_lengths = np.diff(np.append(run_starts, n))
    run_doc = dh[run_starts]
    doc_first = np.ones(len(run_starts), dtype=bool)
    doc_first[1:] = run_doc[1:] != run_doc[:-1]
    first = np.flatnonzero(doc_first)
    out[run_doc[first]] = np.maximum.reduceat(run_lengths, first)
    return out
