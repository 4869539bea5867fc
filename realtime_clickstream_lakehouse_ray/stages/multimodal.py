"""Multimodal (image/audio/video) stages: opaque binary columns + typed
metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL / torchaudio / av) are NOT in this container, so
the codec step is stubbed per the build contract: ``try: import PIL``
gates the real path, and the fallback computes a deterministic fake decode
(byte-histogram features + hash-derived dimensions).  Everything around
the stub — binary schema, small-batch sizing, per-actor setup, output
layout — is real and tested, so swapping in a real codec is a one-line
change inside ``_decode_real``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


try:  # pragma: no cover - PIL absent in this container by design
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


class ImageFeatures:
    """Actor-pool stage over binary image payloads.

    batch in : (doc_id, payload: binary)
    batch out: (doc_id, n_bytes, width, height, features: list<float>[8])

    ``__init__`` is where a model / codec would load once per actor; size
    the pool with small ``batch_size`` — binary payloads are wide rows and
    batch x concurrency must fit the worker heap."""

    FEATURE_DIM = 8

    def __init__(self):
        self.have_codec = HAVE_PIL

    def _decode_real(self, payloads: pa.Array):  # pragma: no cover
        raise NotImplementedError(
            "real image decode requires PIL, not present in this container"
        )

    def _decode_stub(self, payloads: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Deterministic fake decode: dims from the payload's md5 (so the
        driver's DuckDB oracle can reproduce them: ``md5(text)`` hex
        substrings), features from the true byte histogram (real vectorized
        compute over the binary buffers — only the codec itself is faked)."""
        import hashlib

        big = payloads.cast(pa.large_binary())
        offs = np.frombuffer(
            big.buffers()[1], dtype=np.int64, count=len(big) + 1, offset=big.offset * 8
        )
        mv = memoryview(big.buffers()[2])
        # md5 is per-row by nature (C call per payload; the pool amortizes)
        hexes = [hashlib.md5(mv[offs[i]: offs[i + 1]]).hexdigest() for i in range(len(big))]
        w = np.array([int(h[:8], 16) for h in hexes], dtype=np.uint64)
        hh = np.array([int(h[8:16], 16) for h in hexes], dtype=np.uint64)
        width = (w % np.uint64(1920) + np.uint64(16)).astype(np.int64)
        height = (hh % np.uint64(1080) + np.uint64(16)).astype(np.int64)
        offsets = offs
        data = np.frombuffer(big.buffers()[2], dtype=np.uint8)
        feats = np.zeros((len(big), self.FEATURE_DIM), dtype=np.float64)
        doc_idx = np.repeat(np.arange(len(big)), offsets[1:] - offsets[:-1])
        np.add.at(feats, (doc_idx, data[: len(doc_idx)] >> 5), 1.0)
        lengths = np.maximum(offsets[1:] - offsets[:-1], 1).astype(np.float64)
        feats /= lengths[:, None]
        return width, height, feats

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].combine_chunks() if isinstance(t["payload"], pa.ChunkedArray) else t["payload"]
        n_bytes = pc.binary_length(payloads).cast(pa.int64())
        if self.have_codec:  # pragma: no cover
            width, height, feats = self._decode_real(payloads)
        else:
            width, height, feats = self._decode_stub(payloads)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": n_bytes,
                "width": pa.array(width),
                "height": pa.array(height),
                "features": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


class FrameSampler:
    """'Video' stage: treat the payload as a frame container and sample
    every ``stride``-th fixed-size frame (real chunking arithmetic; the
    frame *decode* would sit behind the same stub gate as above).

    batch in : (doc_id, payload: binary)
    batch out: (doc_id, frame_idx, frame_bytes)"""

    def __init__(self, frame_size: int = 1024, stride: int = 4):
        self.frame_size = frame_size
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        big = t["payload"].combine_chunks().cast(pa.large_binary()) if isinstance(
            t["payload"], pa.ChunkedArray
        ) else t["payload"].cast(pa.large_binary())
        offsets = np.frombuffer(
            big.buffers()[1], dtype=np.int64, count=len(big) + 1, offset=big.offset * 8
        )
        lengths = offsets[1:] - offsets[:-1]
        n_frames = np.maximum((lengths + self.frame_size - 1) // self.frame_size, 1)
        sampled = (n_frames + self.stride - 1) // self.stride
        doc_ids = np.repeat(np.asarray(t["doc_id"]), sampled)
        frame_idx = (
            np.arange(int(sampled.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(sampled) - sampled, sampled)
        ) * self.stride
        frame_bytes = np.minimum(
            self.frame_size,
            np.repeat(lengths, sampled) - frame_idx * self.frame_size,
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "frame_idx": pa.array(frame_idx),
                "frame_bytes": pa.array(frame_bytes),
            }
        )


class AudioFeatures:
    """Audio stage over binary payloads interpreted as raw s16le PCM — a
    REAL decode (no codec library needed for headerless PCM), fully
    vectorized across rows via the Arrow binary buffers: per-doc sample
    count, sum(|sample|), peak |sample|, clip count (|s| > 30000) and
    zero-crossing count.  All features are integers, so the DuckDB oracle
    (char-pair arithmetic over the same bytes) checks them exactly.

    batch in : (doc_id, payload: binary)
    batch out: (doc_id, n_samples, sum_abs, peak, n_clip, n_zero_cross)

    A trailing odd byte is ignored (s16 frames are 2 bytes).  Stateless
    numpy only, but kept as a callable class so a resampler / codec loaded
    in ``__init__`` slots in without reshaping the pipeline."""

    CLIP = 30000

    def __call__(self, t: pa.Table) -> pa.Table:
        big = (
            t["payload"].combine_chunks().cast(pa.large_binary())
            if isinstance(t["payload"], pa.ChunkedArray)
            else t["payload"].cast(pa.large_binary())
        )
        offs = np.frombuffer(
            big.buffers()[1], dtype=np.int64, count=len(big) + 1, offset=big.offset * 8
        )
        data = np.frombuffer(big.buffers()[2], dtype=np.uint8)
        n_rows = len(big)
        n = (offs[1:] - offs[:-1]) // 2  # samples per doc
        total = int(n.sum())
        doc_idx = np.repeat(np.arange(n_rows), n)
        j = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
        pos = np.repeat(offs[:-1], n) + 2 * j
        s = data[pos].astype(np.int32) | (data[pos + 1].astype(np.int32) << 8)
        s -= (s >= 32768) * 65536  # sign-extend s16le
        abs_s = np.abs(s)
        sum_abs = np.bincount(doc_idx, weights=abs_s, minlength=n_rows).astype(np.int64)
        peak = np.zeros(n_rows, dtype=np.int64)
        np.maximum.at(peak, doc_idx, abs_s)
        n_clip = np.bincount(
            doc_idx, weights=(abs_s > self.CLIP), minlength=n_rows
        ).astype(np.int64)
        if total > 1:
            same_doc = doc_idx[1:] == doc_idx[:-1]
            crossed = ((s[1:] >= 0) != (s[:-1] >= 0)) & same_doc
            n_cross = np.bincount(
                doc_idx[1:][crossed], minlength=n_rows
            ).astype(np.int64)
        else:
            n_cross = np.zeros(n_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_samples": pa.array(n, pa.int64()),
                "sum_abs": pa.array(sum_abs, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
                "n_clip": pa.array(n_clip, pa.int64()),
                "n_zero_cross": pa.array(n_cross, pa.int64()),
            }
        )


def _binary_flat(payloads) -> tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, n+1], flat u8 data) views over an Arrow binary
    column — zero-copy access to every row's bytes at once."""
    big = (
        payloads.combine_chunks().cast(pa.large_binary())
        if isinstance(payloads, pa.ChunkedArray)
        else payloads.cast(pa.large_binary())
    )
    offsets = np.frombuffer(
        big.buffers()[1], dtype=np.int64, count=len(big) + 1, offset=big.offset * 8
    )
    data = np.frombuffer(big.buffers()[2], dtype=np.uint8)
    return offsets, data


class RgbRawFeatures:
    """Second REAL image leg (alongside the stubbed-codec ``ImageFeatures``
    and the real-PCM ``AudioFeatures``): the payload is RAW interleaved
    RGB u8 — headerless, so like PCM it decodes with NO codec library —
    and the stage emits exact per-channel integer statistics.  Trailing
    bytes that don't complete an RGB triple are discarded (the decode
    contract), and sub-pixel payloads emit no rows.

    batch in : (doc_id, payload: binary)
    batch out: (doc_id, channel, n, sum_v, min_v, max_v) — one row per
               (doc, channel in 0..2), all int64, oracle-exact.

    Fully vectorized across rows: one pass builds (row, channel) keys for
    every usable byte; sums via ``np.bincount(weights=...)``, extrema via
    ``np.minimum.at`` / ``np.maximum.at`` — no per-row Python."""

    def __call__(self, t: pa.Table) -> pa.Table:
        offsets, data = _binary_flat(t["payload"])
        lengths = offsets[1:] - offsets[:-1]
        usable = 3 * (lengths // 3)
        n_rows = len(lengths)
        doc_ids = np.asarray(t["doc_id"])
        total = int(lengths.sum())
        if total == 0 or usable.sum() == 0:
            empty = pa.array([], pa.int64())
            return pa.table(
                {"doc_id": empty, "channel": empty, "n": empty,
                 "sum_v": empty, "min_v": empty, "max_v": empty}
            )
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
        pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(
            offsets[:-1] - offsets[0], lengths
        )
        keep = pos_in_row < np.repeat(usable, lengths)
        vals = data[offsets[0]: offsets[0] + total][keep].astype(np.int64)
        rows_k = row_of[keep]
        chan = pos_in_row[keep] % 3
        key = rows_k * 3 + chan
        n_keys = n_rows * 3
        sums = np.bincount(key, weights=vals, minlength=n_keys).astype(np.int64)
        counts = np.bincount(key, minlength=n_keys).astype(np.int64)
        mins = np.full(n_keys, 256, dtype=np.int64)
        maxs = np.full(n_keys, -1, dtype=np.int64)
        np.minimum.at(mins, key, vals)
        np.maximum.at(maxs, key, vals)
        present = counts > 0
        idx = np.nonzero(present)[0]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[idx // 3]),
                "channel": pa.array(idx % 3),
                "n": pa.array(counts[idx]),
                "sum_v": pa.array(sums[idx]),
                "min_v": pa.array(mins[idx]),
                "max_v": pa.array(maxs[idx]),
            }
        )


class RgbDownsample:
    """REAL resize: 2x2 average-pool over raw interleaved-RGB payloads of
    fixed pixel width ``width`` (headerless decode, like the PCM leg).
    Rows truncate to whole pixel rows; odd trailing pixel rows/columns are
    dropped by the pool (floor semantics), and outputs are exact
    ``(a+b+c+d)//4`` integer means — deterministic, pytest-verified
    against a per-image reshape reference.

    batch in : (doc_id, payload: binary)
    batch out: (doc_id, out_h, out_w, pooled: binary)

    The pool's four taps gather through ONE set of global index arrays
    built from the Arrow offsets — every image in the batch pools in the
    same few numpy ops (no per-row Python)."""

    def __init__(self, width: int = 16):
        if width < 2 or width % 2:
            raise ValueError("width must be an even pixel count >= 2")
        self.width = width

    def __call__(self, t: pa.Table) -> pa.Table:
        W = self.width
        Wo = W // 2
        offsets, data = _binary_flat(t["payload"])
        lengths = offsets[1:] - offsets[:-1]
        npix = lengths // 3
        H = npix // W
        Ho = H // 2
        out_vals = Ho * Wo * 3  # bytes per pooled image
        n_rows = len(lengths)
        total_out = int(out_vals.sum())
        doc_ids = np.asarray(t["doc_id"])
        if total_out == 0:
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids[:0]),
                    "out_h": pa.array([], pa.int64()),
                    "out_w": pa.array([], pa.int64()),
                    "pooled": pa.array([], pa.large_binary()),
                }
            )
        q = np.arange(total_out, dtype=np.int64) - np.repeat(
            np.cumsum(out_vals) - out_vals, out_vals
        )
        io = q // (Wo * 3)
        rem = q % (Wo * 3)
        jo = rem // 3
        c = rem % 3
        base = (
            np.repeat(offsets[:-1], out_vals)
            + ((2 * io) * W + 2 * jo) * 3
            + c
        )
        d64 = data.astype(np.int64)
        pooled = (
            d64[base] + d64[base + 3] + d64[base + W * 3] + d64[base + W * 3 + 3]
        ) // 4
        out_offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(out_vals, out=out_offsets[1:])
        pooled_arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            n_rows,
            [None, pa.py_buffer(out_offsets.tobytes()),
             pa.py_buffer(pooled.astype(np.uint8).tobytes())],
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "out_h": pa.array(Ho),
                "out_w": pa.array(np.full(n_rows, Wo, dtype=np.int64)),
                "pooled": pooled_arr,
            }
        )
