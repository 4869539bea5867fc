"""Multimodal (image/audio/video) stages: opaque binary columns + typed
metadata, processed by actor-pool map_batches stages.

The image leg carries a REAL dependency-free codec for three containers —
PPM (P6), BMP (24bpp BI_RGB) and PNG (8-bit RGB, zlib + filter
reconstruction, stdlib ``zlib`` only) — sniffed by magic bytes per
payload.  Exotic containers (JPEG etc.) fall through to PIL when present
(``try: import PIL``); payloads that are no recognized container at all
(the text-bytes-as-payload test corpus) take the deterministic stub
(byte-histogram features + hash-derived dimensions) so schema/plumbing
stay exercised end to end either way.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


try:  # pragma: no cover - PIL absent in this container by design
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


# ---- dependency-free image codec (PPM / BMP / PNG) -----------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PPM_HEADER = re.compile(rb"^P6\s+(?:#[^\n]*\n\s*)*(\d+)\s+(\d+)\s+(\d+)\s")


def sniff_container(payload: bytes) -> str | None:
    """'ppm' | 'bmp' | 'png' | None by magic bytes."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == PNG_SIG:
        return "png"
    return None


def encode_ppm(width: int, height: int, rgb: np.ndarray) -> bytes:
    """Raw interleaved RGB u8 -> binary PPM (P6)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.size != width * height * 3:
        raise ValueError("rgb size must be width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb.tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"only maxval 255 PPM supported (got {maxval})")
    body = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return w, h, body


def encode_bmp(width: int, height: int, rgb: np.ndarray) -> bytes:
    """Raw interleaved RGB u8 -> 24bpp uncompressed BMP (BI_RGB): BGR pixel
    order, rows bottom-up and padded to 4-byte multiples per the format."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = rgb[::-1, :, ::-1]  # bottom-up rows, RGB->BGR
    pad = (-(width * 3)) % 4
    rows = np.zeros((height, width * 3 + pad), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24bpp BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return w, h, np.ascontiguousarray(rows[:, :, ::-1]).reshape(-1)  # BGR->RGB


def encode_png(width: int, height: int, rgb: np.ndarray) -> bytes:
    """Raw interleaved RGB u8 -> PNG (8-bit RGB, filter 0 scanlines,
    stdlib zlib)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8).reshape(height, width * 3)
    raw = np.zeros((height, width * 3 + 1), dtype=np.uint8)
    raw[:, 1:] = rgb

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, height: int, stride: int) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4, bpp=3).  Filters 0/2 are
    fully vectorized; 1 (Sub) is three interleaved mod-256 prefix sums;
    3/4 (Average/Paeth) recurse on the left neighbor so they fall back to
    a per-byte loop — encoders here emit filter 0, so the loop only runs
    on foreign PNGs."""
    lines = raw.reshape(height, stride)
    out = np.zeros((height, stride - 1), dtype=np.uint8)
    bpp = 3
    for y in range(height):
        f = int(lines[y, 0])
        line = lines[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride - 1, np.int64)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            rec = line.copy()
            for c in range(bpp):
                rec[c::bpp] = np.cumsum(line[c::bpp]) % 256
        elif f in (3, 4):  # Average / Paeth: left-recursive
            rec = np.zeros_like(line)
            for i in range(len(line)):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 3:
                    rec[i] = (line[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                    rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(-1)


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit non-interlaced RGB PNG supported "
                    f"(depth={depth}, color={ctype}, interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * 3 + 1
    if len(raw) != h * stride:
        raise ValueError("PNG payload size mismatch")
    return w, h, _png_unfilter(raw, h, stride)


_DECODERS = {"ppm": decode_ppm, "bmp": decode_bmp, "png": decode_png}


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Sniff + decode one encoded image payload to (width, height, flat
    interleaved RGB u8).  Raises ValueError for unrecognized containers."""
    kind = sniff_container(payload)
    if kind is None:
        raise ValueError("unrecognized image container (no PPM/BMP/PNG magic)")
    return _DECODERS[kind](payload)


class ImageFeatures:
    """Actor-pool stage over binary image payloads.

    batch in : (doc_id, payload: binary)
    batch out: (doc_id, n_bytes, width, height, features: list<float>[8])

    Recognized containers (PPM/BMP/PNG magic on EVERY payload of the
    batch) take the REAL codec: dims from the actual header, features =
    8-bucket histogram (``pixel >> 5``) over the DECODED interleaved-RGB
    bytes, normalized by pixel-byte count — container-invariant (the same
    pixels give the same features from PPM, BMP or PNG) and
    SQL-replayable when the oracle knows the encoded pixel source.
    Unrecognized payloads (the text-as-binary test corpus) keep the
    deterministic stub so the plumbing is exercised under any input.

    ``__init__`` is where a model / codec would load once per actor; size
    the pool with small ``batch_size`` — binary payloads are wide rows and
    batch x concurrency must fit the worker heap."""

    FEATURE_DIM = 8

    def __init__(self):
        self.have_pil = HAVE_PIL

    def _decode_real(
        self, payloads: pa.Array
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-payload container decode (header parse + pixel recovery is
        inherently per-row); the feature histogram over the decoded pixels
        is one vectorized bincount per row."""
        big = payloads.cast(pa.large_binary())
        n = len(big)
        width = np.zeros(n, dtype=np.int64)
        height = np.zeros(n, dtype=np.int64)
        feats = np.zeros((n, self.FEATURE_DIM), dtype=np.float64)
        for i in range(n):
            w, h, rgb = decode_image(big[i].as_py())
            width[i], height[i] = w, h
            if rgb.size:
                feats[i] = np.bincount(
                    rgb >> 5, minlength=self.FEATURE_DIM
                ) / float(rgb.size)
        return width, height, feats

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
        # batch-level sniff: ALL payloads carry a known container magic ->
        # real decode; anything else -> deterministic stub (never mixed,
        # so a batch's output provenance is unambiguous).  Vectorized: one
        # gather of each payload's first two bytes from the flat buffer.
        offs, data = _binary_flat(payloads)
        lens = offs[1:] - offs[:-1]
        real = False
        if len(lens) and (lens >= 2).all():
            b0 = data[offs[:-1]]
            b1 = data[offs[:-1] + 1]
            known = (
                ((b0 == 0x50) & (b1 == 0x36))  # 'P6'
                | ((b0 == 0x42) & (b1 == 0x4D))  # 'BM'
                | ((b0 == 0x89) & (b1 == 0x50) & (lens >= 8))  # 0x89 'P' ...
            )
            real = bool(known.all())
        if real:
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


class ImageEncoder:
    """Encode each payload's raw bytes as a REAL image container: the
    first ``3*width*h`` bytes (``h = len // (3*width)``) become the
    interleaved-RGB pixel buffer of a width-by-h image, written as PPM,
    BMP or PNG by ``doc_id % 3`` — the encode half of the codec, used to
    manufacture genuinely-encoded inputs for the decode stage from any
    byte source.  Rows too short for one pixel row are dropped (the
    decode contract needs at least one scanline).

    batch in : (doc_id, payload: binary)
    batch out: (doc_id: int64, payload: binary — encoded container)"""

    FORMATS = (encode_ppm, encode_bmp, encode_png)

    def __init__(self, width: int = 16):
        self.width = width

    def __call__(self, t: pa.Table) -> pa.Table:
        offs, data = _binary_flat(t["payload"])
        lens = offs[1:] - offs[:-1]
        row_bytes = 3 * self.width
        hs = lens // row_bytes
        ids = np.asarray(pc.cast(t["doc_id"].combine_chunks() if isinstance(
            t["doc_id"], pa.ChunkedArray) else t["doc_id"], pa.int64()))
        out_ids: list[int] = []
        payloads: list[bytes] = []
        for i in range(len(lens)):  # container write is per-row by nature
            h = int(hs[i])
            if h == 0:
                continue
            px = data[offs[i]: offs[i] + row_bytes * h]
            payloads.append(self.FORMATS[int(ids[i]) % 3](self.width, h, px))
            out_ids.append(int(ids[i]))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "payload": pa.array(payloads, pa.large_binary()),
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
