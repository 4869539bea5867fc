"""Multimodal pipelines: binary payload columns through actor-pool stages.

The test corpus has no real images, so the documents' utf8 text bytes play
the opaque binary payload (schema-wise identical to image bytes); the
codec itself is stubbed deterministically (stages/multimodal.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from realtime_clickstream_lakehouse_ray.stages.multimodal import FrameSampler, ImageFeatures


def _pool_size() -> tuple[int, int]:
    """Actor-pool bounds sized to the cluster, not a hard cap (round 1's
    fixed ``(1, 4)`` starved these stages at 32 CPUs); the pool still
    autoscales down for tiny inputs."""
    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (1, max(4, ncpu))


def _payload_ds(sf_dir: str) -> ray.data.Dataset:
    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "payload": t["text"].cast(pa.binary())}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)


def image_features(sf_dir: str) -> ray.data.Dataset:
    """Binary payload -> (n_bytes, stub dims, byte-histogram features).
    Small batch_size on purpose: binary rows are wide (see stage docs)."""
    return _payload_ds(sf_dir).map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=_pool_size(),
    )


def image_metadata(sf_dir: str) -> ray.data.Dataset:
    """Oracle-checkable slice of the decode output: payload byte length
    (DuckDB: octet_length(encode(text)))."""

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "n_bytes": t["n_bytes"]})

    return image_features(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def frame_samples(sf_dir: str) -> ray.data.Dataset:
    """'Video' frame sampling over the binary payload (every 4th 1-KiB
    frame) — deterministic chunk arithmetic, oracle-checkable."""
    return _payload_ds(sf_dir).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=_pool_size(),
    )


def image_features_flat(sf_dir: str) -> ray.data.Dataset:
    """``image_features`` with the feature vector flattened to scalar
    columns (f0..f7) — the driver-oracle-checkable projection: dims come
    from md5 hex substrings and features are the byte-bucket histogram
    (``byte >> 5``) over the payload, both DuckDB-expressible for ASCII
    payloads."""

    def flatten(t: pa.Table) -> pa.Table:
        feats = t["features"].combine_chunks()
        vals = pc.list_flatten(feats).to_numpy().reshape(len(t), -1)
        cols = {
            "doc_id": t["doc_id"],
            "n_bytes": t["n_bytes"],
            "width": t["width"],
            "height": t["height"],
        }
        for i in range(vals.shape[1]):
            cols[f"f{i}"] = pa.array(vals[:, i], pa.float64())
        return pa.table(cols)

    return image_features(sf_dir).map_batches(
        flatten, batch_format="pyarrow", zero_copy_batch=True
    )


def audio_features(sf_dir: str) -> ray.data.Dataset:
    """Raw-PCM (s16le) audio features over the binary payload — the audio
    leg of the multimodal family.  Integer features, oracle-exact (the
    DuckDB side decodes the same char pairs arithmetically)."""
    from realtime_clickstream_lakehouse_ray.stages.multimodal import AudioFeatures

    return _payload_ds(sf_dir).map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=_pool_size(),
    )


def rgb_channel_stats(sf_dir: str) -> ray.data.Dataset:
    """Second REAL image leg: payloads decoded as headerless interleaved
    RGB u8 (no codec library needed, the image analog of the s16le PCM
    audio leg), per-channel integer stats per document — exact against a
    DuckDB char-arithmetic oracle over the same bytes."""
    from realtime_clickstream_lakehouse_ray.stages.multimodal import RgbRawFeatures

    return _payload_ds(sf_dir).map_batches(
        RgbRawFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=_pool_size(),
    )


def rgb_downsample(sf_dir: str, width: int = 16) -> ray.data.Dataset:
    """REAL resize plumbing: 2x2 average-pool every payload's raw-RGB
    pixels at fixed width; binary in, smaller binary out (the
    shape every thumbnail / patch-extraction stage shares).  Verified in
    pytest against a per-image reshape reference; the driver-checked
    oracle relation is ``rgb_downsample_stats`` below, whose per-channel
    stats over the POOLED bytes pin the binary content exactly."""
    from realtime_clickstream_lakehouse_ray.stages.multimodal import RgbDownsample

    return _payload_ds(sf_dir).map_batches(
        RgbDownsample,
        fn_constructor_kwargs=dict(width=width),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=_pool_size(),
    )


def frame_diff_energy(sf_dir: str, frame_bytes: int = 128) -> ray.data.Dataset:
    """Third REAL video leg: scene-change detection by frame differencing
    — the payload is treated as consecutive ``frame_bytes`` raw frames and
    each frame's L1 distance to its predecessor is the classic cut-score
    (codec-free temporal processing, like the PCM/RGB legs are codec-free
    spatial ones).  Output: one row per (doc, frame_idx >= 1) over whole
    frames, ``diff_energy`` = Σ |b[k][j] - b[k-1][j]| — integer-exact
    against a char-arithmetic DuckDB oracle.

    Fully vectorized: ONE global subtraction of the flat byte buffer
    against itself shifted by ``frame_bytes``, masked to within-doc
    whole-frame regions, per-frame sums via one ``np.add.reduceat``."""
    F = int(frame_bytes)

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        payload = t["payload"].combine_chunks().cast(pa.large_binary())
        offsets = np.frombuffer(
            payload.buffers()[1], dtype=np.int64, count=len(payload) + 1,
            offset=payload.offset * 8,
        )
        base = offsets[0]
        lengths = offsets[1:] - offsets[:-1]
        data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)[
            base: base + int(lengths.sum())
        ].astype(np.int64)
        doc_ids = np.asarray(t["doc_id"]).astype(np.int64)
        nf = lengths // F  # whole frames per doc
        n_out = np.maximum(nf - 1, 0)  # diffs per doc
        total = int(n_out.sum())
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "frame_idx": pa.array([], pa.int64()),
                "diff_energy": pa.array([], pa.int64()),
            }
        )
        if total == 0:
            return empty
        # flat positions of every byte in frames 1..nf-1 of each doc
        kdoc = np.repeat(np.arange(len(nf), dtype=np.int64), n_out)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_out) - n_out, n_out
        )
        starts = (offsets[:-1] - base)[kdoc] + (within + 1) * F
        gather = (
            np.arange(total * F, dtype=np.int64)
            - np.repeat(np.arange(total, dtype=np.int64) * F, F)
            + np.repeat(starts, F)
        )
        diffs = np.abs(data[gather] - data[gather - F])
        energy = np.add.reduceat(diffs, np.arange(total, dtype=np.int64) * F)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[kdoc]),
                "frame_idx": pa.array(within + 1),
                "diff_energy": pa.array(energy.astype(np.int64)),
            }
        )

    return _payload_ds(sf_dir).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=512
    )


def rgb_downsample_stats(sf_dir: str, width: int = 16) -> ray.data.Dataset:
    """Oracle-checkable projection of the REAL pooled binaries: run the
    actual 2x2 average-pool (``rgb_downsample``), then per-channel integer
    stats over each document's POOLED bytes — the DuckDB oracle replays
    the ``(a+b+c+d)//4`` pooling with char arithmetic, so sums/extrema pin
    the binary content itself, not just its shape."""
    from realtime_clickstream_lakehouse_ray.stages.multimodal import RgbRawFeatures

    def as_payload(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "payload": t["pooled"]})

    return (
        rgb_downsample(sf_dir, width=width)
        .map_batches(as_payload, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            RgbRawFeatures,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=256,
            concurrency=_pool_size(),
        )
    )


def image_codec_stats(sf_dir: str, width: int = 16) -> ray.data.Dataset:
    """Genuinely-ENCODED containers through the REAL codec (the round-5
    closure of the image-leg stub): each document's text bytes become the
    pixel buffer of a width-16 RGB image, written as PPM, BMP or PNG by
    ``doc_id % 3`` (``ImageEncoder``), then ``ImageFeatures`` sniffs the
    magic and truly decodes — header-parsed dims, zlib inflate + filter
    reconstruction for PNG, BGR/bottom-up/padding undo for BMP.  The
    emitted histogram features are container-INVARIANT (same pixels ->
    same features from any of the three containers), so the DuckDB oracle
    replays them from the same text bytes with char-class arithmetic
    without needing to parse any container."""
    from realtime_clickstream_lakehouse_ray.stages.multimodal import ImageEncoder

    encoded = _payload_ds(sf_dir).map_batches(
        ImageEncoder,
        fn_constructor_kwargs=dict(width=width),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=_pool_size(),
    )

    def flatten(t: pa.Table) -> pa.Table:
        from realtime_clickstream_lakehouse_ray.stages.multimodal import (
            ImageFeatures as IF,
        )

        dim = IF.FEATURE_DIM
        cols = {
            "doc_id": t["doc_id"],
            "width": t["width"],
            "height": t["height"],
        }
        if len(t) == 0:  # schema-stable empty block
            for i in range(dim):
                cols[f"f{i}"] = pa.array([], pa.float64())
            return pa.table(cols)
        feats = t["features"].combine_chunks()
        vals = pc.list_flatten(feats).to_numpy().reshape(len(t), dim)
        for i in range(dim):
            cols[f"f{i}"] = pa.array(vals[:, i], pa.float64())
        return pa.table(cols)

    return encoded.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=256,
        concurrency=_pool_size(),
    ).map_batches(flatten, batch_format="pyarrow", zero_copy_batch=True)
