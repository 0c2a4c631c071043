"""Multimodal column stages: image/audio/video as opaque binary columns.

The container has no image/audio libraries (no PIL/ffmpeg/rasterio), so
the CODEC layer is stubbed (clearly marked), while everything Ray-side —
schema, actor-pool signatures, batch sizing, zero-copy binary payload
layout, output schema — is real and tested:

- payloads are ``large_binary`` + typed metadata (media_type, shape,
  sample_rate), exactly how 100 TB of media rides the object store;
- decode / resize / frame-sample are **actor-pool** ``map_batches``
  stages (codec state loads once per actor in ``__init__``);
- batch_size stays small (64) because each payload is large — a batch ×
  concurrency must fit a worker heap (SURVEY.md §4.2).

Real codecs drop in by overriding ``_decode_real`` — the
NotImplementedError marks exactly where.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MEDIA_SCHEMA", "synth_media_batch", "MediaDecoder", "ImageResize", "FrameSampler"]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("height", pa.int32()),
        ("width", pa.int32()),
        ("n_frames", pa.int32()),       # video only, else 1
        ("sample_rate", pa.int32()),    # audio only, else 0
    ]
)

_DECODE_BATCH = 64  # large payloads ⇒ small batches (heap = B × payload × pool)


def synth_media_batch(seeds: np.ndarray, media_type: str = "image") -> pa.Table:
    """Deterministic fake media rows (PRNG keyed by seed only — idempotent
    under retries). The payload is a raw uint8 plane, standing in for an
    encoded JPEG/WAV/MP4 blob."""
    rows = []
    for s in np.asarray(seeds, dtype=np.int64):
        rng = np.random.default_rng(int(s))
        if media_type == "image":
            h, w, nf, sr = 32, 32, 1, 0
            payload = rng.integers(0, 256, h * w, dtype=np.uint8).tobytes()
        elif media_type == "audio":
            h, w, nf, sr = 1, 8000, 1, 8000
            payload = rng.integers(0, 256, w, dtype=np.uint8).tobytes()
        else:
            h, w, nf, sr = 16, 16, 8, 0
            payload = rng.integers(0, 256, h * w * nf, dtype=np.uint8).tobytes()
        rows.append((f"media-{s}", media_type, payload, h, w, nf, sr))
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(list(c), f.type) for f, c in zip(MEDIA_SCHEMA, cols)},
        schema=MEDIA_SCHEMA,
    )


class MediaDecoder:
    """Actor-pool stage: encoded payload → decoded pixel/sample tensor +
    extracted features. Codec handle is 'loaded' once per actor."""

    def __init__(self, real_codec: bool = False):
        self.real_codec = real_codec  # a real impl would open lib handles here

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        # STUB: the sandbox has no image/audio codecs. A production build
        # plugs PIL/ffmpeg in here; everything around this call is real.
        raise NotImplementedError("no media codecs in this environment")

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        n = batch.num_rows
        mean_v = np.empty(n)
        std_v = np.empty(n)
        nbytes = np.empty(n, dtype=np.int64)
        for i in range(n):
            raw = payloads[i].as_py()
            arr = (
                self._decode_real(raw, batch["media_type"][i].as_py())
                if self.real_codec
                else self._decode_fake(raw)
            )
            mean_v[i] = arr.mean() if arr.size else 0.0
            std_v[i] = arr.std() if arr.size else 0.0
            nbytes[i] = len(raw)
        out = dict(zip(batch.column_names, batch.columns))
        out.pop("payload")  # decoded stats replace the heavy payload column
        out.update(
            {
                "n_bytes": pa.array(nbytes),
                "pixel_mean": pa.array(np.round(mean_v, 6)),
                "pixel_std": pa.array(np.round(std_v, 6)),
            }
        )
        return pa.table(out)


class ImageResize:
    """Actor-pool stage: nearest-neighbor resize of raw uint8 planes
    (pure-numpy stand-in for a codec-backed resize; plumbing is real)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = batch["height"].to_numpy(zero_copy_only=False)
        ws = batch["width"].to_numpy(zero_copy_only=False)
        out_payload, out_h, out_w = [], [], []
        for i in range(batch.num_rows):
            raw = batch["payload"][i].as_py()
            if batch["media_type"][i].as_py() != "image":
                out_payload.append(raw)
                out_h.append(int(hs[i]))
                out_w.append(int(ws[i]))
                continue
            img = np.frombuffer(raw, dtype=np.uint8)
            img = img[: hs[i] * ws[i]].reshape(hs[i], ws[i])
            yi = (np.arange(self.out_h) * hs[i] // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * ws[i] // self.out_w).astype(np.int64)
            out_payload.append(img[np.ix_(yi, xi)].tobytes())
            out_h.append(self.out_h)
            out_w.append(self.out_w)
        out = dict(zip(batch.column_names, batch.columns))
        out["payload"] = pa.array(out_payload, pa.large_binary())
        out["height"] = pa.array(out_h, pa.int32())
        out["width"] = pa.array(out_w, pa.int32())
        return pa.table(out)


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th frame of video rows;
    non-video rows pass through unchanged."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload, out_frames = [], []
        for i in range(batch.num_rows):
            raw = np.frombuffer(batch["payload"][i].as_py(), dtype=np.uint8)
            nf = int(batch["n_frames"][i].as_py())
            if batch["media_type"][i].as_py() != "video" or nf <= 1:
                out_payload.append(raw.tobytes())
                out_frames.append(nf)
                continue
            frame = raw.size // nf
            frames = raw[: frame * nf].reshape(nf, frame)[:: self.stride]
            out_payload.append(frames.tobytes())
            out_frames.append(frames.shape[0])
        out = dict(zip(batch.column_names, batch.columns))
        out["payload"] = pa.array(out_payload, pa.large_binary())
        out["n_frames"] = pa.array(out_frames, pa.int32())
        return pa.table(out)


def media_pipeline(ds, resize_to=(8, 8), frame_stride: int = 2, concurrency: int = 2):
    """The multimodal reference pipeline: resize → frame-sample → decode
    features. All actor pools, small batches, binary payloads end-to-end."""
    ds = ds.map_batches(
        ImageResize,
        fn_constructor_args=resize_to,
        batch_format="pyarrow",
        batch_size=_DECODE_BATCH,
        concurrency=concurrency,
    )
    ds = ds.map_batches(
        FrameSampler,
        fn_constructor_args=(frame_stride,),
        batch_format="pyarrow",
        batch_size=_DECODE_BATCH,
        concurrency=concurrency,
    )
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=_DECODE_BATCH,
        concurrency=concurrency,
    )
