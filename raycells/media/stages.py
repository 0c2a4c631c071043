"""Multimodal column stages: image/audio/video as opaque binary columns.

The container has no PIL/ffmpeg/rasterio — but since round 3 the image
and audio codecs are REAL anyway: stdlib-only PNG (zlib, full filter
set) and RIFF/WAVE PCM live in :mod:`raycells.media.png`, and
``MediaDecoder(real_codec=True)`` decodes real containers end-to-end
(``media_decode_real`` oracle-checks the decoded content). Only VIDEO
containers remain stubbed — they genuinely need ffmpeg. Everything
Ray-side — schema, actor-pool signatures, batch sizing, zero-copy
binary payload layout, output schema — is real and tested:

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


def _binary_segments(arr):
    """Zero-copy (flat uint8 view, offsets int64) of a large_binary
    column — the decode stages index into this instead of calling
    ``.as_py()`` per row (per-row Python was the r1 media bottleneck)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, off


def _binary_column(n: int, out_off: np.ndarray, out_flat: np.ndarray):
    """Build a large_binary array directly from (offsets, flat bytes)."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(out_off), pa.py_buffer(out_flat)]
    )


def _synth_payload(s: int, size: int) -> bytes:
    """Payload byte i of seed s: ``(s*31 + i*7919 + i*i) % 256`` — plain
    BIGINT arithmetic, so the DuckDB oracle reproduces the DECODED pixel
    sums exactly (same design as the tile store's LCG values)."""
    i = np.arange(size, dtype=np.int64)
    return ((s * 31 + i * 7919 + i * i) % 256).astype(np.uint8).tobytes()


def synth_media_batch(seeds: np.ndarray, media_type: str = "image") -> pa.Table:
    """Deterministic fake media rows (pure seed arithmetic — idempotent
    under retries AND SQL-reproducible, see ``_synth_payload``). The
    payload is a raw uint8 plane, standing in for an encoded
    JPEG/WAV/MP4 blob."""
    rows = []
    for s in np.asarray(seeds, dtype=np.int64):
        if media_type == "image":
            h, w, nf, sr = 32, 32, 1, 0
            payload = _synth_payload(int(s), h * w)
        elif media_type == "audio":
            h, w, nf, sr = 1, 8000, 1, 8000
            payload = _synth_payload(int(s), w)
        else:
            h, w, nf, sr = 16, 16, 8, 0
            payload = _synth_payload(int(s), h * w * nf)
        rows.append((f"media-{s}", media_type, payload, h, w, nf, sr))
    if not rows:  # empty partition/shard → 0-row table, not a KeyError
        return MEDIA_SCHEMA.empty_table()
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(list(c), f.type) for f, c in zip(MEDIA_SCHEMA, cols)},
        schema=MEDIA_SCHEMA,
    )


class MediaDecoder:
    """Actor-pool stage: encoded payload → decoded pixel/sample tensor +
    extracted features. Codec handle is loaded once per actor.

    ``real_codec=True`` decodes REAL containers with the stdlib-only
    codecs in :mod:`raycells.media.png` — PNG (full filter set,
    CRC-checked) for images and RIFF/WAVE PCM for audio. Only video
    containers remain stubbed (they genuinely need ffmpeg)."""

    def __init__(self, real_codec: bool = False):
        self.real_codec = real_codec
        if real_codec:  # the per-actor codec-handle load
            from raycells.media import png as _codecs

            self._codecs = _codecs

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        c = self._codecs
        if payload[: len(c.PNG_SIGNATURE)] == c.PNG_SIGNATURE:
            return c.decode_png(payload).reshape(-1)
        if payload[:4] == c.WAV_MAGIC:
            return c.decode_wav(payload)[0]
        # the one remaining stub: video containers need ffmpeg — the
        # sandbox has none; PNG/WAV above are real decodes
        raise NotImplementedError(
            "no video container codec in this environment (PNG/WAV are real)"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.real_codec:
            # the codec boundary stays per-payload by nature: stats come
            # from the DECODED tensors, row by row
            lens = np.zeros(n, np.int64)
            sums = np.zeros(n)
            sumsq = np.zeros(n)
            for i in range(n):
                arr = self._decode_real(
                    batch["payload"][i].as_py(), batch["media_type"][i].as_py()
                ).astype(np.float64)
                lens[i] = arr.size
                sums[i] = arr.sum()
                sumsq[i] = (arr * arr).sum()
        else:
            data, off = _binary_segments(batch["payload"])
            lens = np.diff(off)
            # segment mean/std over the flat byte view via exact cumsum
            # differences (uint8 sums stay integer-exact in float64):
            # one pass per moment instead of a per-row Python decode
            # loop, and empty segments anywhere — including trailing —
            # fall out as 0 (reduceat can't represent an empty trailing
            # segment: clamping its start corrupts the previous row)
            x = data.astype(np.float64)
            cs = np.zeros(len(x) + 1)
            np.cumsum(x, out=cs[1:])
            cs2 = np.zeros(len(x) + 1)
            np.cumsum(x * x, out=cs2[1:])
            sums = cs[off[1:]] - cs[off[:-1]]
            sumsq = cs2[off[1:]] - cs2[off[:-1]]
        nz = lens > 0
        denom = np.maximum(lens, 1).astype(np.float64)
        mean_v = np.where(nz, sums / denom, 0.0)
        var = np.maximum(sumsq / denom - mean_v * mean_v, 0.0)
        std_v = np.where(nz, np.sqrt(var), 0.0)
        out = dict(zip(batch.column_names, batch.columns))
        out.pop("payload")  # decoded stats replace the heavy payload column
        out.update(
            {
                "n_bytes": pa.array(lens.astype(np.int64)),
                # exact integer moments (uint8 partial sums stay < 2^53 in
                # float64, so the conversion back to int64 is lossless) —
                # these are the oracle-hashable content columns
                "sum_val": pa.array(sums.astype(np.int64)),
                "sumsq_val": pa.array(sumsq.astype(np.int64)),
                "pixel_mean": pa.array(np.round(mean_v, 6)),
                "pixel_std": pa.array(np.round(std_v, 6)),
            }
        )
        return pa.table(out)


class ContentHasher:
    """Stage: REAL-codec decode → polynomial content hash of the decoded
    samples (Σ v_i·31^i mod 2^64 — the multimodal-dedup key, same
    formula as tilestore.synth_band_content_hash). The codec handle and
    the 31-power table load once per instance; the decode itself stays
    per-payload at the codec boundary. Emits (content_hash, media_id) —
    the exchange never carries pixels."""

    def __init__(self):
        from raycells.media import png as _codecs

        self._codecs = _codecs
        with np.errstate(over="ignore"):
            self._p31 = np.uint64(31) ** np.arange(8192, dtype=np.uint64)

    def _pows(self, n: int) -> np.ndarray:
        # grow the power table on demand — a fixed cap would crash on
        # the first payload larger than the fixture (the chunk_docs
        # length-cap lesson); doubling keeps regrowth amortized O(1)
        if self._p31.size < n:
            size = self._p31.size
            while size < n:
                size *= 2
            with np.errstate(over="ignore"):
                self._p31 = np.uint64(31) ** np.arange(size, dtype=np.uint64)
        return self._p31[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = self._codecs
        n = batch.num_rows
        h = np.empty(n, np.uint64)
        with np.errstate(over="ignore"):
            for i in range(n):
                p = batch["payload"][i].as_py()
                if p[: len(c.PNG_SIGNATURE)] == c.PNG_SIGNATURE:
                    arr = c.decode_png(p).reshape(-1)
                elif p[:4] == c.WAV_MAGIC:
                    arr = c.decode_wav(p)[0]
                else:
                    raise NotImplementedError(
                        "no video container codec in this environment"
                    )
                v = arr.astype(np.uint64)
                h[i] = (v * self._pows(v.size)).sum(dtype=np.uint64)
        return pa.table(
            {
                "content_hash": pa.array(h.view(np.int64), pa.int64()),
                "media_id": batch["media_id"],
            }
        )


def synth_media_batch_encoded(seeds: np.ndarray, media_type: str = "image") -> pa.Table:
    """REAL-container variant of :func:`synth_media_batch`: the same
    SQL-reproducible LCG samples (``_synth_payload``), packed through
    the real stdlib codecs — PNG for images, 8-bit PCM WAV for audio —
    so a REAL decode recovers exactly the oracle-reproducible values."""
    from raycells.media.png import encode_png_gray, encode_wav_pcm8

    rows = []
    for s in np.asarray(seeds, dtype=np.int64):
        if media_type == "image":
            h, w, nf, sr = 32, 32, 1, 0
            plane = np.frombuffer(_synth_payload(int(s), h * w), np.uint8)
            payload = encode_png_gray(plane.reshape(h, w))
        elif media_type == "audio":
            h, w, nf, sr = 1, 8000, 1, 8000
            payload = encode_wav_pcm8(
                np.frombuffer(_synth_payload(int(s), w), np.uint8), sr
            )
        else:
            raise ValueError("encoded synth supports image|audio (video is the stub)")
        rows.append((f"media-{s}", media_type, payload, h, w, nf, sr))
    if not rows:
        return MEDIA_SCHEMA.empty_table()
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(list(c), f.type) for f, c in zip(MEDIA_SCHEMA, cols)},
        schema=MEDIA_SCHEMA,
    )


def synth_media_batch_encoded_dups(idx: np.ndarray, hot: int) -> pa.Table:
    """Duplicate-planting variant of :func:`synth_media_batch_encoded`
    — the real-codec DEDUP fixture: row index r gets LCG seed
    ``r % hot`` (hot kept EVEN by callers so dup partners stay in their
    media-type lane: even rows → PNG image, odd rows → PCM-8 WAV), and
    ``media_id`` is the zero-padded ROW index — unique per row, so rows
    r and r+hot carry byte-identical CONTAINERS under distinct ids.
    Deterministic pure-index arithmetic → SQL-reproducible and
    idempotent under Ray task retries."""
    from raycells.media.png import encode_png_gray, encode_wav_pcm8

    rows = []
    for r in np.asarray(idx, dtype=np.int64):
        r = int(r)
        s = r % hot
        if r % 2 == 0:
            h, w, nf, sr = 32, 32, 1, 0
            plane = np.frombuffer(_synth_payload(s, h * w), np.uint8)
            payload, mt = encode_png_gray(plane.reshape(h, w)), "image"
        else:
            h, w, nf, sr = 1, 8000, 1, 8000
            payload = encode_wav_pcm8(
                np.frombuffer(_synth_payload(s, w), np.uint8), sr
            )
            mt = "audio"
        rows.append((f"media-{r:05d}", mt, payload, h, w, nf, sr))
    if not rows:
        return MEDIA_SCHEMA.empty_table()
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(list(c), f.type) for f, c in zip(MEDIA_SCHEMA, cols)},
        schema=MEDIA_SCHEMA,
    )


class ImageResize:
    """Actor-pool stage: nearest-neighbor resize of raw uint8 planes
    (pure-numpy stand-in for a codec-backed resize; plumbing is real)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hs = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        ws = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        mt = np.asarray(batch["media_type"].to_pylist(), dtype=object)
        is_img = mt == "image"
        data, off = _binary_segments(batch["payload"])
        lens = np.diff(off)
        out_lens = np.where(is_img, self.out_h * self.out_w, lens)
        out_off = np.zeros(n + 1, np.int64)
        np.cumsum(out_lens, out=out_off[1:])
        out_flat = np.empty(out_off[-1], np.uint8)
        # pass-through rows: straight memcpy of the source segment
        for i in np.nonzero(~is_img)[0]:
            out_flat[out_off[i] : out_off[i + 1]] = data[off[i] : off[i + 1]]
        # image rows: ONE fancy-indexed gather per (h, w) group — the
        # gather matrix is (rows, out_h*out_w) indices into the flat view
        for h, w in {(int(a), int(b)) for a, b in zip(hs[is_img], ws[is_img])}:
            rows = np.nonzero(is_img & (hs == h) & (ws == w))[0]
            yi = np.arange(self.out_h, dtype=np.int64) * h // self.out_h
            xi = np.arange(self.out_w, dtype=np.int64) * w // self.out_w
            flat_idx = (yi[:, None] * w + xi[None, :]).ravel()
            res = data[off[rows][:, None] + flat_idx[None, :]]
            dst = out_off[rows][:, None] + np.arange(res.shape[1])[None, :]
            out_flat[dst] = res
        out = dict(zip(batch.column_names, batch.columns))
        out["payload"] = _binary_column(n, out_off, out_flat)
        out["height"] = pa.array(np.where(is_img, self.out_h, hs).astype(np.int32))
        out["width"] = pa.array(np.where(is_img, self.out_w, ws).astype(np.int32))
        return pa.table(out)


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th frame of video rows;
    non-video rows pass through unchanged."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        nf_in = batch["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        mt = np.asarray(batch["media_type"].to_pylist(), dtype=object)
        data, off = _binary_segments(batch["payload"])
        lens = np.diff(off)
        is_vid = (mt == "video") & (nf_in > 1)
        frame = np.where(nf_in > 0, lens // np.maximum(nf_in, 1), 0)
        nf_out = np.where(is_vid, (nf_in + self.stride - 1) // self.stride, nf_in)
        out_lens = np.where(is_vid, nf_out * frame, lens)
        out_off = np.zeros(n + 1, np.int64)
        np.cumsum(out_lens, out=out_off[1:])
        out_flat = np.empty(out_off[-1], np.uint8)
        for i in np.nonzero(~is_vid)[0]:
            out_flat[out_off[i] : out_off[i + 1]] = data[off[i] : off[i + 1]]
        # video rows: one gather per (n_frames, frame_size) group
        for nf, fsz in {(int(a), int(b)) for a, b in zip(nf_in[is_vid], frame[is_vid])}:
            rows = np.nonzero(is_vid & (nf_in == nf) & (frame == fsz))[0]
            kept = np.arange(0, nf, self.stride, dtype=np.int64)
            flat_idx = (kept[:, None] * fsz + np.arange(fsz, dtype=np.int64)[None, :]).ravel()
            res = data[off[rows][:, None] + flat_idx[None, :]]
            dst = out_off[rows][:, None] + np.arange(res.shape[1])[None, :]
            out_flat[dst] = res
        out = dict(zip(batch.column_names, batch.columns))
        out["payload"] = _binary_column(n, out_off, out_flat)
        out["n_frames"] = pa.array(nf_out.astype(np.int32))
        return pa.table(out)


_STAGE_CACHE: dict = {}  # (class, args) → instance, reused task workers
_STAGE_CACHE_MAX = 16


def _task_stage(cls, *args):
    """Run a media stage class as a TASK stage with the instance memoized
    per worker: these stubbed constructors are cheap, and on this
    platform actor pools pay ~1-2 s startup per execution (CLAUDE.md) —
    the wrong trade until ``__init__`` really opens codec handles. The
    class API is identical either way; ``media_pipeline(actors=True)``
    flips back to pools for a real-codec build."""

    def fn(batch: pa.Table) -> pa.Table:
        key = (cls.__module__, cls.__qualname__, args)
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            if len(_STAGE_CACHE) >= _STAGE_CACHE_MAX:
                _STAGE_CACHE.clear()
            inst = _STAGE_CACHE[key] = cls(*args)
        return inst(batch)

    return fn


def media_pipeline(
    ds, resize_to=(8, 8), frame_stride: int = 2, concurrency: int = 2,
    actors: bool = False,
):
    """The multimodal reference pipeline: resize → frame-sample → decode
    features, small batches, binary payloads end-to-end. Task stages with
    per-worker memoized instances by default; ``actors=True`` runs the
    same classes as actor pools — the right shape once ``__init__``
    genuinely loads codecs/models (the stubs here construct in
    microseconds, so pools would only add their per-execution startup)."""
    if actors:
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
    ds = ds.map_batches(
        _task_stage(ImageResize, *resize_to),
        batch_format="pyarrow",
        batch_size=_DECODE_BATCH,
    )
    ds = ds.map_batches(
        _task_stage(FrameSampler, frame_stride),
        batch_format="pyarrow",
        batch_size=_DECODE_BATCH,
    )
    return ds.map_batches(
        _task_stage(MediaDecoder),
        batch_format="pyarrow",
        batch_size=_DECODE_BATCH,
    )
