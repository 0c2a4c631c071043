"""Multimodal plumbing tests: schemas, actor-pool stages, stub boundary."""

import numpy as np
import pyarrow as pa
import pytest

from raycells.media.stages import (
    MEDIA_SCHEMA,
    FrameSampler,
    ImageResize,
    MediaDecoder,
    media_pipeline,
    synth_media_batch,
)


def test_synth_schema_and_determinism():
    a = synth_media_batch(np.array([1, 2, 3]), "image")
    b = synth_media_batch(np.array([1, 2, 3]), "image")
    assert a.schema.equals(MEDIA_SCHEMA)
    assert a.equals(b)  # idempotent under retries
    assert len(a["payload"][0].as_py()) == 32 * 32


def test_resize_only_touches_images():
    imgs = synth_media_batch(np.array([1]), "image")
    auds = synth_media_batch(np.array([2]), "audio")
    batch = pa.concat_tables([imgs, auds])
    out = ImageResize(8, 8)(batch)
    assert out["height"].to_pylist() == [8, 1]
    assert out["width"].to_pylist() == [8, 8000]
    assert len(out["payload"][0].as_py()) == 64


def test_frame_sampler():
    vids = synth_media_batch(np.array([5]), "video")
    out = FrameSampler(stride=2)(vids)
    assert out["n_frames"].to_pylist() == [4]
    assert len(out["payload"][0].as_py()) == 16 * 16 * 4


def test_decoder_stub_boundary():
    batch = synth_media_batch(np.array([9]), "image")
    out = MediaDecoder()(batch)
    assert "payload" not in out.column_names  # heavy column dropped
    assert out["n_bytes"].to_pylist() == [1024]
    assert 0 <= out["pixel_mean"][0].as_py() <= 255
    with pytest.raises(NotImplementedError):
        MediaDecoder(real_codec=True)(batch)


def test_decoder_empty_trailing_payload():
    """Empty payloads in ANY position — including the last row of the
    batch — must yield 0 stats without corrupting their neighbors (a
    reduceat formulation clamped the empty trailing segment's start
    into the previous row, silently shifting its mean)."""
    batch = pa.table(
        {
            "media_ref": pa.array(["a", "b", "c"]),
            "media_type": pa.array(["image"] * 3),
            "payload": pa.array([b"ab", b"", b""], pa.large_binary()),
            "height": pa.array([1, 0, 0], pa.int32()),
            "width": pa.array([2, 0, 0], pa.int32()),
            "n_frames": pa.array([1, 1, 1], pa.int32()),
            "sample_rate": pa.array([0, 0, 0], pa.int32()),
        }
    )
    out = MediaDecoder()(batch)
    assert out["n_bytes"].to_pylist() == [2, 0, 0]
    assert out["pixel_mean"].to_pylist() == [97.5, 0.0, 0.0]  # (97+98)/2
    assert out["pixel_std"].to_pylist() == [0.5, 0.0, 0.0]


def test_decoder_real_codec_uses_decoded_tensor():
    """The real-codec path must derive stats from the DECODED tensor,
    not the raw encoded bytes (a prior version called the codec for
    side effects and then ran the identity-codec stats)."""

    class FakeCodec(MediaDecoder):
        def _decode_real(self, payload, media_type):
            # 'decode' -> constant plane, unlike the payload bytes
            return np.full(4, 10.0)

    batch = synth_media_batch(np.array([9]), "image")
    out = FakeCodec(real_codec=True)(batch)
    assert out["n_bytes"].to_pylist() == [4]
    assert out["pixel_mean"].to_pylist() == [10.0]
    assert out["pixel_std"].to_pylist() == [0.0]


def test_media_pipeline_end_to_end(ray_session):
    import ray.data as rd

    tables = [
        synth_media_batch(np.arange(0, 30, 3), "image"),
        synth_media_batch(np.arange(1, 30, 3), "audio"),
        synth_media_batch(np.arange(2, 30, 3), "video"),
    ]
    ds = rd.from_arrow(pa.concat_tables(tables))
    out = media_pipeline(ds).to_pandas()
    assert len(out) == 30
    assert set(out.columns) >= {"media_id", "media_type", "n_bytes", "pixel_mean"}
    # images were resized before decode
    assert (out[out.media_type == "image"]["n_bytes"] == 64).all()
    # videos were frame-sampled 8 → 4 frames of 16×16
    assert (out[out.media_type == "video"]["n_bytes"] == 1024).all()


def test_synth_media_batch_empty_seeds():
    """An empty partition/shard must yield a 0-row table with the media
    schema, not a KeyError from the empty-dict pa.table path."""
    from raycells.media.stages import MEDIA_SCHEMA, synth_media_batch

    t = synth_media_batch(np.array([], dtype=np.int64))
    assert t.num_rows == 0
    assert t.schema == MEDIA_SCHEMA


# ---------------------------------------------------------------------------
# real stdlib codecs (raycells/media/png.py)
# ---------------------------------------------------------------------------

def test_png_roundtrip_gray():
    import numpy as np

    from raycells.media.png import decode_png, encode_png_gray

    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (5, 7), (32, 32)):
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png_gray(img)), img)


def test_png_decoder_all_filters():
    """Hand-build a PNG whose scanlines use every filter type (0-4) and
    check the decoder unfilters them to the intended plane."""
    import struct
    import zlib

    import numpy as np

    from raycells.media.png import PNG_SIGNATURE, decode_png, _chunk

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    rows = []
    prev = np.zeros(6, dtype=np.uint8)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[y]
        if f == 0:
            enc = cur.copy()
        elif f == 1:  # Sub
            enc = cur - np.r_[np.zeros(1, np.uint8), cur[:-1]]
        elif f == 2:  # Up
            enc = cur - prev
        elif f == 3:  # Average
            left = np.r_[np.zeros(1, np.uint8), cur[:-1]]
            enc = cur - ((left.astype(np.int32) + prev.astype(np.int32)) // 2).astype(
                np.uint8
            )
        else:  # Paeth
            from raycells.media.png import _paeth

            left = np.r_[np.zeros(1, np.uint8), cur[:-1]]
            upleft = np.r_[np.zeros(1, np.uint8), prev[:-1]]
            enc = cur - _paeth(left, prev, upleft)
        rows.append(bytes([f]) + enc.tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 0, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_crc_validation():
    import numpy as np
    import pytest

    from raycells.media.png import decode_png, encode_png_gray

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    data = bytearray(encode_png_gray(img))
    data[20] ^= 0xFF  # corrupt IHDR body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_wav_roundtrip_8_and_16_bit():
    import struct

    import numpy as np

    from raycells.media.png import decode_wav, encode_wav_pcm8

    s8 = np.arange(256, dtype=np.uint8)
    out, rate = decode_wav(encode_wav_pcm8(s8, 8000))
    assert rate == 8000 and np.array_equal(out, s8)
    # hand-built 16-bit PCM
    s16 = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
    body = s16.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    out16, rate16 = decode_wav(wav)
    assert rate16 == 44100 and np.array_equal(out16, s16)


def test_media_decoder_real_codec_end_to_end():
    import numpy as np

    from raycells.media.stages import MediaDecoder, synth_media_batch_encoded

    t = synth_media_batch_encoded(np.array([4, 10]), "image")
    t2 = synth_media_batch_encoded(np.array([5]), "audio")
    import pyarrow as pa

    out = MediaDecoder(real_codec=True)(pa.concat_tables([t, t2]))
    # decoded moments equal the raw LCG formula
    for row in out.to_pylist():
        s = int(row["media_id"].split("-")[1])
        size = 1024 if row["media_type"] == "image" else 8000
        i = np.arange(size, dtype=np.int64)
        v = (s * 31 + i * 7919 + i * i) % 256
        assert row["n_bytes"] == size
        assert row["sum_val"] == int(v.sum())
        assert row["sumsq_val"] == int((v * v).sum())


def test_content_hasher_grows_power_table():
    """A payload larger than the initial 8192-entry power table must
    hash correctly (table grows on demand — no fixed media-size cap),
    and the hash must equal the Σ v_i·31^i mod 2^64 definition."""
    import numpy as np
    import pyarrow as pa

    from raycells.media.png import encode_wav_pcm8
    from raycells.media.stages import MEDIA_SCHEMA, ContentHasher

    n = 20_000  # > 8192 initial table
    rng = np.arange(n, dtype=np.int64)
    samples = ((rng * 7 + 13) % 256).astype(np.uint8)
    payload = encode_wav_pcm8(samples, 8000)
    batch = pa.table(
        {
            "media_id": pa.array(["m-big"]),
            "media_type": pa.array(["audio"]),
            "payload": pa.array([payload], pa.large_binary()),
            "height": pa.array([1], pa.int32()),
            "width": pa.array([n], pa.int32()),
            "n_frames": pa.array([1], pa.int32()),
            "sample_rate": pa.array([8000], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = ContentHasher()(batch)
    with np.errstate(over="ignore"):
        pows = np.uint64(31) ** np.arange(n, dtype=np.uint64)
        want = (samples.astype(np.uint64) * pows).sum(dtype=np.uint64)
    assert out["content_hash"][0].as_py() == int(want.view(np.int64))
    assert out["media_id"][0].as_py() == "m-big"
