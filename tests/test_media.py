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
