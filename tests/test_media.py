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
