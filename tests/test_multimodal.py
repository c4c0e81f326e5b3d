"""Multimodal plumbing: binary-payload actor stages over Ray Data."""

import numpy as np
import pytest


def test_image_features_stage(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.multimodal import (
        IMAGE_FEATURE_DIM,
        ImageFeatures,
        synthesize_media_table,
    )

    t = synthesize_media_table(32)
    ds = rd.from_arrow(t).map_batches(
        ImageFeatures(), batch_format="pyarrow", batch_size=8,
        concurrency=2, num_cpus=1,
    )
    out = ds.to_pandas()
    assert len(out) == 32
    assert all(len(f) == IMAGE_FEATURE_DIM for f in out["features"])
    assert (out["n_bytes"] > 0).all()
    # deterministic: same payload → same features
    out2 = rd.from_arrow(t).map_batches(
        ImageFeatures(), batch_format="pyarrow", batch_size=16
    ).to_pandas()
    a = out.sort_values("item_id")["features"].tolist()
    b = out2.sort_values("item_id")["features"].tolist()
    for x, y in zip(a, b):
        assert np.allclose(x, y)


def test_audio_frames_stage(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.multimodal import AudioFrames, synthesize_media_table

    t = synthesize_media_table(16)
    out = rd.from_arrow(t).map_batches(
        AudioFrames(window=128), batch_format="pyarrow", batch_size=8
    ).to_pandas()
    assert len(out) > 16  # multiple windows per item
    assert (out["rms"] >= 0).all()
    # windows per item == payload_len//2//128
    import pyarrow.compute as pc
    lens = {i: len(p) for i, p in zip(t.column("item_id").to_pylist(),
                                      t.column("payload").to_pylist())}
    counts = out.groupby("item_id").size().to_dict()
    for i, n in counts.items():
        assert n == (lens[i] // 2) // 128


def test_real_decoder_is_gated():
    from lucenenet_ray.ops.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG")


def test_image_resize_stage(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.multimodal import ImageResize, synthesize_media_table

    t = synthesize_media_table(n=16)
    out = (rd.from_arrow(t)
           .map_batches(ImageResize, fn_constructor_kwargs={"side": 2},
                        batch_format="pyarrow", batch_size=8, concurrency=2)
           .take_all())
    assert len(out) == 16
    for r in out:
        assert len(r["pixels"]) == 2 * 2 * 3 and r["side"] == 2


def test_video_frame_sample_stage(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.multimodal import (
        VideoFrameSample,
        synthesize_media_table,
    )

    t = synthesize_media_table(n=8)
    out = (rd.from_arrow(t)
           .map_batches(VideoFrameSample, fn_constructor_kwargs={"stride": 3},
                        batch_format="pyarrow", batch_size=4, concurrency=2)
           .take_all())
    # every sampled frame index is a multiple of the stride; counts match
    # payload sizes deterministically
    assert out and all(r["frame"] % 3 == 0 for r in out)
    by_id = {}
    for r in out:
        by_id.setdefault(r["item_id"], []).append(r["frame"])
    payloads = {i: len(p.as_py()) for i, p in
                zip(t.column("item_id").to_pylist(), t.column("payload"))}
    for i, frames in by_id.items():
        n_frames = payloads[i] // VideoFrameSample.FRAME_BYTES
        assert len(frames) == len(range(0, n_frames, 3))
