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


def test_real_decoder_dispatches_and_gates():
    """PNG is now a REAL decode path (ops/png.py); unsupported
    compressed codecs (JPEG et al.) still raise through the
    dispatcher."""
    import numpy as np

    from lucenenet_ray.ops.multimodal import _decode_image_real
    from lucenenet_ray.ops.png import png_encode

    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    assert (_decode_image_real(png_encode(img)) == img).all()
    with pytest.raises(ValueError):
        _decode_image_real(b"\xff\xd8\xff\xe0 jpeg-ish")


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


def test_real_ppm_bmp_roundtrip():
    """Dependency-free REAL decoders: encode->decode is the identity."""
    import numpy as np

    from lucenenet_ray.ops.multimodal import (decode_bmp, decode_image,
                                              decode_ppm, encode_bmp,
                                              encode_ppm)

    rng = np.random.default_rng(3)
    for h, w in [(4, 4), (3, 5), (1, 7)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)
        np.testing.assert_array_equal(decode_image(encode_ppm(img)), img)
        np.testing.assert_array_equal(decode_image(encode_bmp(img)), img)
    # PPM comments + P5 grayscale expansion
    gray = rng.integers(0, 256, size=(2, 3, 1), dtype=np.uint8)
    p5 = b"P5\n# a comment\n3 2\n255\n" + gray.tobytes()
    out = decode_ppm(p5)
    np.testing.assert_array_equal(out, np.repeat(gray, 3, axis=2))


def test_real_wav_roundtrip_and_stereo():
    import numpy as np

    from lucenenet_ray.ops.multimodal import (decode_wav_pcm16,
                                              encode_wav_pcm16)

    pcm = (np.sin(np.linspace(0, 20, 200)) * 20000).astype(np.int16)
    got = decode_wav_pcm16(encode_wav_pcm16(pcm))
    np.testing.assert_array_equal(got, pcm.astype(np.int32))
    # stereo averages exactly (integer floor division)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        inter = np.empty(10, dtype=np.int16)
        inter[0::2] = [100, -100, 7, 0, 32000]
        inter[1::2] = [200, -300, 8, 1, 31000]
        f.writeframes(inter.tobytes())
    got2 = decode_wav_pcm16(buf.getvalue())
    np.testing.assert_array_equal(got2, [150, -200, 7, 0, 31500])


def test_image_audio_stats_stages(ray_session):
    import numpy as np
    import ray.data as rd

    from lucenenet_ray.ops.multimodal import (AudioStats, ImageStats,
                                              synthesize_real_media_table)

    t = synthesize_real_media_table(n=8)
    imgs = rd.from_arrow(t).filter(lambda r: r["kind"] == "image") \
        .map_batches(ImageStats, batch_format="pyarrow", concurrency=1) \
        .to_pandas()
    assert (imgs["sum_all"] == imgs[["sum_r", "sum_g", "sum_b"]]
            .sum(axis=1)).all()
    assert (imgs["sum_all"] == imgs[["q00", "q01", "q10", "q11"]]
            .sum(axis=1)).all()
    auds = rd.from_arrow(t).filter(lambda r: r["kind"] == "audio") \
        .map_batches(AudioStats, batch_format="pyarrow", concurrency=1) \
        .to_pandas()
    assert (auds["n_samples"] == 128).all()
    assert (auds["max_sample"] >= auds["min_sample"]).all()


def test_ppm_stream_roundtrip():
    import numpy as np

    from lucenenet_ray.ops.multimodal import decode_ppm_stream, encode_ppm

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
              for _ in range(7)]
    clip = b"".join(encode_ppm(f) for f in frames)
    got = decode_ppm_stream(clip)
    assert len(got) == 7
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
