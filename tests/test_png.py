"""Real PNG codec (ops/png.py) — roundtrip through zlib + all five
scanline filters, color-type normalization, error cases, and the
actor-stage + formula-oracle parity of png_decode_stats."""

import struct
import zlib

import numpy as np
import pytest

from lucenenet_ray.ops.png import _SIG, _chunk, png_decode, png_encode


def _img(h, w, seed=1):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("filters", [
    None, "sub", "up", "avg", "paeth", "cycle"])
def test_roundtrip_every_filter(filters):
    img = _img(11, 7)
    fmap = {None: None, "sub": [1] * 11, "up": [2] * 11, "avg": [3] * 11,
            "paeth": [4] * 11, "cycle": [i % 5 for i in range(11)]}
    got = png_decode(png_encode(img, fmap[filters]))
    assert (got == img).all()


def test_single_pixel_and_single_row():
    for shape in [(1, 1, 3), (1, 9, 3), (9, 1, 3)]:
        img = _img(*shape[:2])
        assert (png_decode(png_encode(img, [4] * shape[0])) == img).all()


def _raw_png(ctype, h, w, rows, extra=b""):
    raw = b"".join(b"\x00" + r.tobytes() for r in rows)
    return (_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype,
                                          0, 0, 0))
            + extra + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def test_grayscale_palette_rgba_normalization():
    rng = np.random.default_rng(3)
    h, w = 5, 4
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    g = png_decode(_raw_png(0, h, w, [gray[r] for r in range(h)]))
    assert g.shape == (h, w, 3)
    assert (g == gray[:, :, None]).all()
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
    p = png_decode(_raw_png(3, h, w, [idx[r] for r in range(h)],
                            extra=_chunk(b"PLTE", pal.tobytes())))
    assert (p == pal[idx]).all()
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    a = png_decode(_raw_png(6, h, w,
                            [rgba[r].reshape(-1) for r in range(h)]))
    assert (a == rgba[:, :, :3]).all()


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    img = _img(3, 3)
    good = png_encode(img)
    # 16-bit depth
    bad = bytearray(good)
    # depth byte sits at offset 8(sig)+8(len+tag)+8(w,h) = 24
    bad[24] = 16
    with pytest.raises(ValueError):
        png_decode(bytes(bad))
    # interlaced
    bad = bytearray(good)
    bad[28] = 1
    with pytest.raises(ValueError):
        png_decode(bytes(bad))


def test_decode_image_dispatches_png():
    from lucenenet_ray.ops.multimodal import decode_image

    img = _img(6, 5)
    assert (decode_image(png_encode(img)) == img).all()


def test_png_stats_gate_matches_duckdb_oracle(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.multimodal import (PNGStats,
                                              synthesize_png_table)
    from lucenenet_ray.ops.sql_oracle import png_decode_stats_sql

    t = synthesize_png_table(n=16)
    ds = rd.from_arrow(t).map_batches(PNGStats, batch_format="pyarrow",
                                      batch_size=4, concurrency=2)
    out = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")])
    out = out.take(pa.compute.sort_indices(out.column("item_id")))
    exp = duckdb.connect().execute(png_decode_stats_sql(n=16)).arrow()
    assert out.to_pylist() == exp.to_pylist()


def test_conformance_on_reference_branding_pngs():
    """REAL third-party-encoded PNGs (reference branding logos — written
    by production encoders with adaptive per-row filters): decode all
    19, pin dimensions against the filename ground truth, and use the
    grayscale logos as an unfilter-correctness oracle — every pixel's
    channels must agree within 1 (the source's own conversion rounding);
    any Sub/Up/Average/Paeth bug produces diffs up to 255."""
    import glob
    import re

    files = sorted(glob.glob("/root/reference/branding/logo/*.png"))
    assert len(files) >= 15
    for f in files:
        img = png_decode(open(f, "rb").read())
        m = re.search(r"-(\d+)x(\d+)\.png$", f)
        if m:
            w, h = int(m.group(1)), int(m.group(2))
            assert img.shape == (h, w, 3), f
        # self-consistency on real pixel data
        assert (png_decode(png_encode(img)) == img).all()
    for name in ("lucene-net-grayscale.png",
                 "lucene-net-reverse-grayscale.png"):
        img = png_decode(open(
            f"/root/reference/branding/logo/{name}", "rb").read()
        ).astype(int)
        assert abs(img[:, :, 0] - img[:, :, 1]).max() <= 1, name
        assert abs(img[:, :, 1] - img[:, :, 2]).max() <= 1, name
