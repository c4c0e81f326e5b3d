"""Spatial ops (ops/spatial.py): quad-cell letter semantics, ancestor
prefixes, bbox exactness, knn identity vs brute force."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_quad_cell_letters():
    from lucenenet_ray.ops.spatial import quad_cell

    # level 1 quadrants: A=NW B=NE C=SW D=SE (QuadPrefixTree.cs:182-185)
    assert quad_cell(45.0, -90.0, 1) == "A"
    assert quad_cell(45.0, 90.0, 1) == "B"
    assert quad_cell(-45.0, -90.0, 1) == "C"
    assert quad_cell(-45.0, 90.0, 1) == "D"


def test_quad_cells_prefix_family():
    from lucenenet_ray.ops.spatial import quad_cell, quad_cells

    cells = quad_cells(37.77, -122.42, 4)
    assert len(cells) == 4
    for i, c in enumerate(cells, 1):
        assert len(c) == i
        assert cells[-1].startswith(c)
    assert cells[-1] == quad_cell(37.77, -122.42, 4)


def test_bbox_filter_exact(ray_session):
    from lucenenet_ray.ops.spatial import bbox_filter, synth_latlon_centi
    from lucenenet_ray.util.tables import dataset_to_table
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    out = dataset_to_table(
        bbox_filter(ds, 0.0, 45.0, -90.0, 0.0), schema=None)
    got = set(out.column("doc_id").to_pylist())
    ids = np.arange(500, dtype=np.int64)
    lat, lon = synth_latlon_centi(ids)
    want = {int(i) for i, la, lo in zip(ids, lat / 100.0, lon / 100.0)
            if 0.0 <= la < 45.0 and -90.0 <= lo < 0.0}
    assert got == want and got


def test_knn_matches_bruteforce(ray_session):
    from lucenenet_ray.ops.spatial import knn_euclidean, synth_latlon_centi
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    out = knn_euclidean(ds, np.asarray([(10.0, 10.0)]), k=5)
    ids = np.arange(500, dtype=np.int64)
    lat_c, lon_c = synth_latlon_centi(ids)
    lat, lon = lat_c / 100.0, lon_c / 100.0
    d2 = (lat - 10.0) ** 2 + (lon - 10.0) ** 2
    order = np.lexsort((ids, d2))[:5]
    assert out.column("doc_id").to_pylist() == ids[order].tolist()
    assert out.column("dist2").to_pylist() == d2[order].tolist()


def test_geohash_public_vectors():
    from lucenenet_ray.ops.spatial import geohash_cells, geohash_encode

    # canonical vectors (Niemeyer / geohash.org)
    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_encode(42.6, -5.6, 5) == "ezs42"
    assert geohash_encode(0.0, 0.0, 1) == "s"
    assert geohash_encode(37.8324, 112.5584, 9) == "ww8p1r4t8"
    cells = geohash_cells(57.64911, 10.40744, 5)
    assert cells == ["u", "u4", "u4p", "u4pr", "u4pru"]


def test_quad_cover_prefix_free_and_superset(ray_session):
    """RecursivePrefixTree Intersects: the cover is prefix-free; every doc
    whose exact point lies in the rect is matched (grid leaves can only
    ADD edge docs, never drop interior ones)."""
    import numpy as np
    import ray.data as rd

    from lucenenet_ray.ops.spatial import (intersects_filter, quad_cover,
                                           synth_latlon_centi)

    lat_lo, lat_hi, lon_lo, lon_hi = -3000, 1000, 2000, 9000
    cover = quad_cover(lat_lo, lat_hi, lon_lo, lon_hi, 6)
    assert cover
    for i, a in enumerate(cover):
        for b in cover[i + 1:]:
            assert not b.startswith(a) and not a.startswith(b)
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"])
    got = set()
    for b in intersects_filter(ds, cover, 6).iter_batches(
            batch_format="pyarrow"):
        got.update(b.column("doc_id").to_pylist())
    ids = np.arange(500, dtype=np.int64)
    lat, lon = synth_latlon_centi(ids)
    exact = set(ids[(lat >= lat_lo) & (lat <= lat_hi)
                    & (lon >= lon_lo) & (lon <= lon_hi)].tolist())
    assert exact <= got
    # approximation only adds docs whose CELL touches the rect: every
    # extra doc is within one level-6 cell width of the boundary
    cell_w_lon, cell_w_lat = 36000 // 64 + 1, 18000 // 64 + 1
    for d in got - exact:
        la, lo = synth_latlon_centi(np.asarray([d]))
        assert (lat_lo - cell_w_lat <= la[0] <= lat_hi + cell_w_lat
                and lon_lo - cell_w_lon <= lo[0] <= lon_hi + cell_w_lon)


def test_quad_cover_full_world_is_whole_corpus(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.spatial import intersects_filter, quad_cover

    cover = quad_cover(-9000, 8999, -18000, 17999, 4)
    assert sorted(cover) == ["A", "B", "C", "D"]
    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"])
    assert intersects_filter(ds, cover, 4).count() == 500
