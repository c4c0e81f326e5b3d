"""Scalar quantization SQ8 (ops/sq.py) — stats, encode rounding, asymmetric
search vs a naive model."""

import numpy as np
import pyarrow as pa


def _vecs(n: int, dim: int = 8, seed: int = 5) -> pa.Table:
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim).astype(np.float32)
    m[:, 3] = 1.25  # a constant dimension (max == min edge case)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              type=pa.list_(pa.float32())),
    })


def _naive_codes(mat, mins, maxs):
    rng = maxs - mins
    out = np.zeros(mat.shape, dtype=np.int64)
    live = rng > 0
    sc = np.where(live, rng / 255.0, 1.0)
    q = np.clip(np.floor((mat - mins) / sc + 0.5), 0, 255).astype(np.int64)
    q[:, ~live] = 0
    return q


def test_train_and_encode(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.sq import sq_encode, train_sq
    from lucenenet_ray.util.tables import dataset_to_table

    t = _vecs(80)
    mat = np.array([r.as_py() for r in t.column("embedding")],
                   dtype=np.float64)
    mins, maxs = train_sq(rd.from_arrow(t))
    np.testing.assert_allclose(mins, mat.min(axis=0))
    np.testing.assert_allclose(maxs, mat.max(axis=0))
    enc = dataset_to_table(sq_encode(rd.from_arrow(t), mins, maxs),
                           schema=None)
    import pyarrow.compute as pc

    ids = enc.column("vec_id").to_numpy().astype(np.int64)
    codes = pc.list_flatten(enc.column("codes")).to_numpy().reshape(
        len(ids), mat.shape[1])
    order = np.argsort(ids)
    np.testing.assert_array_equal(codes[order],
                                  _naive_codes(mat, mins, maxs))
    # constant dim → all zeros; live dims span close to the full range
    assert (codes[:, 3] == 0).all()
    assert codes[:, 0].min() == 0 and codes[:, 0].max() == 255
    # reconstruction error bounded by half a quantization step per dim
    sc = np.where(maxs > mins, (maxs - mins) / 255.0, 0.0)
    rec = mins + codes[order] * sc
    assert np.abs(rec - mat).max() <= (sc.max() / 2) + 1e-12


def test_knn_sq8_matches_naive(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.sq import knn_sq8, sq_encode, train_sq

    t = _vecs(120, seed=9)
    mat = np.array([r.as_py() for r in t.column("embedding")],
                   dtype=np.float64)
    mins, maxs = train_sq(rd.from_arrow(t))
    enc = sq_encode(rd.from_arrow(t), mins, maxs)
    q = mat[[2, 40]]
    got = knn_sq8(enc, mins, maxs, q, k=5).to_pandas()
    codes = _naive_codes(mat, mins, maxs)
    sc = np.where(maxs > mins, (maxs - mins) / 255.0, 0.0)
    rec = mins + codes * sc
    for qi, qv in enumerate(q):
        d = ((rec - qv) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(d)), d))[:5]
        sub = got[got.query_id == qi].sort_values("rank")
        assert sub.vec_id.tolist() == [int(i) for i in order]
    # a corpus vector queries back to itself at rank 1 (its own code is
    # the nearest reconstruction)
    assert got[(got.query_id == 0) & (got["rank"] == 1)].vec_id.item() == 2
