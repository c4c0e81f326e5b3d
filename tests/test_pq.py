"""Product quantization (ops/pq.py) — seed codebooks, encode argmin
semantics, ADC exactness vs a naive model, Lloyd training determinism."""

import numpy as np
import pyarrow as pa
import pytest


def _vecs(n: int, dim: int = 8, seed: int = 7) -> pa.Table:
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              type=pa.list_(pa.float32())),
    })


def _naive_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, k, dsub = books.shape
    out = np.zeros((mat.shape[0], m), dtype=np.int64)
    for i, x in enumerate(mat):
        for s in range(m):
            xs = x[s * dsub:(s + 1) * dsub]
            d = ((books[s] - xs) ** 2).sum(axis=1)
            out[i, s] = int(np.argmin(d))
    return out


def test_seed_codebooks_and_encode(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.pq import pq_encode, seed_codebooks
    from lucenenet_ray.util.tables import dataset_to_table

    t = _vecs(40, dim=8)
    ds = rd.from_arrow(t)
    books = seed_codebooks(ds, m=2, k=4)
    mat = np.array([r.as_py() for r in t.column("embedding")],
                   dtype=np.float64)
    # codebooks are exactly the 4 lowest-id vectors' subspace slices
    assert books.shape == (2, 4, 4)
    np.testing.assert_allclose(books[0], mat[:4, :4])
    np.testing.assert_allclose(books[1], mat[:4, 4:])
    enc = dataset_to_table(pq_encode(rd.from_arrow(t), books),
                           schema=None).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    want = _naive_codes(mat, books)
    got = enc[["c0", "c1"]].to_numpy()
    np.testing.assert_array_equal(got, want)
    # a seed vector encodes to itself in every subspace
    assert got[2, 0] == 2 and got[2, 1] == 2


def test_adc_matches_naive_model(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.pq import adc_topk, pq_encode, seed_codebooks

    t = _vecs(60, dim=8, seed=11)
    mat = np.array([r.as_py() for r in t.column("embedding")],
                   dtype=np.float64)
    ds = rd.from_arrow(t)
    books = seed_codebooks(ds, m=2, k=4)
    q = mat[[0, 5]]
    got = adc_topk(pq_encode(rd.from_arrow(t), books), books, q,
                   k=5).to_pandas()
    # naive ADC: distance = sum_s ||q_sub - codeword(code_s(x))||^2
    codes = _naive_codes(mat, books)
    m, k, dsub = books.shape
    for qi, qv in enumerate(q):
        d = np.zeros(mat.shape[0])
        for s in range(m):
            tab = ((books[s] - qv[s * dsub:(s + 1) * dsub]) ** 2).sum(axis=1)
            d += tab[codes[:, s]]
        order = np.lexsort((np.arange(len(d)), d))[:5]
        sub = got[got.query_id == qi].sort_values("rank")
        assert sub.vec_id.tolist() == [int(i) for i in order]
    # query 0 IS seed 0: its ADC distance to itself is 0 → rank 1
    assert got[(got.query_id == 0) & (got["rank"] == 1)].vec_id.item() == 0


def test_ivfpq_prunes_and_matches_naive(ray_session, tmp_path):
    import ray.data as rd

    from lucenenet_ray.ops.pq import (build_ivfpq_index, coarse_seeds,
                                      knn_ivfpq, seed_codebooks)

    t = _vecs(200, dim=8, seed=23)
    mat = np.array([r.as_py() for r in t.column("embedding")],
                   dtype=np.float64)
    ds = rd.from_arrow(t)
    coarse = coarse_seeds(ds, n_lists=4)
    books = seed_codebooks(rd.from_arrow(t), m=2, k=4)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(rd.from_arrow(t), path, coarse, books)
    q = mat[[3, 17]]
    got, n_read, n_total = knn_ivfpq(path, coarse, books, q, k=5, nprobe=1)
    assert n_total == 4 and 1 <= n_read <= 2  # genuine partition pruning
    # naive model: assign -> probe -> ADC within probed lists
    assign = np.array([
        int(np.argmin(((coarse - x) ** 2).sum(axis=1))) for x in mat])
    codes = _naive_codes(mat, books)
    m, k, dsub = books.shape
    gdf = got.to_pandas()
    for qi, qv in enumerate(q):
        probe = int(np.argmin(((coarse - qv) ** 2).sum(axis=1)))
        cand = np.where(assign == probe)[0]
        d = np.zeros(len(cand))
        for s in range(m):
            tab = ((books[s] - qv[s * dsub:(s + 1) * dsub]) ** 2).sum(axis=1)
            d += tab[codes[cand, s]]
        order = cand[np.lexsort((cand, d))][:5]
        sub = gdf[gdf.query_id == qi].sort_values("rank")
        assert sub.vec_id.tolist() == [int(i) for i in order]


def test_train_pq_deterministic_and_improves(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.pq import pq_encode, seed_codebooks, train_pq
    from lucenenet_ray.util.tables import dataset_to_table

    t = _vecs(120, dim=8, seed=3)
    mat = np.array([r.as_py() for r in t.column("embedding")],
                   dtype=np.float64)

    def mse(books: np.ndarray) -> float:
        enc = dataset_to_table(pq_encode(rd.from_arrow(t), books),
                               schema=None).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        m, k, dsub = books.shape
        err = 0.0
        codes = enc[[f"c{s}" for s in range(m)]].to_numpy()
        for s in range(m):
            rec = books[s][codes[:, s]]
            err += ((mat[:, s * dsub:(s + 1) * dsub] - rec) ** 2).sum()
        return err

    b1 = train_pq(rd.from_arrow(t), m=2, k=8, n_iters=4)
    b2 = train_pq(rd.from_arrow(t), m=2, k=8, n_iters=4)
    np.testing.assert_array_equal(b1, b2)  # no RNG anywhere
    seed = seed_codebooks(rd.from_arrow(t), m=2, k=8)
    assert mse(b1) <= mse(seed)  # Lloyd never increases quantization error
