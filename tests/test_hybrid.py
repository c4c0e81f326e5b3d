"""ops/hybrid.py — reciprocal-rank fusion, model-checked against the RRF
definition (Cormack et al. 2009): score(d) = sum 1/(K + rank)."""

import pyarrow as pa
import pytest

from lucenenet_ray.ops.hybrid import rrf_fuse


def test_rrf_both_lists():
    t = rrf_fuse([[10, 20, 30], [20, 40]], k=10, K=60)
    d = dict(zip(t.column("doc_id").to_pylist(),
                 t.column("rrf_score").to_pylist()))
    assert d[10] == 1.0 / 61
    assert d[20] == 1.0 / 62 + 1.0 / 61
    assert d[30] == 1.0 / 63
    assert d[40] == 1.0 / 62
    # doc 20 appears in both lists -> highest fused score
    assert t.column("doc_id")[0].as_py() == 20


def test_rrf_tie_breaks_by_doc_id():
    # docs 5 and 9 get identical scores (same ranks in disjoint lists)
    t = rrf_fuse([[9], [5]], k=10, K=60)
    assert t.column("doc_id").to_pylist() == [5, 9]
    assert t.column("rrf_score")[0].as_py() == t.column("rrf_score")[1].as_py()


def test_rrf_k_cut_and_custom_K():
    t = rrf_fuse([list(range(100))], k=3, K=1)
    assert t.num_rows == 3
    assert t.column("doc_id").to_pylist() == [0, 1, 2]
    assert t.column("rrf_score").to_pylist() == [1 / 2, 1 / 3, 1 / 4]


def test_rrf_empty():
    t = rrf_fuse([[], []], k=5)
    assert t.num_rows == 0
    assert t.schema == pa.schema([("doc_id", pa.int64()),
                                  ("rrf_score", pa.float64())])


@pytest.mark.usefixtures("ray_session")
def test_knn_filtered_pool_only():
    """Filtered kNN returns only vectors passing the filter, ranked exactly
    as brute force over the filtered pool."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucenenet_ray.ops.knn import knn_bruteforce

    path = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(path)
    qv = np.array([t.column("embedding")[0].as_py()], dtype=np.float64)
    ds = rd.read_parquet(path, columns=["vec_id", "embedding", "label"])
    ds = ds.map_batches(lambda b: b.filter(pc.equal(b.column("label"), 3)),
                        batch_format="pyarrow")
    out = knn_bruteforce(ds, qv, k=5)
    allowed = {v for v, l in zip(t.column("vec_id").to_pylist(),
                                 t.column("label").to_pylist()) if l == 3}
    got = out.column("vec_id").to_pylist()
    assert got and set(got) <= allowed
    # sequential reference over the filtered pool
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.array(t.column("vec_id").to_pylist())
    mask = np.array(t.column("label").to_pylist()) == 3
    e, i = emb[mask], ids[mask]
    sims = (e / np.linalg.norm(e, axis=1, keepdims=True)) @ (
        qv[0] / np.linalg.norm(qv[0]))
    order = np.lexsort((i, -sims))[:5]
    assert got == i[order].tolist()


def test_borda_fuse_points():
    from lucenenet_ray.ops.hybrid import borda_fuse

    t = borda_fuse([[5, 7, 9], [7, 5, 11]], k=4, leg_k=3)
    rows = list(zip(t.column("doc_id").to_pylist(),
                    t.column("borda").to_pylist()))
    # 5: 3+2=5; 7: 2+3=5 (tie -> id asc); 9: 1; 11: 1 (tie -> id asc)
    assert rows == [(5, 5), (7, 5), (9, 1), (11, 1)]
