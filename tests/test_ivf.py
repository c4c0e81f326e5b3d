"""IVF ANN (ops/ivf.py): deterministic training, genuine partition
pruning, and recall vs the exact brute-force path."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
EMB = f"{SF_DIR}/embeddings.parquet"


def _queries(n=4):
    t = pq.read_table(EMB, columns=["vec_id", "embedding"])
    m = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    return m[:n]


@pytest.fixture(scope="module")
def ivf_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.ops.ivf import build_ivf_index, train_centroids

    ds = rd.read_parquet(EMB)
    cent = train_centroids(ds, n_lists=8, n_iters=4)
    path = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(rd.read_parquet(EMB), path, cent)
    return path, cent


def test_training_deterministic(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.ivf import train_centroids

    c1 = train_centroids(rd.read_parquet(EMB), n_lists=8, n_iters=3)
    c2 = train_centroids(rd.read_parquet(EMB), n_lists=8, n_iters=3)
    assert np.array_equal(c1, c2)
    assert c1.shape[0] == 8
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_pruning_and_recall(ivf_index, ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.ivf import knn_ivf_pruned
    from lucenenet_ray.ops.knn import knn_bruteforce

    path, cent = ivf_index
    qv = _queries(4)
    out, n_read, n_total = knn_ivf_pruned(path, cent, qv, k=10, nprobe=3)
    assert n_total == 8 and 0 < n_read < n_total  # genuine pruning
    exact = knn_bruteforce(rd.read_parquet(EMB), qv, k=10)
    hits = 0
    for qi in range(4):
        got = {v for q, v in zip(out.column("query_id").to_pylist(),
                                 out.column("vec_id").to_pylist()) if q == qi}
        want = {v for q, v in zip(exact.column("query_id").to_pylist(),
                                  exact.column("vec_id").to_pylist())
                if q == qi}
        hits += len(got & want)
    assert hits / 40.0 >= 0.5  # IVF recall floor at nprobe=3/8


def test_self_is_top1(ivf_index):
    from lucenenet_ray.ops.ivf import knn_ivf_pruned

    path, cent = ivf_index
    qv = _queries(2)
    out, _r, _t = knn_ivf_pruned(path, cent, qv, k=3, nprobe=2)
    top1 = {q: v for q, r, v in zip(out.column("query_id").to_pylist(),
                                    out.column("rank").to_pylist(),
                                    out.column("vec_id").to_pylist())
            if r == 1}
    # queries are vectors 0 and 1 of the table — each finds itself
    assert top1[0] == 0 and top1[1] == 1
