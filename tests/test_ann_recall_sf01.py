"""Real-data recall floors for the approximate ANN members at sf0.1
(the HNSW knn_hnsw_recall precedent extended to LSH and IVF): the
approximation quality of every scale path is measured against the exact
engine path on the actual embeddings table, not just synthetic vectors."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.1"
K = 10


def _queries():
    qt = pq.read_table(f"{SF}/embeddings.parquet",
                       filters=[("vec_id", "<", 8)])
    return pc.list_flatten(qt.column("embedding")).to_numpy() \
        .astype(np.float64).reshape(qt.num_rows, -1)


def _exact_sets(ds, qm):
    from lucenenet_ray.ops.knn import knn_bruteforce

    exact = knn_bruteforce(ds, qm, k=K)
    return {qi: set(exact.filter(pc.equal(exact.column("query_id"), qi))
                    .column("vec_id").to_pylist())
            for qi in range(qm.shape[0])}


def _recalls(res, want):
    out = []
    for qi, w in want.items():
        got = set(res.filter(pc.equal(res.column("query_id"), qi))
                  .column("vec_id").to_pylist())
        out.append(len(w & got) / len(w))
    return out


def test_lsh_recall_sf01(ray_session):
    from lucenenet_ray.ops.knn import knn_lsh

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qm = _queries()
    want = _exact_sets(ds, qm)
    res = knn_lsh(ds, qm, k=K, n_bits=6, multiprobe=2)
    recs = _recalls(res, want)
    assert np.mean(recs) >= 0.6, recs  # 6-bit hyperplane LSH, 2-bit probe


def test_ivf_recall_sf01(ray_session, tmp_path):
    from lucenenet_ray.ops.ivf import (build_ivf_index, knn_ivf_pruned,
                                       train_centroids)

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    qm = _queries()
    want = _exact_sets(ds, qm)
    cents = train_centroids(ds, n_lists=16, n_iters=3)
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, cents)
    res, n_read, n_total = knn_ivf_pruned(idx, cents, qm, k=K, nprobe=4)
    assert n_read < n_total  # the pruning must actually prune
    recs = _recalls(res, want)
    assert np.mean(recs) >= 0.6, recs  # nprobe 4/16
