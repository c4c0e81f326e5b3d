"""SemDeDup (ops/semdedup.py): within-cluster dedup vs brute force, keep
rule on a handcrafted cluster."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
K, TAU = 8, 0.4


def _brute():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    seeds = m[ids < K]
    sims = m @ seeds.T
    cl = np.argmax(sims, axis=1)
    cs = sims[np.arange(len(ids)), cl]
    kept = np.ones(len(ids), dtype=bool)
    for c in range(K):
        idx = np.flatnonzero(cl == c)
        s = m[idx] @ m[idx].T
        for a_pos, a in enumerate(idx):
            dom = (s[a_pos] >= TAU) & (
                (cs[idx] < cs[a])
                | ((cs[idx] == cs[a]) & (ids[idx] < ids[a])))
            dom[a_pos] = False
            if dom.any():
                kept[a] = False
    return ids, cl, kept


def test_semdedup_matches_bruteforce(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.semdedup import semdedup

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = (semdedup(ds, n_clusters=K, tau=TAU).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    ids, cl, kept = _brute()
    assert got["vec_id"].to_numpy().tolist() == ids.tolist()
    assert got["cluster"].to_numpy().tolist() == cl.tolist()
    assert got["kept"].to_numpy().astype(bool).tolist() == kept.tolist()


def test_keep_rule_prefers_low_centroid_sim(ray_session):
    """Two near-identical vectors: the one FARTHER from the centroid
    survives (the paper's keep rule); an orthogonal vector is untouched."""
    import ray.data as rd

    from lucenenet_ray.ops.semdedup import semdedup

    vecs = [
        [1.0, 0.0, 0.0],        # vec 0: seed (cluster 0 centroid)
        [0.99, 0.141, 0.0],     # vec 1: close to seed, cos(1,2) high
        [0.95, 0.312, 0.0],     # vec 2: same direction, farther from seed
        [0.0, 0.0, 1.0],        # vec 3: own direction
    ]
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
    }))
    out = (semdedup(ds, n_clusters=1, tau=0.95).to_pandas()
           .sort_values("vec_id"))
    kept = dict(zip(out["vec_id"], out["kept"]))
    # all in cluster 0; 0,1,2 mutually >= 0.95 cosine; vec 3 below tau
    # priority = lowest cent_sim first -> vec 3 < vec 2 < vec 1 < vec 0
    assert kept[3] == 1          # no neighbor above tau
    assert kept[2] == 1          # lowest cent_sim of the dup group
    assert kept[1] == 0 and kept[0] == 0
