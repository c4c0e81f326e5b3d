"""ColBERT MaxSim (ops/multivector.py) and nDCG helpers (ops/ndcg.py)
vs plain-Python brute force."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.multivector import maxsim_topk


def _emb_table(n_vecs, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.randn(n_vecs, dim)
    return pa.table({
        "vec_id": pa.array(range(n_vecs), type=pa.int64()),
        "embedding": pa.array([row.tolist() for row in m]),
    }), m


def _brute_maxsim(m, q, g, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    docs = np.arange(len(m)) // g
    scores = {}
    for d in np.unique(docs):
        block = sims[docs == d]
        scores[int(d)] = float(sum(block[:, i].max()
                                   for i in range(q.shape[0])))
    order = sorted(scores, key=lambda d: (-scores[d], d))[:k]
    return order


def test_maxsim_matches_bruteforce(ray_session):
    import ray.data as rd

    t, m = _emb_table(48, dim=8)
    q = m[:4]
    ds = rd.from_arrow(t).repartition(5)  # groups straddle blocks
    out = maxsim_topk(ds, q, group_size=4, k=6)
    assert out.column("doc").to_pylist() == _brute_maxsim(m, q, 4, 6)
    assert out.column("rank").to_pylist() == [1, 2, 3, 4, 5, 6]
    assert out.column("doc").to_pylist()[0] == 0  # query doc scores max


def test_maxsim_parallelism_invariant(ray_session):
    import ray.data as rd

    t, m = _emb_table(40, dim=8, seed=11)
    out1 = maxsim_topk(rd.from_arrow(t).repartition(1), m[:3],
                       group_size=4, k=5)
    out7 = maxsim_topk(rd.from_arrow(t).repartition(7), m[:3],
                       group_size=4, k=5)
    assert out1.equals(out7)


def test_maxsim_gate_rank_gap_floor():
    """Rank-only gate safety (ADVICE r3): the gated corpus's minimum
    adjacent MaxSim score gap in the top-30 must stay orders of magnitude
    above the engine/oracle float-path divergence (~1e-14), so adjacent
    ranks provably cannot flip. Fails loudly if a regenerated corpus
    narrows the gap."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    m = pc.list_flatten(t.column("embedding")).to_numpy() \
        .astype(np.float64).reshape(len(ids), -1)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qm = mn[ids < 4]
    sims = mn @ qm.T
    doc = ids // 4
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    per_tok_max = np.maximum.reduceat(sims, starts, axis=0)
    tot = np.sort(per_tok_max.sum(axis=1))[::-1][:30]
    assert (-np.diff(tot)).min() > 1e-6


def test_ndcg_helpers():
    from lucenenet_ray.ops.ndcg import (
        DISCOUNTS,
        NDCG_K,
        SCALE,
        dcg_scaled,
        idcg_scaled,
    )

    assert len(DISCOUNTS) == NDCG_K
    assert DISCOUNTS[0] == SCALE  # 1/log2(2) == 1
    assert all(a > b for a, b in zip(DISCOUNTS, DISCOUNTS[1:]))
    # perfect ranking: dcg == idcg
    assert dcg_scaled([True] * 10) == idcg_scaled(10) == sum(DISCOUNTS)
    # one relevant doc at rank 3
    assert dcg_scaled([False, False, True]) == DISCOUNTS[2]
    assert idcg_scaled(1) == DISCOUNTS[0]
    assert idcg_scaled(0) == 0
    # more relevant docs than k: ideal saturates at k
    assert idcg_scaled(100) == sum(DISCOUNTS)
