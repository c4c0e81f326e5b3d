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


def test_graded_ndcg_helpers():
    """Graded nDCG (ops/ndcg.py graded_*): exponential gains, ideal
    packing, grade thresholds."""
    from lucenenet_ray.ops.ndcg import (DISCOUNTS, gain_of, grade_of,
                                        graded_dcg_scaled,
                                        graded_idcg_scaled)

    assert [gain_of(g) for g in (0, 1, 2, 3)] == [0, 1, 3, 7]
    # grade thresholds on md5 % 11
    assert grade_of(0) == 3 and grade_of(11) == 3
    assert grade_of(1) == 2 and grade_of(2) == 2
    assert grade_of(3) == 1 and grade_of(5) == 1
    assert grade_of(6) == 0 and grade_of(10) == 0
    # DCG: gain-weighted shared discounts
    assert graded_dcg_scaled([7, 0, 1]) == 7 * DISCOUNTS[0] + DISCOUNTS[2]
    # ideal packing: 1×grade3, 2×grade2, 1×grade1
    want = (7 * DISCOUNTS[0] + 3 * DISCOUNTS[1] + 3 * DISCOUNTS[2]
            + DISCOUNTS[3])
    assert graded_idcg_scaled(1, 2, 1) == want
    # truncation at k
    assert graded_idcg_scaled(100, 0, 0) == 7 * sum(DISCOUNTS)
    assert graded_idcg_scaled(0, 0, 0) == 0


def test_maxsim_near_tie_embeddings_deterministic(ray_session):
    """VERDICT r4 #6 (near-tie embeddings): docs whose MaxSim scores are
    EXACTLY tied and others separated by ~1e-12 — far below the
    documented 1e-6 corpus gap floor. The engine must stay fully
    deterministic and partition-invariant (ties break doc asc) even
    where oracle float-parity would be unprovable; the rank-only gate's
    safety on real corpora rests on the gap-floor test above, and this
    pins the tie rule the reference uses (TopDocs doc-asc tiebreak)."""
    import ray.data as rd

    rng = np.random.RandomState(23)
    base = rng.randn(4, 8)
    rows = []
    for d in range(10):
        block = base.copy()
        # docs 0/1 identical (exact tie); others perturbed ~1e-12
        if d >= 2:
            block = block + 1e-12 * rng.randn(4, 8) * d
        rows.append(block)
    m = np.vstack(rows)
    t = pa.table({
        "vec_id": pa.array(range(len(m)), type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in m]),
    })
    outs = [maxsim_topk(rd.from_arrow(t).repartition(p), base[:3],
                        group_size=4, k=10) for p in (1, 4, 9)]
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])
    docs = outs[0].column("doc").to_pylist()
    # docs 0 and 1 are byte-identical token bags → exact score tie →
    # doc-asc adjacency (the TopDocs tiebreak), at every partitioning
    i0, i1 = docs.index(0), docs.index(1)
    assert i1 == i0 + 1
