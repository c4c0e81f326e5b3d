"""Session-13 wave: HITS fixed-point, temperature mixing, Kneser-Ney LM."""

from math import isqrt

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.graphrank import HITS_SCALE, _out_edges, hits, hits_topk
from lucenenet_ray.ops.kn_lm import bigram_table, kneser_ney_topk
from lucenenet_ray.ops.neardup import md5_int31


def _ids_ds(n, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": list(range(n))})) \
             .repartition(parallelism)


def _hits_local(n, n_iters):
    """Independent driver-side reference of the same integer equations."""
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    h = np.full(n, HITS_SCALE, dtype=np.int64)
    for _ in range(n_iters):
        a_raw = np.zeros(n, dtype=np.int64)
        np.add.at(a_raw, dst, h[src])
        a = (HITS_SCALE * a_raw) // int(a_raw.max())
        h_raw = np.zeros(n, dtype=np.int64)
        np.add.at(h_raw, src, a[dst])
        h = (HITS_SCALE * h_raw) // int(h_raw.max())
    return a, h


def test_hits_matches_local_reference(ray_session):
    a, h = hits(_ids_ds(60, parallelism=5), 60, n_iters=3)
    ra, rh = _hits_local(60, 3)
    assert (a == ra).all() and (h == rh).all()
    assert a.max() == HITS_SCALE and h.max() == HITS_SCALE


def test_hits_parallelism_invariant(ray_session):
    a1, h1 = hits(_ids_ds(40, parallelism=1), 40, n_iters=2)
    a7, h7 = hits(_ids_ds(40, parallelism=7), 40, n_iters=2)
    assert (a1 == a7).all() and (h1 == h7).all()


def test_hits_topk_order(ray_session):
    t = hits_topk(_ids_ds(30, parallelism=3), 30, n_iters=2, k=10)
    assert t.num_rows == 10
    auth = t.column("authority").to_pylist()
    node = t.column("node").to_pylist()
    assert auth == sorted(auth, reverse=True)
    for i in range(9):  # ties break node-ascending
        if auth[i] == auth[i + 1]:
            assert node[i] < node[i + 1]
    assert t.column("rank_pos").to_pylist() == list(range(1, 11))


def test_tmix_threshold_equivalence():
    # k <= isqrt((c^2-1)//n)  <=>  k^2 * n < c^2, for every k in range
    c = 6 << 31
    for n in (1, 2, 144, 10**6, 2**31):
        t = min(isqrt((c * c - 1) // n), (1 << 31) - 1)
        assert t * t * n < c * c or t == (1 << 31) - 1
        if t < (1 << 31) - 1:
            assert (t + 1) * (t + 1) * n >= c * c


def test_temperature_mix_matches_bruteforce(ray_session):
    from lucenenet_ray.ops.domains import (TMIX_C_MULT, synth_domains,
                                           temperature_mix_stats)

    n = 300
    got = temperature_mix_stats(_ids_ds(n, parallelism=5))
    c = TMIX_C_MULT << 31
    doms = synth_domains(list(range(n)))
    counts, kept = {}, {}
    for i, d in enumerate(doms):
        counts[d] = counts.get(d, 0) + 1
    for i, d in enumerate(doms):
        k = md5_int31(f"tmix:{i}")
        if k * k * counts[d] < c * c:
            kept[d] = kept.get(d, 0) + 1
    rows = list(zip(got.column("domain").to_pylist(),
                    got.column("n_docs").to_pylist(),
                    got.column("n_kept").to_pylist()))
    assert rows == sorted((d, counts[d], kept.get(d, 0)) for d in counts)
    # downsampling really happens somewhere, and nothing exceeds its count
    assert any(kp < nd for _, nd, kp in rows)
    assert all(kp <= nd for _, nd, kp in rows)


def _docs(texts, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})) \
        .repartition(parallelism)


def test_bigram_table_counts(ray_session):
    t = bigram_table(_docs(["a b a b", "b a", ""], parallelism=3))
    rows = {(u, w): c for u, w, c in zip(t.column("u").to_pylist(),
                                         t.column("w").to_pylist(),
                                         t.column("cnt").to_pylist())}
    assert rows == {("a", "b"): 2, ("b", "a"): 2}


def test_kneser_ney_hand_worked(ray_session):
    # bigrams: (a,b):3 (b,a):2 (a,c):1 (c,a):1 -> c(a)=4, N1a=2, N1pp=4,
    # N1+(.b)=1, N1+(.c)=1; u0 = 'a' (c(a)=4 > c(b)=2 > c(c)=1)
    t = kneser_ney_topk(_docs(["a b a b a c a b"], parallelism=1), k=10)
    assert t.column("w").to_pylist() == ["b", "c"]
    n1pp = 4
    num_b = (4 * 3 - 3) * n1pp + 3 * 2 * 1   # = 36 + 6 = 42
    num_c = (4 * 1 - 3) * n1pp + 3 * 2 * 1   # = 4 + 6 = 10
    den = 4 * 4 * n1pp                       # = 64
    assert t.column("p_num").to_pylist() == [num_b, num_c]
    assert t.column("p_den").to_pylist() == [den, den]
    # scores are honest probabilities: sum over continuations <= 1
    assert num_b + num_c <= den


def test_kneser_ney_parallelism_invariant(ray_session):
    texts = [f"tok{i % 7} tok{(i * 3) % 7} tok{i % 5}" for i in range(40)]
    t1 = kneser_ney_topk(_docs(texts, parallelism=1), k=15)
    t9 = kneser_ney_topk(_docs(texts, parallelism=9), k=15)
    assert t1.equals(t9)


def test_random_walks(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.randwalk import _hop, random_walks

    n = 80
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n))})).repartition(5)
    t = random_walks(ds, n, walk_len=4, start_mod=20)
    rows = list(zip(t.column("start").to_pylist(),
                    t.column("step").to_pylist(),
                    t.column("node").to_pylist()))
    # starts 0, 20, 40, 60, each with steps 0..4
    assert [r[0] for r in rows] == sorted([s for s in (0, 20, 40, 60)
                                           for _ in range(5)])
    # walk reconstruction matches the hop rule
    for s in (0, 20, 40, 60):
        path = [node for st, step, node in rows if st == s]
        assert path[0] == s
        u = s
        for step in range(1, 5):
            u = _hop(u, step, n)
            assert path[step] == u
    # parallelism invariance
    t1 = random_walks(rd.from_arrow(pa.table(
        {"doc_id": list(range(n))})).repartition(1), n,
        walk_len=4, start_mod=20)
    assert t.equals(t1)
