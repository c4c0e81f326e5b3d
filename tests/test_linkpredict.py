"""Neighborhood function + resource-allocation link prediction
(ops/linkpredict.py) vs plain-Python brute force."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.graphrank import _out_edges
from lucenenet_ray.ops.linkpredict import (
    SCALE,
    neighborhood_sizes,
    resource_allocation_topk,
)


def _ids_ds(n, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": list(range(n))})) \
             .repartition(parallelism)


def _adj(n):
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    edges = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(),
                                                    dst.tolist())}
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def test_neighborhood_matches_bruteforce(ray_session):
    n = 80
    edges, adj = _adj(n)
    t = neighborhood_sizes(_ids_ds(n, parallelism=5), n)
    got = {r["node"]: (r["n1"], r["n2"])
           for r in t.to_pylist()}
    for u, nb in adj.items():
        ball2 = set(nb)
        for z in nb:
            ball2 |= adj[z]
        ball2.discard(u)
        assert got[u] == (len(nb), len(ball2)), u
    assert set(got) == set(adj)


def test_neighborhood_parallelism_invariant(ray_session):
    n = 50
    t1 = neighborhood_sizes(_ids_ds(n, parallelism=1), n)
    t7 = neighborhood_sizes(_ids_ds(n, parallelism=7), n)
    assert t1.equals(t7)


def _ra_brute(n, k):
    edges, adj = _adj(n)
    scores: dict[tuple, int] = {}
    for z, nb in adj.items():
        wt = SCALE // len(nb)
        snb = sorted(nb)
        for i in range(len(snb)):
            for j in range(i + 1, len(snb)):
                p = (snb[i], snb[j])
                scores[p] = scores.get(p, 0) + wt
    cand = [(s, a, b) for (a, b), s in scores.items()
            if (a, b) not in edges]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    return [(a, b, s) for s, a, b in cand[:k]]


def test_ra_matches_bruteforce(ray_session):
    n, k = 80, 15
    t = resource_allocation_topk(_ids_ds(n, parallelism=5), n, k=k)
    got = [(r["a"], r["b"], r["score"]) for r in t.to_pylist()]
    assert got == _ra_brute(n, k)
    assert t.column("rank").to_pylist() == list(range(1, len(got) + 1))


def test_ra_excludes_existing_edges(ray_session):
    n = 60
    edges, _ = _adj(n)
    t = resource_allocation_topk(_ids_ds(n, parallelism=4), n, k=50)
    pairs = {(r["a"], r["b"]) for r in t.to_pylist()}
    assert not (pairs & edges)


def test_ra_parallelism_invariant(ray_session):
    n = 50
    t1 = resource_allocation_topk(_ids_ds(n, parallelism=1), n, k=10)
    t7 = resource_allocation_topk(_ids_ds(n, parallelism=7), n, k=10)
    assert t1.equals(t7)


def test_trustrank_matches_bruteforce(ray_session):
    from lucenenet_ray.ops.graphrank import SCALE, trustrank

    n, seed_mod, iters = 90, 10, 3
    src, dst, deg = _out_edges(np.arange(n, dtype=np.int64), n)
    seeds = [u for u in range(n) if u % seed_mod == 0]
    base = SCALE // len(seeds)
    r = {u: (base if u % seed_mod == 0 else 0) for u in range(n)}
    for _ in range(iters):
        new = {u: ((15 * base) // 100 if u % seed_mod == 0 else 0)
               for u in range(n)}
        incoming: dict[int, int] = {}
        for s, d, dg in zip(src.tolist(), dst.tolist(), deg.tolist()):
            incoming[d] = incoming.get(d, 0) + r[s] // dg
        for d, s in incoming.items():
            new[d] += (85 * s) // 100
        r = new
    got = trustrank(_ids_ds(n, parallelism=5), n, n_iters=iters,
                    seed_mod=seed_mod)
    assert got.tolist() == [r[u] for u in range(n)]


def test_anchor_terms_matches_bruteforce(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.linkpredict import anchor_terms_topk

    n, k = 60, 12
    texts = [f"w{u % 7} x{u % 3} extra tail" for u in range(n)]
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    counts: dict[tuple, int] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        for w in texts[u].split(" ")[:2]:
            counts[(v, w)] = counts.get((v, w), 0) + 1
    exp = sorted(((c, v, w) for (v, w), c in counts.items()),
                 key=lambda t: (-t[0], t[1], t[2]))[:k]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n)),
                                 "text": texts})).repartition(4)
    t = anchor_terms_topk(ds, n_nodes=n, k=k)
    got = [(r["cnt"], r["node"], r["term"]) for r in t.to_pylist()]
    assert got == exp


def test_degree_dist_matches_bruteforce(ray_session):
    from lucenenet_ray.ops.linkpredict import degree_distribution

    n = 70
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    ind = {u: 0 for u in range(n)}
    for d in dst.tolist():
        ind[d] += 1
    ih: dict[int, int] = {}
    for d in ind.values():
        ih[d] = ih.get(d, 0) + 1
    oh: dict[int, int] = {}
    for u in range(n):
        dg = 1 + (u % 3)
        oh[dg] = oh.get(dg, 0) + 1
    exp = ([("in", d, c) for d, c in sorted(ih.items())]
           + [("out", d, c) for d, c in sorted(oh.items())])
    t = degree_distribution(_ids_ds(n, parallelism=4), n)
    got = [(r["kind"], r["deg"], r["n_nodes"]) for r in t.to_pylist()]
    assert got == exp
    assert sum(c for k_, d, c in got if k_ == "in") == n


def test_clustering_coeff_bruteforce(ray_session):
    from lucenenet_ray.ops.linkpredict import clustering_coefficient

    n = 80
    edges, adj = _adj(n)
    tri = 0
    for x, y in edges:
        tri += len([z for z in (adj[x] & adj[y]) if z > y])
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    t = clustering_coefficient(_ids_ds(n, parallelism=5), n)
    r = t.to_pylist()[0]
    assert r["n_triangles"] == tri
    assert r["n_wedges"] == wedges
    assert r["global_cc_fp"] == 3 * tri * 10**9 // wedges


def test_assortativity_stats_bruteforce(ray_session):
    from lucenenet_ray.ops.linkpredict import assortativity_stats

    n = 70
    edges, adj = _adj(n)
    deg = {u: len(nb) for u, nb in adj.items()}
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    t = assortativity_stats(_ids_ds(n, parallelism=4), n)
    r = t.to_pylist()[0]
    assert r["m"] == len(xs)
    assert r["sum_x"] == sum(xs)
    assert r["sum_xy"] == sum(x * y for x, y in zip(xs, ys))
    assert r["sum_x2"] == sum(x * x for x in xs)
