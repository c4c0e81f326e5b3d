"""Label propagation + multi-source BFS (ops/propagation.py) vs
plain-Python brute force."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.graphrank import _out_edges
from lucenenet_ray.ops.propagation import bfs_distances, label_propagation


def _ids_ds(n, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": list(range(n))})) \
             .repartition(parallelism)


def _adj(n):
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    edges = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(),
                                                    dst.tolist())}
    adj: dict[int, set] = {u: set() for u in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


def _brute_lpa(n, rounds, seed_mod, n_labels):
    adj = _adj(n)
    lab = {u: (u % n_labels if u % seed_mod == 0 else -1)
           for u in range(n)}
    for _ in range(rounds):
        new = {}
        for u in range(n):
            if u % seed_mod == 0:
                new[u] = u % n_labels
                continue
            votes: dict[int, int] = {}
            for v in adj[u]:
                if lab[v] >= 0:
                    votes[lab[v]] = votes.get(lab[v], 0) + 1
            if votes:
                best = sorted(votes.items(),
                              key=lambda t: (-t[1], t[0]))[0][0]
                new[u] = best
            else:
                new[u] = lab[u]
        lab = new
    return {u: l for u, l in lab.items() if l >= 0}


def test_lpa_matches_bruteforce(ray_session):
    n, rounds, seed_mod, n_labels = 90, 3, 10, 3
    t = label_propagation(_ids_ds(n, parallelism=5), n, n_rounds=rounds,
                          seed_mod=seed_mod, n_labels=n_labels)
    got = dict(zip(t.column("node").to_pylist(),
                   t.column("label").to_pylist()))
    assert got == _brute_lpa(n, rounds, seed_mod, n_labels)
    # seeds keep their clamped labels
    for u in range(0, n, seed_mod):
        assert got[u] == u % n_labels


def test_lpa_parallelism_invariant(ray_session):
    n = 60
    t1 = label_propagation(_ids_ds(n, parallelism=1), n, n_rounds=2)
    t7 = label_propagation(_ids_ds(n, parallelism=7), n, n_rounds=2)
    assert t1.equals(t7)


def _brute_bfs(n, seeds, rounds):
    adj = _adj(n)
    rows = []
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for r in range(1, rounds + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = r
                        nxt.append(v)
            frontier = nxt
        hist: dict[int, int] = {}
        for d in dist.values():
            hist[d] = hist.get(d, 0) + 1
        rows += [(s, d, c) for d, c in sorted(hist.items())]
    rows.sort()
    return rows


def test_bfs_matches_bruteforce(ray_session):
    n, seeds, rounds = 80, (0, 7, 13), 4
    t = bfs_distances(_ids_ds(n, parallelism=5), n, seeds=seeds,
                      max_rounds=rounds)
    got = [(r["seed"], r["dist"], r["n_nodes"]) for r in t.to_pylist()]
    assert got == _brute_bfs(n, seeds, rounds)


def test_bfs_parallelism_invariant(ray_session):
    n = 50
    t1 = bfs_distances(_ids_ds(n, parallelism=1), n, max_rounds=3)
    t6 = bfs_distances(_ids_ds(n, parallelism=6), n, max_rounds=3)
    assert t1.equals(t6)
