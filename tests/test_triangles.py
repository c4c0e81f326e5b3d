"""Distributed triangle counting (ops/triangles.py)."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.graphrank import _out_edges
from lucenenet_ray.ops.triangles import triangle_counts


def _ids_ds(n, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": list(range(n))})) \
             .repartition(parallelism)


def _brute(n):
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    edges = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(),
                                                    dst.tolist())}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y in edges:
        for z in adj[x] & adj[y]:
            if z > y:  # x < y < z: count each triangle once
                for v in (x, y, z):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def test_matches_bruteforce(ray_session):
    n = 80
    t = triangle_counts(_ids_ds(n, parallelism=5), n)
    got = dict(zip(t.column("node").to_pylist(),
                   t.column("n_triangles").to_pylist()))
    assert got == _brute(n)
    assert sum(got.values()) % 3 == 0  # each triangle counted at 3 nodes


def test_parallelism_invariant(ray_session):
    n = 50
    t1 = triangle_counts(_ids_ds(n, parallelism=1), n)
    t7 = triangle_counts(_ids_ds(n, parallelism=7), n)
    assert t1.equals(t7)


def test_kcore_matches_bruteforce(ray_session):
    from lucenenet_ray.ops.triangles import kcore_peel

    n, k, rounds = 70, 3, 6
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    edges = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(),
                                                    dst.tolist())}
    alive = set(range(n))
    deg = {}
    for _ in range(rounds):
        deg = {v: 0 for v in range(n)}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        alive = {v for v in alive if deg[v] >= k}
    want = sorted((v, deg[v]) for v in alive)
    t = kcore_peel(_ids_ds(n, parallelism=5), n, k=k, rounds=rounds)
    got = list(zip(t.column("node").to_pylist(),
                   t.column("deg").to_pylist()))
    assert got == want
    # every survivor's induced degree meets the bar
    assert all(d >= k for _v, d in got)


def test_kcore_parallelism_invariant(ray_session):
    from lucenenet_ray.ops.triangles import kcore_peel

    t1 = kcore_peel(_ids_ds(40, parallelism=1), 40, k=2, rounds=4)
    t7 = kcore_peel(_ids_ds(40, parallelism=7), 40, k=2, rounds=4)
    assert t1.equals(t7)
