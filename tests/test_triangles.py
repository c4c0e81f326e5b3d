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
