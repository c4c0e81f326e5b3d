"""PageRank (ops/graphrank.py): partition invariance, naive-model parity,
and fixed-point arithmetic properties."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.graphrank import SCALE, _out_edges, pagerank, pagerank_topk


def _naive(n, iters):
    base = SCALE // n
    r = np.full(n, base, dtype=np.int64)
    src, dst, deg = _out_edges(np.arange(n, dtype=np.int64), n)
    for _ in range(iters):
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, r[src] // deg)
        r = (15 * base) // 100 + (85 * s) // 100
    return r


def test_matches_naive_and_partition_invariant(ray_session):
    import ray.data as rd

    n = 300
    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64())})
    want = _naive(n, 3)
    for parts in (1, 5):
        got = pagerank(rd.from_arrow(t).repartition(parts), n, n_iters=3)
        assert np.array_equal(got, want), f"parts={parts}"


def test_topk_order_and_tiebreak(ray_session):
    import ray.data as rd

    n = 200
    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64())})
    top = pagerank_topk(rd.from_arrow(t), n, n_iters=2, k=10)
    r = _naive(n, 2)
    order = np.lexsort((np.arange(n), -r))[:10]
    assert top.column("node").to_pylist() == order.tolist()
    assert top.column("pagerank").to_pylist() == r[order].tolist()
    assert top.column("rank_pos").to_pylist() == list(range(1, 11))


def test_no_self_loops_and_outdeg():
    src, dst, deg = _out_edges(np.arange(120, dtype=np.int64), 120)
    assert not np.any(src == dst)
    # outdeg(u) = 1 + u % 3
    counts = np.bincount(src, minlength=120)
    assert np.array_equal(counts, 1 + np.arange(120) % 3)
    assert np.array_equal(deg, counts[src])


def test_mass_bounded():
    """Damped integer iteration keeps total mass under SCALE (floor
    divisions only lose mass) and every node keeps the teleport floor."""
    n = 250
    r = _naive(n, 4)
    base = SCALE // n
    assert r.sum() <= SCALE
    assert (r >= (15 * base) // 100).all()
