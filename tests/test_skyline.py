"""Skyline query (ops/skyline.py) vs brute-force dominance check."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.skyline import _local_skyline, skyline_docs


def _brute(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for j, (x2, y2) in enumerate(points) if j != i)
        if not dominated:
            out.append(i)
    return out


def test_local_skyline_kernel():
    rng = np.random.RandomState(4)
    pts = list(zip(rng.randint(1, 20, 200).tolist(),
                   rng.randint(1, 20, 200).tolist()))
    ids = np.arange(200, dtype=np.int64)
    d, x, y = _local_skyline(ids,
                             np.asarray([p[0] for p in pts]),
                             np.asarray([p[1] for p in pts]))
    assert sorted(d.tolist()) == sorted(_brute(pts))


def test_skyline_distributive(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(9)
    n = 150
    texts = [" ".join(f"w{rng.randint(0, 40)}"
                      for _ in range(rng.randint(1, 30)))
             for _ in range(n)]
    tbl = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                    "text": texts})
    pts = []
    for x in texts:
        toks = [w for w in x.split(" ") if w]
        pts.append((len(toks), len(set(toks))))
    # brute dominance with (min x, max y)
    exp = sorted(_brute(pts))
    t1 = skyline_docs(rd.from_arrow(tbl).repartition(1))
    t7 = skyline_docs(rd.from_arrow(tbl).repartition(7))
    assert t1.equals(t7)  # parallelism-invariant
    assert t1.column("doc_id").to_pylist() == exp
