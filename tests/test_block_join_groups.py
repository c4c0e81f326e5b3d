"""ToParentBlockJoinCollector analog (ops/joins.to_parent_block_join_groups):
TopGroups shape — parent ordering, per-group child top-k with tie-breaks,
group hit counts, and invariance to batch boundaries."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lucenenet_ray.ops.joins import to_parent_block_join_groups


def _children(n_parents=6, per=7, seed=3):
    rng = np.random.RandomState(seed)
    pk, cid, sc = [], [], []
    for p in range(n_parents):
        for c in range(per):
            pk.append(p)
            cid.append(c)
            sc.append(float(rng.randint(0, 5)))  # coarse → many ties
    return pa.table({"pk": pa.array(pk, type=pa.int64()),
                     "cid": pa.array(cid, type=pa.int64()),
                     "s": pa.array(sc, type=pa.float64())})


def _expect(t, n_groups, m):
    pk = t.column("pk").to_numpy()
    cid = t.column("cid").to_numpy()
    s = t.column("s").to_numpy()
    agg = {}
    for p, c, sc in zip(pk, cid, s):
        agg.setdefault(int(p), []).append((float(sc), int(c)))
    tops = sorted(((max(v)[0], -p) for p, v in agg.items()), reverse=True)
    rows = []
    for ms, negp in tops[:n_groups]:
        p = -negp
        kids = sorted(agg[p], key=lambda t: (-t[0], t[1]))[:m]
        for rank, (sc, c) in enumerate(kids, 1):
            rows.append((p, ms, len(agg[p]), rank, c, sc))
    return rows


@pytest.mark.parametrize("blocks", [1, 5])
def test_matches_reference_fold(ray_session, blocks):
    t = _children()
    ds = rd.from_arrow(t).repartition(blocks)
    out = to_parent_block_join_groups(ds, "pk", "cid", "s",
                                      score_mode="max", n_groups=4,
                                      docs_per_group=2)
    got = list(zip(out.column("pk").to_pylist(),
                   out.column("parent_score").to_pylist(),
                   out.column("group_hits").to_pylist(),
                   out.column("child_rank").to_pylist(),
                   out.column("cid").to_pylist(),
                   out.column("child_score").to_pylist()))
    assert got == _expect(t, 4, 2)


def test_group_smaller_than_docs_per_group(ray_session):
    t = pa.table({"pk": pa.array([1, 1, 2], type=pa.int64()),
                  "cid": pa.array([0, 1, 0], type=pa.int64()),
                  "s": pa.array([5.0, 4.0, 9.0], type=pa.float64())})
    out = to_parent_block_join_groups(rd.from_arrow(t), "pk", "cid", "s",
                                      n_groups=5, docs_per_group=10)
    # parent 2 first (score 9), one child; parent 1 next, two children
    assert out.column("pk").to_pylist() == [2, 1, 1]
    assert out.column("group_hits").to_pylist() == [1, 2, 2]
    assert out.column("child_rank").to_pylist() == [1, 1, 2]


def test_score_modes(ray_session):
    t = pa.table({"pk": pa.array([1, 1, 2], type=pa.int64()),
                  "cid": pa.array([0, 1, 0], type=pa.int64()),
                  "s": pa.array([5.0, 1.0, 4.0], type=pa.float64())})
    ds = rd.from_arrow(t)
    tot = to_parent_block_join_groups(ds, "pk", "cid", "s",
                                      score_mode="total", n_groups=1,
                                      docs_per_group=1)
    assert tot.column("pk").to_pylist() == [1]          # 6 > 4
    assert tot.column("parent_score").to_pylist() == [6.0]
    avg = to_parent_block_join_groups(ds, "pk", "cid", "s",
                                      score_mode="avg", n_groups=1,
                                      docs_per_group=1)
    assert avg.column("pk").to_pylist() == [2]          # 4 > 3
    with pytest.raises(ValueError):
        to_parent_block_join_groups(ds, "pk", "cid", "s", score_mode="nope")
