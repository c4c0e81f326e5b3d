"""Set-overlap top-k (ops/setsearch.py) vs a naive model."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.setsearch import set_overlap_topk


def _mk(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


def _naive(texts, q, k, bbox=None):
    from lucenenet_ray.ops.spatial import synth_latlon_centi

    qs = {t for t in q if t}
    rows = []
    ids = np.arange(len(texts), dtype=np.int64)
    lat, lon = synth_latlon_centi(ids)
    for i, txt in enumerate(texts):
        if bbox is not None and not (bbox[0] <= lat[i] < bbox[1]
                                     and bbox[2] <= lon[i] < bbox[3]):
            continue
        rows.append((len(set(txt.split(" ")) & qs), i))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return rows[:k]


def test_matches_naive_and_partition_invariant(ray_session):
    import ray.data as rd

    texts = [f"w{i % 7} w{(i * 3) % 11} common tail{i % 4}"
             for i in range(300)]
    q = texts[0].split(" ")
    want = _naive(texts, q, 10)
    for parts in (1, 5):
        out = set_overlap_topk(rd.from_arrow(_mk(texts)).repartition(parts),
                               q, k=10)
        got = list(zip(out.column("overlap").to_pylist(),
                       out.column("doc_id").to_pylist()))
        assert got == want, f"parts={parts}"


def test_bbox_prefilter(ray_session):
    import ray.data as rd

    texts = [f"tok{i % 5} shared" for i in range(200)]
    q = ["shared", "tok1"]
    bbox = (-4500, 4500, -9000, 9000)
    want = _naive(texts, q, 8, bbox)
    out = set_overlap_topk(rd.from_arrow(_mk(texts)), q, k=8, bbox=bbox)
    got = list(zip(out.column("overlap").to_pylist(),
                   out.column("doc_id").to_pylist()))
    assert got == want
    # pruned: every returned doc is inside the box
    from lucenenet_ray.ops.spatial import synth_latlon_centi

    ids = np.asarray(out.column("doc_id").to_pylist(), dtype=np.int64)
    lat, lon = synth_latlon_centi(ids)
    assert ((lat >= bbox[0]) & (lat < bbox[1])
            & (lon >= bbox[2]) & (lon < bbox[3])).all()


def test_greedy_cover_matches_naive(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.setsearch import greedy_cover

    texts = [f"a{i % 4} b{i % 6} c{i % 9} common" for i in range(150)]
    q = list(set("a0 a1 a2 b0 b1 c0 c1 c2 common".split(" ")))
    out = greedy_cover(rd.from_arrow(_mk(texts)), q, rounds=3)

    # naive greedy
    uncovered = set(q)
    selected = set()
    want = []
    tot = 0
    for r in range(1, 4):
        best = None
        for i, txt in enumerate(texts):
            if i in selected:
                continue
            g = len(set(txt.split(" ")) & uncovered)
            if best is None or g > best[0] or (g == best[0] and i < best[1]):
                best = (g, i)
        uncovered -= set(texts[best[1]].split(" ")) & uncovered
        selected.add(best[1])
        tot += best[0]
        want.append((r, best[1], best[0], tot))
    got = list(zip(out.column("round").to_pylist(),
                   out.column("doc_id").to_pylist(),
                   out.column("gain").to_pylist(),
                   out.column("covered_total").to_pylist()))
    assert got == want


def test_containment_prefers_small_docs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.setsearch import CONTAIN_SCALE, containment_topk

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b",                      # fully contained, small
                 "a b c d e f g h",          # same overlap, diluted
                 "a a b b",                  # distinct = {a,b}: full
                 "x y z"],                   # zero overlap
    })).repartition(3)
    t = containment_topk(ds, ["a", "b"], k=4)
    rows = list(zip(t.column("doc_id").to_pylist(),
                    t.column("score").to_pylist()))
    full = CONTAIN_SCALE
    assert rows[0] == (0, full) and rows[1] == (2, full)  # ties: id asc
    assert rows[2] == (1, (2 * CONTAIN_SCALE) // 8)
    assert rows[3] == (3, 0)


def test_containment_index_prunes_and_matches(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.containment_idx import (
        build_containment_index, containment_topk_indexed)
    from lucenenet_ray.ops.setsearch import containment_topk

    # wide size spread -> many buckets; small docs fully contained
    texts = (["a b"] * 3
             + ["a b c d"] * 3
             + [" ".join(f"w{i}_{j}" for j in range(40)) + " a"
                for i in range(6)]
             + [" ".join(f"x{i}_{j}" for j in range(300))
                for i in range(4)])
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})).repartition(4)
    out = str(tmp_path / "cidx")
    build_containment_index(ds, out)
    got, read, pruned = containment_topk_indexed(out, ["a", "b"], k=5)
    want = containment_topk(ds, ["a", "b"], k=5)
    assert got.equals(want)
    # the giant-doc bucket (nd ~ 300 -> ub = 2*S//256) can never beat the
    # full-containment small docs -> it must have been pruned
    assert pruned, (read, pruned)
    assert max(pruned) >= 9  # the 256..511 size bucket
