"""Snapshot diff (CDC) + JSON props rollup."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.neardup import md5_int31
from lucenenet_ray.ops.snapshot_diff import (STATUSES, _side_rows,
                                             snapshot_diff_counts)


def _docs(texts, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})) \
        .repartition(parallelism)


def test_side_rows_membership_and_mutation():
    t = pa.table({"doc_id": list(range(40)), "text": ["x"] * 40})
    old = _side_rows(t, 0)
    new = _side_rows(t, 1)
    want_old = [d for d in range(40) if md5_int31(f"old:{d}") % 4 != 0]
    want_new = [d for d in range(40) if md5_int31(f"new:{d}") % 4 != 0]
    assert old.column("key").to_pylist() == want_old
    assert new.column("key").to_pylist() == want_new
    # changed docs differ in digest, others don't
    oh = dict(zip(old.column("key").to_pylist(),
                  old.column("h").to_pylist()))
    nh = dict(zip(new.column("key").to_pylist(),
                  new.column("h").to_pylist()))
    for d in set(oh) & set(nh):
        chg = md5_int31(f"chg:{d}") % 5 == 0
        assert (oh[d] != nh[d]) == chg


def test_diff_counts_match_bruteforce(ray_session):
    n = 120
    t = snapshot_diff_counts(_docs(["doc %d body" % i for i in range(n)], 5))
    got = dict(zip(t.column("status").to_pylist(),
                   t.column("n_docs").to_pylist()))
    want = {s: 0 for s in STATUSES}
    for d in range(n):
        in_old = md5_int31(f"old:{d}") % 4 != 0
        in_new = md5_int31(f"new:{d}") % 4 != 0
        chg = md5_int31(f"chg:{d}") % 5 == 0
        if in_old and in_new:
            want["changed" if chg else "unchanged"] += 1
        elif in_new:
            want["added"] += 1
        elif in_old:
            want["removed"] += 1
    assert got == want
    assert sum(got.values()) <= n and min(got.values()) >= 0
    assert t.column("status").to_pylist() == list(STATUSES)


def test_props_extract(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.cohort import props_extract_stats

    ds = rd.from_arrow(pa.table({
        "event_type": ["a", "a", "b", "a"],
        "value": [1.25, 2.0, 0.1, 3.0],
        "props": ['{"k": 5}', '{"k": 15}', '{"k": 5}', '{"k": 17}'],
    })).repartition(3)
    t = props_extract_stats(ds)
    rows = list(zip(t.column("event_type").to_pylist(),
                    t.column("k_bucket").to_pylist(),
                    t.column("n_events").to_pylist(),
                    t.column("value_centi_sum").to_pylist()))
    assert rows == [("a", 0, 1, 125), ("a", 1, 2, 500), ("b", 0, 1, 10)]
