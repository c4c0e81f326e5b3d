"""Cohort retention + exact quantiles (ops/cohort.py)."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.cohort import (cohort_retention, value_quantiles,
                                      _day_idx)


def _events(rows, parallelism=3):
    import ray.data as rd

    uid, ts, et, val = zip(*rows)
    return rd.from_arrow(pa.table({
        "user_id": pa.array(uid, type=pa.int64()),
        "ts": pa.array(list(ts), type=pa.timestamp("us")),
        "event_type": pa.array(et, type=pa.string()),
        "value": pa.array(val, type=pa.float64()),
    })).repartition(parallelism)


def _ts(day, hour=0):
    return np.datetime64("2024-01-01", "us") + np.timedelta64(
        day * 24 + hour, "h")


def test_day_idx():
    arr = np.array([_ts(0, 5), _ts(3, 23)], dtype="datetime64[us]")
    assert _day_idx(arr).tolist() == [0, 3]


def test_cohort_cells(ray_session):
    rows = [
        (1, _ts(0), "view", 1.0), (1, _ts(0, 5), "view", 1.0),  # same cell
        (1, _ts(2), "view", 1.0),
        (2, _ts(0), "view", 1.0), (2, _ts(2), "view", 1.0),
        (3, _ts(1), "view", 1.0), (3, _ts(2), "view", 1.0),
    ]
    t = cohort_retention(_events(rows, 4))
    cells = {(c, o): n for c, o, n in zip(
        t.column("cohort_day").to_pylist(),
        t.column("day_offset").to_pylist(),
        t.column("n_users").to_pylist())}
    # users 1,2 cohort day0 (both active at offset 0 and 2); user 3 day1
    assert cells == {(0, 0): 2, (0, 2): 2, (1, 0): 1, (1, 1): 1}


def test_quantiles_rank_select(ray_session):
    vals = [float(v) for v in range(1, 101)]          # 1..100
    rows = [(i, _ts(0), "a", v) for i, v in enumerate(vals)]
    rows += [(0, _ts(0), "b", 7.0), (1, _ts(0), "b", 9.0)]
    t = value_quantiles(_events(rows, 5), qs=(50, 90, 99))
    got = {(e, q): v for e, q, v in zip(
        t.column("event_type").to_pylist(),
        t.column("q").to_pylist(),
        t.column("value").to_pylist())}
    # k = (n-1)*q//100 + 1 over n=100: p50 -> 50th, p90 -> 90th, p99 -> 100th
    assert got[("a", 50)] == 50.0
    assert got[("a", 90)] == 90.0
    assert got[("a", 99)] == 99.0        # k = (99*99)//100 + 1 = 99
    assert got[("b", 50)] == 7.0 and got[("b", 99)] == 7.0  # k=(1*99)//100+1=1


def test_quantiles_parallelism_invariant(ray_session):
    rows = [(i, _ts(0), "t", float((i * 37) % 11)) for i in range(200)]
    t1 = value_quantiles(_events(rows, 1))
    t9 = value_quantiles(_events(rows, 9))
    assert t1.equals(t9)
