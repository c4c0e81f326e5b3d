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


def test_rate_anomalies_integer_rule(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.cohort import rate_anomalies

    # 10 quiet hours of 5 events + one 100-event spike + one 0-event
    # hour (absent hours don't exist, so the dip arm needs a small hour)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = []
    for h in range(10):
        ts += [base + h * 3_600_000_000 + i for i in range(5)]
    ts += [base + 10 * 3_600_000_000 + i for i in range(100)]
    ts += [base + 11 * 3_600_000_000]
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(np.asarray(ts, dtype=np.int64)).cast(
            pa.timestamp("us")),
    })).repartition(4)
    out = rate_anomalies(ds)
    rows = out.to_pylist()
    # brute force check
    c = np.asarray([5] * 10 + [100, 1], dtype=object)
    H, T, SS = len(c), int(sum(c)), int(sum(x * x for x in c))
    exp = [(i, int(ci)) for i, ci in enumerate(c)
           if (ci * H - T) ** 2 > 9 * (H * SS - T * T)]
    assert [(r["n_events"]) for r in rows] == [n for _, n in exp]
    spike = [r for r in rows if r["n_events"] == 100]
    assert spike and spike[0]["is_high"] == 1


def test_daily_distinct_users_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.cohort import daily_distinct_users

    base = np.datetime64("2024-03-01T00:00:00", "us").astype(np.int64)
    day = 86_400_000_000
    rows = [(base + 1, 1), (base + 2, 1), (base + 3, 2),      # day0: {1,2}
            (base + day, 1), (base + day + 5, 3),             # day1: {1,3}
            (base + 2 * day, 9)]                              # day2: {9}
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(np.asarray([t for t, _ in rows],
                                  dtype=np.int64)).cast(
            pa.timestamp("us")),
        "user_id": pa.array([u for _, u in rows], type=pa.int64()),
    })).repartition(3)
    out = daily_distinct_users(ds)
    assert out.column("n_users").to_pylist() == [2, 2, 1]
