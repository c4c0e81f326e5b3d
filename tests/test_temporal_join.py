"""Temporal joins (ops/temporal_join.py): as-of join + interval join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _asof(left_rows, right_rows):
    import ray.data as rd

    from lucenenet_ray.ops.temporal_join import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in left_rows], pa.int64()),
        "t": pa.array([r[1] for r in left_rows], pa.int64()),
        "lid": pa.array([r[2] for r in left_rows], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in right_rows], pa.int64()),
        "rt": pa.array([r[1] for r in right_rows], pa.int64()),
        "rid": pa.array([r[2] for r in right_rows], pa.int64()),
        "price": pa.array([r[3] for r in right_rows], pa.float64()),
    }))
    out = asof_join(left, right, key="k", left_on="t", right_on="rt",
                    tie="rid", right_cols=["rid", "price"])
    return {r["lid"]: (r["rid"], r["price"])
            for r in out.take_all()}


def test_asof_basic_latest_wins(ray_session):
    got = _asof(
        left_rows=[(1, 10, 100), (1, 25, 101), (1, 5, 102)],
        right_rows=[(1, 8, 7, 1.5), (1, 20, 8, 2.5), (1, 30, 9, 3.5)],
    )
    assert got[100] == (7, 1.5)      # t=10 -> rt=8
    assert got[101] == (8, 2.5)      # t=25 -> rt=20
    assert got[102] == (None, None)  # t=5 precedes all -> nulls


def test_asof_equal_ts_inclusive_and_tie_by_id(ray_session):
    got = _asof(
        left_rows=[(1, 10, 100)],
        right_rows=[(1, 10, 3, 1.0), (1, 10, 9, 2.0), (1, 10, 5, 3.0)],
    )
    # rt == t is a match (<=); equal rt ties break by greatest rid
    assert got[100] == (9, 2.0)


def test_asof_keys_isolated(ray_session):
    got = _asof(
        left_rows=[(1, 10, 100), (2, 10, 200)],
        right_rows=[(1, 4, 1, 1.0), (2, 6, 2, 2.0)],
    )
    assert got[100] == (1, 1.0)
    assert got[200] == (2, 2.0)


def test_asof_key_with_no_right_rows(ray_session):
    got = _asof(
        left_rows=[(3, 10, 300)],
        right_rows=[(1, 4, 1, 1.0)],
    )
    assert got[300] == (None, None)


def _interval(left_rows, win_rows, bucket):
    import ray.data as rd

    from lucenenet_ray.ops.temporal_join import interval_join_agg

    left = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in left_rows], pa.int64()),
        "t": pa.array([r[1] for r in left_rows], pa.int64()),
        "v": pa.array([r[2] for r in left_rows], pa.float64()),
    }))
    wins = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in win_rows], pa.int64()),
        "wid": pa.array([r[1] for r in win_rows], pa.int64()),
        "s": pa.array([r[2] for r in win_rows], pa.int64()),
        "e": pa.array([r[3] for r in win_rows], pa.int64()),
    }))
    out = interval_join_agg(left, wins, key="k", left_on="t", win_id="wid",
                            win_start="s", win_end="e", value="v",
                            bucket_len_us=bucket)
    return {r["wid"]: (int(r["n"]), float(r["total"]))
            for r in out.take_all()}


def test_interval_window_spanning_two_buckets(ray_session):
    # bucket=100; window [80, 180) spans buckets 0 and 1
    got = _interval(
        left_rows=[(1, 85, 1.0), (1, 150, 2.0), (1, 180, 4.0), (1, 79, 8.0)],
        win_rows=[(1, 1, 80, 180)],
        bucket=100,
    )
    assert got[1] == (2, 3.0)        # 85 and 150 in; 180 (end excl), 79 out


def test_interval_empty_window_reports_zero(ray_session):
    got = _interval(
        left_rows=[(1, 500, 1.0)],
        win_rows=[(1, 1, 0, 50), (2, 2, 480, 520)],
        bucket=100,
    )
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)        # key 2 has no rows at all


def test_interval_half_open_and_key_isolation(ray_session):
    got = _interval(
        left_rows=[(1, 10, 1.0), (1, 20, 2.0), (2, 15, 4.0)],
        win_rows=[(1, 1, 10, 20), (2, 2, 10, 20)],
        bucket=100,
    )
    assert got[1] == (1, 1.0)        # start incl, end excl; key-scoped
    assert got[2] == (1, 4.0)


def test_interval_rejects_window_longer_than_bucket(ray_session):
    with pytest.raises(Exception):
        _interval(left_rows=[(1, 10, 1.0)],
                  win_rows=[(1, 1, 0, 250)], bucket=100)
