"""Funnel + FreqMass ops vs DuckDB oracles on synthetic inputs."""

import duckdb
import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.funnel import funnel, user_funnel_depth


def test_user_funnel_depth_ordering():
    types = np.asarray(["click", "view", "purchase"])
    ts = np.asarray([10, 20, 30])
    # view at 20, click must be AFTER 20 -> the click at 10 doesn't count
    assert user_funnel_depth(types, ts, ("view", "click", "purchase")) == 1
    ts2 = np.asarray([25, 20, 30])
    assert user_funnel_depth(types, ts2, ("view", "click", "purchase")) == 3


def test_user_funnel_depth_no_first_step():
    types = np.asarray(["click", "purchase"])
    ts = np.asarray([1, 2])
    assert user_funnel_depth(types, ts, ("view", "click")) == 0


def test_funnel_matches_oracle(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.sql_oracle import funnel_sql

    rng = np.random.RandomState(7)
    n = 600
    events = pa.table({
        "user_id": pa.array(rng.randint(0, 40, n), type=pa.int64()),
        "ts": pa.array(rng.randint(0, 10_000, n), type=pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array(
            rng.choice(["view", "click", "purchase", "error"], n)),
    })
    got = funnel(rd.from_arrow(events))
    con = duckdb.connect()
    con.register("events", events)
    want = con.execute(funnel_sql()).fetch_arrow_table()
    assert got.equals(want)
    # monotone non-increasing step counts
    ns = got.column("n_users").to_pylist()
    assert ns == sorted(ns, reverse=True)
