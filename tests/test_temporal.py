

def test_attribution_join_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.temporal_join import attribution_join

    base = np.datetime64("2024-05-01T00:00:00", "us").astype(np.int64)
    m = 60_000_000
    rows = [
        (1, base + 0 * m, "click"),
        (1, base + 10 * m, "purchase"),   # -> click at +0
        (1, base + 20 * m, "click"),
        (1, base + 25 * m, "purchase"),   # -> click at +20
        (1, base + 200 * m, "purchase"),  # click 180m ago: outside 1h
        (2, base + 5 * m, "purchase"),    # no click at all
        (3, base + 1 * m, "click"),
        (3, base + 1 * m, "purchase"),    # same-instant touch counts
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([u for u, _, _ in rows], type=pa.int64()),
        "ts": pa.array(np.asarray([t for _, t, _ in rows],
                                  dtype=np.int64)).cast(
            pa.timestamp("us")),
        "event_type": pa.array([e for _, _, e in rows]),
    })).repartition(3)
    out = attribution_join(ds, k=100)
    got = [(r["user_id"], r["lag_us"]) for r in out.to_pylist()]
    assert got == [(1, 10 * m), (1, 5 * m), (3, 0)]
