

def test_session_trigrams_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.sessions import session_path_trigrams

    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    m = 60_000_000
    rows = [
        (1, base + 0 * m, "a"), (1, base + 1 * m, "b"),
        (1, base + 2 * m, "c"), (1, base + 3 * m, "a"),
        # gap > 30 min splits the session: no trigram across it
        (1, base + 60 * m, "a"), (1, base + 61 * m, "b"),
        (1, base + 62 * m, "c"),
        (2, base + 0 * m, "a"), (2, base + 1 * m, "b"),
        (2, base + 2 * m, "c"),
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([u for u, _, _ in rows], type=pa.int64()),
        "ts": pa.array(np.asarray([t for _, t, _ in rows],
                                  dtype=np.int64)).cast(
            pa.timestamp("us")),
        "event_type": pa.array([e for _, _, e in rows]),
    })).repartition(3)
    out = session_path_trigrams(ds, k=10)
    got = {r["trigram"]: r["n"] for r in out.to_pylist()}
    assert got == {"a>b>c": 3, "b>c>a": 1}
    assert out.column("rank").to_pylist() == [1, 2]
