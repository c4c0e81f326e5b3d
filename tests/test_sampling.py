"""Sampling ops (ops/sampling.py): equal-per-group mixing."""

def test_equalized_sample_quota_semantics(ray_session):
    """Head group down-sampled toward per_group; tail kept whole; the
    keep rule is content-keyed (re-run identical)."""
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.sampling import equalized_sample

    n_head, n_tail = 4000, 20
    t = pa.table({
        "doc_id": pa.array(range(n_head + n_tail), type=pa.int64()),
        "lang": pa.array(["en"] * n_head + ["sw"] * n_tail),
    })
    kept = equalized_sample(rd.from_arrow(t), per_group=50).to_pandas()
    by = kept.groupby("lang").size()
    assert by["sw"] == n_tail  # n <= per_group -> keep all
    assert 20 <= by["en"] <= 90  # ~binomial(4000, 50/4000)
    kept2 = equalized_sample(rd.from_arrow(t), per_group=50).to_pandas()
    assert sorted(kept2["doc_id"]) == sorted(kept["doc_id"])


def test_weighted_sample_matches_naive(ray_session):
    """A-ES partial-topk + driver merge == the naive whole-corpus ranking;
    zero/negative weights excluded; exactly k rows; ranks 1..k."""
    import hashlib
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.sampling import weighted_sample

    n = 500
    ids = list(range(n))
    weights = [(i * 7) % 11 - 1 for i in ids]  # includes -1 and 0
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "w": pa.array(weights, type=pa.int64())})
    out = weighted_sample(rd.from_arrow(t).repartition(7), k=40,
                          weight_col="w")
    assert out.num_rows == 40
    assert out.column("rank").to_pylist() == list(range(1, 41))

    # naive reference
    scored = []
    for i, w in zip(ids, weights):
        if w <= 0:
            continue
        m = int(hashlib.md5(f"wsamp:{i}".encode()).hexdigest()[:15], 16)
        lnu = math.log((np.float64(m) + 1.0) / 1152921504606846976.0)
        scored.append((lnu / w, i, w))
    scored.sort(key=lambda s: (-s[0], s[1]))
    want_ids = [s[1] for s in scored[:40]]
    want_w = [s[2] for s in scored[:40]]
    assert out.column("doc_id").to_pylist() == want_ids
    assert out.column("weight").to_pylist() == want_w


def test_weighted_sample_prefers_heavy(ray_session):
    """Statistical sanity: with weights 1 vs 9 the heavy stratum should
    dominate the sample (deterministic md5 draw, so this is stable)."""
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.sampling import weighted_sample

    n = 1000
    t = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "w": pa.array([9 if i % 2 else 1 for i in range(n)],
                      type=pa.int64()),
    })
    out = weighted_sample(rd.from_arrow(t), k=100, weight_col="w")
    heavy = sum(1 for w in out.column("weight").to_pylist() if w == 9)
    assert heavy >= 70
