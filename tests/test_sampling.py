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
