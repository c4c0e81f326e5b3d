"""Best-fit-decreasing sequence packing (ops/packing.py pack_best_fit)."""

def test_best_fit_matches_brute(ray_session):
    """pack_best_fit vs an in-process best-fit-decreasing model."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.packing import pack_best_fit

    texts = ["w " * n for n in (60, 60, 60, 50, 40, 30, 10, 200, 5, 128)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array([s.strip() for s in texts], type=pa.string()),
    })
    out = {r["doc_id"]: r for r in
           pack_best_fit(rd.from_arrow(t), seq_len=128,
                         shard_span=1000).take_all()}

    # brute model on the op's own token counts
    eff = {d: min(out[d]["n_tokens"], 128) for d in out}
    order = sorted(eff, key=lambda d: (-eff[d], d))
    bins, assign = [], {}
    for d in order:
        x = eff[d]
        best_i, best_load = -1, -1
        for i, b in enumerate(bins):
            if b + x <= 128 and b > best_load:
                best_i, best_load = i, b
        if best_i < 0:
            bins.append(x)
            assign[d] = len(bins) - 1
        else:
            bins[best_i] += x
            assign[d] = best_i
    for d in out:
        assert out[d]["bin_id"] == assign[d], d
        assert out[d]["eff_tokens"] == eff[d]
    # every bin within capacity
    loads = {}
    for d in out:
        loads[out[d]["bin_id"]] = loads.get(out[d]["bin_id"], 0) + eff[d]
    assert all(v <= 128 for v in loads.values())


def test_best_fit_shard_locality(ray_session):
    """Bins never span shards; global_bin encodes (shard, bin_id)."""
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.packing import pack_best_fit

    t = pa.table({
        "doc_id": pa.array(range(40), type=pa.int64()),
        "text": pa.array(["tok " * 30] * 40, type=pa.string()),
    })
    rows = pack_best_fit(rd.from_arrow(t), seq_len=128,
                         shard_span=16).take_all()
    for r in rows:
        assert r["shard"] == r["doc_id"] // 16
        assert r["global_bin"] == r["shard"] * (1 << 20) + r["bin_id"]
