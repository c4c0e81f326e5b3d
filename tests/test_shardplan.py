"""Shard planner, systematic resampling, and split-leakage audit
(ops/shardplan.py) vs plain-Python brute force."""

import hashlib

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.shardplan import (
    VAL_ID_OFFSET,
    shard_plan,
    split_leakage,
    systematic_resample,
)


def _ds(weights, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(weights)), type=pa.int64()),
        "n_chars": pa.array(weights, type=pa.int64()),
    })).repartition(parallelism)


def test_shard_plan_matches_bruteforce(ray_session):
    rng = np.random.RandomState(3)
    w = rng.randint(1, 500, size=200).tolist()
    B = 7
    total = sum(w)
    before = 0
    exp: dict[int, list] = {}
    for i, wi in enumerate(w):
        s = before * B // total
        exp.setdefault(s, []).append((i, wi))
        before += wi
    t = shard_plan(_ds(w, parallelism=5), n_shards=B, n_buckets=9)
    got = {r["shard_id"]: r for r in t.to_pylist()}
    assert set(got) == set(exp)
    for s, docs in exp.items():
        ids = [d for d, _ in docs]
        assert got[s]["doc_lo"] == min(ids)
        assert got[s]["doc_hi"] == max(ids)
        assert got[s]["n_docs"] == len(ids)
        assert got[s]["n_bytes"] == sum(wi for _, wi in docs)


def test_shard_plan_contiguous_and_complete(ray_session):
    w = [10] * 64
    t = shard_plan(_ds(w, parallelism=4), n_shards=8)
    rows = t.to_pylist()
    assert sum(r["n_docs"] for r in rows) == 64
    # contiguous, non-overlapping ranges
    for a, b in zip(rows, rows[1:]):
        assert a["doc_hi"] + 1 == b["doc_lo"]


def test_systematic_resample_matches_bruteforce(ray_session):
    rng = np.random.RandomState(11)
    w = rng.randint(0, 300, size=150).tolist()
    m = 40
    total = sum(w)
    # brute force: place grid points (2j+1)*W/(2m), count per interval
    cum = np.concatenate(([0], np.cumsum(w)))
    exp = {}
    for j in range(m):
        pos = (2 * j + 1) * total / (2 * m)
        i = int(np.searchsorted(cum, pos, side="right")) - 1
        exp[i] = exp.get(i, 0) + 1
    t = systematic_resample(_ds(w, parallelism=6), m=m, n_buckets=7)
    got = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("n_copies").to_pylist()))
    assert got == exp
    assert sum(got.values()) == m


def test_systematic_resample_total_is_m(ray_session):
    w = [5, 0, 17, 1, 1, 100, 3]
    for m in (1, 3, 10, 127):
        t = systematic_resample(_ds(w, parallelism=2), m=m)
        assert sum(t.column("n_copies").to_pylist()) == m
        # zero-weight doc can never be sampled
        assert 1 not in t.column("doc_id").to_pylist()


def test_split_leakage_matches_bruteforce(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.neardup import md5_int31

    n = 120
    texts = [f"doc body {i % 30}" for i in range(n)]  # corpus HAS dups
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": texts,
    })).repartition(5)
    pick_mod, copy_mod = 4, 2
    train_digs: dict[str, int] = {}
    for x in texts:
        d = hashlib.md5(x.encode()).hexdigest()
        train_digs[d] = train_digs.get(d, 0) + 1
    exp = []
    for i in range(n):
        if md5_int31(f"valpick-{i}") % pick_mod == 0:
            if md5_int31(f"leakcopy-{i}") % copy_mod == 0:
                vtext = texts[i]
            else:
                vtext = "fresh-" + hashlib.md5(
                    f"fresh-{i}".encode()).hexdigest()
            d = hashlib.md5(vtext.encode()).hexdigest()
            if d in train_digs:
                exp.append((i + VAL_ID_OFFSET, train_digs[d]))
    exp.sort()
    t = split_leakage(ds, pick_mod=pick_mod, copy_mod=copy_mod, k=1000)
    got = list(zip(t.column("doc_id").to_pylist(),
                   t.column("n_train_dups").to_pylist()))
    assert got == exp
    assert len(got) > 0
