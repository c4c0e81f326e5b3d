"""Skip-gram co-occurrence (ops/cooccur.py): model parity on a tiny
corpus, window semantics, empty-token and doc-boundary exclusion,
partition invariance."""

import collections

import pyarrow as pa

from lucenenet_ray.ops.cooccur import _batch_pairs, cooccur_topk


def _naive(texts, window):
    c = collections.Counter()
    for txt in texts:
        ts = txt.split(" ")
        for i, a in enumerate(ts):
            if a == "":
                continue
            for j in range(max(0, i - window), min(len(ts), i + window + 1)):
                if j == i or ts[j] == "":
                    continue
                c[(a, ts[j])] += 1
    return c


def test_batch_pairs_matches_naive():
    texts = ["a b c a b", "x  y x", "", "lone"]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    out = _batch_pairs(t, window=2)
    got = {(c, x): n for c, x, n in zip(out.column("center").to_pylist(),
                                        out.column("context").to_pylist(),
                                        out.column("cnt").to_pylist())}
    assert got == dict(_naive(texts, 2))


def test_no_cross_doc_pairs():
    t = pa.table({"text": pa.array(["a b", "c d"], type=pa.string())})
    out = _batch_pairs(t, window=2)
    pairs = set(zip(out.column("center").to_pylist(),
                    out.column("context").to_pylist()))
    assert pairs == {("a", "b"), ("b", "a"), ("c", "d"), ("d", "c")}


def test_topk_partition_invariant(ray_session):
    import ray.data as rd

    texts = [f"w{i % 5} w{(i + 1) % 5} w{i % 3} end" for i in range(200)]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    naive = _naive(texts, 2)
    want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for parts in (1, 6):
        out = cooccur_topk(rd.from_arrow(t).repartition(parts),
                           window=2, k=10)
        got = list(zip(zip(out.column("center").to_pylist(),
                           out.column("context").to_pylist()),
                       out.column("cnt").to_pylist()))
        assert got == want, f"parts={parts}"
