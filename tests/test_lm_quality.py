"""LM quality scoring (ops/lm_quality.py): vectorized scorer vs a per-doc
brute force, backoff/OOV arms, filter semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
SCALE = 10 ** 6


@pytest.fixture(scope="module")
def model_path(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.ops.lm_quality import build_reference_model

    def ref_slice(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(ids % 10 == 0))

    path = str(tmp_path_factory.mktemp("lmq") / "model.parquet")
    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]) \
        .map_batches(ref_slice, batch_format="pyarrow")
    build_reference_model(ds, path)
    return path


def _brute_scores():
    from collections import Counter

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    uni: Counter = Counter()
    bi: Counter = Counter()
    tot = 0
    for i, x in zip(ids, texts):
        if i % 10:
            continue
        toks = [w for w in (x or "").split(" ") if w]
        uni.update(toks)
        tot += len(toks)
        bi.update(" ".join(p) for p in zip(toks, toks[1:]))
    out = {}
    for i, x in zip(ids, texts):
        toks = [w for w in (x or "").split(" ") if w]
        if len(toks) < 2:
            continue
        s = 0
        for w1, w2 in zip(toks, toks[1:]):
            b = bi.get(f"{w1} {w2}", 0)
            if b:
                s += (SCALE * b) // uni[w1]
            elif uni.get(w2, 0):
                s += (SCALE * 4 * uni[w2]) // (10 * tot)
        out[i] = (s, len(toks) - 1)
    return out


def test_scores_match_bruteforce(ray_session, model_path):
    import ray.data as rd

    from lucenenet_ray.ops.lm_quality import lm_score_dataset

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    got = lm_score_dataset(ds, model_path, concurrency=2).to_pandas()
    want = _brute_scores()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        s, n = want[r["doc_id"]]
        assert (r["lm_score"], r["n_trans"]) == (s, n)
        assert r["avg_w"] == s // n


def test_backoff_and_oov_arms(tmp_path, ray_session):
    """Doc with an in-model bigram, a backoff-only pair, and an OOV pair."""
    from lucenenet_ray.ops.lm_quality import LMDocScorer

    model = pa.table({
        "gram": ["a", "b", "a b"],
        "ord": [1, 1, 2],
        "count": [4, 6, 3],
    })
    p = os.path.join(tmp_path, "m.parquet")
    pq.write_table(model, p)
    sc = LMDocScorer(p)
    out = sc(pa.table({"doc_id": [7], "text": ["a b zz b qq"]}))
    # a->b in-model: (1e6*3)//4; b->zz OOV: 0; zz->b backoff:
    # (4e6*6)//(10*10); b->qq OOV: 0
    want = (SCALE * 3) // 4 + (SCALE * 4 * 6) // (10 * 10)
    assert out.column("lm_score").to_pylist() == [want]
    assert out.column("n_trans").to_pylist() == [4]


def test_short_docs_dropped_and_filter(tmp_path, ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.lm_quality import lm_quality_filter

    model = pa.table({"gram": ["a", "a a"], "ord": [1, 2], "count": [5, 4]})
    p = os.path.join(tmp_path, "m.parquet")
    pq.write_table(model, p)
    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a a a", "a", "zz qq"],
    }))
    kept = lm_quality_filter(ds, p, min_avg_w=1).to_pandas()
    # doc 1: two in-model transitions; doc 2: single token (dropped);
    # doc 3: OOV transitions -> avg_w 0 (filtered)
    assert kept["doc_id"].tolist() == [1]
    assert kept["avg_w"].tolist() == [(SCALE * 4) // 5]


def test_bucket_cutoffs_rank_select(ray_session):
    """Histogram rank-select == sorting the rows and picking ranks
    ceil(n/3), ceil(2n/3) (desc)."""
    import numpy as np
    import ray.data as rd

    from lucenenet_ray.ops.lm_quality import lm_bucket_cutoffs

    rng = [9, 9, 7, 7, 7, 5, 4, 4, 2, 1, 1]  # n=11, ties on purpose
    ds = rd.from_arrow(pa.table({"avg_w": pa.array(rng, type=pa.int64())}))
    c1, c2 = lm_bucket_cutoffs(ds)
    desc = sorted(rng, reverse=True)
    n = len(rng)
    assert c1 == desc[(n + 2) // 3 - 1]
    assert c2 == desc[(2 * n + 2) // 3 - 1]
    assert (c1, c2) == (7, 4)


def test_perplexity_buckets_match_bruteforce(ray_session, model_path):
    import ray.data as rd

    from lucenenet_ray.ops.lm_quality import lm_perplexity_buckets

    def ref_slice(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.filter(pa.array(ids % 10 == 0))

    ds_all = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                             columns=["doc_id", "text"])
    ds_ref = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                             columns=["doc_id", "text"]) \
        .map_batches(ref_slice, batch_format="pyarrow")
    got = lm_perplexity_buckets(ds_all, ds_ref, model_path).to_pandas()

    want = _brute_scores()
    ref_avg = sorted((s // n for i, (s, n) in want.items() if i % 10 == 0),
                     reverse=True)
    nr = len(ref_avg)
    c1 = ref_avg[(nr + 2) // 3 - 1]
    c2 = ref_avg[(2 * nr + 2) // 3 - 1]
    from collections import Counter
    cnt: Counter = Counter()
    tot: Counter = Counter()
    for s, n in want.values():
        a = s // n
        b = "head" if a >= c1 else ("middle" if a >= c2 else "tail")
        cnt[b] += 1
        tot[b] += a
    assert dict(zip(got["bucket"], got["n_docs"])) == dict(cnt)
    assert dict(zip(got["bucket"], got["sum_avg_w"])) == dict(tot)
