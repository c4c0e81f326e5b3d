"""DSIR hashed n-gram importance weights (ops/dsir.py): bucket counts and
scores vs per-doc brute force; log-weight form sanity."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
B = 512
SCALE = 10 ** 9


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B


def _grams(text: str) -> list[str]:
    toks = [w for w in (text or "").split(" ") if w]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _brute():
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    raw = np.zeros(B, dtype=np.int64)
    tgt = np.zeros(B, dtype=np.int64)
    feats = {}
    for i, x, lg in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist(),
                        t.column("lang").to_pylist()):
        bks = [_bucket(g) for g in _grams(x)]
        feats[i] = bks
        for b in bks:
            raw[b] += 1
            if lg == "en":
                tgt[b] += 1
    T, R = int(tgt.sum()), int(raw.sum())
    w = (SCALE * (tgt + 1)) // (T + B) - (SCALE * (raw + 1)) // (R + B)
    return raw, tgt, w, feats


@pytest.fixture(scope="module")
def built(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.dsir import build_dsir_weights, dsir_score_dataset

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    w = build_dsir_weights(ds, n_buckets=B, target_lang="en")
    scored = dsir_score_dataset(
        rd.read_parquet(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]),
        w, n_buckets=B).to_pandas()
    return w, scored


def test_weights_match_bruteforce(built):
    raw, tgt, w_brute, _ = _brute()
    w, _scored = built
    assert np.array_equal(w, w_brute)


def test_scores_match_bruteforce(built):
    _raw, _tgt, w, feats = _brute()
    _w, scored = built
    want = {i: (int(w[bks].sum()), len(bks))
            for i, bks in feats.items() if bks}
    assert len(scored) == len(want)
    for _, r in scored.iterrows():
        assert (r["dsir_score"], r["n_feats"]) == want[r["doc_id"]]


def test_log_weights_sign_tracks_ratio():
    from lucenenet_ray.ops.dsir import dsir_log_weights

    raw = np.array([10, 1, 5], dtype=np.int64)
    tgt = np.array([9, 0, 1], dtype=np.int64)
    lw = dsir_log_weights(raw, tgt)
    # bucket 0: target share (10/19) > raw share (11/19) -> positive
    assert lw[0] > 0 and lw[1] < 0 and lw[2] < 0


def test_empty_doc_emits_nothing(ray_session, tmp_path):
    from lucenenet_ray.ops.dsir import DsirScorer

    sc = DsirScorer(np.zeros(B, dtype=np.int64), B)
    out = sc(pa.table({"doc_id": [1, 2], "text": ["", "a b"]}))
    assert out.column("doc_id").to_pylist() == [2]
    assert out.column("n_feats").to_pylist() == [3]  # a, b, 'a b'
