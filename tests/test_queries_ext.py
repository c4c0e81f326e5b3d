"""BoostingQuery / CustomScoreQuery semantics (search/queries_ext.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reader(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    return IndexReader(path)


def test_boosting_demotes_context_matches(reader):
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.queries_ext import boosting_search
    from lucenenet_ray.search.searcher import search

    match, ctx = TermQuery(term="spark"), TermQuery(term="merge")
    plain = dict(search(reader, match, k=reader.num_docs).to_list())
    ctx_hits = {d for d, _ in search(reader, ctx,
                                     k=reader.num_docs).to_list()}
    rows = boosting_search(reader, match, ctx, 0.1, k=reader.num_docs)
    assert {d for d, _ in rows} == set(plain)  # context never excludes
    for d, s in rows:
        if d not in ctx_hits:
            assert float(s) == plain[d]  # coord 1.0 keeps the score
        else:
            assert float(s) < plain[d]  # demoted below the plain score


def test_boosting_float32_contract(reader):
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.queries_ext import boosting_search
    from lucenenet_ray.search.searcher import search

    match, ctx = TermQuery(term="spark"), TermQuery(term="merge")
    sm = dict(search(reader, match, k=reader.num_docs).to_list())
    sc = dict(search(reader, ctx, k=reader.num_docs).to_list())
    rows = dict(boosting_search(reader, match, ctx, 0.4,
                                k=reader.num_docs))
    d = next(d for d in rows if d in sc)
    exp = np.float32(np.float32(np.float32(sm[d]) + np.float32(sc[d]))
                     * np.float32(0.4))
    assert rows[d] == exp


def test_custom_score_multiplies_docvalue(reader):
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.queries_ext import custom_score_search
    from lucenenet_ray.search.searcher import search

    q = parse_query("spark window")
    sub = dict(search(reader, q, k=reader.num_docs).to_list())
    rows = custom_score_search(reader, q, "n_chars", k=5)
    dv = {}
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        ids = bucket.norms()[0]
        vals = bucket.docvalues("n_chars")
        dv.update(zip(ids.tolist(), vals.tolist()))
    for d, s in rows:
        assert s == np.float32(np.float32(sub[d]) * np.float32(dv[d]))
