"""Multi-field index (keyword StringField analog + field-qualified queries)
and QueryParser field/boost syntax. Reference: ``Index/FieldInfos.cs``,
``Demo/IndexFiles.cs:88-122`` (path keyword field),
``QueryParser/Classic/QueryParserBase.cs`` (field:, ^boost, ~slop)."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.search.query import (
    FIELD_SEP,
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    field_term,
    parse_query,
)


@pytest.fixture(scope="module")
def field_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.search.reader import IndexReader

    docs = [
        ("alpha beta gamma", "srcA", "intro to alpha"),
        ("beta beta delta", "srcA", "all about beta"),
        ("gamma epsilon", "srcB", "gamma notes"),
        ("alpha alpha alpha", "srcC", None),
        ("sourceless text srca", "srcA", "srca look alike"),
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array([d[0] for d in docs]),
        "source": pa.array([d[1] for d in docs]),
        "title": pa.array([d[2] for d in docs]),
    })
    path = str(tmp_path_factory.mktemp("fidx") / "idx")
    cfg = IndexConfig(
        index_path=path, id_min=0, id_max=len(docs) - 1, n_buckets=2,
        n_hparts=1,
        extra_fields=(("source", "source", False), ("title", "title", True)),
    )
    build_index(rd.from_arrow(t), cfg)
    return IndexReader(path)


def test_keyword_field_lookup(field_index):
    from lucenenet_ray.search.searcher import search

    td = search(field_index, TermQuery(term=field_term("source", "srcA")), k=10)
    assert sorted(td.docs.tolist()) == [0, 1, 4]
    # omit-norms scoring: all matches identical score = wv/(1+k1)
    assert len(set(td.scores.tolist())) == 1
    # keyword value is NOT analyzed: raw string term, no body-term bleed
    td2 = search(field_index, TermQuery(term=field_term("source", "srcB")), k=10)
    assert td2.docs.tolist() == [2]
    # body term "srca" (doc 4's text) does not match the field query
    td3 = search(field_index, TermQuery(term="srca"), k=10)
    assert td3.docs.tolist() == [4]


def test_analyzed_extra_field(field_index):
    from lucenenet_ray.search.searcher import search

    td = search(field_index, TermQuery(term=field_term("title", "beta")), k=10)
    assert td.docs.tolist() == [1]
    # phrase inside an analyzed field
    q = PhraseQuery(terms=((field_term("title", "gamma"), 0),
                           (field_term("title", "notes"), 1)))
    td = search(field_index, q, k=10)
    assert td.docs.tolist() == [2]


def test_body_field_unaffected(field_index):
    from lucenenet_ray.search.searcher import search

    # body stats/norms exclude extra-field postings: doc 3 has body len 3
    td = search(field_index, TermQuery(term="alpha"), k=10)
    assert set(td.docs.tolist()) == {0, 3}
    assert field_index.num_docs == 5


def test_prefix_no_cross_field_leak(field_index):
    # body prefix "s" must not expand into "source\x1f..." terms
    exp = field_index.expand_query(PrefixQuery(prefix="s"))
    assert all(FIELD_SEP not in t for t in exp)
    assert "sourceless" in exp
    # field-qualified prefix expands ONLY within its field
    exp2 = field_index.expand_query(
        PrefixQuery(prefix=field_term("source", "src")))
    assert sorted(exp2) == [field_term("source", v)
                            for v in ("srcA", "srcB", "srcC")]


def test_parser_field_boost_syntax():
    q = parse_query("source:srca")
    assert isinstance(q, TermQuery) and q.term == field_term("source", "srca")
    q = parse_query("alpha^2 beta")
    assert isinstance(q, BooleanQuery)
    assert q.clauses[0].query.boost == 2.0
    assert q.clauses[1].query.boost == 1.0
    q = parse_query('title:"gamma notes"~2^3')
    assert isinstance(q, PhraseQuery)
    assert q.slop == 2 and q.boost == 3.0
    assert q.terms[0][0] == field_term("title", "gamma")


def test_boost_scoring_bit_exact(field_index):
    """boost folds into weightValue BEFORE the score kernel: score(boost=2)
    equals score computed with weightValue doubled in float32 — and pruned
    path replays identically."""
    from lucenenet_ray.search.bm25 import idf as bm25_idf
    from lucenenet_ray.search.searcher import plan_query, search

    q = parse_query("alpha^2.5")
    td = search(field_index, q, k=10)
    plan = plan_query(field_index, q)
    w = plan.weights[("alpha", 2.5)]
    i = bm25_idf(w.df, field_index.num_docs)
    expect_wv = np.float32(np.float32(i * np.float32(2.5))
                           * np.float32(np.float32(1.2) + np.float32(1.0)))
    assert w.weight_value == expect_wv
    td1 = search(field_index, parse_query("alpha"), k=10)
    assert set(td.docs.tolist()) == set(td1.docs.tolist())
    assert all(s2 > s1 for s2, s1 in zip(td.scores, td1.scores))
