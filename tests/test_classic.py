"""ClassicSimilarity (TFIDF) — the Similarity-override surface
(Search/Similarities/TFIDFSimilarity.cs / DefaultSimilarity.cs)."""

import math

import numpy as np
import pytest

from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    PhraseQuery,
    TermQuery,
)
from lucenenet_ray.search.reader import IndexReader
from lucenenet_ray.search.searcher import search
from lucenenet_ray.util.smallfloat import CLASSIC_NORM_TABLE, byte315_to_float


def test_classic_norm_table():
    assert CLASSIC_NORM_TABLE[0] == 0.0
    b = np.arange(1, 256, dtype=np.uint8)
    assert np.array_equal(CLASSIC_NORM_TABLE[1:], byte315_to_float(b))


def test_classic_single_term_scores(documents_index, corpus):
    """Brute-force float32 replay: score = ((float)sqrt(tf) · value) · dec,
    value = (idf·queryNorm)·idf with queryNorm = 1/sqrt(idf²) for one term."""
    path, _m = documents_index
    r = IndexReader(path)
    td = search(r, TermQuery(term="spark"), k=20, similarity="classic")
    assert len(td.docs) == 20

    docs, _texts, toks = corpus
    n = len(docs)
    df = sum(1 for d in docs if "spark" in toks[d])
    idf = np.float32(math.log(n / (df + 1.0)) + 1.0)
    qw = np.float32(idf * np.float32(1.0))
    sum_sq = np.float32(np.float32(0.0) + np.float32(qw * qw))
    qnorm = np.float32(1.0 / math.sqrt(float(sum_sq)))
    value = np.float32(np.float32(qw * qnorm) * idf)

    from lucenenet_ray.util.smallfloat import encode_norm

    got = {int(d): float(s) for d, s in zip(td.docs, td.scores)}
    for d in list(got)[:5]:
        tf = toks[d].count("spark")
        L = len(toks[d])
        nb = int(encode_norm(np.array([L]))[0])
        dec = CLASSIC_NORM_TABLE[nb]
        expect = np.float32(np.float32(np.float32(math.sqrt(tf)) * value) * dec)
        assert got[d] == float(expect)


def test_classic_coord(documents_index, corpus):
    """Docs matching 1 of 2 OR clauses score ×(1/2) coord."""
    path, _m = documents_index
    r = IndexReader(path)
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="quantumflux")),  # df=0
    ))
    td2 = search(r, q, k=20, similarity="classic")
    td1 = search(r, TermQuery(term="spark"), k=20, similarity="classic")
    # same doc set; the boolean applies coord=1/2 but also a different
    # queryNorm (sum includes only present terms) — here identical since the
    # absent term contributes no weight; so score2 = score1 * 0.5 (float32)
    assert td2.docs.tolist() == td1.docs.tolist()
    for s1, s2 in zip(td1.scores, td2.scores):
        assert float(np.float32(np.float32(s1) * np.float32(0.5))) == float(s2)


def test_classic_rejects_phrases(documents_index):
    path, _m = documents_index
    r = IndexReader(path)
    with pytest.raises(NotImplementedError):
        search(r, PhraseQuery(terms=(("batch", 0), ("merge", 1))), k=5,
               similarity="classic")


def test_classic_ranking_differs_from_bm25(documents_index):
    path, _m = documents_index
    r = IndexReader(path)
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="window")),
    ))
    tc = search(r, q, k=1000, similarity="classic")
    tb = search(r, q, k=1000)
    assert set(tc.docs.tolist()) == set(tb.docs.tolist())  # same matches
    assert tc.scores.tolist() != tb.scores.tolist()  # different formula


def test_analyzing_query_parser():
    """AnalyzingQueryParser: wildcard chunks run through the analyzer
    (TestAnalyzingQueryParser.cs shapes: folding applies inside
    wildcards/prefixes/fuzzies; multi-token chunks raise)."""
    import pytest

    from lucenenet_ray.search.query import (FuzzyQuery, PrefixQuery,
                                            WildcardQuery,
                                            analyzing_parse_query)

    class FoldingAnalyzer:
        def __call__(self, text):
            from lucenenet_ray.analysis.filters import ascii_fold
            toks = [ascii_fold(t.lower()) for t in text.split()]
            return toks, list(range(1, len(toks) + 1))

    a = FoldingAnalyzer()
    q = analyzing_parse_query("Ubersetzung Über*", analyzer=a)
    wc = [c.query for c in q.clauses
          if isinstance(c.query, (WildcardQuery, PrefixQuery))]
    assert len(wc) == 1
    pat = getattr(wc[0], "pattern", None) or getattr(wc[0], "prefix")
    assert pat.split("\x1f")[-1].startswith("uber")
    q = analyzing_parse_query("mötley~", analyzer=a)
    # a single-clause query collapses to the FuzzyQuery itself
    assert isinstance(q, FuzzyQuery)
    assert q.term.split("\x1f")[-1] == "motley"
    with pytest.raises(ValueError):
        class Splitting:
            def __call__(self, text):
                return ["a", "b"], [1, 2]
        analyzing_parse_query("foo*", analyzer=Splitting())


def test_multifield_query_parser():
    """MultiFieldQueryParser: clauses expand across fields with boosts
    (TestMultiFieldQueryParser.cs shapes)."""
    from lucenenet_ray.search.query import (BooleanQuery, TermQuery,
                                            multifield_parse_query)

    q = multifield_parse_query("spark", ["", "source"],
                               boosts={"source": 2.0})
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
    t0, t1 = q.clauses[0].query, q.clauses[1].query
    assert isinstance(t0, TermQuery) and t0.term == "spark"
    assert t1.term.startswith("source") and t1.boost == 2.0

    q = multifield_parse_query("spark AND window", ["", "source"])
    # each conjunct is itself an across-fields OR group
    assert all(isinstance(c.query, BooleanQuery) for c in q.clauses)
