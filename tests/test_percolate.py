"""MemoryIndex + percolation (ops/percolate.py): single-doc match/score
semantics vs hand math, and the batch percolator's set-algebra path vs the
one-doc-at-a-time MemoryIndex for every (doc, query) pair."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _queries():
    from lucenenet_ray.search.query import parse_query

    texts = [
        "spark AND window",
        '"batch merge"',
        "vector dup -spark",
        "sp*",
        "merge NOT window",
        '"spark data"~2',
    ]
    return [(f"q{i}", parse_query(t)) for i, t in enumerate(texts)]


def test_memory_index_term_and_phrase_match():
    from lucenenet_ray.ops.percolate import MemoryIndex
    from lucenenet_ray.search.query import parse_query

    mi = MemoryIndex("spark window merge spark")
    assert mi.matches(parse_query("spark AND merge"))
    assert mi.matches(parse_query('"window merge"'))
    assert not mi.matches(parse_query('"merge window"'))
    assert not mi.matches(parse_query("spark AND zebra"))
    assert mi.matches(parse_query("sp*"))
    assert not mi.matches(parse_query("-spark"))  # MUST_NOT-only: no match


def test_memory_index_stopword_and_empty():
    from lucenenet_ray.ops.percolate import MemoryIndex
    from lucenenet_ray.search.query import parse_query

    mi = MemoryIndex("the of and")  # all stopwords -> empty index
    assert mi.length == 0
    assert not mi.matches(parse_query("spark"))


def test_memory_index_score_hand_math():
    """N=1, df=1, avgdl=dl: score = idf*(k1+1)*tf/(tf+cache[nb])."""
    from lucenenet_ray.ops.percolate import MemoryIndex
    from lucenenet_ray.search.bm25 import avg_field_length, norm_cache
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.util.smallfloat import encode_norm

    text = "spark window merge spark data"
    mi = MemoryIndex(text)
    s = mi.search(parse_query("spark merge"))
    nb = int(encode_norm(np.asarray([5]))[0])
    cache = norm_cache(avg_field_length(5, 1))[nb]
    idf = np.float32(math.log(1 + 0.5 / 1.5))
    w = np.float32(np.float32(idf * np.float32(1.0)) * np.float32(2.2))
    exp = np.float32(0.0)
    for tf in (2.0, 1.0):  # spark, merge in clause order
        tff = np.float32(tf)
        exp = np.float32(exp + np.float32(
            np.float32(w * tff) / np.float32(tff + cache)))
    assert s == exp
    assert mi.search(parse_query("zebra")) == np.float32(0.0)


def test_percolator_matches_memory_index(ray_session):
    """Batch set-algebra path == one-at-a-time MemoryIndex, every pair."""
    import ray.data as rd

    from lucenenet_ray.ops.percolate import MemoryIndex, percolate

    plans = _queries()
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"]).slice(0, 200)
    got = percolate(
        rd.from_arrow(t), plans).to_pandas()
    got_pairs = set(zip(got["doc_id"], got["query_id"]))
    exp_pairs = set()
    for did, text in zip(t.column("doc_id").to_pylist(),
                         t.column("text").to_pylist()):
        mi = MemoryIndex(text)
        for qid, plan in plans:
            if mi.matches(plan):
                exp_pairs.add((did, qid))
    assert got_pairs == exp_pairs
    assert len(exp_pairs) > 0


def test_percolator_numeric_range(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.percolate import percolate
    from lucenenet_ray.search.query import NumericDocValuesRangeQuery

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"]).slice(0, 100)
    q = NumericDocValuesRangeQuery(field="n_chars", lower=100, upper=400,
                                   include_lower=True, include_upper=False)
    got = percolate(rd.from_arrow(t), [("r", q)],
                    numeric_cols=("n_chars",)).to_pandas()
    exp = {d for d, v in zip(t.column("doc_id").to_pylist(),
                             t.column("n_chars").to_pylist())
           if 100 <= v < 400}
    assert set(got["doc_id"]) == exp


def test_min_should_match_semantics():
    from lucenenet_ray.ops.percolate import MemoryIndex
    from lucenenet_ray.search.query import (BooleanClause, BooleanQuery,
                                            Occur, TermQuery)

    q = BooleanQuery(clauses=tuple(
        BooleanClause(Occur.SHOULD, TermQuery(term=t))
        for t in ("spark", "merge", "zebra")), min_should_match=2)
    assert MemoryIndex("spark merge other").matches(q)
    assert not MemoryIndex("spark other").matches(q)


def test_presearcher_required_terms():
    from lucenenet_ray.ops.percolate import required_any_terms
    from lucenenet_ray.search.query import (BooleanClause, BooleanQuery,
                                            MatchAllDocsQuery, Occur,
                                            TermQuery, parse_query)

    assert required_any_terms(parse_query("spark")) == {"spark"}
    assert required_any_terms(parse_query("spark AND window")) in (
        {"spark"}, {"window"})
    assert required_any_terms(parse_query("spark window")) == \
        {"spark", "window"}
    assert required_any_terms(parse_query('"batch merge"')) == \
        {"batch", "merge"}
    assert required_any_terms(parse_query("sp*")) is None
    # MUST MatchAll + optional SHOULD: shoulds are NOT required
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, MatchAllDocsQuery()),
        BooleanClause(Occur.SHOULD, TermQuery(term="spark"))))
    assert required_any_terms(q) is None


def test_presearcher_skips_absent_queries():
    """A batch containing none of a query's required terms must not
    evaluate it at all (the Monitor-style prefilter)."""
    import pyarrow as pa

    from lucenenet_ray.ops.percolate import Percolator
    from lucenenet_ray.search.query import parse_query

    plans = [("a", parse_query("zebra AND lion")),
             ("b", parse_query("spark"))]
    p = Percolator(plans)
    batch = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                      "text": pa.array(["spark window", "merge batch"])})
    out = p(batch)
    assert p.evaluated == 1  # only 'b' ran
    assert set(out.column("query_id").to_pylist()) == {"b"}
