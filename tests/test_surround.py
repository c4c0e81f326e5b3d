"""Surround + ComplexPhrase parser dialects (QueryParser/Surround,
QueryParser/ComplexPhrase analogs) → span trees + index-backed counts."""

import pytest

from lucenenet_ray.search.query import BooleanQuery, Occur, TermQuery
from lucenenet_ray.search.spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucenenet_ray.search.surround import (
    SpanTruncQuery,
    SurroundSyntaxError,
    parse_complex_phrase,
    parse_surround,
    rewrite_spans,
)


def test_prefix_distance_op_slop_and_order():
    q = parse_surround("4W(fast, key)")
    assert isinstance(q, SpanNearQuery) and q.slop == 3 and q.in_order
    q = parse_surround("2N(spark, window)")
    assert isinstance(q, SpanNearQuery) and q.slop == 1 and not q.in_order


def test_case_insensitive_and_infix():
    q = parse_surround("merge w batch")
    assert isinstance(q, SpanNearQuery) and q.slop == 0 and q.in_order
    assert q == parse_surround("W(merge, batch)")
    q = parse_surround("merge n batch")
    assert not q.in_order and q.slop == 0
    # n-ary infix chain folds into one near (grammar: Primary (W Primary)*)
    q = parse_surround("a w b w c")
    assert len(q.clauses) == 3


def test_truncation_placeholder_and_or_group():
    q = parse_surround("W(mer*, batch)")
    assert isinstance(q.clauses[0], SpanTruncQuery)
    assert q.clauses[0].pattern == "mer*"
    q = parse_surround("3W((spark OR window), merge)")
    assert isinstance(q.clauses[0], SpanOrQuery)
    assert {c.term for c in q.clauses[0].clauses} == {"spark", "window"}


def test_boolean_forms():
    q = parse_surround("spark AND window")
    assert isinstance(q, BooleanQuery)
    assert all(c.occur == Occur.MUST for c in q.clauses)
    q = parse_surround("spark OR window")
    # pure-term OR stays span-composable (SrndOrQuery is a DistanceSubQuery)
    assert isinstance(q, SpanOrQuery)
    q = parse_surround("OR(spark, window)")
    assert isinstance(q, SpanOrQuery)
    q = parse_surround("spark NOT window")
    assert isinstance(q, BooleanQuery)
    assert q.clauses[0].occur == Occur.MUST
    assert q.clauses[1].occur == Occur.MUST_NOT
    assert isinstance(q.clauses[1].query, TermQuery)


def test_rejects():
    with pytest.raises(SurroundSyntaxError):
        parse_surround("3W(spark AND window, merge)")  # boolean in distance
    with pytest.raises(SurroundSyntaxError):
        parse_surround("W(a, b")  # unbalanced
    with pytest.raises(SurroundSyntaxError):
        parse_surround("")


def test_complex_phrase_shapes():
    q = parse_complex_phrase('"(spark window) merge"~2')
    assert isinstance(q, SpanNearQuery) and q.slop == 2 and q.in_order
    assert isinstance(q.clauses[0], SpanOrQuery)
    assert isinstance(q.clauses[1], SpanTermQuery)
    q = parse_complex_phrase('"fast key"')
    assert q.slop == 0
    q = parse_complex_phrase('"mer* batch"')
    assert isinstance(q.clauses[0], SpanTruncQuery)
    with pytest.raises(SurroundSyntaxError):
        parse_complex_phrase("no quotes")


def test_trunc_rewrite_and_counts(documents_index, corpus):
    """'2W(mer*, batch)' == SpanOr(all mer? index terms) near batch: counts
    must equal the explicitly-expanded span query's counts."""
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.spans import span_counts

    path, _m = documents_index
    r = IndexReader(path)
    q = rewrite_spans(parse_surround("2W(mer*, batch)"), r)
    assert isinstance(q.clauses[0], SpanOrQuery)
    terms = sorted(c.term for c in q.clauses[0].clauses)
    assert terms and all(t.startswith("mer") for t in terms)
    got = span_counts(r, q)

    explicit = SpanNearQuery(
        clauses=(SpanOrQuery(clauses=tuple(
            SpanTermQuery(term=t) for t in terms)),
            SpanTermQuery(term="batch")),
        slop=1, in_order=True)
    assert got == span_counts(r, explicit)


def test_surround_equals_plain_span_near(documents_index, corpus):
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.spans import span_counts

    path, _m = documents_index
    r = IndexReader(path)
    got = span_counts(r, rewrite_spans(parse_surround("3w(merge, batch)"), r))
    want = span_counts(r, SpanNearQuery(
        clauses=(SpanTermQuery(term="merge"), SpanTermQuery(term="batch")),
        slop=2, in_order=True))
    assert got == want
