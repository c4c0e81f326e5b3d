"""Span query algebra + search (Search/Spans module analog)."""

import numpy as np
import pytest

from lucenenet_ray.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    near_ordered,
    near_unordered,
    span_counts,
    span_first,
    span_not,
    span_or,
    span_search,
)


def T(*ps):
    return [(p, p + 1) for p in ps]


def test_near_ordered_minimal_pairs():
    # each emitted span: p2 = first t2 after p1, p1 = last t1 before that p2
    assert near_ordered([T(0, 5), T(7)], slop=10) == [(5, 8)]
    assert near_ordered([T(0), T(2, 4)], slop=10) == [(0, 3)]
    assert near_ordered([T(0, 1), T(3)], slop=10) == [(1, 4)]
    assert near_ordered([T(0, 5), T(2, 7)], slop=1) == [(0, 3), (5, 8)]
    assert near_ordered([T(0, 5), T(1, 6)], slop=0) == [(0, 2), (5, 7)]
    # slop filter: gap = p2 - p1 - 1
    assert near_ordered([T(0), T(4)], slop=2) == []
    assert near_ordered([T(0), T(3)], slop=2) == [(0, 4)]
    # three clauses, in order
    assert near_ordered([T(0), T(2), T(4)], slop=2) == [(0, 5)]
    assert near_ordered([T(0), T(4), T(2)], slop=4) == []


def test_near_unordered():
    # order-free window
    out = near_unordered([T(4), T(1)], slop=2)
    assert out == [(1, 5)]
    assert near_unordered([T(9), T(1)], slop=2) == []


def test_or_not_first():
    assert span_or([T(3, 1), T(2)]) == [(1, 2), (2, 3), (3, 4)]
    assert span_not(T(1, 5), T(5)) == [(1, 2)]
    assert span_first(T(1, 9), end=5) == [(1, 2)]


def test_span_search_matches_phrase_docs(documents_index, corpus):
    """Ordered near slop=0 with adjacent terms matches the exact-phrase doc
    set (SpanNearQuery([t1,t2],0,true) ~ PhraseQuery)."""
    from lucenenet_ray.search.query import PhraseQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    path, _m = documents_index
    r = IndexReader(path)
    sq = SpanNearQuery(clauses=(SpanTermQuery(term="batch"),
                                SpanTermQuery(term="merge")),
                       slop=0, in_order=True)
    td_s = span_search(r, sq, k=500)
    td_p = search(r, PhraseQuery(terms=(("batch", 0), ("merge", 1))), k=500)
    assert set(td_s.docs.tolist()) == set(td_p.docs.tolist())


def test_span_counts_brute_force(documents_index, corpus):
    from lucenenet_ray.analysis import analyze
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    r = IndexReader(path)
    slop = 2
    sq = SpanNearQuery(clauses=(SpanTermQuery(term="merge"),
                                SpanTermQuery(term="batch")),
                       slop=slop, in_order=True)
    got = dict(span_counts(r, sq))

    docs, texts, _toks = corpus
    want = {}
    for d, x in zip(docs, texts):
        terms, pos = analyze(x)
        p1s = [p for t, p in zip(terms, pos) if t == "merge"]
        p2s = [p for t, p in zip(terms, pos) if t == "batch"]
        n = 0
        for p2 in p2s:
            before = [p1 for p1 in p1s if p1 < p2]
            if not before:
                continue
            p1 = max(before)
            # p2 must also be the first t2 after p1
            if min(q for q in p2s if q > p1) != p2:
                continue
            if p2 - p1 - 1 <= slop:
                n += 1
        if n:
            want[d] = n
    assert got == want


def test_span_or_not_search(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    r = IndexReader(path)
    q = SpanNearQuery(
        clauses=(SpanOrQuery(clauses=(SpanTermQuery(term="merge"),
                                      SpanTermQuery(term="line"))),
                 SpanTermQuery(term="batch")),
        slop=3, in_order=True)
    td = span_search(r, q, k=50)
    assert len(td.docs) > 0
    q2 = SpanFirstQuery(match=SpanTermQuery(term="spark"), end=5)
    td2 = span_search(r, q2, k=50)
    # every match must have 'spark' within the first 5 positions
    from lucenenet_ray.analysis import analyze
    import os
    import pyarrow.parquet as pq

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    by_id = {r_["doc_id"]: r_["text"] for r_ in src.to_pylist()}
    for d in td2.docs.tolist():
        terms, pos = analyze(by_id[int(d)])
        assert any(t == "spark" and p + 1 <= 5 for t, p in zip(terms, pos))


def test_time_limiting_collector(documents_index):
    """TimeLimitingCollector analog: zero budget → partial result from the
    first bucket only, flagged timed_out (Search/TimeLimitingCollector.cs)."""
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    path, _m = documents_index
    r = IndexReader(path)
    q = parse_query("data")
    full = search(r, q, k=10_000)
    part = search(r, q, k=10_000, time_limit_ms=0.0)
    assert part.timed_out and part.total_hits_relation == "gte"
    assert 0 < part.total_hits < full.total_hits
    assert set(part.docs.tolist()) <= set(full.docs.tolist())
    # generous budget → identical to unlimited
    ok = search(r, q, k=10_000, time_limit_ms=60_000)
    assert not ok.timed_out
    assert ok.docs.tolist() == full.docs.tolist()


def test_ngram_phrase_rewrite(documents_index):
    """NGramPhraseQuery: the every-n-th-term rewrite matches exactly the
    same docs as the full n-gram phrase (NGramPhraseQuery.cs:30-70)."""
    from lucenenet_ray.analysis.filters import ngram_filter
    from lucenenet_ray.search.query import PhraseQuery, ngram_phrase_rewrite
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    # bigram phrase for the word "window" over 2-gram terms of chars
    grams = ngram_filter("window", 2, 2)
    full = PhraseQuery(terms=tuple((g, i) for i, g in enumerate(grams)))
    opt = ngram_phrase_rewrite(full, 2)
    assert len(opt.terms) < len(full.terms)
    assert [p for _t, p in opt.terms] == [0, 2, 4]
    # non-optimizable shapes pass through unchanged
    assert ngram_phrase_rewrite(full, 1) is full
    sloppy = PhraseQuery(terms=full.terms, slop=1)
    assert ngram_phrase_rewrite(sloppy, 2) is sloppy
    gap = PhraseQuery(terms=(("wi", 0), ("nd", 2), ("do", 3)))
    assert ngram_phrase_rewrite(gap, 2) is gap


def test_span_position_range_algebra():
    """SpanPositionRangeQuery semantics (SpanPositionRangeQuery.cs
    AcceptPosition: start >= lo AND end <= hi); SpanFirst == start=0."""
    from lucenenet_ray.search.spans import span_first, span_position_range

    spans = [(0, 1), (2, 4), (5, 6), (7, 10)]
    assert span_position_range(spans, 0, 10) == spans
    assert span_position_range(spans, 2, 6) == [(2, 4), (5, 6)]
    assert span_position_range(spans, 3, 6) == [(5, 6)]
    assert span_position_range(spans, 0, 6) == span_first(spans, 6)
    assert span_position_range(spans, 8, 9) == []


def test_span_position_range_eval(documents_index):
    """Composed over a SpanNear: only spans inside the window survive."""
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.spans import (
        SpanNearQuery,
        SpanPositionRangeQuery,
        SpanTermQuery,
        span_counts,
    )

    path, _m = documents_index
    reader = IndexReader(path)
    near = SpanNearQuery(clauses=(SpanTermQuery(term="merge"),
                                  SpanTermQuery(term="batch")), slop=2,
                         in_order=True)
    base = dict(span_counts(reader, near))
    windowed = dict(span_counts(
        reader, SpanPositionRangeQuery(match=near, start=0, end=10**6)))
    assert windowed == base
    none = dict(span_counts(
        reader, SpanPositionRangeQuery(match=near, start=10**5, end=10**6)))
    assert none == {}


def test_field_masking_span_cross_field(ray_session, tmp_path_factory):
    """FieldMaskingSpanQuery analog (Search/Spans/FieldMaskingSpanQuery.cs:
    lets spans from different fields join in one SpanNear when their
    position spaces are congruent). This engine's span trees carry the
    field IN the term (field_term prefix) and impose no same-field check,
    so cross-field near works directly — the mask is implicit."""
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.search.query import field_term
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.spans import (
        SpanNearQuery,
        SpanTermQuery,
        span_counts,
    )

    # teacher/student lists: congruent position spaces per doc (the
    # reference's own FieldMaskingSpanQuery example)
    t = pa.table({
        "doc_id": pa.array(range(3), type=pa.int64()),
        "text": pa.array(["x", "x", "x"]),
        "teachers": pa.array(["james smith", "sally jones", "mary brown"]),
        "students": pa.array(["susan kelly", "jake smith", "sally hart"]),
    })
    path = str(tmp_path_factory.mktemp("mask") / "idx")
    build_index(rd.from_arrow(t),
                IndexConfig(index_path=path, id_min=0, id_max=2, n_buckets=1,
                            n_hparts=1,
                            extra_fields=(("teachers", "teachers", True),
                                          ("students", "students", True))))
    r = IndexReader(path)
    # first name from `teachers`, surname from `students`: doc 1 has
    # teachers "sally jones" (sally @ 0) and students "jake smith"
    # (smith @ 1) — congruent position spaces, cross-field near matches
    q = SpanNearQuery(clauses=(
        SpanTermQuery(term=field_term("teachers", "sally")),
        SpanTermQuery(term=field_term("students", "smith"))),
        slop=0, in_order=True)
    assert dict(span_counts(r, q)) == {1: 1}
    # same-field control: james smith is a teachers-only phrase in doc 0
    q2 = SpanNearQuery(clauses=(
        SpanTermQuery(term=field_term("teachers", "james")),
        SpanTermQuery(term=field_term("teachers", "smith"))),
        slop=0, in_order=True)
    assert dict(span_counts(r, q2)) == {0: 1}


def test_field_masking_is_identity_on_eval():
    """GetSpans delegates untouched (FieldMaskingSpanQuery.cs:102-104)."""
    from lucenenet_ray.search.spans import SpanFieldMaskingQuery, _spans_for

    pos = {"x": [2, 5], "f\x1fk": [0]}
    get = lambda t: pos.get(t, [])
    inner = SpanTermQuery(term="x")
    masked = SpanFieldMaskingQuery(match=inner, field="other")
    assert _spans_for(masked, get) == _spans_for(inner, get)


def test_field_masking_composes_in_near():
    from lucenenet_ray.search.spans import (SpanFieldMaskingQuery,
                                            _required_terms, _spans_for,
                                            extract_terms)

    pos = {"body": [3], "f\x1fk": [0]}
    get = lambda t: pos.get(t, [])
    q = SpanNearQuery(clauses=(
        SpanFieldMaskingQuery(match=SpanTermQuery(term="f\x1fk"),
                              field="body"),
        SpanTermQuery(term="body")), slop=5, in_order=True)
    # keyword span (0,1) then body occurrence at 3: gap 2 <= 5
    assert _spans_for(q, get) == [(0, 4)]
    out = []
    extract_terms(q, out)
    assert out == ["f\x1fk", "body"]
    assert _required_terms(q) == [{"f\x1fk"}, {"body"}]


def test_terms_filter_union_and_dedup(documents_index, corpus):
    from lucenenet_ray.search.filters import terms_filter
    from lucenenet_ray.search.query import field_term
    from lucenenet_ray.search.reader import IndexReader

    import os

    import pyarrow.parquet as pq

    from tests.conftest import SF_DIR

    r = IndexReader(documents_index[0])
    docs, _texts, toks = corpus
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id", "source"])
    by_src = dict(zip(src.column("doc_id").to_pylist(),
                      src.column("source").to_pylist()))
    terms = [field_term("source", "src3"), "merge",
             field_term("source", "src3")]
    got = np.sort(terms_filter(r, terms)).tolist()
    want = sorted(d for d in docs
                  if by_src[d] == "src3" or "merge" in toks[d])
    assert got == want
    # unknown terms contribute nothing; empty list matches nothing
    assert terms_filter(r, ["zzz_nonexistent_term"]).size == 0
    assert terms_filter(r, []).size == 0
