"""DuplicateFilter (Sandbox/Queries/DuplicateFilter.cs analog) +
DocIdSetQuery filter clause."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def reader(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _ = documents_index
    return IndexReader(path)


def _source_of():
    t = pq.read_table(SF_DIR + "/documents.parquet",
                      columns=["doc_id", "source"])
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("source").to_pylist()))


def test_keep_last_full_validation(reader):
    from lucenenet_ray.search.duplicates import duplicate_filter

    kept = duplicate_filter(reader, "source", keep_mode="last")
    src = _source_of()
    expect = {}
    for d, s in src.items():
        if s not in expect or d > expect[s]:
            expect[s] = d
    assert kept.tolist() == sorted(expect.values())


def test_keep_first_full_validation(reader):
    from lucenenet_ray.search.duplicates import duplicate_filter

    kept = duplicate_filter(reader, "source", keep_mode="first")
    src = _source_of()
    expect = {}
    for d, s in src.items():
        if s not in expect or d < expect[s]:
            expect[s] = d
    assert kept.tolist() == sorted(expect.values())


def test_fast_invalidation_keeps_fieldless_docs(reader):
    """PM_FAST_INVALIDATION = all docs minus non-kept duplicates; with every
    doc carrying `source` it equals FULL_VALIDATION here, and the set
    algebra (all − losers) is checked explicitly."""
    from lucenenet_ray.search.duplicates import duplicate_filter

    full = duplicate_filter(reader, "source", process_mode="full")
    fast = duplicate_filter(reader, "source", process_mode="fast")
    assert np.array_equal(full, fast)  # every doc has the field
    assert fast.size == len(set(_source_of().values()))


def test_docidset_query_filters_and_keeps_scores(reader):
    """FilteredQuery contract: restricting by DocIdSetQuery(boost=0) keeps
    each surviving doc's score bit-identical to the unfiltered query."""
    from lucenenet_ray.search.duplicates import duplicate_filter
    from lucenenet_ray.search.query import (BooleanClause, BooleanQuery,
                                            DocIdSetQuery, Occur, TermQuery)
    from lucenenet_ray.search.searcher import search

    kept = duplicate_filter(reader, "source", keep_mode="last")
    inner = BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="window")),
    ))
    unfiltered = search(reader, inner, k=10_000)
    base = dict(zip(unfiltered.docs.tolist(), unfiltered.scores.tolist()))
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, inner),
        BooleanClause(Occur.MUST, DocIdSetQuery(
            boost=0.0, doc_ids=tuple(int(d) for d in kept))),
    ))
    td = search(reader, q, k=10_000)
    kept_set = set(kept.tolist())
    assert td.docs.size, "filtered query matched nothing"
    for doc, score in zip(td.docs.tolist(), td.scores.tolist()):
        assert doc in kept_set
        assert score == base[doc]  # float32 bit identity (+0.0f clause)
    # every kept doc that matched the inner query survives the filter
    assert set(td.docs.tolist()) == {d for d in base if d in kept_set}
