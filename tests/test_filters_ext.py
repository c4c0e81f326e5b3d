"""ChainedFilter / BooleanFilter algebra (search/filters.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reader(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    return IndexReader(path)


def _docs(reader, term):
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.filters import chained_filter

    return set(chained_filter(reader, [TermQuery(term=term)]).tolist())


def test_chain_ops(reader):
    from lucenenet_ray.search.filters import (AND, ANDNOT, OR, XOR,
                                              chained_filter)
    from lucenenet_ray.search.query import TermQuery

    a, b = _docs(reader, "spark"), _docs(reader, "window")
    f = [TermQuery(term="spark"), TermQuery(term="window")]
    assert set(chained_filter(reader, f, [OR, OR]).tolist()) == a | b
    assert set(chained_filter(reader, f, [OR, AND]).tolist()) == a & b
    assert set(chained_filter(reader, f, [OR, ANDNOT]).tolist()) == a - b
    assert set(chained_filter(reader, f, [OR, XOR]).tolist()) == a ^ b


def test_boolean_filter(reader):
    from lucenenet_ray.search.filters import boolean_filter
    from lucenenet_ray.search.query import Occur, TermQuery

    a, b, c = (_docs(reader, t) for t in ("spark", "window", "merge"))
    got = boolean_filter(reader, [
        (Occur.MUST, TermQuery(term="spark")),
        (Occur.MUST, TermQuery(term="window")),
        (Occur.MUST_NOT, TermQuery(term="merge")),
    ])
    assert set(got.tolist()) == (a & b) - c
    got = boolean_filter(reader, [
        (Occur.SHOULD, TermQuery(term="spark")),
        (Occur.SHOULD, TermQuery(term="merge")),
    ])
    assert set(got.tolist()) == a | c
