"""SortedSetSortField selectors (search/sortedset.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reader(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    return IndexReader(path)


def test_min_max_match_corpus(reader, corpus):
    from lucenenet_ray.search.sortedset import sorted_set_min_max

    _ids, _texts, tokens_of = corpus
    for b in reader.bucket_ids:
        doc_ids, terms, mn, mx = sorted_set_min_max(reader, b)
        for i, d in enumerate(doc_ids.tolist()):
            kept = tokens_of.get(d, [])
            if not kept:
                assert mn[i] == -1 and mx[i] == -1
            else:
                assert terms[mn[i]] == min(kept)
                assert terms[mx[i]] == max(kept)


def test_sorted_set_sort_order_and_reverse(reader):
    from lucenenet_ray.search.sortedset import sorted_set_sort

    t = sorted_set_sort(reader, k=reader.num_docs, selector="min")
    vals = t.column("min_term").to_pylist()
    docs = t.column("doc_id").to_pylist()
    assert vals == sorted(vals)
    for a, b in zip(range(len(vals) - 1), range(1, len(vals))):
        if vals[a] == vals[b]:
            assert docs[a] < docs[b]
    rev = sorted_set_sort(reader, k=5, selector="max", reverse=True)
    rvals = rev.column("max_term").to_pylist()
    assert rvals == sorted(rvals, reverse=True)
