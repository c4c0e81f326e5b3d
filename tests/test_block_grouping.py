"""BlockGroupingCollector analog (search/block_grouping.py)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def setup(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _ = documents_index
    r = IndexReader(path)
    t = pq.read_table(SF_DIR + "/documents.parquet",
                      columns=["doc_id", "source"])
    src = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("source").to_pylist()))
    return r, (lambda docs: np.asarray([src[int(d)] for d in docs])), src


def _q():
    from lucenenet_ray.search.query import (BooleanClause, BooleanQuery,
                                            Occur, TermQuery)

    return BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="window"))))


def test_matches_naive_regroup_of_the_flat_ranking(setup):
    from lucenenet_ray.search.block_grouping import block_grouping_search
    from lucenenet_ray.search.searcher import search

    r, key_fn, src = setup
    res = block_grouping_search(r, _q(), key_fn, n_groups=4,
                                max_docs_per_group=3)
    td = search(r, _q(), k=r.num_docs)
    flat = [(int(d), float(s)) for d, s in zip(td.docs, td.scores)]
    # naive model: walk the flat ranking, first-seen group order
    seen, groups = {}, {}
    for d, s in flat:
        g = src[d]
        seen.setdefault(g, len(seen))
        groups.setdefault(g, []).append((d, s))
    ranked = sorted(seen, key=seen.get)
    assert res.total_hit_count == len(flat)
    assert res.total_group_count == len(seen)
    assert len(res.groups) == 4
    for i, g in enumerate(ranked[:4]):
        got = res.groups[i]
        assert got.group_count == len(groups[g])
        assert list(got.docs) == [d for d, _ in groups[g][:3]]
        assert list(got.scores) == [s for _, s in groups[g][:3]]
    assert res.total_grouped_hit_count == sum(
        len(groups[g]) for g in ranked[:4])


def test_fewer_groups_than_requested(setup):
    from lucenenet_ray.search.block_grouping import block_grouping_search

    r, key_fn, _ = setup
    res = block_grouping_search(r, _q(), key_fn, n_groups=1000,
                                max_docs_per_group=1)
    assert len(res.groups) == res.total_group_count
    # every group contributes exactly its count to the grand total
    assert res.total_grouped_hit_count == res.total_hit_count


def test_group_ranks_are_dense_and_ordered(setup):
    from lucenenet_ray.search.block_grouping import block_grouping_search

    r, key_fn, _ = setup
    res = block_grouping_search(r, _q(), key_fn, n_groups=5)
    assert [g.group_rank for g in res.groups] == list(
        range(1, len(res.groups) + 1))
    # group order == best-doc score order (desc, doc asc): the first
    # group's best hit outranks every later group's best hit
    bests = [(-g.scores[0], g.docs[0]) for g in res.groups]
    assert bests == sorted(bests)
