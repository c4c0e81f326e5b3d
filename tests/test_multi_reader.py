"""MultiReader analog (Index/MultiReader.cs / BaseCompositeReader.cs):
two shard indexes with disjoint doc-id ranges searched as one composite
must be BIT-IDENTICAL (docs, scores, total hits) to one physically
merged index over the same docs — global term/collection stats federate
(IndexSearcher.cs:982-1007 over MultiFields)."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)

TEXTS = [
    "alpha beta gamma delta",
    "beta beta delta",
    "gamma epsilon alpha",
    "alpha alpha alpha beta",
    "delta epsilon beta gamma",
    "epsilon gamma gamma",
    "beta gamma delta delta",
    "alpha epsilon",
]
STARS = [10, 3, 7, 1, 9, 5, 2, 8]


def _table(lo: int, hi: int) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(lo, hi), type=pa.int64()),
        "text": pa.array(TEXTS[lo:hi]),
        "stars": pa.array(STARS[lo:hi], type=pa.int64()),
    })


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.index.docvalues import build_docvalues
    from lucenenet_ray.search.reader import IndexReader

    root = tmp_path_factory.mktemp("multi")
    n = len(TEXTS)
    paths = {}
    for name, lo, hi, nb in (("combined", 0, n, 3),
                             ("shard_a", 0, 5, 2),
                             ("shard_b", 5, n, 2)):
        p = str(root / name)
        cfg = IndexConfig(index_path=p, id_min=lo, id_max=hi - 1,
                          n_buckets=nb, n_hparts=1)
        build_index(rd.from_arrow(_table(lo, hi)), cfg)
        build_docvalues(
            rd.from_arrow(_table(lo, hi).select(["doc_id", "stars"])),
            cfg, ["stars"])
        paths[name] = p
    return (IndexReader(paths["combined"]),
            paths["shard_a"], paths["shard_b"])


def _multi(a, b):
    from lucenenet_ray.search.multi_reader import MultiIndexReader
    from lucenenet_ray.search.reader import IndexReader

    return MultiIndexReader([IndexReader(a), IndexReader(b)])


QUERIES = [
    TermQuery(term="alpha"),
    TermQuery(term="gamma"),
    BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="alpha")),
        BooleanClause(Occur.SHOULD, TermQuery(term="delta")))),
    BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, TermQuery(term="beta")),
        BooleanClause(Occur.MUST_NOT, TermQuery(term="epsilon")))),
    PhraseQuery(terms=(("beta", 0), ("gamma", 1))),
    PrefixQuery(prefix="ep"),
]


def test_multi_identical_to_merged(indexes):
    from lucenenet_ray.search.searcher import search

    combined, a, b = indexes
    multi = _multi(a, b)
    for q in QUERIES:
        want = search(combined, q, k=10)
        got = search(multi, q, k=10)
        assert got.docs.tolist() == want.docs.tolist(), q
        assert got.scores.tolist() == want.scores.tolist(), q
        assert got.total_hits == want.total_hits, q
        # block-max pruning stays lossless across the federation
        gp = search(multi, q, k=10, prune=True)
        assert gp.to_list() == want.to_list(), q


def test_multi_global_stats(indexes):
    combined, a, b = indexes
    multi = _multi(a, b)
    assert multi.num_docs == combined.num_docs
    assert multi.sum_total_term_freq == combined.sum_total_term_freq
    terms = ["alpha", "beta", "gamma", "delta", "epsilon", "zzz"]
    assert multi.term_stats(terms) == combined.term_stats(terms)
    assert (sorted(multi.expand_query(PrefixQuery(prefix="e")))
            == sorted(combined.expand_query(PrefixQuery(prefix="e"))))


def test_multi_dv_sort_and_term_vector(indexes):
    from lucenenet_ray.search.searcher import search_sorted_by_docvalue

    combined, a, b = indexes
    multi = _multi(a, b)
    q = TermQuery(term="gamma")
    assert (search_sorted_by_docvalue(multi, q, "stars", k=6)
            == search_sorted_by_docvalue(combined, q, "stars", k=6))


def test_multi_deletes_are_shard_scoped(indexes, tmp_path):
    """A delete log belongs to its shard — per-segment liveDocs: it
    tombstones ONLY that shard's matching docs (a writer deletes by
    logging onto every shard existing at delete time, so docs another
    shard adds later survive — IndexWriter delete-queue ordering)."""
    from lucenenet_ray.index.deletes import delete_documents
    from lucenenet_ray.search.multi_reader import MultiIndexReader
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    combined, a, b = indexes
    ddir = str(tmp_path / "del")
    delete_documents(ddir, ["epsilon"])
    multi = MultiIndexReader([IndexReader(a, deletes_path=ddir),
                              IndexReader(b)])
    td = search(multi, TermQuery(term="gamma"), k=10)
    # gamma matches {0,2,4,5,6}; epsilon docs in shard a (ids 0-4) are
    # {2,4} → tombstoned; shard b's epsilon doc 5 SURVIVES (scoped)
    assert sorted(td.docs.tolist()) == [0, 5, 6]
    # logging the same delete on BOTH shards = the global effect
    ddir_b = str(tmp_path / "del_b")
    delete_documents(ddir_b, ["epsilon"])
    multi2 = MultiIndexReader([IndexReader(a, deletes_path=ddir),
                               IndexReader(b, deletes_path=ddir_b)])
    td2 = search(multi2, TermQuery(term="gamma"), k=10)
    assert sorted(td2.docs.tolist()) == [0, 6]


def test_multi_rejects_overlapping_ranges(indexes):
    from lucenenet_ray.search.multi_reader import MultiIndexReader
    from lucenenet_ray.search.reader import IndexReader

    combined, a, b = indexes
    with pytest.raises(ValueError, match="overlap"):
        MultiIndexReader([IndexReader(a), combined])
