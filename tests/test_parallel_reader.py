"""ParallelCompositeReader analog: several field-partitioned indexes over
the SAME doc space searched as one index
(``Index/ParallelCompositeReader.cs`` / ``ParallelAtomicReader.cs``).

Identity contract: a ParallelIndexReader over (body-only index,
fields-only index) must return BIT-IDENTICAL docs/scores to a single
combined index that carries both — the parallel composition is a storage
layout choice, never a semantics change (the reference routes per field
via fieldToReader, ParallelAtomicReader.cs:66-118)."""

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
    field_term,
)

DOCS = [
    ("alpha beta gamma", "srcA", "intro to alpha"),
    ("beta beta delta", "srcA", "all about beta"),
    ("gamma epsilon alpha", "srcB", "gamma notes"),
    ("alpha alpha alpha beta", "srcC", "triple alpha"),
    ("delta epsilon beta", "srcA", "delta epsilon"),
    ("epsilon gamma gamma", "srcB", "more gamma text"),
]


def _table(blank_body: bool = False) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "text": pa.array(["" if blank_body else d[0] for d in DOCS]),
        "source": pa.array([d[1] for d in DOCS]),
        "title": pa.array([d[2] for d in DOCS]),
        "stars": pa.array([10, 3, 7, 1, 9, 5], type=pa.int64()),
    })


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.index.docvalues import build_docvalues
    from lucenenet_ray.search.reader import IndexReader

    root = tmp_path_factory.mktemp("par")
    n = len(DOCS)
    fields = (("source", "source", False), ("title", "title", True))

    # combined: body + keyword/analyzed fields + doc-values, one index
    comb = str(root / "combined")
    cfg = IndexConfig(index_path=comb, id_min=0, id_max=n - 1, n_buckets=2,
                      n_hparts=1, extra_fields=fields)
    build_index(rd.from_arrow(_table()), cfg)
    build_docvalues(rd.from_arrow(_table().select(["doc_id", "stars"])),
                    cfg, ["stars"])

    # body-only index (the scored field's owner — norms/doc order authority)
    body = str(root / "body")
    build_index(rd.from_arrow(_table().select(["doc_id", "text"])),
                IndexConfig(index_path=body, id_min=0, id_max=n - 1,
                            n_buckets=2, n_hparts=1))

    # fields-only index: SAME docs/buckets, blank body so its term dict
    # holds only the field-prefixed terms; carries the doc-values too
    fidx = str(root / "fields")
    fcfg = IndexConfig(index_path=fidx, id_min=0, id_max=n - 1, n_buckets=2,
                       n_hparts=1, extra_fields=fields)
    build_index(rd.from_arrow(_table(blank_body=True)), fcfg)
    build_docvalues(rd.from_arrow(_table().select(["doc_id", "stars"])),
                    fcfg, ["stars"])

    return IndexReader(comb), body, fidx


def _parallel(body_path, fields_path):
    from lucenenet_ray.search.parallel_reader import ParallelIndexReader
    from lucenenet_ray.search.reader import IndexReader

    return ParallelIndexReader(
        [IndexReader(body_path), IndexReader(fields_path)],
        field_map={None: 0, "source": 1, "title": 1},
        dv_fields={"stars": 1},
    )


QUERIES = [
    TermQuery(term="alpha"),
    TermQuery(term=field_term("source", "srcA")),
    TermQuery(term=field_term("title", "gamma")),
    BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, TermQuery(term="beta")),
        BooleanClause(Occur.SHOULD,
                      TermQuery(term=field_term("source", "srcB"))))),
    BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="gamma")),
        BooleanClause(Occur.SHOULD,
                      TermQuery(term=field_term("title", "alpha"))))),
    PhraseQuery(terms=(("delta", 0), ("epsilon", 1))),
    PrefixQuery(prefix=field_term("source", "src")),
    PrefixQuery(prefix=field_term("title", "gam")),
]


def test_parallel_identical_to_combined(indexes):
    from lucenenet_ray.search.searcher import search

    combined, body, fidx = indexes
    par = _parallel(body, fidx)
    for q in QUERIES:
        want = search(combined, q, k=10)
        got = search(par, q, k=10)
        assert got.docs.tolist() == want.docs.tolist(), q
        assert got.scores.tolist() == want.scores.tolist(), q
        assert got.total_hits == want.total_hits, q


def test_parallel_term_stats_and_expansion(indexes):
    combined, body, fidx = indexes
    par = _parallel(body, fidx)
    terms = ["alpha", "beta", field_term("source", "srcA"),
             field_term("title", "gamma")]
    assert par.term_stats(terms) == combined.term_stats(terms)
    assert par.num_docs == combined.num_docs
    assert par.sum_total_term_freq == combined.sum_total_term_freq
    # multi-term expansion routes to the owning reader's term dict
    got = sorted(par.expand_query(
        PrefixQuery(prefix=field_term("source", "src"))))
    want = sorted(combined.expand_query(
        PrefixQuery(prefix=field_term("source", "src"))))
    assert got == want and got


def test_parallel_docvalues_routing(indexes):
    combined, body, fidx = indexes
    par = _parallel(body, fidx)
    for b in combined.bucket_ids:
        np.testing.assert_array_equal(
            par.numeric_docvalues(b, "stars"),
            combined.numeric_docvalues(b, "stars"))


def test_parallel_dv_sort(indexes):
    from lucenenet_ray.search.searcher import search_sorted_by_docvalue

    combined, body, fidx = indexes
    par = _parallel(body, fidx)
    q = TermQuery(term="beta")
    assert (search_sorted_by_docvalue(par, q, "stars", k=5)
            == search_sorted_by_docvalue(combined, q, "stars", k=5))


def test_parallel_deletes_on_field_index(indexes, tmp_path):
    """Delete-by-term applies on the index owning the term; the live mask
    is the AND across sub-readers, aligned to body doc order."""
    from lucenenet_ray.index.deletes import delete_documents
    from lucenenet_ray.search.parallel_reader import ParallelIndexReader
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    combined, body, fidx = indexes
    # tombstone srcA docs via the FIELD index's delete log
    ddir = str(tmp_path / "deletes")
    delete_documents(ddir, [field_term("source", "srcA")])
    par = ParallelIndexReader(
        [IndexReader(body), IndexReader(fidx, deletes_path=ddir)],
        field_map={None: 0, "source": 1, "title": 1})
    td = search(par, TermQuery(term="beta"), k=10)
    # docs 0,1,4 are srcA; beta matches {0,1,3,4} → only 3 survives
    assert td.docs.tolist() == [3]


def test_parallel_requires_same_doc_space(indexes, ray_session, tmp_path):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.search.parallel_reader import ParallelIndexReader
    from lucenenet_ray.search.reader import IndexReader

    combined, body, fidx = indexes
    small = str(tmp_path / "small")
    t = _table().slice(0, 3)
    build_index(rd.from_arrow(t),
                IndexConfig(index_path=small, id_min=0, id_max=2,
                            n_buckets=2, n_hparts=1))
    with pytest.raises(ValueError, match="share the doc space"):
        ParallelIndexReader([IndexReader(body), IndexReader(small)],
                            field_map={None: 0, "source": 1})
