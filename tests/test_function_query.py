"""FunctionQuery / ValueSource semantics (search/function.py)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def reader(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    return IndexReader(path)


def _all_dv(reader, field="n_chars"):
    """(doc_ids, float32 values) over every doc, doc-id ascending."""
    ids, vals = [], []
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        ids.append(bucket.norms()[0])
        vals.append(reader.numeric_docvalues(b, field).astype(np.float32))
    ids = np.concatenate(ids)
    vals = np.concatenate(vals)
    order = np.argsort(ids, kind="stable")
    return ids[order], vals[order]


def test_reciprocal_function_topk_matches_bruteforce(reader):
    from lucenenet_ray.search.function import (
        Int64FieldSource,
        ReciprocalFunction,
        function_search,
    )

    vs = ReciprocalFunction(source=Int64FieldSource(field="n_chars"),
                            a=1000.0, m=1.0, b=1000.0)
    rows = function_search(reader, vs, k=10)
    ids, x = _all_dv(reader)
    scores = np.float32(1000.0) / (np.float32(1.0) * x + np.float32(1000.0))
    order = np.lexsort((ids, -scores))[:10]
    assert [(int(ids[i]), np.float32(scores[i])) for i in order] == rows


def test_scale_function_range_and_extremes(reader):
    from lucenenet_ray.search.function import (
        Int64FieldSource,
        ScaleFunction,
        function_search,
    )

    vs = ScaleFunction(source=Int64FieldSource(field="n_chars"),
                       min=0.0, max=1.0)
    rows = function_search(reader, vs, k=reader.num_docs)
    scores = np.array([s for _, s in rows], dtype=np.float32)
    assert scores.max() == np.float32(1.0)
    assert scores.min() == np.float32(0.0)
    # top doc is (one of) the max-n_chars docs, smallest doc id on ties
    ids, x = _all_dv(reader)
    best = ids[x == x.max()].min()
    assert rows[0][0] == int(best)


def test_composed_sources_float32_left_assoc(reader):
    from lucenenet_ray.search.function import (
        ConstValueSource,
        Int64FieldSource,
        LinearFunction,
        ProductFunction,
        SumFunction,
    )

    f = Int64FieldSource(field="n_chars")
    vs = SumFunction(sources=(
        LinearFunction(source=f, slope=0.5, intercept=3.0),
        ProductFunction(sources=(ConstValueSource(value=2.0), f)),
    ))
    b = reader.bucket(reader.bucket_ids[0])
    got = vs.values(reader, b)
    x = reader.numeric_docvalues(b.bucket_id, "n_chars").astype(np.float32)
    lin = np.float32(0.5) * x + np.float32(3.0)
    prod = (np.ones_like(x) * np.float32(2.0)) * x
    exp = (np.zeros_like(x) + lin) + prod  # left-assoc f32 adds
    assert got.dtype == np.float32
    assert np.array_equal(got, exp)


def test_const_source_tiebreaks_by_doc_id(reader):
    from lucenenet_ray.search.function import ConstValueSource, function_search

    rows = function_search(reader, ConstValueSource(value=2.5), k=7)
    ids, _ = _all_dv(reader)
    assert [d for d, _ in rows] == sorted(ids.tolist())[:7]
    assert all(s == np.float32(2.5) for _, s in rows)


def test_boosted_query_rescored_hits(reader):
    from lucenenet_ray.search.function import (
        Int64FieldSource,
        ReciprocalFunction,
        boosted_search,
    )
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.searcher import search

    q = parse_query("spark window")
    sub = dict(search(reader, q, k=reader.num_docs, prune=False).to_list())
    vs = ReciprocalFunction(source=Int64FieldSource(field="n_chars"),
                            a=1000.0, m=1.0, b=1000.0)
    rows = boosted_search(reader, q, vs, k=len(sub))
    assert {d for d, _ in rows} == set(sub)
    ids, x = _all_dv(reader)
    recip = np.float32(1000.0) / (np.float32(1.0) * x + np.float32(1000.0))
    val_of = dict(zip(ids.tolist(), recip))
    for d, s in rows[:20]:
        exp = (np.float32(1.0) * np.float32(sub[d])) * val_of[d]
        assert s == exp


def test_function_query_respects_dv_updates(reader, documents_index, tmp_path):
    """Int64FieldSource reads through the update-resolved accessor
    (ReaderAndUpdates stacking), not the base column."""
    from lucenenet_ray.index.docvalues import update_numeric_docvalue
    from lucenenet_ray.search.function import Int64FieldSource, function_search
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    upd_dir = str(tmp_path / "dvu")
    update_numeric_docvalue(upd_dir, "spark", "n_chars", 1)
    r2 = IndexReader(path, dv_updates_path=upd_dir)
    rows = function_search(r2, Int64FieldSource(field="n_chars"),
                           k=r2.num_docs)
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.searcher import search

    spark_docs = {d for d, _ in search(r2, TermQuery(term="spark"),
                                       k=r2.num_docs).to_list()}
    got = dict(rows)
    assert spark_docs  # fixture corpus contains the term
    assert all(got[d] == np.float32(1.0) for d in spark_docs)
