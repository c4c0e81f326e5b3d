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


def test_pow_div_min_max_rangemap_if_algebra(reader):
    """Wave-2 combinators: float32 node-by-node, pow in double."""
    from lucenenet_ray.search.function import (
        ConstValueSource,
        DivFunction,
        IfFunction,
        Int64FieldSource,
        MaxFunction,
        MinFunction,
        PowFunction,
        RangeMapFunction,
    )

    f = Int64FieldSource(field="n_chars")
    b = reader.bucket(reader.bucket_ids[0])
    x = reader.numeric_docvalues(b.bucket_id, "n_chars").astype(np.float32)

    got = PowFunction(a=f, b=ConstValueSource(0.5)).values(reader, b)
    assert np.array_equal(
        got, np.power(x.astype(np.float64), 0.5).astype(np.float32))

    got = DivFunction(a=f, b=ConstValueSource(7.0)).values(reader, b)
    assert np.array_equal(got, x / np.float32(7.0))

    got = MaxFunction(sources=(f, ConstValueSource(400.0))).values(reader, b)
    assert np.array_equal(got, np.maximum(x, np.float32(400.0)))
    got = MinFunction(sources=(f, ConstValueSource(400.0))).values(reader, b)
    assert np.array_equal(got, np.minimum(x, np.float32(400.0)))

    rm = RangeMapFunction(source=f, min=300.0, max=700.0,
                          target=ConstValueSource(1.0))
    got = rm.values(reader, b)  # no default: out-of-range passes through
    inside = (x >= np.float32(300.0)) & (x <= np.float32(700.0))
    assert np.array_equal(got, np.where(inside, np.float32(1.0), x))

    got = IfFunction(cond=rm, true_source=ConstValueSource(9.0),
                     false_source=f).values(reader, b)
    # cond != 0 everywhere x != 0; in-range docs read 1.0 → true branch
    assert np.array_equal(got, np.where(
        np.where(inside, np.float32(1.0), x) != 0, np.float32(9.0), x))


def test_postings_backed_sources_match_direct_scan(reader):
    """TermFreq/TF per doc vs the raw postings; DocFreq/IDF/TotalTermFreq
    constants vs reader.term_stats; absent term → all zeros / df=0."""
    from lucenenet_ray.search.bm25 import classic_idf
    from lucenenet_ray.search.function import (
        DocFreqSource,
        IDFSource,
        TermFreqSource,
        TFSource,
        TotalTermFreqSource,
    )

    term = "spark"
    df, ttf = reader.term_stats([term])[term]
    seen_df = 0
    seen_ttf = 0
    for bid in reader.bucket_ids:
        b = reader.bucket(bid)
        ids = b.norms()[0]
        tf = TermFreqSource(term).values(reader, b)
        ch = b.chunks_for_terms([term]).get(term)
        exp = np.zeros(len(ids), dtype=np.float32)
        if ch is not None:
            exp[np.searchsorted(ids, ch.docs())] = ch.freqs()
        assert np.array_equal(tf, exp)
        seen_df += int((tf > 0).sum())
        seen_ttf += int(tf.sum())
        assert np.array_equal(
            TFSource(term).values(reader, b),
            np.sqrt(tf.astype(np.float64)).astype(np.float32))
        assert np.all(DocFreqSource(term).values(reader, b) == np.float32(df))
        assert np.all(IDFSource(term).values(reader, b)
                      == classic_idf(df, reader.num_docs))
        assert np.all(TotalTermFreqSource(term).values(reader, b)
                      == np.float32(ttf))
        assert np.all(TermFreqSource("zzz_absent").values(reader, b) == 0)
    assert seen_df == df and seen_ttf == ttf


def test_norm_and_collection_constant_sources(reader):
    from lucenenet_ray.search.function import (
        MaxDocSource,
        NormSource,
        NumDocsSource,
        SumTotalTermFreqSource,
    )
    from lucenenet_ray.util.smallfloat import CLASSIC_NORM_TABLE

    b = reader.bucket(reader.bucket_ids[0])
    got = NormSource().values(reader, b)
    exp = CLASSIC_NORM_TABLE[b.norms()[2].astype(np.int64)].astype(np.float32)
    assert np.array_equal(got, exp)
    assert np.all(SumTotalTermFreqSource().values(reader, b)
                  == np.float32(reader.sum_total_term_freq))
    assert np.all(MaxDocSource().values(reader, b)
                  == np.float32(reader.num_docs))
    # no deletes in the fixture: NumDocs == MaxDoc
    assert np.all(NumDocsSource().values(reader, b)
                  == np.float32(reader.num_docs))


def test_function_grouping_search_matches_naive(reader):
    """GroupingSearch(ValueSource): groups by (best score desc, key asc),
    docs by (score desc, doc asc), vs a brute-force regroup."""
    from lucenenet_ray.search.function import (
        ConstValueSource,
        Int64FieldSource,
        RangeMapFunction,
        function_grouping_search,
    )
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.searcher import search

    nchars = Int64FieldSource(field="n_chars")
    key = RangeMapFunction(
        source=nchars, min=0.0, max=399.0, target=ConstValueSource(0.0),
        default=RangeMapFunction(source=nchars, min=400.0, max=699.0,
                                 target=ConstValueSource(1.0),
                                 default=ConstValueSource(2.0)))
    q = parse_query("spark window")
    got = function_grouping_search(reader, q, key, n_groups=3, group_docs=2)

    td = search(reader, q, k=reader.num_docs, prune=False)
    ids, x = _all_dv(reader)
    kf = np.where(x <= 399, 0.0, np.where(x <= 699, 1.0, 2.0)).astype(
        np.float32)
    key_of = dict(zip(ids.tolist(), kf.tolist()))
    byg: dict[float, list[tuple[int, float]]] = {}
    for d, s in td.to_list():
        byg.setdefault(key_of[d], []).append((d, s))
    exp_groups = sorted(byg, key=lambda g: (-max(s for _, s in byg[g]), g))[:3]
    assert [float(g) for g, _ in got] == exp_groups
    for (_g, docs), g in zip(got, exp_groups):
        exp = sorted(byg[g], key=lambda t: (-t[1], t[0]))[:2]
        assert [(d, float(s)) for d, s in docs] == exp


def test_query_value_source_scores_and_default(reader):
    """QueryValueSource: matching docs read the sub-query's score,
    non-matching docs read def_val; memoized per reader."""
    from lucenenet_ray.search.function import QueryValueSource
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.searcher import search

    q = parse_query("spark window")
    vs = QueryValueSource(query=q, def_val=0.25)
    sub = dict(search(reader, q, k=reader.num_docs, prune=False).to_list())
    for bid in reader.bucket_ids:
        b = reader.bucket(bid)
        got = vs.values(reader, b)
        for d, v in zip(b.norms()[0].tolist(), got):
            exp = sub.get(d)
            assert v == (np.float32(exp) if exp is not None
                         else np.float32(0.25))
    assert vs in reader.__dict__["_qvs_cache"]  # one search per reader


def test_ord_field_source_global_ranks(reader, documents_index):
    """OrdFieldSource: global ords == rank among sorted distinct values;
    reverse = valueCount - ord - 1; every doc valued (single-valued
    keyword field)."""
    import pyarrow.parquet as pq

    from lucenenet_ray.search.function import OrdFieldSource

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "source"])
    src_of = dict(zip(t.column("doc_id").to_pylist(),
                      t.column("source").to_pylist()))
    distinct = sorted(set(src_of.values()))
    ord_of = {v: i for i, v in enumerate(distinct)}
    fwd = OrdFieldSource(field="source")
    rev = OrdFieldSource(field="source", reverse=True)
    for bid in reader.bucket_ids:
        b = reader.bucket(bid)
        ids = b.norms()[0].tolist()
        f = fwd.values(reader, b)
        r = rev.values(reader, b)
        for i, d in enumerate(ids):
            assert f[i] == np.float32(ord_of[src_of[d]])
            assert r[i] == np.float32(len(distinct) - ord_of[src_of[d]] - 1)


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
