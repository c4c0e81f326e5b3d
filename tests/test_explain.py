"""Explain API (search/explain.py): root value bit-matches search()."""

import pytest


@pytest.fixture(scope="module")
def reader(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    return IndexReader(path)


@pytest.mark.parametrize("qtext", ["spark", "spark window",
                                   "spark AND merge", "merge -window"])
def test_explain_matches_search_scores(reader, qtext):
    from lucenenet_ray.search.explain import explain
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.searcher import search

    q = parse_query(qtext)
    td = search(reader, q, k=25)
    hits = dict(td.to_list())
    assert hits
    for doc, score in list(hits.items())[:10]:
        e = explain(reader, q, doc)
        assert e["match"] is True
        assert e["value"] == score
        assert e["details"] or e["description"].startswith("weight")


def test_explain_nonmatching_doc(reader):
    from lucenenet_ray.search.explain import explain
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.searcher import search

    q = parse_query("spark AND window")
    matching = {d for d, _s in search(reader, q,
                                      k=reader.num_docs).to_list()}
    non = next(d for d in range(reader.num_docs) if d not in matching)
    e = explain(reader, q, non)
    assert e["match"] is False and e["value"] == 0.0


def test_explain_structure(reader):
    from lucenenet_ray.search.explain import explain
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.searcher import search

    q = parse_query("spark")
    doc, _ = search(reader, q, k=1).to_list()[0]
    e = explain(reader, q, doc)
    assert e["description"].startswith("weight(spark")
    kinds = [d["description"].split("(")[0] for d in e["details"]]
    assert kinds == ["idf", "tfNorm"]
