"""Index splitting (index/split.py): PK and filter splits must partition
the corpus exactly — per-side searches equal the full-index results
restricted to each side, stats recomputed, round-robin covers all docs."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _all_hits(reader, qtext, k=10_000):
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.searcher import search

    td = search(reader, parse_query(qtext), k=k)
    return {d for d, _s in td.to_list()}


def test_pk_split_partitions_and_search(documents_index, tmp_path):
    from lucenenet_ray.index.split import split_index
    from lucenenet_ray.search.reader import IndexReader

    path, manifest = documents_index
    m1, m2 = split_index(path, str(tmp_path / "lo"), str(tmp_path / "hi"),
                         250)
    assert m1["n_docs"] + m2["n_docs"] == manifest["n_docs"]
    r_all = IndexReader(path)
    r1 = IndexReader(str(tmp_path / "lo"))
    r2 = IndexReader(str(tmp_path / "hi"))
    full = _all_hits(r_all, "spark")
    assert _all_hits(r1, "spark") == {d for d in full if d < 250}
    assert _all_hits(r2, "spark") == {d for d in full if d >= 250}
    # stats recomputed per side
    assert m1["sum_total_term_freq"] + m2["sum_total_term_freq"] == \
        manifest["sum_total_term_freq"]


def test_filter_split_by_term(documents_index, tmp_path):
    from lucenenet_ray.index.split import split_index
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    m1, m2 = split_index(path, str(tmp_path / "a"), str(tmp_path / "b"),
                         parse_query("spark"))
    r_all = IndexReader(path)
    sparky = _all_hits(r_all, "spark")
    r1 = IndexReader(str(tmp_path / "a"))
    assert m1["n_docs"] == len(sparky)
    # every doc in side A contains spark; side B none
    assert _all_hits(r1, "spark") == sparky
    r2 = IndexReader(str(tmp_path / "b"))
    assert _all_hits(r2, "spark") == set()
    assert m2["n_docs"] == r_all.num_docs - len(sparky)


def test_round_robin_split(documents_index, tmp_path):
    from lucenenet_ray.index.split import split_index_round_robin
    from lucenenet_ray.search.reader import IndexReader

    path, manifest = documents_index
    outs = [str(tmp_path / f"p{i}") for i in range(3)]
    ms = split_index_round_robin(path, outs)
    assert sum(m["n_docs"] for m in ms) == manifest["n_docs"]
    # outputs are disjoint and cover everything
    seen: set[int] = set()
    for out in outs:
        r = IndexReader(out)
        ids = set()
        for b in r.bucket_ids:
            ids.update(r.bucket(b).norms()[0].tolist())
        assert not (ids & seen)
        seen |= ids
    assert len(seen) == manifest["n_docs"]
