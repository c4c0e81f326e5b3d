"""FastVectorHighlighter analog (ops/highlight.py fvh_best_fragment):
term-vector-driven fragments, no re-analysis."""

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _text(doc_id):
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "=", doc_id)])
    return t.column("text")[0].as_py()


def test_fvh_marks_hits(documents_index):
    from lucenenet_ray.ops.highlight import fvh_best_fragment

    path, _m = documents_index
    # find a doc containing 'spark'
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    doc = next(d for d, x in zip(t.column("doc_id").to_pylist(),
                                 t.column("text").to_pylist())
               if "spark" in x.split())
    text = _text(doc)
    out = fvh_best_fragment(path, text, doc, ["spark"], fragsize=60)
    assert out is not None
    frag, n_hits, start = out
    assert "<b>spark</b>" in frag
    assert n_hits >= 1 and 0 <= start < len(text)
    # marks wrap EXACT occurrences from vector offsets
    assert frag.replace("<b>", "").replace("</b>", "") == \
        text[start:start + 60]


def test_fvh_best_window_beats_first(documents_index):
    """The chosen window maximizes hit count, not just the first hit."""
    from lucenenet_ray.ops.highlight import fvh_best_fragment

    path, _m = documents_index
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    # doc with >= 3 'data' occurrences
    doc, text = next(
        (d, x) for d, x in zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist())
        if x.split().count("data") >= 3)
    frag, n_hits, _start = fvh_best_fragment(path, text, doc, ["data"],
                                             fragsize=120)
    assert n_hits >= 1
    assert frag.count("<b>data</b>") == n_hits


def test_fvh_no_hits_returns_none(documents_index):
    from lucenenet_ray.ops.highlight import fvh_best_fragment

    path, _m = documents_index
    assert fvh_best_fragment(path, _text(0), 0, ["zzznotaterm"]) is None
