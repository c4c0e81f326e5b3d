"""Offset payloads: analyzer offsets, postings roundtrip through the
distributed merge, aggregation, PayloadTermQuery scoring, expunge survival.

Reference: Search/Payloads/PayloadTermQuery.cs + AveragePayloadFunction.cs
(tests TestPayloadTermQuery.cs), Analysis/Payloads/
TokenOffsetPayloadTokenFilter.cs.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def _offset_oracle(text: str):
    """(term -> list of start offsets) for kept tokens, python reference."""
    from lucenenet_ray.analysis.standard import (
        ENGLISH_STOP_WORDS,
        MAX_TOKEN_LENGTH,
    )

    out: dict[str, list[int]] = {}
    off = 0
    idx = 0
    for tok in text.split(" "):
        if tok and tok not in ENGLISH_STOP_WORDS and len(tok) <= MAX_TOKEN_LENGTH:
            out.setdefault(tok, []).append(idx)
        idx += len(tok) + 1
    return out


def test_call_with_offsets_fast_and_slow_agree():
    from lucenenet_ray.analysis.standard import StandardAnalyzer

    a = StandardAnalyzer()
    fast = a.call_with_offsets("spark merge the batch line")
    assert fast == (["spark", "merge", "batch", "line"], [0, 1, 3, 4],
                    [0, 6, 16, 22])
    # non-simple ASCII goes through the regex tokenizer with spans
    t2, p2, o2 = a.call_with_offsets("Spark, Merge!  batch")
    assert t2 == ["spark", "merge", "batch"]
    assert o2 == [0, 7, 15]
    # mixed-case/punct path agrees with plain analysis on terms+positions
    terms, positions = a("Spark, Merge!  batch")
    assert (t2, p2) == (terms, positions)


def test_payload_roundtrip_through_merge(documents_index, corpus):
    """Every (term, doc) payload run in the built index equals the
    text-derived offsets — proving inverter encode → shuffle → merge byte
    reorder → reader decode is lossless."""
    from lucenenet_ray.search.reader import IndexReader

    _docs, texts, _toks = corpus
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    text_of = dict(zip(t.column("doc_id").to_pylist(),
                       t.column("text").to_pylist()))
    r = IndexReader(documents_index[0])
    checked = 0
    for b in r.bucket_ids:
        bd = r.bucket(b)
        for term, chunk in list(bd.load_full().items())[:200]:
            if "\x1f" in term:
                continue  # keyword fields carry payload 0, skipped here
            flat, offs = chunk.payloads_flat()
            docs = chunk.docs()
            for i in range(chunk.df):
                want = _offset_oracle(text_of[int(docs[i])]).get(term)
                got = flat[offs[i]:offs[i + 1]].tolist()
                assert got == want, (term, int(docs[i]))
                checked += 1
    assert checked > 100


def test_payload_stats_matches_oracle(documents_index, corpus):
    from lucenenet_ray.search.payloads import payload_stats
    from lucenenet_ray.search.reader import IndexReader

    docs, texts, _toks = corpus
    r = IndexReader(documents_index[0])
    got = payload_stats(r, "spark")
    expect = []
    for d, tx in zip(docs, texts):
        offs = _offset_oracle(tx).get("spark")
        if offs:
            expect.append((d, len(offs), min(offs), max(offs), sum(offs)))
    expect.sort()
    assert got == expect


def test_payload_term_topk_score(documents_index):
    """score == float32(bm25_term_score * (f32 sum / f32 count))."""
    from lucenenet_ray.search.payloads import payload_stats, payload_term_topk
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    r = IndexReader(documents_index[0])
    st = {d: (n, s) for d, n, _mn, _mx, s in payload_stats(r, "spark")}
    td = search(r, TermQuery(term="spark"), k=r.num_docs)
    want = {}
    for d, s in td.to_list():
        n, sm = st[d]
        factor = np.float32(np.float32(sm) / np.float32(n))
        want[d] = np.float32(np.float32(s) * factor)
    expect = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:10]
    got = payload_term_topk(r, "spark", k=10, fn="avg")
    assert [(d, float(v)) for d, v in expect] == got


def test_min_max_payload_functions(documents_index):
    from lucenenet_ray.search.payloads import payload_stats, payload_term_topk
    from lucenenet_ray.search.reader import IndexReader

    r = IndexReader(documents_index[0])
    stats = payload_stats(r, "spark")
    top_min = payload_term_topk(r, "spark", k=5, fn="min")
    top_max = payload_term_topk(r, "spark", k=5, fn="max")
    assert len(top_min) == 5 and len(top_max) == 5
    mins = {d: mn for d, _n, mn, _mx, _s in stats}
    maxs = {d: mx for d, _n, _mn, mx, _s in stats}
    # sanity: per-doc factors actually differ between the two functions for
    # at least one multi-occurrence doc
    multi = [d for d, n, mn, mx, _s in stats if n > 1 and mn != mx]
    assert multi, "need a doc with distinct payload values"


def test_payloads_survive_expunge(documents_index, corpus, tmp_path):
    """expunge rewrite filters payload runs alongside position runs."""
    from lucenenet_ray.index.deletes import delete_documents, expunge_deletes
    from lucenenet_ray.search.payloads import payload_stats
    from lucenenet_ray.search.reader import IndexReader

    docs, texts, toks = corpus
    src = documents_index[0]
    ddir = str(tmp_path / "dels")
    delete_documents(ddir, ["dup"])
    out = str(tmp_path / "expunged")
    expunge_deletes(src, out, deletes_path=ddir)
    r = IndexReader(out)
    dup_docs = {d for d in docs if "dup" in toks[d]}
    got = payload_stats(r, "spark")
    expect = []
    for d, tx in zip(docs, texts):
        if d in dup_docs:
            continue
        offs = _offset_oracle(tx).get("spark")
        if offs:
            expect.append((d, len(offs), min(offs), max(offs), sum(offs)))
    expect.sort()
    assert got == expect
