"""Physical term-vector sidecar (CompressingTermVectorsWriter/-Reader
analog: index/build.py _write_term_vector_file / read_term_vector)."""

from collections import Counter

import pyarrow as pa


def test_stored_vector_matches_analyzer(documents_index, corpus):
    """Every doc's stored (term, freq, positions, start_offsets) must equal
    a recount through the analyzer chain — same contract the reconstruct-
    on-demand path satisfies, now from the physical sidecar."""
    from lucenenet_ray.analysis.standard import StandardAnalyzer
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    r = IndexReader(path)
    docs, texts, toks = corpus
    an = StandardAnalyzer()
    checked = 0
    for d, text in zip(docs[:25], texts[:25]):
        t = r.term_vector(d)
        terms, positions, offsets = an.call_with_offsets(text or "")
        want = Counter(terms)
        if not want:
            assert t is None or t.num_rows == 0
            continue
        assert t is not None
        got = dict(zip(t.column("term").to_pylist(),
                       t.column("freq").to_pylist()))
        assert got == dict(want)
        # positions + offsets per term, ascending, matching the token stream
        by_term_pos: dict = {}
        by_term_off: dict = {}
        for tm, p, o in zip(terms, positions, offsets):
            by_term_pos.setdefault(tm, []).append(p)
            by_term_off.setdefault(tm, []).append(o)
        for tm, pl, ol in zip(t.column("term").to_pylist(),
                              t.column("positions").to_pylist(),
                              t.column("start_offsets").to_pylist()):
            assert pl == by_term_pos[tm]
            assert ol == by_term_off[tm]
        checked += 1
    assert checked > 0


def test_field_scoped_vector(documents_index):
    """field='source' returns the keyword field's single unprefixed term."""
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    r = IndexReader(path)
    t = r.term_vector(0, field="source")
    assert t is not None and t.num_rows == 1
    assert t.column("freq").to_pylist() == [1]
    assert not t.column("term").to_pylist()[0].startswith("source")


def test_missing_doc_returns_none(documents_index):
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    assert IndexReader(path).term_vector(10**9) is None
