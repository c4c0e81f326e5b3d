"""ops/chunk.py — sliding-window document chunking for RAG / sequence prep.

Boundary semantics model-checked against a trivially-correct sequential
reference: chunks of `window` whitespace tokens advancing by
`window - overlap`; emitted while i*stride < n; final chunk may be short;
empty docs yield zero chunks.
"""

import hashlib

import pyarrow as pa
import pytest

from lucenenet_ray.ops.chunk import chunk_documents, chunk_stats


def _ref_chunks(text, window, overlap):
    toks = text.split()
    stride = window - overlap
    out = []
    i = 0
    while i * stride < len(toks):
        out.append(toks[i * stride:i * stride + window])
        i += 1
    return out


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_boundaries():
    texts = [
        (0, "a b c d e f g h i j"),        # 10 toks
        (1, "x"),                          # 1 tok -> one short chunk
        (2, ""),                           # empty -> zero chunks
        (3, " ".join(f"t{i}" for i in range(17))),  # 17 toks
    ]
    got = chunk_documents(_ds(texts), window=4, overlap=1).take_all()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, text in texts:
        ref = _ref_chunks(text, 4, 1)
        rows = sorted(by_doc.get(did, []), key=lambda r: r["chunk_idx"])
        assert len(rows) == len(ref)
        for r, ref_toks in zip(rows, ref):
            assert r["chunk_text"] == " ".join(ref_toks)
            assert r["n_tok"] == len(ref_toks)
            assert r["start_tok"] == r["chunk_idx"] * 3


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_rejects_bad_overlap():
    with pytest.raises(ValueError):
        chunk_documents(_ds([(0, "a b")]), window=4, overlap=4)


@pytest.mark.usefixtures("ray_session")
def test_chunk_stats_matches_reference_model():
    texts = [(i, " ".join(f"w{j % 7}" for j in range(n)))
             for i, n in enumerate([0, 1, 5, 8, 9, 40, 100])]
    t = chunk_stats(_ds(texts), window=8, overlap=3)
    got = {r["doc_id"]: r for r in t.to_pylist()}
    for did, text in texts:
        ref = _ref_chunks(text, 8, 3)
        if not ref:
            assert did not in got
            continue
        r = got[did]
        assert r["n_chunks"] == len(ref)
        assert r["total_tok"] == sum(len(c) for c in ref)
        h = hashlib.md5()
        for c in ref:
            h.update(" ".join(c).encode())
        assert r["chunks_md5"] == h.hexdigest()[:16]
    assert set(got) == {did for did, tx in texts if tx}
