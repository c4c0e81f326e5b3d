"""Binary doc-values: base column, dvb update log, reader resolution.

Reference semantics: ``BinaryDocValuesField`` +
``IndexWriter.UpdateBinaryDocValues`` (Index/IndexWriter.cs:1723-1753,
BinaryDocValuesFieldUpdates.cs; Tests: TestBinaryDocValuesUpdates.cs).
Missing docs read an empty BytesRef (here: ``b""``); updates resolve
(term → docs) via postings in generation order, later generations win.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bdv_index(documents_index, tmp_path_factory, ray_session):
    """Symlink view of the documents index with its own docvalues dir
    holding a binary column text_head = first 12 bytes of text."""
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig
    from lucenenet_ray.index.docvalues import build_docvalues

    src, manifest = documents_index
    view = str(tmp_path_factory.mktemp("bdv") / "view")
    os.makedirs(view)
    for name in os.listdir(src):
        if name not in ("commits", "deletes", "dv_updates", "docvalues"):
            os.symlink(os.path.join(src, name), os.path.join(view, name))
    mc = manifest["config"]
    cfg = IndexConfig(index_path=view, id_min=mc["id_min"],
                      id_max=mc["id_max"], n_buckets=mc["n_buckets"])

    def head(batch: pa.Table) -> pa.Table:
        h = pc.binary_slice(batch.column("text").cast(pa.binary()), 0, 12)
        return pa.table({"doc_id": batch.column("doc_id"), "text_head": h})

    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    build_docvalues(ds.map_batches(head, batch_format="pyarrow"),
                    cfg, ["text_head"])
    return view


def _base_heads():
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "text"])
    return {d: s.encode("utf-8")[:12]
            for d, s in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist())}


def _all_values(r):
    out = {}
    for b in r.bucket_ids:
        bd = r.bucket(b)
        for d, v in zip(bd.norms()[0], r.binary_docvalues(b, "text_head")):
            out[int(d)] = bytes(v)
    return out


def test_base_binary_docvalues_match_source(bdv_index):
    from lucenenet_ray.search.reader import IndexReader

    got = _all_values(IndexReader(bdv_index))
    want = _base_heads()
    assert got == want


def test_missing_field_defaults_empty(bdv_index):
    from lucenenet_ray.search.reader import IndexReader

    r = IndexReader(bdv_index)
    vals = _all_values_field(r, "no_such_field")
    assert set(vals.values()) == {b""}


def _all_values_field(r, field):
    out = {}
    for b in r.bucket_ids:
        bd = r.bucket(b)
        for d, v in zip(bd.norms()[0], r.binary_docvalues(b, field)):
            out[int(d)] = bytes(v)
    return out


def test_update_overrides_matching_docs(bdv_index, corpus, tmp_path):
    from lucenenet_ray.index.docvalues import update_binary_docvalue
    from lucenenet_ray.search.reader import IndexReader

    docs, _texts, toks = corpus
    udir = str(tmp_path / "dvb")
    update_binary_docvalue(udir, "dup", "text_head", b"<<DUP>>")
    r = IndexReader(bdv_index, dv_updates_path=udir)
    got = _all_values(r)
    want = _base_heads()
    dup_docs = {d for d in docs if "dup" in toks[d]}
    assert dup_docs, "test corpus must contain 'dup' docs"
    for d, v in got.items():
        assert v == (b"<<DUP>>" if d in dup_docs else want[d])


def test_later_generation_wins_and_numeric_log_separate(bdv_index, corpus,
                                                        tmp_path):
    from lucenenet_ray.index.docvalues import (
        load_dv_updates,
        update_binary_docvalue,
    )
    from lucenenet_ray.search.reader import IndexReader

    docs, _texts, toks = corpus
    udir = str(tmp_path / "dvb2")
    update_binary_docvalue(udir, "dup", "text_head", b"first")
    update_binary_docvalue(udir, "dup", "text_head", b"second")
    # binary generations never leak into the numeric log
    assert load_dv_updates(udir) == ()
    r = IndexReader(bdv_index, dv_updates_path=udir)
    got = _all_values(r)
    dup_docs = {d for d in docs if "dup" in toks[d]}
    for d in dup_docs:
        assert got[d] == b"second"


def test_version_stamp_sees_dvb_generations(bdv_index, tmp_path):
    from lucenenet_ray.index.docvalues import update_binary_docvalue
    from lucenenet_ray.search.reader import IndexReader

    udir = str(tmp_path / "dvb3")
    r1 = IndexReader(bdv_index, dv_updates_path=udir)
    update_binary_docvalue(udir, "dup", "text_head", b"x")
    r2 = IndexReader(bdv_index, dv_updates_path=udir)
    assert r1.version() != r2.version()
