"""Compound Sort(SortField[]) collector (search_sorted_by_fields) and
LazyDocument deferred stored-field access (Misc/Document/LazyDocument.cs)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def mfs_index(documents_index, tmp_path_factory, ray_session):
    """Symlink view with derived two-field docvalues
    (nc_bucket = n_chars // 100, nc_rem = n_chars % 10)."""
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig
    from lucenenet_ray.index.docvalues import build_docvalues

    src, manifest = documents_index
    view = str(tmp_path_factory.mktemp("mfs") / "view")
    os.makedirs(view)
    for name in os.listdir(src):
        if name not in ("commits", "deletes", "dv_updates", "docvalues"):
            os.symlink(os.path.join(src, name), os.path.join(view, name))
    mc = manifest["config"]
    cfg = IndexConfig(index_path=view, id_min=mc["id_min"],
                      id_max=mc["id_max"], n_buckets=mc["n_buckets"])

    def derive(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "nc_bucket": pa.array(nc // 100, type=pa.int64()),
                         "nc_rem": pa.array(nc % 10, type=pa.int64())})

    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "n_chars"])
    build_docvalues(ds.map_batches(derive, batch_format="pyarrow"), cfg,
                    ["nc_bucket", "nc_rem"])
    return view


def _nc():
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "n_chars"])
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("n_chars").to_pylist()))


def test_compound_sort_matches_python_oracle(mfs_index, corpus):
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search_sorted_by_fields

    docs, _texts, toks = corpus
    nc = _nc()
    matches = [d for d in docs if "spark" in toks[d]]
    expect = sorted(
        ((d, nc[d] // 100, nc[d] % 10) for d in matches),
        key=lambda x: (-x[1], x[2], x[0]))[:25]
    r = IndexReader(mfs_index)
    got = search_sorted_by_fields(
        r, TermQuery(term="spark"),
        [("nc_bucket", True), ("nc_rem", False)], k=25)
    assert got == expect
    # primary field must actually tie somewhere, or the test is vacuous
    assert len({b for _, b, _ in expect}) < len(expect)


def test_single_field_chain_equals_single_field_collector(mfs_index, corpus):
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import (
        search_sorted_by_docvalue,
        search_sorted_by_fields,
    )

    r = IndexReader(mfs_index)
    a = search_sorted_by_fields(r, TermQuery(term="window"),
                                [("nc_rem", True)], k=15)
    b = search_sorted_by_docvalue(r, TermQuery(term="window"), "nc_rem",
                                  k=15, reverse=True)
    assert a == b


def test_compound_sort_no_matches(mfs_index):
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search_sorted_by_fields

    r = IndexReader(mfs_index)
    assert search_sorted_by_fields(
        r, TermQuery(term="zzz_nohit"),
        [("nc_bucket", True), ("nc_rem", False)], k=5) == []


# ---------------------------------------------------------------------------
# LazyDocument


@pytest.fixture(scope="module")
def docstore(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.store.docstore import build_docstore

    out = str(tmp_path_factory.mktemp("lazy") / "store")
    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text", "lang", "n_chars"])
    build_docstore(ds, out)
    return out


def test_lazy_document_defers_and_caches(docstore):
    from lucenenet_ray.store.docstore import DocStore

    store = DocStore(docstore)
    d = store.lazy(7)
    assert d.loaded_fields() == ()          # no I/O at construction
    lang = d.get("lang")
    assert d.loaded_fields() == ("lang",)   # only the asked-for field
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                      columns=["doc_id", "lang", "n_chars"])
    row = {x["doc_id"]: x for x in t.to_pylist()}
    assert lang == row[7]["lang"]
    assert d.get("n_chars") == row[7]["n_chars"]
    assert d.get("lang") is lang or d.get("lang") == lang  # cached


def test_lazy_document_missing(docstore):
    from lucenenet_ray.store.docstore import DocStore

    store = DocStore(docstore)
    assert store.lazy(10 ** 9).get("lang") is None
    assert store.lazy(3).get("no_such_field") is None
