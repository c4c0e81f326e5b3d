"""AddIndexes analog + shard-at-a-time resumable build: merged-from-shards
index must answer queries identically to the direct whole-corpus index."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def incremental_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig
    from lucenenet_ray.index.merge_indexes import build_index_incremental

    out = str(tmp_path_factory.mktemp("inc") / "merged")
    src = "/root/testdata/sf0.001/documents.parquet"

    def shard(lo, hi):
        def factory():
            ds = rd.read_parquet(src, columns=["doc_id", "text"])
            return ds.filter(lambda r: lo <= r["doc_id"] < hi)

        return factory

    cfg = IndexConfig(index_path="IGNORED", id_min=0, id_max=499, n_buckets=4)
    manifest = build_index_incremental(
        [("s0", shard(0, 250)), ("s1", shard(250, 500))], out, cfg
    )
    return out, manifest


def test_incremental_matches_direct(incremental_index, documents_index):
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    inc_path, manifest = incremental_index
    direct_path, _ = documents_index
    ri = IndexReader(inc_path)
    rdir = IndexReader(direct_path)
    assert ri.num_docs == rdir.num_docs
    assert ri.sum_total_term_freq == rdir.sum_total_term_freq
    for qt in ["spark window", '"batch merge"', "data", "vector AND dup", "dup"]:
        q = parse_query(qt)
        a = search(rdir, q, k=10)
        b = search(ri, q, k=10)
        assert np.array_equal(a.docs, b.docs), qt
        assert np.array_equal(a.scores, b.scores), qt
        assert a.total_hits == b.total_hits
        # pruning stays lossless on the merged index too
        c = search(ri, q, k=10, prune=True)
        assert np.array_equal(b.docs, c.docs) and np.array_equal(b.scores, c.scores)


def test_resume_skips_built_shards(incremental_index, ray_session):
    """Re-running the incremental build must skip existing shard checkpoints."""
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig
    from lucenenet_ray.index.merge_indexes import build_index_incremental

    inc_path, _ = incremental_index
    src = "/root/testdata/sf0.001/documents.parquet"

    def fail_factory():  # would blow up if actually called
        raise AssertionError("shard should have been skipped")

    cfg = IndexConfig(index_path="IGNORED", id_min=0, id_max=499, n_buckets=4)
    manifest = build_index_incremental(
        [("s0", fail_factory), ("s1", fail_factory)], inc_path, cfg
    )
    assert all("skipped" in s["status"] for s in manifest["shard_lineage"])


def test_merge_manifest_lineage(incremental_index):
    inc_path, manifest = incremental_index
    assert len(manifest["merged_from"]) == 2
    with open(os.path.join(inc_path, "manifest.json")) as f:
        on_disk = json.load(f)
    assert "shard_lineage" in on_disk
