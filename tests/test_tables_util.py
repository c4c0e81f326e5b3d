"""Hardened small-result collection (util/tables.py) + the round-2
near_dup_jaccard failure mode: groupby over many partitions emits zero-row
blocks with EMPTY schemas that a plain pa.concat_tables rejects."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.util.tables import concat_tables


def test_concat_drops_zero_column_empty_blocks():
    good = pa.table({"a": pa.array([1, 2], type=pa.int64())})
    empty_zero_col = pa.table({})  # what Ray's groupby can emit for an empty block
    out = concat_tables([empty_zero_col, good, empty_zero_col])
    assert out.num_rows == 2
    assert out.column_names == ["a"]


def test_concat_all_empty_uses_schema():
    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    out = concat_tables([pa.table({})], schema=schema)
    assert out.num_rows == 0
    assert out.schema == schema


def test_concat_promotes_schema_drift():
    a = pa.table({"x": pa.array([1], type=pa.int64())})
    b = pa.table({"x": pa.array([2], type=pa.int64()),
                  "y": pa.array([3], type=pa.int64())})
    out = concat_tables([a, b])
    assert out.num_rows == 2
    assert set(out.column_names) == {"x", "y"}


def test_minhash_candidates_survive_many_partitions(ray_session):
    """The round-2 driver crash: a tiny corpus split over many blocks makes
    groupby(doc_a, doc_b).count() produce empty output blocks. The shared
    candidate-materialization path must not crash and must match the
    single-block result."""
    import ray.data as rd

    from lucenenet_ray.ops.neardup import minhash_candidates
    from lucenenet_ray.util.tables import dataset_to_table

    base = ("spark data window merge join filter sort table scan key " * 6).split()
    rows = [
        {"doc_id": 1, "text": " ".join(base)},
        {"doc_id": 2, "text": " ".join(base)},
        {"doc_id": 3, "text": "totally different words entirely unrelated"},
    ]
    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                        ("count()", pa.int64())])
    wide = rd.from_items(rows, override_num_blocks=3)
    t_wide = dataset_to_table(minhash_candidates(wide), schema=schema)
    narrow = rd.from_items(rows, override_num_blocks=1)
    t_narrow = dataset_to_table(minhash_candidates(narrow), schema=schema)
    got = sorted(zip(t_wide.column("doc_a").to_pylist(),
                     t_wide.column("doc_b").to_pylist()))
    want = sorted(zip(t_narrow.column("doc_a").to_pylist(),
                      t_narrow.column("doc_b").to_pylist()))
    assert got == want
    assert (1, 2) in got


def test_cosine_pairs_block_pair_matches_bruteforce(ray_session):
    """The block-pair cross-join rewrite (no driver matrix) must equal the
    O(n^2) numpy reference, across multiple chunks (chunk_rows < n)."""
    import ray.data as rd

    from lucenenet_ray.ops.knn import cosine_pairs

    rng = np.random.default_rng(7)
    n, d = 40, 8
    mat = rng.standard_normal((n, d))
    mat[11] = mat[3] + 0.01 * rng.standard_normal(d)  # planted near-dup
    mat[25] = mat[3] + 0.01 * rng.standard_normal(d)
    rows = [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(n)]
    ds = rd.from_items(rows, override_num_blocks=4)

    thr = 0.8
    out = cosine_pairs(ds, thr, chunk_rows=7)
    got = set(zip(out.column("id_a").to_pylist(), out.column("id_b").to_pylist()))

    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ mn.T
    want = {(i, j) for i in range(n) for j in range(i + 1, n)
            if sims[i, j] >= thr}
    assert got == want
    assert (3, 11) in got and (3, 25) in got
    # output is sorted and deduplicated
    pairs = list(zip(out.column("id_a").to_pylist(),
                     out.column("id_b").to_pylist()))
    assert pairs == sorted(set(pairs))
