"""Infix suggester (ops/suggest.py suggest_infix)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _dict(tmp_path):
    t = pa.table({
        "key": pa.array(["alpha merge", "merge batch", "merge line",
                         "summer day", "data merge"]),
        "weight": pa.array([5, 9, 9, 7, 3], type=pa.int64()),
    })
    p = str(tmp_path / "d.parquet")
    pq.write_table(t, p)
    return p


def test_infix_token_prefix_semantics(tmp_path):
    from lucenenet_ray.ops.suggest import suggest_infix

    out = suggest_infix(_dict(tmp_path), "mer", k=10)
    # token-prefix match: 'summer day' must NOT match ('mer' is not a
    # token prefix); ties by key asc
    assert out.column("key").to_pylist() == [
        "merge batch", "merge line", "alpha merge", "data merge"]
    assert out.column("weight").to_pylist() == [9, 9, 5, 3]


def test_infix_k_cap(tmp_path):
    from lucenenet_ray.ops.suggest import suggest_infix

    out = suggest_infix(_dict(tmp_path), "mer", k=2)
    assert out.num_rows == 2


def test_suggest_blended_linear_and_reciprocal(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucenenet_ray.ops.suggest import suggest_blended

    p = str(tmp_path / "dict.parquet")
    pq.write_table(pa.table({
        "key": ["merge sort", "quick merge", "merge join", "zz top"],
        "weight": [10, 10, 7, 99]}), p)
    t = suggest_blended(p, "mer", k=10)
    # "merge sort" pos0 -> 10; "quick merge" pos1 -> 9; "merge join" -> 7
    assert t.column("key").to_pylist() == [
        "merge sort", "quick merge", "merge join"]
    assert t.column("score").to_pylist() == [10, 9, 7]
    t = suggest_blended(p, "mer", k=10, blender="POSITION_RECIPROCAL")
    # reciprocal: pos1 coefficient 1/2 -> 5
    assert t.column("score").to_pylist() == [10, 7, 5]
