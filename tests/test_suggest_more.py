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
