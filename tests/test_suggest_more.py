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


def test_suggest_fuzzy(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucenenet_ray.ops.suggest import suggest_fuzzy

    p = str(tmp_path / "dict.parquet")
    pq.write_table(pa.table({
        "key": ["merge sort", "marge x", "merge join", "zerge q",
                "me q"],
        "weight": [10, 8, 7, 99, 50]}), p)
    t = suggest_fuzzy(p, "merge", k=10, transpositions=False)
    # non_fuzzy_prefix=1 excludes zerge; exact-prefix first
    assert t.column("key").to_pylist() == [
        "merge sort", "merge join", "marge x"]
    # short queries fall back to exact prefix (min_fuzzy_length=3)
    t = suggest_fuzzy(p, "me", k=10)
    assert t.column("key").to_pylist() == ["me q", "merge sort",
                                           "merge join"]
    # Damerau transposition counts as one edit when enabled
    t = suggest_fuzzy(p, "emrge", k=10, transpositions=True)
    assert "merge sort" not in t.column("key").to_pylist()  # prefix 'e'!='m'
    t = suggest_fuzzy(p, "mrege", k=10, transpositions=True)
    assert "merge sort" in t.column("key").to_pylist()
    t2 = suggest_fuzzy(p, "mrege", k=10, transpositions=False)
    assert "merge sort" not in t2.column("key").to_pylist()


def test_suggest_stop_filter():
    from lucenenet_ray.ops.suggest import suggest_stop_filter

    stop = frozenset(["the", "a", "of"])
    # trailing stopword the user may still be typing is kept
    assert suggest_stop_filter(["lord", "of", "the"], "lord of the",
                               stop) == [("lord", False), ("the", True)]
    # a completed (space-followed) trailing stopword is dropped
    assert suggest_stop_filter(["lord", "of", "the"], "lord of the ",
                               stop) == [("lord", False)]
    assert suggest_stop_filter(["the", "lord"], "the lord",
                               stop) == [("lord", False)]


def test_suggest_fst_bucketed(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucenenet_ray.ops.suggest import suggest_fst_bucketed

    p = str(tmp_path / "dict.parquet")
    pq.write_table(pa.table({
        "key": [f"k{i:02d}" for i in range(10)] + ["tie a", "tie b"],
        "weight": list(range(1, 11)) + [5, 5]}), p)
    t = suggest_fst_bucketed(p, "tie", k=10, buckets=10)
    # equal weights share the run-FIRST bucket (line carry)
    assert len(set(t.column("bucket").to_pylist())) == 1
    t = suggest_fst_bucketed(p, "k0", k=10, buckets=10)
    # higher buckets (ranks) first
    b = t.column("bucket").to_pylist()
    assert b == sorted(b, reverse=True)
