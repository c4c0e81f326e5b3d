"""Sort-based substring dedup (ops/suffixsort.py): parity with the
hash-groupby path, interior-singleton prune correctness, edge cases."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.suffixsort import (
    _prune_interior_singletons,
    _suffix_rows,
    duplicated_window_spans_sorted,
)


def _docs(texts, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})) \
        .repartition(parallelism)


def _collect(ds):
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs())
            if t.num_rows and "doc_id" in t.schema.names]
    if not tabs:
        return {}
    t = pa.concat_tables(tabs)
    return {d: (w, c) for d, w, c in zip(t.column("doc_id").to_pylist(),
                                         t.column("n_dup_windows").to_pylist(),
                                         t.column("n_covered").to_pylist())}


def test_suffix_rows_shape():
    t = _suffix_rows(pa.table({"doc_id": [7], "text": ["a b c d"]}), k=3)
    assert t.column("key").to_pylist() == ["a b c", "b c d"]
    assert t.column("pos").to_pylist() == [1, 2]
    # shorter than k emits nothing
    t2 = _suffix_rows(pa.table({"doc_id": [1], "text": ["a b"]}), k=3)
    assert t2.num_rows == 0


def test_prune_keeps_edges_and_runs():
    t = pa.table({"key": ["a", "b", "b", "c", "d"],
                  "doc_id": [0, 1, 2, 3, 4],
                  "pos": [1, 1, 1, 1, 1]})
    out = _prune_interior_singletons(t)
    # 'a' (first row) kept, 'b' run kept, 'c' interior singleton dropped,
    # 'd' (last row) kept
    assert out.column("doc_id").to_pylist() == [0, 1, 2, 4]


def test_matches_hash_path(ray_session):
    from lucenenet_ray.ops.neardup import duplicated_window_spans

    texts = (["alpha beta gamma delta epsilon zeta"] * 2
             + ["one two three four five six seven",
                "unique words only here nothing repeats at all",
                "alpha beta gamma delta epsilon zeta eta theta",
                "x " * 20])  # within-doc repeats count
    got = _collect(duplicated_window_spans_sorted(_docs(texts, 5), k=5))
    want = _collect(duplicated_window_spans(_docs(texts, 5), k=5))
    assert got == want
    assert 0 in got and 1 in got          # the exact dups are marked
    assert 5 in got                       # within-doc repetition marked
    assert 2 not in got and 3 not in got  # unique docs absent


def test_single_giant_run_spanning_batches(ray_session):
    # every window identical -> one key group spans many sorted batches;
    # every position must still be marked exactly once
    texts = ["w w w w w w w w w w"] * 6   # 6 windows of 'w w w w w' each
    got = _collect(duplicated_window_spans_sorted(_docs(texts, 6), k=5))
    assert set(got) == set(range(6))
    for d in got:
        assert got[d] == (6, 10)
