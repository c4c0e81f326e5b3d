"""Cross-snapshot incremental dedup (ops/incdedup.py): bloom tree-reduce,
exactness under forced false positives, empty-candidate fast path."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.incdedup import (
    _bit_positions,
    _digests,
    _fold,
    _test,
    build_text_bloom,
    dedup_against,
)


def _ds(texts, ids=None, parallelism=3):
    import ray.data as rd

    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
             .repartition(parallelism)


def test_bit_positions_deterministic_and_in_range():
    d = _digests(["alpha", "beta", "alpha"])
    p = _bit_positions(d, bits_log2=10, k=5)
    assert p.shape == (3, 5)
    assert (p >= 0).all() and (p < 1024).all()
    assert (p[0] == p[2]).all()          # same text, same bits
    assert not (p[0] == p[1]).all()      # different text, different bits
    # double hashing from the md5 digest halves
    raw = np.frombuffer(hashlib.md5(b"alpha").digest(), dtype=np.uint64)
    h1, h2 = raw[0], raw[1] | np.uint64(1)
    want = [(int(h1) + i * int(h2)) % 1024 for i in range(5)]
    assert p[0].tolist() == want


def test_fold_and_test_membership():
    bm = np.zeros(16, dtype=np.uint64)  # 1024 bits
    d = _digests(["x", "y"])
    _fold(bm, _bit_positions(d, 10, 7))
    assert _test(bm, _bit_positions(_digests(["x", "y"]), 10, 7)).all()
    # a fresh value is (almost surely) rejected at this load factor
    assert not _test(bm, _bit_positions(_digests(["zzz"]), 10, 7)).any()


def test_distributed_bloom_equals_local(ray_session):
    texts = [f"doc number {i}" for i in range(200)]
    got = build_text_bloom(_ds(texts, parallelism=7), bits_log2=12, k=4)
    want = np.zeros((1 << 12) >> 6, dtype=np.uint64)
    _fold(want, _bit_positions(_digests(texts), 12, 4))
    assert (got == want).all()


def test_dedup_exact_result(ray_session):
    old = _ds(["a", "b", "c", "d"])
    new = _ds(["b", "x", "d", "y", "b"], ids=[10, 11, 12, 13, 14])
    kept, ndup = dedup_against(new, old, bits_log2=12)
    assert sorted(kept.to_pandas()["doc_id"]) == [11, 13]
    assert ndup == 2  # distinct dup texts: b, d


def test_dedup_exact_under_forced_false_positives(ray_session):
    """A 64-bit bloom with k=2 saturates instantly — every row becomes a
    candidate, and the confirm pass must still produce the exact answer."""
    old = _ds([f"old {i}" for i in range(50)])
    new = _ds([f"old {i}" for i in range(0, 50, 5)]
              + [f"new {i}" for i in range(10)],
              ids=list(range(100, 120)))
    kept, ndup = dedup_against(new, old, bits_log2=6, k=2)
    assert sorted(kept.to_pandas()["doc_id"]) == list(range(110, 120))
    assert ndup == 10


def test_dedup_no_overlap_skips_confirm(ray_session):
    old = _ds(["p", "q"])
    new = _ds(["r", "s"], ids=[1, 2])
    kept, ndup = dedup_against(new, old, bits_log2=16)
    assert sorted(kept.to_pandas()["doc_id"]) == [1, 2]
    assert ndup == 0


def test_within_new_duplicates_are_not_dropped(ray_session):
    """Cross-snapshot dedup only: duplicates WITHIN the new snapshot are a
    separate (single-snapshot) op and must survive here."""
    old = _ds(["a"])
    new = _ds(["x", "x", "a"], ids=[1, 2, 3])
    kept, ndup = dedup_against(new, old, bits_log2=12)
    assert sorted(kept.to_pandas()["doc_id"]) == [1, 2]
    assert ndup == 1
