"""Incremental MinHash near-dup (ops/incneardup.py): band-index build +
cross-corpus candidate join, brute-force parity, empty sides, side caps."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.incneardup import (
    build_band_index,
    incremental_minhash_candidates,
)
from lucenenet_ray.ops.neardup import MinHashLSH


def _ds(texts, ids=None, parallelism=3):
    import ray.data as rd

    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
             .repartition(parallelism)


def _band_rows(texts, ids, num_perm=8, num_bands=4, shingle_k=3):
    """Driver-side reference: band keys per doc via the same MinHashLSH."""
    lsh = MinHashLSH(num_perm=num_perm, num_bands=num_bands,
                     shingle_k=shingle_k)
    t = lsh(pa.table({"doc_id": ids, "text": texts}))
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("band").to_pylist(),
                    t.column("band_key").to_pylist()))


def _brute_pairs(old_texts, old_ids, new_texts, new_ids, **kw):
    old = _band_rows(old_texts, old_ids, **kw)
    new = _band_rows(new_texts, new_ids, **kw)
    counts = {}
    for nd, nb, nk in new:
        for od, ob, ok in old:
            if nb == ob and nk == ok:
                counts[(nd, od)] = counts.get((nd, od), 0) + 1
    return sorted((n, o, c) for (n, o), c in counts.items())


CORPUS = [
    "the quick brown fox jumps over the lazy dog in the morning sun",
    "the quick brown fox jumps over the lazy dog in the morning rain",
    "completely unrelated text about distributed stream processing",
    "another entirely different document discussing arrow columnar data",
    "the quick brown fox jumps over the lazy dog in the morning sun",
]


def test_incremental_matches_bruteforce(ray_session, tmp_path):
    old_texts, old_ids = CORPUS[:3], [0, 2, 4]
    new_texts, new_ids = CORPUS[3:] + [CORPUS[0]], [1, 3, 5]
    out = str(tmp_path / "bands")
    build_band_index(_ds(old_texts, old_ids), out,
                     num_perm=8, num_bands=4, shingle_k=3)
    got = incremental_minhash_candidates(
        _ds(new_texts, new_ids), out,
        num_perm=8, num_bands=4, shingle_k=3)
    want = _brute_pairs(old_texts, old_ids, new_texts, new_ids,
                        num_perm=8, num_bands=4, shingle_k=3)
    assert list(zip(got.column("doc_new").to_pylist(),
                    got.column("doc_old").to_pylist(),
                    got.column("n_bands").to_pylist())) == want
    # the exact dup of doc 0 must be a full-band match
    full = {(n, o): c for n, o, c in want}
    assert full[(5, 0)] == 4
    assert got.schema.types == [pa.int64(), pa.int64(), pa.int64()]


def test_no_cross_pairs_and_no_within_side_pairs(ray_session, tmp_path):
    # old has an internal exact dup; new has an internal exact dup; no
    # cross similarity -> zero rows (within-side pairs never emitted)
    old = ["aaaa bbbb cccc dddd eeee", "aaaa bbbb cccc dddd eeee"]
    new = ["zzzz yyyy xxxx wwww vvvv", "zzzz yyyy xxxx wwww vvvv"]
    out = str(tmp_path / "bands")
    build_band_index(_ds(old, [0, 2]), out,
                     num_perm=8, num_bands=4, shingle_k=3)
    got = incremental_minhash_candidates(
        _ds(new, [1, 3]), out, num_perm=8, num_bands=4, shingle_k=3)
    assert got.num_rows == 0
    assert got.column_names == ["doc_new", "doc_old", "n_bands"]


def test_max_side_caps_star_groups(ray_session, tmp_path):
    # 6 identical old docs x 4 identical new docs, max_side=2 -> the
    # lowest 2 ids per side survive: 2x2 pairs, each with all 4 bands
    text = "identical boilerplate shingle payload repeated everywhere"
    old_ids = [0, 2, 4, 6, 8, 10]
    new_ids = [1, 3, 5, 7]
    out = str(tmp_path / "bands")
    build_band_index(_ds([text] * 6, old_ids), out,
                     num_perm=8, num_bands=4, shingle_k=3)
    got = incremental_minhash_candidates(
        _ds([text] * 4, new_ids), out,
        num_perm=8, num_bands=4, shingle_k=3, max_side=2)
    pairs = set(zip(got.column("doc_new").to_pylist(),
                    got.column("doc_old").to_pylist()))
    assert pairs == {(1, 0), (1, 2), (3, 0), (3, 2)}
    assert set(got.column("n_bands").to_pylist()) == {4}
