"""Winnowing fingerprints + Aho-Corasick blocklist scan."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.ahocorasick import AhoCorasick, blocklist_scan
from lucenenet_ray.ops.neardup import md5_int31
from lucenenet_ray.ops.winnow import (WINNOW_K, WINNOW_W,
                                      _doc_fingerprints, winnow_stats)


def _ds(texts, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})) \
        .repartition(parallelism)


def _brute_fps(tokens, k=WINNOW_K, w=WINNOW_W):
    """Independent winnowing reference: per window, rightmost min."""
    m = len(tokens) - k + 1
    if m < w:
        return set()
    h = [md5_int31(" ".join(tokens[i:i + k])) for i in range(m)]
    sel = set()
    for j in range(m - w + 1):
        window = h[j:j + w]
        mn = min(window)
        p = max(i for i in range(j, j + w) if h[i] == mn)
        sel.add((p + 1, h[p]))
    return sel


def test_fingerprints_match_bruteforce():
    toks = ("the quick brown fox jumps over the quick brown dog and "
            "the quick brown fox returns").split()
    pos, hs = _doc_fingerprints(toks)
    assert set(zip(pos.tolist(), hs.tolist())) == _brute_fps(toks)


def test_winnow_guarantee_shared_substring(ray_session):
    # docs sharing a substring of >= k + w - 1 tokens share a fingerprint
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = k + w - 1
    t = winnow_stats(_ds([f"xx yy {shared} zz",
                          f"aa bb cc {shared}",
                          "totally different words everywhere here now ok"],
                         parallelism=3))
    n_shared = t.column("n_shared_fp").to_pylist()
    assert n_shared[0] >= 1 and n_shared[1] >= 1 and n_shared[2] == 0
    # every doc appears, zeros included, doc_id-sorted
    assert t.column("doc_id").to_pylist() == [0, 1, 2]


def test_winnow_short_doc_zeroes(ray_session):
    t = winnow_stats(_ds(["a b c", "x"], parallelism=2))
    assert t.column("n_fp").to_pylist() == [0, 0]


def test_ac_overlapping_outputs():
    ac = AhoCorasick(("the", "he", "aa"))
    c = np.zeros(3, dtype=np.int64)
    ac.count("the theirs aaa", c)
    # the: 'the','theirs'; he: inside both; aa: 2 overlapping in 'aaa'
    assert dict(zip(ac.patterns, c.tolist())) == {
        "the": 2, "he": 2, "aa": 2}


def test_ac_matches_naive_positional(ray_session):
    pats = ("ab", "ba", "aba", "b")
    texts = ["ababab", "bbbb", "no hits here"]

    def naive(p, s):
        return sum(1 for i in range(len(s)) if s[i:i + len(p)] == p)

    t = blocklist_scan(_ds(texts, parallelism=3), pats)
    got = {p: (d, o) for p, d, o in zip(
        t.column("pattern").to_pylist(),
        t.column("n_docs").to_pylist(),
        t.column("n_occurrences").to_pylist())}
    for p in pats:
        occ = sum(naive(p, s) for s in texts)
        nd = sum(1 for s in texts if naive(p, s) > 0)
        assert got[p] == (nd, occ), p
    # 'no hits here' contributes nothing anywhere except none
    assert got["ab"] == (1, 3) and got["aba"] == (1, 2)
