"""SlowFuzzyQuery / FuzzyLikeThisQuery semantics (ops/slowfuzzy.py)."""

import numpy as np
import pytest


def _lev_ref(a: str, b: str) -> int:
    """Plain-int Levenshtein for cross-checking the vectorized DP."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_matches_reference():
    from lucenenet_ray.ops.slowfuzzy import levenshtein_batch

    import random

    rng = random.Random(7)
    words = ["", "a", "sort", "sorted", "assort", "tros", "windows",
             "中文词", "mergesort"]
    words += ["".join(rng.choice("abcde") for _ in range(rng.randrange(1, 9)))
              for _ in range(100)]
    probe = "sort"
    got = levenshtein_batch(words, probe)
    assert got.tolist() == [_lev_ref(w, probe) for w in words]


def test_slow_fuzzy_boost_ramp(ray_session, documents_index):
    import os

    from lucenenet_ray.ops.slowfuzzy import slow_fuzzy_terms

    path, _m = documents_index
    t = slow_fuzzy_terms(os.path.join(path, "termstats"), "sort", 0.2)
    terms = t.column("term").to_pylist()
    boosts = dict(zip(terms, t.column("boost").to_pylist()))
    assert "sort" in terms
    assert boosts["sort"] == 1.0  # exact match → top of the ramp
    # every accepted term satisfies the strict similarity bound
    for term, b in boosts.items():
        sim = np.float32(1.0) - np.float32(_lev_ref(term, "sort")) \
            / np.float32(min(len(term), 4))
        assert sim > np.float32(0.2)
        exp = (sim - np.float32(0.2)) * (np.float32(1.0)
                                         / (np.float32(1.0) - np.float32(0.2)))
        assert np.float32(b) == exp


def test_fuzzy_like_this_shared_idf(ray_session, documents_index):
    import math
    import os

    from lucenenet_ray.ops.slowfuzzy import fuzzy_like_this, slow_fuzzy_terms
    from lucenenet_ray.search.reader import IndexReader

    path, _m = documents_index
    r = IndexReader(path)
    ts = os.path.join(path, "termstats")
    out = fuzzy_like_this(ts, ["sort"], r.num_docs, 0.2, max_num_terms=50)
    variants = slow_fuzzy_terms(ts, "sort", 0.2)
    vt = variants.column("term").to_pylist()
    df_src = int(variants.column("df")
                 .to_numpy()[vt.index("sort")])
    idf = np.float32(math.log(r.num_docs / float(df_src + 1)) + 1.0)
    got = dict(zip(out.column("term").to_pylist(),
                   out.column("score").to_pylist()))
    boosts = dict(zip(vt, variants.column("boost").to_pylist()))
    for term, s in got.items():
        b = np.float32(boosts[term])
        assert np.float32(s) == (b * b) * idf
    # exact source term ranks first (boost 1 → score == idf)
    assert out.column("term")[0].as_py() == "sort"
    assert np.float32(out.column("score")[0].as_py()) == idf
