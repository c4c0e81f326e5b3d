"""Gopher repetition rules (ops/gopher_rep.py) vs a naive model."""

import collections

from lucenenet_ray.ops.gopher_rep import _doc_stats


def _naive(tokens):
    tops = []
    for n in (2, 3, 4):
        grams = [" ".join(tokens[i:i + n])
                 for i in range(len(tokens) - n + 1)]
        if not grams:
            tops.append(0)
            continue
        c = collections.Counter(grams)
        mx = max(c.values())
        best = min(g for g, v in c.items() if v == mx)
        tops.append(mx * len(best))
    g5 = [" ".join(tokens[i:i + 5]) for i in range(len(tokens) - 4)]
    c5 = collections.Counter(g5)
    covered = set()
    for i, g in enumerate(g5):
        if c5[g] >= 2:
            covered.update(range(i, i + 5))
    return tops[0], tops[1], tops[2], len(covered)


def test_matches_naive():
    cases = [
        "a b a b a b c".split(" "),
        "x y z x y z x y z q".split(" "),          # dup 5-grams overlap
        "one two three".split(" "),                 # shorter than 4/5
        "w".split(" "),
        "a a a a a a a a".split(" "),                # total self-repetition
        "p q r s t p q r s t u p q r s t".split(" "),
    ]
    for toks in cases:
        assert _doc_stats(toks) == _naive(toks), toks


def test_tiebreak_lexicographic():
    # "b c" and "a z" both occur twice; modal pick must be "a z"
    toks = "a z b c a z b c".split(" ")
    t2 = _doc_stats(toks)[0]
    assert t2 == 2 * len("a z")
