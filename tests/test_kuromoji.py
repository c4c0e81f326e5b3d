"""Kuromoji analog: lattice Viterbi with connection costs.

Semantics under test (cited in analysis/kuromoji.py): path cost =
prev + connection(prevRightID, leftID) + wordCost
(JapaneseTokenizer.cs:312-339), search-mode decomposition penalties
(:71-77, ComputePenalty :285-307), unknown single-char fallback, BOS/EOS
connection edges.
"""

import itertools

import numpy as np
import pytest

from lucenenet_ray.analysis.kuromoji import (
    UNKNOWN_ID, UNKNOWN_WORD_COST, JapaneseLatticeTokenizer, MecabDict,
    _penalty,
)
from lucenenet_ray.sources.kuromoji import (
    N_DOCS, build_dict, raw_word_indices, vocab_word,
)


def brute_force(sent, dic, search_mode=False):
    """Exhaustive minimum over all tokenizations (dict words or single
    chars), scored with the exact BOS..EOS cost chain."""
    entries = dic.entries

    def splits(s):
        if not s:
            yield []
            return
        for l in range(1, len(s) + 1):
            tok = s[:l]
            if tok in entries or l == 1:
                for rest in splits(s[l:]):
                    yield [tok] + rest

    def cost(toks):
        total, rid = 0, 0
        for w in toks:
            wcost, left, right = entries.get(
                w, (UNKNOWN_WORD_COST, UNKNOWN_ID, UNKNOWN_ID))
            total += int(dic.conn[rid, left]) + wcost
            total += _penalty(w, dic.kanji_pred, search_mode)
            rid = right
        return total + int(dic.conn[rid, 0])

    return min(splits(sent), key=cost), cost


def simple_dict(entries, n_ids=4, conn=None):
    if conn is None:
        conn = np.zeros((n_ids, n_ids), dtype=np.int64)
    return MecabDict(entries, conn)


def test_recovers_true_segmentation_whole_corpus():
    dic = build_dict()
    tok = JapaneseLatticeTokenizer(dic)
    for d in range(N_DOCS):
        truth = [vocab_word(i) for i in raw_word_indices(d)]
        assert tok.tokenize("".join(truth)) == truth


def test_word_cost_picks_cheaper_path():
    # "abc": [abc] cost 100 vs [ab,c] cost 10+10=20 -> split wins
    dic = simple_dict({"abc": (100, 1, 1), "ab": (10, 1, 1),
                       "c": (10, 1, 1)})
    assert JapaneseLatticeTokenizer(dic).tokenize("abc") == ["ab", "c"]


def test_connection_cost_matters():
    # equal word costs; conn(right(ab)=2, left(c)=3) huge vs
    # conn(right(a)=1, left(bc)=3) zero -> [a, bc]
    conn = np.zeros((4, 4), dtype=np.int64)
    conn[2, 3] = 5000
    dic = simple_dict({"ab": (10, 3, 2), "bc": (10, 3, 1),
                       "a": (10, 3, 1), "c": (10, 3, 1)}, conn=conn)
    got = JapaneseLatticeTokenizer(dic).tokenize("abc")
    best, _ = brute_force("abc", dic)
    assert got == best == ["a", "bc"]


def test_search_mode_splits_long_kanji_compound():
    # 4-kanji compound: normal mode keeps it (cheapest word), search mode
    # pays (4-2)*3000 penalty and splits into the two 2-kanji words
    w = "一丁丂七"
    dic = simple_dict({w: (100, 1, 1),
                       w[:2]: (2000, 1, 1), w[2:]: (2000, 1, 1)})
    assert JapaneseLatticeTokenizer(dic).tokenize(w) == [w]
    assert JapaneseLatticeTokenizer(dic, search_mode=True).tokenize(w) \
        == [w[:2], w[2:]]


def test_search_mode_penalty_values():
    kanji = lambda c: 0x4E00 <= ord(c) <= 0x9FFF
    assert _penalty("一丁丂", kanji, True) == 3000
    assert _penalty("一丁", kanji, True) == 0
    assert _penalty("abcdefgh", kanji, True) == 1700
    assert _penalty("abcdefg", kanji, True) == 0
    assert _penalty("一丁丂", kanji, False) == 0


def test_unknown_chars_single_tokens():
    dic = simple_dict({"ab": (10, 1, 1)})
    assert JapaneseLatticeTokenizer(dic).tokenize("xaby") == ["x", "ab", "y"]
    assert JapaneseLatticeTokenizer(dic).tokenize("") == []


def test_matches_brute_force_randomized():
    from lucenenet_ray.ops.neardup import md5_int31

    alpha = "abcd"
    for trial in range(30):
        entries = {}
        for w in ("ab", "bc", "cd", "abc", "a", "d"):
            if md5_int31(f"kjt-{trial}-{w}") % 4:
                entries[w] = (100 + md5_int31(f"kjtc-{trial}-{w}") % 900,
                              1 + md5_int31(f"kjtl-{trial}-{w}") % 3,
                              1 + md5_int31(f"kjtr-{trial}-{w}") % 3)
        conn = np.array([[md5_int31(f"kjtm-{trial}-{r}-{l}") % 300
                          for l in range(4)] for r in range(4)],
                        dtype=np.int64)
        dic = MecabDict(entries, conn)
        sent = "".join(alpha[md5_int31(f"kjts-{trial}-{k}") % 4]
                       for k in range(6))
        got = JapaneseLatticeTokenizer(dic).tokenize(sent)
        best, cost = brute_force(sent, dic)
        assert "".join(got) == sent
        assert cost(got) == cost(best)
