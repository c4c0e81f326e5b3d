"""Liang hyphenation + compound filter (analysis/hyphenation.py).

Cited semantics: SearchPatterns max-competition (HyphenationTree.cs:
302-327), odd-value points within [remain, len-push] (:497-537),
Decompose loops + genitive fallback + onlyLongestMatch
(HyphenationCompoundWordTokenFilter.cs:197-287), minWordSize pass-through
(CompoundWordTokenFilterBase.cs:108-142).
"""

from lucenenet_ray.analysis.hyphenation import (
    HyphenationCompoundFilter, HyphenationTree,
)


def tree(pats):
    return HyphenationTree(pats)


def test_pattern_max_competition():
    # "1b" says hyphen before b; "a2b" (even, higher) suppresses it after a
    t = tree(["a", "b", "c", "1b", "a2b"])
    assert t.hyphenate("cbc") == [0, 1, 3]
    assert t.hyphenate("abc") is None        # 2 beats 1, even -> no point
    assert t.hyphenate("cab") is None        # a2b applies at ab too


def test_dot_anchored_patterns():
    # ".c1a": only when word STARTS with c is there a point before a
    t = tree(["a", "b", "c", ".c1a"])
    assert t.hyphenate("cab") == [0, 1, 3]
    assert t.hyphenate("bca") is None


def test_remain_push_window():
    # points at i=1..len-1 only: "1a" can never produce point 0 or len
    t = tree(["a", "1a"])
    assert t.hyphenate("aa") == [0, 1, 2]
    assert t.hyphenate("a") is None


def test_unknown_letter_rejects():
    t = tree(["a", "1a"])
    assert t.hyphenate("aXa") is None


def test_decompose_dictionary_and_min_word():
    t = tree(list("abcdefgh") + ["1e"])
    dic = {"abcd", "efgh"}
    f = HyphenationCompoundFilter(t, dic)
    assert f.decompose("abcdefgh") == ["abcd", "efgh"]
    # below minWordSize(5): original only, no decomposition
    assert f(["abcd"]) == ["abcd"]
    # original passes through, subwords appended
    assert f(["abcdefgh"]) == ["abcdefgh", "abcd", "efgh"]


def test_genitive_fallback_part_minus_one():
    # part "abcds" not in dict, but "abcd" (one shorter) is -> emitted
    t = tree(list("abcdefgs") + ["1e"])
    dic = {"abcds"[:-1], "efg"}  # {"abcd", "efg"}
    f = HyphenationCompoundFilter(t, dic, min_subword_size=2)
    # word "abcdsefg": points before 'e' -> parts "abcds" (fallback
    # emits "abcd") and "efg"
    assert f.decompose("abcdsefg") == ["abcd", "efg"]


def test_only_longest_match():
    t = tree(list("abcdef") + ["1c", "1e"])
    dic = {"ab", "abcd", "ef", "cd"}
    f = HyphenationCompoundFilter(t, dic, only_longest_match=True)
    # points [0,2,4,6]; from 0: "ab" and "abcd" both in dict -> longest
    assert f.decompose("abcdef") == ["abcd", "cd", "ef"]


def test_subword_size_bounds():
    t = tree(list("abcdef") + ["1c", "1e"])
    dic = {"ab", "cd", "ef", "abcd"}
    f = HyphenationCompoundFilter(t, dic, min_subword_size=3,
                                  max_subword_size=3)
    # every 2-char part below min; 4-char above max -> nothing
    assert f.decompose("abcdef") == []
