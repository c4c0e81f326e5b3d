"""Misc filter family vs reference test vectors
(TestPathHierarchyTokenizer.cs, TestElision.cs, TestReverseStringFilter.cs,
TestKeepWordFilter.cs, TestTrimFilter/TestTruncateTokenFilter.cs)."""

import pytest

from lucenenet_ray.analysis.misc_filters import (
    codepoint_count_keep,
    elision,
    keep_words,
    path_hierarchy_tokenize,
    reverse_string,
    truncate_tokens,
)


@pytest.mark.parametrize("path,toks,incs", [
    ("/a/b/c", ["/a", "/a/b", "/a/b/c"], [1, 0, 0]),
    ("/a/b/c/", ["/a", "/a/b", "/a/b/c", "/a/b/c/"], [1, 0, 0, 0]),
    ("a/b/c", ["a", "a/b", "a/b/c"], [1, 0, 0]),
    ("a/b/c/", ["a", "a/b", "a/b/c", "a/b/c/"], [1, 0, 0, 0]),
    ("/", ["/"], [1]),
    ("//", ["/", "//"], [1, 0]),
    ("", [], []),
])
def test_path_hierarchy_basic(path, toks, incs):
    t, p = path_hierarchy_tokenize(path)
    assert t == toks and p == incs


def test_path_hierarchy_replace():
    t, _ = path_hierarchy_tokenize("/a/b/c", "/", "\\")
    assert t == ["\\a", "\\a\\b", "\\a\\b\\c"]
    t, _ = path_hierarchy_tokenize("c:\\a\\b\\c", "\\", "\\")
    assert t == ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]


@pytest.mark.parametrize("path,skip,toks", [
    ("/a/b/c", 1, ["/b", "/b/c"]),
    ("/a/b/c/", 1, ["/b", "/b/c", "/b/c/"]),
    ("a/b/c", 1, ["/b", "/b/c"]),
    ("a/b/c/", 1, ["/b", "/b/c", "/b/c/"]),
    ("/", 1, []),
    ("//", 1, ["/"]),
])
def test_path_hierarchy_skip(path, skip, toks):
    t, _ = path_hierarchy_tokenize(path, skip=skip)
    assert t == toks


@pytest.mark.parametrize("term,want", [
    ("l'avion", "avion"),
    ("d'avion", "avion"),
    ("j'aime", "aime"),
    ("qu'il", "il"),
    ("l\u2019avion", "avion"),   # right single quote
    ("avion", "avion"),
    ("xx'yy", "xx'yy"),          # 'xx' is not an article
    ("l'", ""),                  # article + apostrophe, empty remainder
])
def test_elision(term, want):
    assert elision(term) == want


def test_reverse():
    assert reverse_string("hello") == "olleh"
    assert reverse_string("") == ""


def test_keep_words_holes():
    # TestKeepWordFilter.cs: "aaa BBB" keep {aaa, bbb} case-sensitive
    t, p = keep_words(["aaa", "bbb", "ccc", "aaa"], [0, 1, 2, 3],
                      frozenset({"aaa", "bbb"}))
    assert t == ["aaa", "bbb", "aaa"]
    assert p == [0, 1, 3]        # 'ccc' leaves a position hole


def test_truncate():
    assert truncate_tokens(["abcdefg", "abc", ""], 3) == ["abc", "abc", ""]


def test_codepoint_count():
    t, p = codepoint_count_keep(["a", "ab", "abc", "abcd"], [0, 1, 2, 3],
                                2, 3)
    assert t == ["ab", "abc"] and p == [1, 2]


@pytest.mark.parametrize("w,want", [
    # TestScandinavianFoldingFilter.cs vectors
    ("aeäaeeea", "aaaeea"), ("aeäaeeeae", "aaaeea"), ("aeaeeeae", "aaeea"),
    ("bøen", "boen"), ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("räksmörgås", "raksmorgas"), ("ræksmørgås", "raksmorgas"),
    ("raeksmoergaas", "raksmorgas"), ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
    ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
    ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
])
def test_scandinavian_fold(w, want):
    from lucenenet_ray.analysis.misc_filters import scandinavian_fold

    assert scandinavian_fold(w) == want


@pytest.mark.parametrize("w,want", [
    # TestScandinavianNormalizationFilter.cs shapes
    ("aa", "å"), ("ao", "å"), ("ae", "æ"), ("oe", "ø"), ("oo", "ø"),
    ("ä", "æ"), ("ö", "ø"), ("Ä", "Æ"), ("Ö", "Ø"),
    ("blaabaersyltetoej", "blåbærsyltetøj"),
    ("plain", "plain"),
])
def test_scandinavian_normalize(w, want):
    from lucenenet_ray.analysis.misc_filters import scandinavian_normalize

    assert scandinavian_normalize(w) == want


def test_hyphenated_words():
    from lucenenet_ray.analysis.misc_filters import hyphenated_words

    # TestHyphenatedWordsFilter.cs shape: line-broken hyphens rejoined
    assert hyphenated_words(
        ["ecologi-", "cal", "devel-", "op", "comment"]) == \
        ["ecological", "develop", "comment"]
    # trailing unclosed hyphen keeps the dash
    assert hyphenated_words(["abc-"]) == ["abc-"]
    assert hyphenated_words(["multi-", "part-", "word"]) == \
        ["multipartword"]


def test_apostrophe_filter():
    from lucenenet_ray.analysis.misc_filters import apostrophe_filter

    assert apostrophe_filter("türkiye'nin") == "türkiye"
    assert apostrophe_filter("ankara’ya") == "ankara"
    assert apostrophe_filter("plain") == "plain"


def test_pattern_replace():
    from lucenenet_ray.analysis.misc_filters import pattern_replace

    assert pattern_replace(["aabbaa"], "a+", "x") == ["xbbx"]
    assert pattern_replace(["aabbaa"], "a+", "x", replace_all=False) == \
        ["xbbaa"]


def test_remove_duplicates():
    from lucenenet_ray.analysis.misc_filters import remove_duplicates

    t, p = remove_duplicates(["a", "a", "b", "a"], [0, 0, 1, 2])
    assert t == ["a", "b", "a"] and p == [0, 1, 2]


# -- PatternCaptureGroupTokenFilter ------------------------------------------
# vectors: Tests.Analysis.Common/Analysis/Pattern/
# TestPatternCaptureGroupTokenFilter.cs (token arrays + posIncrements)


def _pcg(text, patterns, preserve):
    from lucenenet_ray.analysis.misc_filters import pattern_capture_group

    terms = text.split(" ")
    pos = list(range(len(terms)))
    return pattern_capture_group(terms, pos, patterns, preserve)


def test_pattern_capture_no_pattern_and_no_match():
    assert _pcg("foobarbaz", [], False) == (["foobarbaz"], [0])
    assert _pcg("foobarbaz", [], True) == (["foobarbaz"], [0])
    assert _pcg("foo bar baz", ["xx"], False) == (
        ["foo", "bar", "baz"], [0, 1, 2])
    # no capture group in the pattern → nothing captured
    assert _pcg("foobarbaz", [".."], True) == (["foobarbaz"], [0])
    # empty-only captures skipped
    assert _pcg("foobarbaz", [".(y*)"], False) == (["foobarbaz"], [0])


def test_pattern_capture_whole_token():
    # non-preserve: whole-token capture replaces the original (same text)
    assert _pcg("foobarbaz", ["(.+)"], False) == (["foobarbaz"], [0])
    # preserve: whole-token capture skipped, original kept once
    assert _pcg("foobarbaz", ["(.+)"], True) == (["foobarbaz"], [0])


def test_pattern_capture_single_group():
    assert _pcg("foobarbaz", ["^(.)"], False) == (["f"], [0])
    assert _pcg("foobarbaz", ["^(.)"], True) == (["foobarbaz", "f"], [0, 0])
    assert _pcg("foo bar baz", ["^(.)"], False) == (
        ["f", "b", "b"], [0, 1, 2])
    assert _pcg("foo bar baz", ["^(.)"], True) == (
        ["foo", "f", "bar", "b", "baz", "b"], [0, 0, 1, 1, 2, 2])
    assert _pcg("foo bar baz", ["(.)$"], False) == (
        ["o", "r", "z"], [0, 1, 2])


def test_pattern_capture_multi_group_order():
    assert _pcg("foobarbaz", ["^(.)(.)"], False) == (["f", "o"], [0, 0])
    assert _pcg("foobarbaz", ["^(.)(.)"], True) == (
        ["foobarbaz", "f", "o"], [0, 0, 0])
    assert _pcg("foobarbaz", ["^(.).+(.)$"], False) == (["f", "z"], [0, 0])
    # nested groups iterate by group INDEX within each match
    assert _pcg("foobarbaz", ["(.(.(.)))"], False) == (
        ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
        [0] * 9)
    assert _pcg("foobarbaz", ["(.(.(.)))"], True) == (
        ["foobarbaz", "foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"],
        [0] * 10)


def test_pattern_capture_multiple_patterns_min_offset_merge():
    # streams merge by current candidate start offset across patterns
    assert _pcg("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"], False) == (
        ["aaa", "bbb", "aaa"], [0, 0, 0])
    assert _pcg("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"], True) == (
        ["aaabbbaaa", "aaa", "bbb", "aaa"], [0, 0, 0, 0])


def test_pattern_capture_camel_case():
    pats = [
        "([A-Z]{2,})",
        "(?<![A-Z])([A-Z][a-z]+)",
        "(?:^|\\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
        "([0-9]+)",
    ]
    t, p = _pcg("letsPartyLIKEits1999_dude", pats, False)
    assert t == ["lets", "Party", "LIKE", "its", "1999", "dude"]
