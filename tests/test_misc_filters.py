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
