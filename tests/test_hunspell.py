"""Hunspell subset (analysis/hunspell.py) vs the reference test
dictionaries and expectations (Tests.Analysis.Common/Analysis/Hunspell:
TestStemmer, TestCondition, TestTwoSuffixes, TestCircumfix,
TestCaseInsensitive)."""

import pytest

from lucenenet_ray.analysis.hunspell import (
    HunspellDictionary,
    HunspellStemmer,
)

BASE = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/"
        "Analysis/Hunspell/")


def load(aff, dic, ic=False):
    return HunspellStemmer(HunspellDictionary(
        open(BASE + aff).read(), open(BASE + dic).read(), ignore_case=ic))


SIMPLE = [
    ("lucene", ["lucene", "lucen"]), ("mahoute", ["mahout"]),
    ("solr", ["olr"]), ("abcd", []), ("ab", ["ab"]), ("abc", ["ab"]),
    ("apach", ["apach"]), ("apache", ["apach"]),
    ("foo", ["foo", "foo"]),       # two homonym dict entries
    ("food", ["foo"]), ("foos", ["foo"]), ("lucen", ["lucen"]),
    ("mahout", ["mahout"]), ("moo", ["moo"]), ("mood", ["moo"]),
    ("olr", ["olr"]),
    # bogus forms must NOT stem
    ("abs", []), ("abe", []), ("sab", []), ("sapach", []),
    ("sapache", []), ("apachee", []), ("sfoo", []), ("sfoos", []),
    ("fooss", []), ("lucenee", []), ("solre", []),
]


@pytest.mark.parametrize("w,want", SIMPLE)
def test_simple(w, want):
    s = load("simple.aff", "simple.dic")
    assert sorted(s.stem(w)) == sorted(want)


@pytest.mark.parametrize("w,want", [
    ("hello", ["hello"]), ("try", ["try"]), ("tried", ["try"]),
    ("work", ["work"]), ("worked", ["work"]), ("rework", ["work"]),
    ("reworked", ["work"]), ("retried", []), ("workied", []),
    ("tryed", []), ("tryied", []), ("helloed", []),
])
def test_condition(w, want):
    s = load("condition.aff", "condition.dic")
    assert sorted(s.stem(w)) == sorted(want)


@pytest.mark.parametrize("w,want", [
    ("drink", ["drink"]), ("drinkable", ["drink"]),
    ("drinks", ["drink"]), ("drinkableable", []), ("drinkss", []),
])
def test_two_suffix_blocks_same_flag(w, want):
    s = load("twosuffixes.aff", "twosuffixes.dic")
    assert sorted(s.stem(w)) == sorted(want)


@pytest.mark.parametrize("w,want", [
    ("nagy", ["nagy"]), ("nagyobb", ["nagy"]),
    ("legnagyobb", ["nagy"]), ("legeslegnagyobb", ["nagy"]),
    ("nagyobbobb", []), ("legnagy", []), ("legeslegnagy", []),
])
def test_circumfix(w, want):
    s = load("circumfix.aff", "circumfix.dic")
    assert sorted(s.stem(w)) == sorted(want)


@pytest.mark.parametrize("w,want", [
    ("lucene", ["lucene", "lucen"]), ("LuCeNe", ["lucene", "lucen"]),
    ("mahoute", ["mahout"]), ("MaHoUte", ["mahout"]), ("solr", ["olr"]),
    ("abcd", []), ("foo", ["foo", "foo"]), ("food", ["foo"]),
])
def test_case_insensitive(w, want):
    s = load("simple.aff", "mixedcase.dic", ic=True)
    assert sorted(s.stem(w)) == sorted(want)


CONV = [
    # TestConv.cs:31-38 — ICONV maps input A/B/C/I to lowercase before
    # lookup; OCONV maps a/b/c/i back to uppercase in output stems
    ("drink", ["drInk"]), ("drInk", ["drInk"]),
    ("drInkAble", ["drInk"]), ("drInkABle", ["drInk"]),
    ("drinkABle", ["drInk"]),
]


@pytest.mark.parametrize("w,want", CONV)
def test_iconv_oconv(w, want):
    s = load("conv.aff", "conv.dic")
    assert sorted(s.stem(w)) == sorted(want)


def test_af_flag_aliases():
    """TestDictionary.TestCompressedDictionary semantics at the stemmer
    level: compressed.aff's AF table maps numeric dic flag parts to long
    flags (ab/3 → CC), so SFX CC strips apply."""
    s = load("compressed.aff", "compressed.dic")
    assert "ab" in s.stem("abc")          # SFX CC '0 c b' on ab/3
    assert "foo" in s.stem("foos")        # foo/4 → DD: strip s after o
    assert "foo" in s.stem("food")        # foo/5 → EE: strip d after o
    assert s.stem("foosd") == []          # DD and EE don't chain
    assert "lucen" in s.stem("lucene")    # lucen/1 → AA: e after n


IGNORE = [
    # TestIgnore.cs:33-39 — ' and - stripped from dic words and tokens
    ("drink", ["drink"]), ("drinkable", ["drink"]),
    ("dr'ink-able", ["drink"]), ("drank-able", ["drank"]),
    ("'-'-'-", []),
]


@pytest.mark.parametrize("w,want", IGNORE)
def test_ignore_chars(w, want):
    s = load("ignore.aff", "ignore.dic")
    assert sorted(s.stem(w)) == sorted(want)


def test_unique_stems():
    s = load("simple.aff", "simple.dic")
    assert s.unique_stems("foo") == ["foo"]


ESCAPED = [
    # TestEscaped.cs:33-40
    ("works", ["work"]), ("work", ["work"]),
    ("R2/D2", ["R2/D2"]), ("R2/D2s", ["R2/D2"]),
    ("N/A", ["N/A"]), ("N/As", []),
]


@pytest.mark.parametrize("w,want", ESCAPED)
def test_escaped_entries(w, want):
    s = load("escaped.aff", "escaped.dic")
    assert sorted(s.stem(w)) == sorted(want)
