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


def test_unsupported_directives_raise():
    with pytest.raises(NotImplementedError):
        HunspellDictionary("ICONV 1\nICONV a b\n", "1\nfoo\n")


def test_unique_stems():
    s = load("simple.aff", "simple.dic")
    assert s.unique_stems("foo") == ["foo"]
