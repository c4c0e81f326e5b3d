"""Original Metaphone (analysis/metaphone.py): golden vectors and
equality fixtures from the reference test suite
(Tests.Analysis.Phonetic/Language/MetaphoneTest.cs:60-500)."""

import pytest

from lucenenet_ray.analysis.metaphone import metaphone as m

GOLDENS = [
    ("HL", "howl"), ("TSTN", "testing"), ("0", "The"), ("KK", "quick"),
    ("BRN", "brown"), ("FKS", "fox"), ("JMPT", "jumped"), ("OFR", "over"),
    ("0", "the"), ("LS", "lazy"), ("TKS", "dogs"), ("KM", "COMB"),
    ("TM", "TOMB"), ("WM", "WOMB"), ("SNS", "SCIENCE"), ("SN", "SCENE"),
    ("S", "SCY"), ("", "WHY"), ("XP", "CIAPO"), ("SKTL", "SCHEDULE"),
    ("SKMT", "SCHEMATIC"), ("KRKT", "CHARACTER"), ("TX", "TEACH"),
    ("TJ", "DODGY"), ("TJ", "DODGE"), ("AJMT", "ADGIEMTI"),
    ("KNT", "GHENT"), ("B", "BAUGH"), ("N", "GNU"), ("SNT", "SIGNED"),
    ("FX", "PHISH"), ("XT", "SHOT"), ("OTXN", "ODSIAN"),
    ("PLXN", "PULSION"), ("OX", "OTIA"), ("PRXN", "PORTION"),
    ("RX", "RETCH"), ("WX", "WATCH"), ("AKSK", "AXEAXE"),
]

EQUAL_PAIRS = [("Case", "case"), ("CASE", "Case"), ("caSe", "cAsE"),
               ("quick", "cookie"), ("Lawrence", "Lorenza"),
               ("Gary", "Cahra"), ("Aero", "Eure")]


@pytest.mark.parametrize("expected,source", GOLDENS)
def test_goldens(expected, source):
    assert m(source) == expected


@pytest.mark.parametrize("a,b", EQUAL_PAIRS)
def test_equal_pairs(a, b):
    assert m(a) == m(b)


def test_white_cluster():
    """Initial-WH rewrite: all of the reference's White matches encode WT."""
    for x in ("Wade", "Wait", "Waite", "Wat", "Whit", "Wiatt", "Wit",
              "Wittie", "Witty", "Wood", "Woodie", "Woody"):
        assert m(x) == m("White") == "WT"


def test_max_code_len_truncation():
    assert m("AXEAXEAXE", max_code_len=6) == "AKSKSK"
    assert m("") == "" and m(None) == ""
    assert m("a") == "A"
