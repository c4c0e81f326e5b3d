"""Double Metaphone (analysis/dmetaphone.py): golden vectors and equality
fixtures from the reference test suite
(Tests.Analysis.Phonetic/Language/DoubleMetaphoneTest.cs:1063-1148)."""

import pytest

from lucenenet_ray.analysis.dmetaphone import double_metaphone as dm

PRIMARY = [("TSTN", "testing"), ("0", "The"), ("KK", "quick"),
           ("PRN", "brown"), ("FKS", "fox"), ("JMPT", "jumped"),
           ("AFR", "over"), ("0", "the"), ("LS", "lazy"), ("TKS", "dogs"),
           ("MKFR", "MacCafferey"), ("STFN", "Stephan"),
           ("KSSK", "Kuczewski"), ("MKLL", "McClelland"),
           ("SNHS", "san jose"), ("SNFP", "xenophobia")]

ALTERNATE = [("TSTN", "testing"), ("T", "The"), ("KK", "quick"),
             ("PRN", "brown"), ("FKS", "fox"), ("AMPT", "jumped"),
             ("AFR", "over"), ("T", "the"), ("LS", "lazy"), ("TKS", "dogs"),
             ("MKFR", "MacCafferey"), ("STFN", "Stephan"),
             ("KXFS", "Kutchefski"), ("MKLL", "McClelland"),
             ("SNHS", "san jose"), ("SNFP", "xenophobia"),
             ("FKR", "Fokker"), ("AK", "Joqqi"), ("HF", "Hovvi"),
             ("XRN", "Czerny")]

EQUAL_PAIRS = [("Case", "case"), ("CASE", "Case"), ("caSe", "cAsE"),
               ("cookie", "quick"), ("quick", "cookie"),
               ("Brian", "Bryan"), ("Auto", "Otto"), ("Steven", "Stefan"),
               ("Philipowitz", "Filipowicz")]


@pytest.mark.parametrize("expected,source", PRIMARY)
def test_primary_goldens(expected, source):
    assert dm(source) == expected


@pytest.mark.parametrize("expected,source", ALTERNATE)
def test_alternate_goldens(expected, source):
    assert dm(source, alternate=True) == expected


@pytest.mark.parametrize("a,b", EQUAL_PAIRS)
def test_equal_fixtures(a, b):
    assert dm(a) == dm(b)
    assert dm(a, alternate=True) == dm(b, alternate=True)


def test_jablonski_alternate_match():
    assert dm("Jablonski", alternate=True) == dm("Yablonsky", alternate=True)


def test_empty_and_maxlen():
    assert dm(None) is None and dm("") is None and dm(" \t\n ") is None
    # DoubleMetaphoneTest.cs:1123-1130 (SetMaxCodeLen)
    assert dm("jump", max_len=3) == "JMP"
    assert dm("jump", alternate=True, max_len=3) == "AMP"


def test_filter_integration():
    from lucenenet_ray.analysis.phonetic import phonetic_filter

    terms, pos = phonetic_filter(["testing", "the"], [0, 1],
                                 lambda t: dm(t) or "")
    assert terms == ["TSTN", "testing", "0", "the"]
    assert pos == [0, 0, 1, 1]
