"""NYSIIS (analysis/nysiis.py): reference test vectors
(Tests.Analysis.Phonetic/Language/NysiisTest.cs), strict and full."""

import pytest

from lucenenet_ray.analysis.nysiis import nysiis

FULL = [("MACINTOSH", "MCANT"), ("KNUTH", "NAT"), ("KOEHN", "CAN"),
        ("PHILLIPSON", "FALAPSAN"), ("PFEISTER", "FASTAR"),
        ("SCHOENHOEFT", "SANAFT"), ("MCKEE", "MCY"), ("MACKIE", "MCY"),
        ("HEITSCHMIDT", "HATSNAD"), ("BART", "BAD"), ("HURD", "HAD"),
        ("HUNT", "HAD"), ("WESTERLUND", "WASTARLAD"),
        ("CASSTEVENS", "CASTAFAN"), ("VASQUEZ", "VASG"),
        ("FRAZIER", "FRASAR"), ("BOWMAN", "BANAN"),
        ("MCKNIGHT", "MCNAGT"), ("RICKERT", "RACAD"), ("DEUTSCH", "DAT"),
        ("WESTPHAL", "WASTFAL"), ("SHRIVER", "SRAVAR"), ("KUHL", "CAL"),
        ("RAWSON", "RASAN"), ("JILES", "JAL"), ("CARRAWAY", "CARY"),
        ("YAMADA", "YANAD"), ("FUZZY", "FASY"), ("MACX", "MCX"),
        ("KNX", "NX"), ("KX", "CX"), ("PHX", "FX"), ("PFX", "FX"),
        ("SCHX", "SX"), ("XEE", "XY"), ("XIE", "XY"), ("XDT", "XD"),
        ("XRT", "XD"), ("XRD", "XD"), ("XNT", "XD"), ("XND", "XD"),
        ("XEV", "XAF"), ("XAX", "XAX"), ("XEX", "XAX"), ("XIX", "XAX"),
        ("XOX", "XAX"), ("XUX", "XAX")]

STRICT = [("Brian", "BRAN"), ("Brown", "BRAN"), ("Brun", "BRAN"),
          ("Capp", "CAP"), ("Cope", "CAP"), ("Copp", "CAP"),
          ("Kipp", "CAP"), ("Dent", "DAD"), ("Dane", "DAN"),
          ("Dean", "DAN"), ("Dionne", "DAN"), ("Phil", "FAL"),
          ("Schmidt", "SNAD"), ("Smith", "SNAT"), ("Schmit", "SNAT"),
          ("Kobwick", "CABWAC"), ("Kocher", "CACAR"), ("Fesca", "FASC"),
          ("Shom", "SAN"), ("Ohlo", "OL"), ("Uhu", "UH"), ("Um", "UN"),
          ("Trueman", "TRANAN"), ("Truman", "TRANAN")]


@pytest.mark.parametrize("src,expected", FULL)
def test_full_vectors(src, expected):
    assert nysiis(src, strict=False) == expected


@pytest.mark.parametrize("src,expected", STRICT)
def test_strict_vectors(src, expected):
    assert nysiis(src) == expected


def test_strict_truncates_to_six():
    assert nysiis("WESTERLUND") == "WASTAR"
    assert len(nysiis("PHILLIPSON")) == 6


def test_edges():
    assert nysiis(None) is None
    assert nysiis("") == ""
    assert nysiis("123") == ""
