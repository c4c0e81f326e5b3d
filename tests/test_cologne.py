"""Kölner Phonetik + Match Rating Approach (analysis/cologne.py):
reference test vectors
(Tests.Analysis.Phonetic/Language/ColognePhoneticTest.cs /
MatchRatingApproachEncoderTest.cs)."""

import pytest

from lucenenet_ray.analysis.cologne import (cologne_phonetic,
                                            match_rating_encode)

COLOGNE = [("a", "0"), ("e", "0"), ("i", "0"), ("o", "0"), ("u", "0"),
           ("aa", "0"), ("ha", "0"), ("aha", "0"), ("b", "1"), ("p", "1"),
           ("ph", "3"), ("f", "3"), ("v", "3"), ("w", "3"), ("g", "4"),
           ("k", "4"), ("q", "4"), ("x", "48"), ("ax", "048"),
           ("cx", "48"), ("l", "5"), ("cl", "45"), ("acl", "085"),
           ("mn", "6"), ("r", "7"), ("schmidt", "862"),
           ("schneider", "8627"), ("fischer", "387"), ("weber", "317"),
           ("wagner", "3467"), ("becker", "147"), ("hoffmann", "0366"),
           ("Breschnew", "17863"), ("Wikipedia", "3412"), ("peter", "127"),
           ("pharma", "376"), ("deutsch", "28"), ("deutz", "28"),
           ("hamburg", "06174"), ("hannover", "0637"),
           ("christstollen", "478256"), ("Xanthippe", "48621"),
           ("Zacharias", "8478"), ("Holzbau", "0581"), ("matsch", "68"),
           ("matz", "68"), ("Arbeitsamt", "071862"),
           ("Eberhard", "01772"), ("Eberhardt", "01772"),
           ("heithabu", "021"), ("bergisch-gladbach", "174845214"),
           ("Müller-Lüdenscheidt", "65752682")]


@pytest.mark.parametrize("src,expected", COLOGNE)
def test_cologne_vectors(src, expected):
    assert cologne_phonetic(src) == expected


def test_cologne_equal_names():
    # the classic Meyer/Mayr family all share a code
    codes = {cologne_phonetic(n) for n in
             ("Meier", "Maier", "Mayer", "Mayr", "Meir", "Meyer", "Meyr")}
    assert len(codes) == 1


MRA = [("HARPER", "HRPR"), ("Smith", "SMTH"), ("Smyth", "SMYTH"),
       ("Alexzander", "ALXNDR"), ("BUBBLE", "BBL"),
       ("MISSISSIPPI", "MSSP")]


@pytest.mark.parametrize("src,expected", MRA)
def test_mra_vectors(src, expected):
    assert match_rating_encode(src) == expected


def test_mra_edges():
    assert match_rating_encode(None) == ""
    assert match_rating_encode("") == ""
    assert match_rating_encode(" ") == ""
    assert match_rating_encode("E") == ""
