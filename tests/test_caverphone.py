"""Caverphone 2.0 (analysis/caverphone.py): reference vectors
(Tests.Analysis.Phonetic/Language/Caverphone2Test.cs)."""

import pytest

from lucenenet_ray.analysis.caverphone import caverphone2

VECTORS = [("Stevenson", "STFNSN1111"), ("Peter", "PTA1111111"),
           ("mb", "M111111111"), ("mbmb", "MPM1111111"),
           ("ready", "RTA1111111"), ("social", "SSA1111111"),
           ("able", "APA1111111"), ("Tedder", "TTA1111111"),
           ("Karleen", "KLN1111111"), ("Dyun", "TN11111111")]


@pytest.mark.parametrize("src,expected", VECTORS)
def test_vectors(src, expected):
    assert caverphone2(src) == expected


def test_empty_pads_with_ones():
    assert caverphone2("") == "1111111111"
    assert caverphone2(None) == "1111111111"
    assert caverphone2("123") == "1111111111"


def test_fixed_length_ten():
    for s in ("a", "Thompson", "supercalifragilistic"):
        assert len(caverphone2(s)) == 10
