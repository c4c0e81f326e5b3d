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


class TestCaverphone1:
    """Caverphone 1.0 vectors from the reference test file
    (Caverphone1Test.cs: AT1111 family, mb endings, spec v1, Wikipedia)."""

    def test_at1111_family(self):
        from lucenenet_ray.analysis.caverphone import caverphone1

        for w in ("add aid at art eat earth head hit hot hold hard heart "
                  "it out old").split():
            assert caverphone1(w) == "AT1111", w

    def test_vectors(self):
        from lucenenet_ray.analysis.caverphone import caverphone1

        for w, want in [("mb", "M11111"), ("mbmb", "MPM111"),
                        ("David", "TFT111"), ("Whittle", "WTL111"),
                        ("Lee", "L11111"), ("Thompson", "TMPSN1"),
                        ("", "111111"), (None, "111111")]:
            assert caverphone1(w) == want, w

    def test_encode_equal(self):
        from lucenenet_ray.analysis.caverphone import caverphone1

        assert caverphone1("Peter") == caverphone1("Peady")
        assert caverphone1("Peter") != caverphone1("Stevenson")
