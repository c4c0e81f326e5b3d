"""Daitch-Mokotoff Soundex (analysis/dmsoundex.py): reference test
vectors (Tests.Analysis.Phonetic/Language/DaitchMokotoffSoundexTest.cs)."""

import pytest

from lucenenet_ray.analysis.dmsoundex import dm_encode, dm_soundex

SOUNDEX = [("Straßburg", "294795"), ("Strasburg", "294795"),
           ("Éregon", "095600"), ("Eregon", "095600"),
           ("AKSSOL", "054800"),
           ("GERSCHFELD", "547830|545783|594783|594578"),
           ("GOLDEN", "583600"), ("Alpert", "087930"),
           ("Breuer", "791900"), ("Haber", "579000"),
           ("Mannheim", "665600"), ("Mintz", "664000"),
           ("Topf", "370000"), ("Kleinmann", "586660"),
           ("Ben Aron", "769600"),
           ("AUERBACH", "097400|097500"), ("OHRBACH", "097400|097500"),
           ("LIPSHITZ", "874400"), ("LIPPSZYC", "874400|874500"),
           ("LEWINSKY", "876450")]

ENCODE = [("AUERBACH", "097400"), ("OHRBACH", "097400"),
          ("LIPSHITZ", "874400"), ("LIPPSZYC", "874400"),
          ("LEWINSKY", "876450"), ("LEVINSKI", "876450"),
          ("SZLAMAWICZ", "486740"), ("SHLAMOVITZ", "486740"),
          (" \t\n\r Washington \t\n\r ", "746536"),
          ("Washington", "746536")]


@pytest.mark.parametrize("src,expected", SOUNDEX)
def test_soundex_vectors(src, expected):
    assert dm_soundex(src) == expected


@pytest.mark.parametrize("src,expected", ENCODE)
def test_encode_vectors(src, expected):
    assert dm_encode(src) == expected


def test_matching_family():
    """The classic D-M motivation: Moskowitz family variants match."""
    assert dm_encode("Moskowitz") == dm_encode("Moskovitz")


def test_none():
    assert dm_soundex(None) is None and dm_encode(None) is None
