"""Romance Snowball stemmers vs the reference's full vocabulary fixtures.

Same protocol as tests/test_snowball.py (TestSnowballVocab.cs): every word
of voc.txt must stem to the matching output.txt line.
"""

import zipfile

import pytest

from lucenenet_ray.analysis.snowball_romance import (
    french_stem,
    italian_stem,
    portuguese_stem,
    spanish_stem,
)

_ZIP = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/Analysis/"
        "Snowball/TestSnowballVocabData.zip")


def _vocab(lang):
    z = zipfile.ZipFile(_ZIP)
    voc = z.read(f"{lang}/voc.txt").decode("utf-8").split()
    out = z.read(f"{lang}/output.txt").decode("utf-8").split()
    assert len(voc) == len(out) and len(voc) > 20000
    return voc, out


@pytest.mark.parametrize("lang,fn", [
    ("spanish", spanish_stem),
    ("french", french_stem),
    ("italian", italian_stem),
    ("portuguese", portuguese_stem),
])
def test_full_reference_vocabulary(lang, fn):
    voc, out = _vocab(lang)
    bad = [(v, o, fn(v)) for v, o in zip(voc, out) if fn(v) != o]
    assert not bad, f"{lang}: {len(bad)} mismatches, first: {bad[:5]}"


def test_spot_checks():
    # attached pronouns with accent repair
    assert spanish_stem("haciéndola") == "hac"
    # Italian pronoun + ar -> e re-attachment then vowel suffix
    assert italian_stem("attaccarlo") == "attacc"
    # Portuguese nasal-vowel marking round trip
    assert portuguese_stem("ações") == "açõ"
    assert portuguese_stem("coração") == "coraçã"
    # French amment -> ant slice THEN verb fallthrough semantics
    assert french_stem("évidemment") == "évident"
    assert french_stem("continuellement") == "continuel"


def test_registry():
    from lucenenet_ray.analysis.lang_stem import _STEM_FN

    assert _STEM_FN["es_snowball"]("abandonadas") == "abandon"
    assert _STEM_FN["fr_snowball"]("majestueusement") == "majestu"
    assert _STEM_FN["it_snowball"]("abbandonate") == "abbandon"
    assert _STEM_FN["pt_snowball"]("abandonadas") == "abandon"
