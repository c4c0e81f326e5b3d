"""Snowball stemmers vs the reference's own vocabulary fixtures.

TestSnowballVocab.cs runs each generated Tartarus stemmer over voc.txt and
asserts output.txt line by line; we do exactly that, for every word, for
each implemented language (analysis/snowball.py).
"""

import zipfile

import pytest

from lucenenet_ray.analysis.snowball import (
    danish_stem,
    norwegian_stem,
    porter2_stem,
    swedish_stem,
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
    ("english", porter2_stem),
    ("danish", danish_stem),
    ("norwegian", norwegian_stem),
    ("swedish", swedish_stem),
])
def test_full_reference_vocabulary(lang, fn):
    voc, out = _vocab(lang)
    bad = [(v, o, fn(v)) for v, o in zip(voc, out) if fn(v) != o]
    assert not bad, f"{lang}: {len(bad)} mismatches, first: {bad[:5]}"


def test_porter2_spot_checks():
    # exception lists + each step
    assert porter2_stem("skies") == "sky"
    assert porter2_stem("news") == "news"
    assert porter2_stem("proceed") == "proceed"
    assert porter2_stem("inning") == "inning"
    assert porter2_stem("generously") == "generous"   # gener R1 override
    assert porter2_stem("communication") == "communic"
    assert porter2_stem("ties") == "tie"              # 1a short ies→ie
    assert porter2_stem("cries") == "cri"             # 1a long ies→i
    assert porter2_stem("hopping") == "hop"           # 1b undouble
    assert porter2_stem("hoping") == "hope"           # 1b short-word +e
    assert porter2_stem("cry") == "cri"               # 1c
    assert porter2_stem("by") == "by"                 # 1c atlimit guard
    assert porter2_stem("rationalization") == "ration"
    # leading apostrophe stripped; final s kept (no vowel before position -2)
    assert porter2_stem("'twas") == "twas"


def test_danish_analyzer_chain():
    from lucenenet_ray.analysis.lang import MultiLangAnalyzer

    a = MultiLangAnalyzer()
    terms, pos = a("hendes aabenbaringen bilerne huset", "da")
    assert terms == ["aabenbaring", "bil", "hus"]  # 'hendes' is a stopword
    assert pos == [1, 2, 3]


def test_snowball_filter_registry():
    from lucenenet_ray.analysis.lang_stem import _STEM_FN

    assert _STEM_FN["en_snowball"]("controlled") == "control"
    assert _STEM_FN["sv_snowball"]("bilarna") == "bil"
    assert _STEM_FN["no_snowball"]("huset") == "hus"
    assert _STEM_FN["da"]("huset") == "hus"
