"""Golden vectors for the round-3 second stemmer wave (fi/hu/cz/id/lv +
English minimal), each hand-worked from the cited reference rules."""

import pytest

from lucenenet_ray.analysis.lang_stem import (
    czech_stem,
    english_minimal_stem,
    finnish_light_stem,
    hungarian_light_stem,
    indonesian_stem,
    latvian_stem,
)


@pytest.mark.parametrize("w,want", [
    ("autoja", "auto"),        # -ja partitive (step3 len>4)
    ("autossa", "auto"),       # -ssa inessive
    ("kaupunkiin", "kaupunk"), # vowel+n illative, then norm1 -i
    ("tyttö", "tyto"),         # ö fold + tt gemination collapse
    ("kala", "kal"),           # step3 final -a (len>4)
    ("abc", "abc"),            # len<4 unchanged
    # -dellinen (len>11), then norm1 -s and norm2 -i
    ("johdannaisdellinen", "johdanna"),
    # recursive -kin (len>8), then step3 -a and norm1 -s
    ("talollansakin", "talollan"),
])
def test_finnish(w, want):
    assert finnish_light_stem(w) == want


@pytest.mark.parametrize("w,want", [
    ("házakban", "haz"),   # fold, -ban case, -ak plural
    ("kertje", "kertj"),   # possessive final -e after consonant
    ("almák", "alm"),      # fold, plural a+k with len>4
    ("kente", "kente"),    # no rule: len 5, ends e but vowel before? k-e-n-t-e: w[-2]='t' cons → possessive strips? len>3: 'e' & !vowel('t') → "kent"
    ("ta", "ta"),          # too short
])
def test_hungarian(w, want):
    if w == "kente":
        # hand-worked: case step no-op (len 5: no 2suf, last 'e' needs
        # w[-2]==w[-3]: 't'!='n'), possessive len>3 strips trailing e after
        # consonant -> "kent"
        assert hungarian_light_stem(w) == "kent"
    else:
        assert hungarian_light_stem(w) == want


@pytest.mark.parametrize("w,want", [
    ("ženami", "žn"),       # -ami case, then e-collapse normalize
    ("městech", "měst"),    # -ech case
    ("pracovnika", "pracovnik"),  # final vowel
    ("bratrov", "bratr"),   # possessive -ov (len>5)
    ("otcov", "otcov"),     # len 5 fails the len>5 possessive guard
    ("moc", "mok"),         # c -> k normalize
    ("nůž", "nůh"),         # ž -> h normalize
])
def test_czech(w, want):
    assert czech_stem(w) == want


@pytest.mark.parametrize("w,want", [
    ("bukunya", "buku"),      # possessive -nya
    ("membeli", "beli"),      # meng-family prefix
    ("kebijakan", "bijak"),   # ke- blocks -kan, strips -an
    ("diperbaiki", "baik"),   # di- then -i then per-
    ("menyapu", "sapu"),      # meny+vowel -> s substitution
    ("buku", "buku"),         # <=2 syllables untouched
    ("belajar", "ajar"),      # special belajar rule
])
def test_indonesian(w, want):
    assert indonesian_stem(w) == want


@pytest.mark.parametrize("w,want", [
    ("cilvēkiem", "cilvēk"),  # -iem, no repair needed
    ("lapas", "lap"),         # -as
    ("galds", "gald"),        # bare -s (vc 0)
    ("upju", "up"),           # -u palatalizing, pj repair
    ("es", "es"),             # len < affix+3 guard
])
def test_latvian(w, want):
    assert latvian_stem(w) == want


@pytest.mark.parametrize("w,want", [
    ("dogs", "dog"),
    ("bus", "bus"),
    ("glass", "glass"),
    ("ponies", "pony"),
    ("goes", "goes"),
    ("gases", "gase"),
    ("as", "as"),        # len < 3
])
def test_english_minimal(w, want):
    assert english_minimal_stem(w) == want


def test_multilang_dispatch_has_new_langs():
    from lucenenet_ray.analysis.lang import MultiLangAnalyzer

    m = MultiLangAnalyzer()
    for lang in ("fi", "hu", "cz", "id", "lv"):
        assert lang in m.analyzers


def test_stemming_analyzer_fi():
    from lucenenet_ray.analysis.lang import FINNISH_STOP
    from lucenenet_ray.analysis.lang_stem import StemmingLangAnalyzer

    an = StemmingLangAnalyzer(FINNISH_STOP, "fi")
    terms, pos = an("autoja ja autossa")
    assert terms == ["auto", "auto"]   # 'ja' is a stopword
    assert pos == [0, 2]               # position hole preserved
