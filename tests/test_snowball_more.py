"""Germanic/Slavic (and later waves of) Snowball stemmers vs the
reference's full vocabulary fixtures (TestSnowballVocab.cs protocol)."""

import zipfile

import pytest

from lucenenet_ray.analysis.snowball_germanic import (
    dutch_stem,
    german2_stem,
    german_snowball_stem,
)
from lucenenet_ray.analysis.snowball_more import russian_stem

_ZIP = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/Analysis/"
        "Snowball/TestSnowballVocabData.zip")


def _vocab(lang):
    z = zipfile.ZipFile(_ZIP)
    voc = z.read(f"{lang}/voc.txt").decode("utf-8").split()
    out = z.read(f"{lang}/output.txt").decode("utf-8").split()
    assert len(voc) == len(out) and len(voc) > 20000
    return voc, out


@pytest.mark.parametrize("lang,fn", [
    ("german", german_snowball_stem),
    ("german2", german2_stem),
    ("dutch", dutch_stem),
    ("russian", russian_stem),
])
def test_full_reference_vocabulary(lang, fn):
    voc, out = _vocab(lang)
    bad = [(v, o, fn(v)) for v, o in zip(voc, out) if fn(v) != o]
    assert not bad, f"{lang}: {len(bad)} mismatches, first: {bad[:5]}"


def test_spot_checks():
    # German2 qu protection: the two letters after qu are never folded
    assert german2_stem("quae") == "quae"
    # German ß fold + s-ending
    assert german_snowball_stem("grüßen") == "gruss"
    # Dutch undouble + e-ending
    assert dutch_stem("lichamelijk") == "licham"
    # Russian perfective gerund group 1 needs preceding а/я
    assert russian_stem("прочитавши") == "прочита"


from lucenenet_ray.analysis.snowball_more import (  # noqa: E402
    finnish_stem,
    hungarian_stem,
    romanian_stem,
)


@pytest.mark.parametrize("lang,fn", [
    ("finnish", finnish_stem),
    ("hungarian", hungarian_stem),
    ("romanian", romanian_stem),
])
def test_full_reference_vocabulary_wave3(lang, fn):
    voc, out = _vocab(lang)
    bad = [(v, o, fn(v)) for v, o in zip(voc, out) if fn(v) != o]
    assert not bad, f"{lang}: {len(bad)} mismatches, first: {bad[:5]}"


def test_spot_checks_wave3():
    # Finnish genitive plural
    assert finnish_stem("tyttöjen") == "tyttöj"
    # Finnish case ending n after long vowel deletes the pair's tail
    assert finnish_stem("taloon") == "talo"
    # Hungarian instrumental after double consonant undoubles
    assert hungarian_stem("babbal") == "bab"
    # Romanian combo-suffix repeat then verb suffix
    assert romanian_stem("abilitate") == "abil"


from lucenenet_ray.analysis.snowball_more import (  # noqa: E402
    armenian_stem,
    lovins_stem,
    porter_classic_stem,
)


@pytest.mark.parametrize("lang,fn", [
    ("porter", porter_classic_stem),
    ("lovins", lovins_stem),
])
def test_full_reference_vocabulary_wave4(lang, fn):
    # classic Porter stems "s" to "", so align by LINE (split() drops
    # empty output lines and shifts everything)
    z = zipfile.ZipFile(_ZIP)
    voc = z.read(f"{lang}/voc.txt").decode("utf-8").splitlines()
    out = z.read(f"{lang}/output.txt").decode("utf-8").splitlines()
    assert len(voc) == len(out) and len(voc) > 20000
    bad = [(v, o, fn(v)) for v, o in zip(voc, out) if fn(v) != o]
    assert not bad, f"{lang}: {len(bad)} mismatches, first: {bad[:5]}"


def test_wave4_spot_checks():
    # Lovins condition B (min stem 3) with respell metr -> meter
    assert lovins_stem("symmetrically") == "symmeter"
    # classic Porter differs from Porter2 on e.g. "abilities"
    assert porter_classic_stem("agreed") == "agre"
    assert porter_classic_stem("controll") == "control"
    # Armenian (no reference fixture; hand-traced rules): plural genitive
    assert armenian_stem("ժողովուրդների") == "ժողովուրդ"


from lucenenet_ray.analysis.snowball_kp import kp_stem  # noqa: E402


def test_kp_full_reference_vocabulary():
    z = zipfile.ZipFile(_ZIP)
    voc = z.read("kraaij_pohlmann/voc.txt").decode("utf-8").splitlines()
    out = z.read("kraaij_pohlmann/output.txt").decode("utf-8").splitlines()
    assert len(voc) == len(out) > 40000
    bad = [(v, o, kp_stem(v)) for v, o in zip(voc, out) if kp_stem(v) != o]
    assert not bad, f"kp: {len(bad)} mismatches, first: {bad[:5]}"


def test_kp_spot_checks():
    # lengthen_V open-syllable doubling after suffix removal
    assert kp_stem("lopen") == "loop"
    # vetoed when the stem vowel is preceded by another AIOU vowel
    assert kp_stem("ademen") == "adem"
    # ge- prefix loss with Step_1c final-d cleanup
    assert kp_stem("gelopen") == "loop"


def test_snowball_analyzer_dispatch():
    from lucenenet_ray.analysis.lang import MultiLangAnalyzer
    from lucenenet_ray.analysis.lang_stem import turkish_lowercase

    a = MultiLangAnalyzer()
    # RussianAnalyzer.cs default = Snowball Russian
    assert a("мальчики читали", "ru")[0] == ["мальчик", "чита"]
    # DutchAnalyzer.cs default: StemmerOverride dict protects 'fiets'
    assert a("fiets lichamelijk", "nl")[0] == ["fiets", "licham"]
    # TurkishAnalyzer.cs: apostrophe + Turkish lowercase + snowball
    assert a("Ankara'nın çocukları", "tr")[0] == ["ankar", "çocuk"]
    assert turkish_lowercase("DİYARBAKIR") == "diyarbakır"
    assert turkish_lowercase("I") == "ı" and turkish_lowercase("İ") == "i"
    # Romanian/Norwegian/Swedish/Finnish/Hungarian snowball chains wired
    assert a("băieții", "ro")[0] == ["băieț"]
    assert a("husene", "no")[0] == ["hus"]
