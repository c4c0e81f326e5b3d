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


@pytest.mark.parametrize("w,want", [
    # TestArabicStemFilter.cs vectors (prefix + suffix table)
    ("الحسن", "حسن"),
    ("والحسن", "حسن"),
    ("بالحسن", "حسن"),
    ("كالحسن", "حسن"),
    ("فالحسن", "حسن"),
    ("للاخر", "اخر"),
    ("وحسن", "حسن"),
    ("زوجها", "زوج"),
    ("ساهدان", "ساهد"),
    ("ساهدات", "ساهد"),
    ("ساهدون", "ساهد"),
    ("ساهدين", "ساهد"),
    ("ساهديه", "ساهد"),
    ("ساهدية", "ساهد"),
    ("ساهده", "ساهد"),
    ("ساهدة", "ساهد"),
    ("ساهدي", "ساهد"),
    ("وساهدون", "ساهد"),
    ("ساهدهات", "ساهد"),     # sequential multi-suffix strip
    ("الو", "الو"),           # too short for the ال prefix
])
def test_arabic(w, want):
    from lucenenet_ray.analysis.lang_stem import arabic_stem

    assert arabic_stem(w) == want


def test_arabic_normalize():
    from lucenenet_ray.analysis.lang_stem import arabic_normalize

    assert arabic_normalize("أحمد") == "احمد"     # hamza above → alef
    assert arabic_normalize("مصطفى") == "مصطفي"   # dotless yeh → yeh
    assert arabic_normalize("مدرسة") == "مدرسه"   # teh marbuta → heh
    assert arabic_normalize("مـحـمـد") == "محمد"  # tatweel deleted


@pytest.mark.parametrize("w,want", [
    # TestBulgarianStemmer.cs vectors
    ("град", "град"), ("града", "град"), ("градът", "град"),
    ("градове", "град"), ("градовете", "град"),
    ("народ", "народ"), ("народа", "народ"), ("народът", "народ"),
    ("народи", "народ"), ("народите", "народ"), ("народе", "народ"),
    ("път", "път"), ("пътя", "път"), ("пътят", "път"),
    ("пътища", "път"), ("пътищата", "път"),
    ("градец", "градец"), ("градеца", "градец"), ("градецът", "градец"),
    ("градовце", "градовц"),
    ("празници", "празник"),
])
def test_bulgarian(w, want):
    from lucenenet_ray.analysis.lang_stem import bulgarian_stem

    assert bulgarian_stem(w) == want


@pytest.mark.parametrize("w,want", [
    # TestHindiStemmer.cs vectors
    ("लडका", "लडक"), ("लडके", "लडक"), ("लडकों", "लडक"),
    ("गुरु", "गुर"), ("गुरुओं", "गुर"),
    ("दोस्त", "दोस्त"), ("दोस्तों", "दोस्त"),
    ("लडकी", "लडक"), ("लडकियों", "लडक"),
    ("किताब", "किताब"), ("किताबें", "किताब"), ("किताबों", "किताब"),
    ("आध्यापीका", "आध्यापीक"), ("आध्यापीकाएं", "आध्यापीक"),
    ("आध्यापीकाओं", "आध्यापीक"),
    ("खाना", "खा"), ("खाता", "खा"), ("खाती", "खा"), ("खा", "खा"),
    ("कठिनाइयां", "कठिन"),
])
def test_hindi(w, want):
    from lucenenet_ray.analysis.lang_stem import hindi_stem

    assert hindi_stem(w) == want


def test_dispatch_17_langs():
    from lucenenet_ray.analysis.lang import MultiLangAnalyzer
    from lucenenet_ray.analysis.lang_stem import _STEM_FN

    m = MultiLangAnalyzer()
    for lang in ("ar", "bg", "hi"):
        assert lang in m.analyzers
        assert lang in _STEM_FN


@pytest.mark.parametrize("w,want", [
    # TestSoraniStemFilter.cs vectors (full normalize→stem chain)
    ("پیاوێک", "پیاو"), ("دەرگایەک", "دەرگا"), ("پیاوەكە", "پیاو"),
    ("دەرگاكە", "دەرگا"), ("کتاویە", "کتاوی"), ("دەرگایە", "دەرگا"),
    ("پیاوان", "پیاو"), ("دەرگایان", "دەرگا"), ("پیاوەکان", "پیاو"),
    ("دەرگاکان", "دەرگا"), ("پیاوانە", "پیاو"), ("دەرگایانە", "دەرگا"),
    ("هۆتیلی", "هۆتیل"), ("هۆتیلێکی", "هۆتیل"), ("هۆتیلانی", "هۆتیل"),
])
def test_sorani(w, want):
    from lucenenet_ray.analysis.lang_stem import sorani_light_stem

    assert sorani_light_stem(w) == want


@pytest.mark.parametrize("w,want", [
    # TestSoraniNormalizationFilter.cs vectors
    ("ي", "ی"), ("ى", "ی"), ("ك", "ک"),
    ("ه‌", "ە"), ("ه‌ک", "ەک"),
    ("ھ", "ه"), ("ة", "ە"), ("ههه", "ههە"),
])
def test_sorani_normalize(w, want):
    from lucenenet_ray.analysis.lang_stem import sorani_normalize

    assert sorani_normalize(w) == want


@pytest.mark.parametrize("w,want", [
    # TestFrenchLightStemFilter.cs vectors (full UniNE light stemmer;
    # 'personnel'/'colonisateur' are commented out in the reference too)
    ("chevaux", "cheval"), ("hiboux", "hibou"), ("chantés", "chant"),
    ("chanter", "chant"), ("chante", "chant"), ("baronnes", "baron"),
    ("peaux", "peau"), ("anneaux", "aneau"), ("neveux", "neveu"),
    ("affreux", "afreu"), ("affreuse", "afreu"),
    ("investissement", "investi"), ("investir", "investi"),
    ("assourdissant", "asourdi"), ("pratiquement", "pratiqu"),
    ("administrativement", "administratif"),
    ("justificatrice", "justifi"), ("justificateur", "justifi"),
    ("educatrice", "eduqu"), ("eduquer", "eduqu"),
    ("communicateur", "comuniqu"), ("accompagnatrice", "acompagn"),
    ("administrateur", "administr"), ("productrice", "product"),
    ("acheteuse", "achet"), ("planteur", "plant"),
    ("poreuse", "poreu"), ("plieuse", "plieu"),
    ("bijoutière", "bijouti"), ("caissière", "caisi"),
    ("abrasive", "abrasif"), ("folle", "fou"),
    ("personnelle", "person"), ("personne", "person"),
    ("complète", "complet"), ("aromatique", "aromat"),
    ("faiblesse", "faibl"), ("patinage", "patin"),
    ("sonorisation", "sono"), ("ritualisation", "rituel"),
    ("nomination", "nomin"), ("disposition", "dispos"),
    ("1234555", "1234555"), ("abcdeff", "abcdef"),
    ("abcccddeef", "abcdef"), ("créées", "cre"), ("22hh00", "22h00"),
    ("", ""),
])
def test_french_light(w, want):
    from lucenenet_ray.analysis.lang_stem import french_light_stem

    assert french_light_stem(w) == want


@pytest.mark.parametrize("w,want", [
    # TestPersianNormalizationFilter.cs vectors
    ("های", "هاي"),      # Farsi yeh
    ("هاے", "هاي"),      # yeh barree
    ("کشاندن", "كشاندن"),  # keheh → kaf
    ("كتابۀ", "كتابه"),   # heh-yeh
    ("كتابهٔ", "كتابه"),   # heh + hamza above
    ("زادہ", "زاده"),     # heh goal
    ("", ""),
])
def test_persian_normalize(w, want):
    from lucenenet_ray.analysis.lang_stem import persian_normalize

    assert persian_normalize(w) == want


@pytest.mark.parametrize("w,want", [
    # TestGermanMinimalStemFilter.cs vectors
    ("sängerinnen", "sangerin"), ("frauen", "frau"),
    ("kenntnisse", "kenntnis"), ("staates", "staat"),
    ("bilder", "bild"), ("boote", "boot"),
    ("götter", "gott"), ("äpfel", "apfel"),
    ("haus", "haus"),   # len < 5 unchanged
])
def test_german_minimal(w, want):
    from lucenenet_ray.analysis.lang_stem import german_minimal_stem

    assert german_minimal_stem(w) == want


def _datafile_vectors(name):
    import os
    path = os.path.join("/root/reference/src/"
                        "Lucene.Net.Tests.Analysis.Common/Analysis/No",
                        name)
    out = []
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) == 2:
            out.append(tuple(parts))
    return out


def test_norwegian_minimal_datafile():
    from lucenenet_ray.analysis.lang_stem import norwegian_minimal_stem

    vecs = _datafile_vectors("nb_minimal.txt")
    assert len(vecs) > 50
    for w, want in vecs:
        assert norwegian_minimal_stem(w) == want, w


def test_norwegian_light_datafile():
    from lucenenet_ray.analysis.lang_stem import norwegian_light_stem

    vecs = _datafile_vectors("nb_light.txt")
    assert len(vecs) > 100
    for w, want in vecs:
        assert norwegian_light_stem(w) == want, w
