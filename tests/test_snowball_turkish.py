"""Turkish Snowball stemmer vs the reference's full vocabulary fixture
(96k words, TestSnowballVocab.cs protocol)."""

import zipfile

from lucenenet_ray.analysis.snowball_turkish import turkish_stem

_ZIP = ("/root/reference/src/Lucene.Net.Tests.Analysis.Common/Analysis/"
        "Snowball/TestSnowballVocabData.zip")


def test_full_reference_vocabulary():
    z = zipfile.ZipFile(_ZIP)
    voc = z.read("turkish/voc.txt").decode("utf-8").splitlines()
    out = z.read("turkish/output.txt").decode("utf-8").splitlines()
    assert len(voc) == len(out) > 90000
    bad = [(v, o, turkish_stem(v)) for v, o in zip(voc, out)
           if turkish_stem(v) != o]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_spot_checks():
    # single-syllable words are never stemmed
    assert turkish_stem("ev") == "ev"
    # nominal verb + noun chains with final devoicing
    assert turkish_stem("kitapları") == "kitap"
    # vowel harmony blocks disharmonic suffix candidates
    assert turkish_stem("evleri") == "ev"
    # continue_stemming unset after verbal lAr keeps partial deletions
    assert turkish_stem("çocuklar") == "çocuk"
