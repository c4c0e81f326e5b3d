"""Swedish + Norwegian light stemmers (analysis/lang_stem.py): rule
goldens hand-worked through the reference Stem() cascades."""

from lucenenet_ray.analysis.lang_stem import (norwegian_light_stem,
                                              swedish_light_stem)


def test_swedish_goldens():
    # Lucene TestSwedishLightStemFilter family behaviors
    assert swedish_light_stem("jackor") == "jack"
    assert swedish_light_stem("jacka") == "jack"
    assert swedish_light_stem("klubben") == "klubb"
    assert swedish_light_stem("klubbarne") == "klubb"
    assert swedish_light_stem("spelelser") == "spel"
    assert swedish_light_stem("starkast") == "stark"
    assert swedish_light_stem("svenskhet") == "svensk"
    # possessive -s first, then the ending
    assert swedish_light_stem("bilens") == "bil"
    # too short to strip
    assert swedish_light_stem("bil") == "bil"
    assert swedish_light_stem("ae") == "ae"


def test_norwegian_goldens():
    # Lucene TestNorwegianLightStemFilter behaviors (Bokmål)
    assert norwegian_light_stem("eplene") == "epl"
    assert norwegian_light_stem("epler") == "epl"
    assert norwegian_light_stem("hemmeligheten") == "hemmelig"
    assert norwegian_light_stem("hemmeligheter") == "hemmelig"
    assert norwegian_light_stem("kristendom") == "kristen"
    assert norwegian_light_stem("følelsen") == "føl"
    assert norwegian_light_stem("fineste") == "fin"
    assert norwegian_light_stem("bilens") == "bil"
    assert norwegian_light_stem("bil") == "bil"


def test_one_strip_only():
    # single-pass: the stripped form is NOT re-stripped
    assert swedish_light_stem("heten") == "het"  # n=5: not >7; 'en' at n>4
    assert norwegian_light_stem("heten") == "het"
