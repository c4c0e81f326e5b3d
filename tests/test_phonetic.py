"""Phonetic encoders + filter (analysis/phonetic.py): commons-codec /
reference goldens hand-worked through Soundex.cs GetSoundex (:281-316) and
RefinedSoundex.cs (:164-199), plus PhoneticFilter inject semantics."""

from lucenenet_ray.analysis.phonetic import (PhoneticAnalyzer,
                                             phonetic_filter,
                                             refined_soundex, soundex)


def test_soundex_goldens():
    # classic commons-codec expectations (Soundex.cs US_ENGLISH)
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"   # H skipped, run collapses across it
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"    # Z==C run collapses
    assert soundex("Pfister") == "P236"    # F==P run collapses at letter 1
    assert soundex("Honeyman") == "H555"


def test_soundex_edges():
    assert soundex("") == ""
    assert soundex("123") == ""            # Clean strips non-letters
    assert soundex("a") == "A000"
    assert soundex("hugh") == "H200"       # H/W ignored entirely
    assert soundex("aa") == "A000"         # vowel repeat after first letter


def test_refined_soundex_goldens():
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    assert refined_soundex("The") == "T60"
    assert refined_soundex("quick") == "Q503"
    assert refined_soundex("brown") == "B1908"
    assert refined_soundex("fox") == "F205"
    assert refined_soundex("jumped") == "J408106"
    assert refined_soundex("over") == "O0209"
    assert refined_soundex("lazy") == "L7050"
    assert refined_soundex("dogs") == "D6043"


def test_phonetic_filter_inject_semantics():
    """PhoneticFilter.cs:92-108 — phonetic first at the position, original
    stacked behind with posIncr=0; unchanged/uncodable tokens pass through."""
    terms, pos = phonetic_filter(["robert", "a1b2"], [0, 1], soundex)
    assert terms == ["R163", "robert", "A100", "a1b2"]
    assert pos == [0, 0, 1, 1]
    # inject=False replaces
    terms, pos = phonetic_filter(["robert"], [0], soundex, inject=False)
    assert terms == ["R163"] and pos == [0]


def test_phonetic_analyzer_chain():
    terms, pos = PhoneticAnalyzer()("Robert and Rupert")
    # 'and' is a stopword; both names share the code at their own positions
    assert terms == ["R163", "robert", "R163", "rupert"]
    assert pos == [0, 0, 2, 2]
