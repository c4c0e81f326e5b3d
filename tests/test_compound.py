"""DictionaryCompoundWordTokenFilter vs reference vectors
(TestCompoundWordTokenFilter.cs)."""

from lucenenet_ray.analysis.compound import (
    decompose_token,
    dictionary_compound,
)

SE_DICT = frozenset(w.lower() for w in (
    "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
    "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll", "Sko",
    "Vind", "Rute", "Torkare", "Blad"))


def test_dumb_compound_words_se():
    text = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba")
    toks = text.split()
    t, p = dictionary_compound(toks, list(range(len(toks))), SE_DICT)
    assert t == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak", "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral", "makare",
        "gesäll", "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba"]
    # subwords share the original token's position
    assert p[:6] == [0, 0, 0, 1, 1, 1]


def test_longest_match():
    d = frozenset(w.lower() for w in (
        "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
        "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare", "Gesäll",
        "Sko", "Vind", "Rute", "Torkare", "Blad", "Fiolsfodral"))
    t, _ = dictionary_compound(["Basfiolsfodralmakaregesäll"], [0], d,
                               only_longest=True)
    assert t == ["Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral",
                 "fodral", "makare", "gesäll"]


def test_min_subword_guard():
    # TestWordComponentWithLessThanMinimumLength: 'd' (len 1) never matches
    d = frozenset({"abc", "d", "efg"})
    assert decompose_token("abcdefg", d) == ["abc", "efg"]


def test_tiling_not_required():
    d = frozenset({"ab", "cd", "ef"})
    assert decompose_token("abcdef", d) == ["ab", "cd", "ef"]


def test_min_word_size():
    # tokens shorter than min_word are never decomposed
    t, _ = dictionary_compound(["abcd"], [0], frozenset({"ab", "cd"}))
    assert t == ["abcd"]
