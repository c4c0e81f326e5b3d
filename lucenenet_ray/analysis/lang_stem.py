"""Per-language light stemmers (Savoy's light-stemming family, the
reference's 4.8-default stem filters).

Semantics re-expressed rule-for-rule from:
- ``Analysis/De/GermanLightStemmer.cs`` (accent fold + 2 suffix steps)
- ``Analysis/Es/SpanishLightStemmer.cs`` (accent fold + plural/gender rules)
- ``Analysis/Fr/FrenchMinimalStemmer.cs`` (aux→al, s/r/e/é strip, dedup)
- ``Analysis/It/ItalianLightStemmer.cs`` (Savoy CLEF-2001: fold + final
  vowel with i/h lookback)
- ``Analysis/Pt/PortugueseLightStemmer.cs`` (Savoy UniNE: plural table,
  feminine normalization, vowel strip, fold)
- ``Analysis/Ru/RussianLightStemmer.cs`` (Dolamic & Savoy: longest-first
  case endings + residual normalize)

They chain after lowercase + stop filtering, like GermanAnalyzer.cs /
SpanishAnalyzer.cs / FrenchAnalyzer.cs build their TokenStreamComponents.
All three are pure per-token functions — memo-cached per analyzer instance
(the stateful-stage pattern; web text repeats tokens heavily).
"""

from __future__ import annotations

from lucenenet_ray.analysis.lang import LangAnalyzer

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")

_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(w: str) -> str:
    """GermanLightStemmer.Stem: fold accents; step1 strips -ern / -e[mnrs]
    / -e / consonant+-s; step2 strips -est / -e[rn] / consonant+-st."""
    w = w.translate(_DE_FOLD)
    n = len(w)
    # step 1
    if n > 5 and w.endswith("ern"):
        w = w[:-3]
    elif n > 4 and n >= 2 and w[-2] == "e" and w[-1] in "mnrs":
        w = w[:-2]
    elif n > 3 and w.endswith("e"):
        w = w[:-1]
    elif n > 3 and w.endswith("s") and w[-2] in _ST_ENDING:
        w = w[:-1]
    # step 2
    n = len(w)
    if n > 5 and w.endswith("est"):
        w = w[:-3]
    elif n > 4 and w[-2] == "e" and w[-1] in "rn":
        w = w[:-2]
    elif n > 4 and w.endswith("st") and w[-3] in _ST_ENDING:
        w = w[:-2]
    return w


def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer.Stem: words <5 chars unchanged; fold accents;
    strip final -o/-a/-e; plural rules for -s (eses→es, ces→z, os/as/es→-2)."""
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    if w[-1] in "oae":
        return w[:-1]
    if w[-1] == "s" and len(w) >= 4:
        if w.endswith("eses"):
            return w[:-2]
        if w.endswith("ces"):
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


def french_minimal_stem(w: str) -> str:
    """FrenchMinimalStemmer.Stem: words <6 chars unchanged; -aux→-al;
    then strip one each of trailing s, r, e, é; collapse a final double
    letter."""
    if len(w) < 6:
        return w
    if w.endswith("x"):
        if w.endswith("aux"):
            w = w[:-3] + "al"
        else:
            w = w[:-1]
        return w
    if w.endswith("s"):
        w = w[:-1]
    if w.endswith("r"):
        w = w[:-1]
    if w.endswith("e"):
        w = w[:-1]
    if w.endswith("é"):
        w = w[:-1]
    if len(w) >= 2 and w[-1] == w[-2]:
        w = w[:-1]
    return w


_IT_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def italian_light_stem(w: str) -> str:
    """ItalianLightStemmer.Stem (Savoy CLEF-2001 algorithm,
    ``Analysis/It/ItalianLightStemmer.cs``): words <6 chars unchanged;
    fold accents; strip a final -e/-i/-a/-o, taking the preceding i (or h
    before e/i) with it."""
    if len(w) < 6:
        return w
    w = w.translate(_IT_FOLD)
    last, prev = w[-1], w[-2]
    if last == "e":
        return w[:-2] if prev in "ih" else w[:-1]
    if last == "i":
        return w[:-2] if prev in "hi" else w[:-1]
    if last in "ao":
        return w[:-2] if prev == "i" else w[:-1]
    return w


_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(w: str) -> str:
    n = len(w)
    if n > 4 and w.endswith("es") and w[-3] in "rslz":
        return w[:-2]
    if n > 3 and w.endswith("ns"):
        return w[:-2] + "m"
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        return w[:-3] + "el"
    if n > 4 and w.endswith("ais"):
        return w[:-3] + "al"
    if n > 4 and w.endswith("óis"):
        return w[:-3] + "ol"
    if n > 4 and w.endswith("is"):
        return w[:-1] + "l"
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        return w[:-3] + "ão"
    if n > 6 and w.endswith("mente"):
        return w[:-5]
    if n > 3 and w.endswith("s"):
        return w[:-1]
    return w


def _pt_norm_feminine(w: str) -> str:
    n = len(w)
    if n > 7 and (w.endswith("inha") or w.endswith("iaca")
                  or w.endswith("eira")):
        return w[:-1] + "o"
    if n > 6:
        if w[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return w[:-1] + "o"
        if w.endswith("ona"):
            return w[:-3] + "ão"
        if w.endswith("ora"):
            return w[:-1]
        if w.endswith("esa"):
            return w[:-3] + "ês"
        if w.endswith("na"):
            return w[:-2] + "no"
    return w


def portuguese_light_stem(w: str) -> str:
    """PortugueseLightStemmer.Stem (Savoy's UniNE algorithm,
    ``Analysis/Pt/PortugueseLightStemmer.cs``): plural/suffix removal →
    feminine normalization → final-vowel strip → accent/cedilla fold
    (fold LAST, matching the reference's pass order — the suffix rules
    see the accented forms)."""
    if len(w) < 4:
        return w
    w = _pt_remove_suffix(w)
    if len(w) > 3 and w.endswith("a"):
        w = _pt_norm_feminine(w)
    if len(w) > 4 and w[-1] in "eao":
        w = w[:-1]
    return w.translate(_PT_FOLD)


_RU_3SUF = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
            "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2SUF = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
            "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
            "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


def russian_light_stem(w: str) -> str:
    """RussianLightStemmer.Stem (Dolamic & Savoy, 'Indexing and Searching
    Strategies for the Russian Language',
    ``Analysis/Ru/RussianLightStemmer.cs``): longest-first case-ending
    removal, then normalize a residual soft sign / -и / doubled -нн."""
    n = len(w)
    if n > 6 and (w.endswith("иями") or w.endswith("оями")):
        w = w[:-4]
    elif n > 5 and w.endswith(_RU_3SUF):
        w = w[:-3]
    elif n > 4 and w.endswith(_RU_2SUF):
        w = w[:-2]
    elif n > 3 and w[-1] in "аеиоуйыяь":
        w = w[:-1]
    # normalize
    if len(w) > 3:
        if w[-1] in "ьи":
            w = w[:-1]
        elif w.endswith("нн"):
            w = w[:-1]
    return w


_SV_4SUF = ("arne", "erna", "ande", "else", "aste", "orna", "aren")
_SV_2SUF = ("ar", "er", "or", "en", "at", "te", "et")


def swedish_light_stem(w: str) -> str:
    """SwedishLightStemmer.Stem (Savoy's light stemmer for Swedish,
    ``Analysis/Sv/SwedishLightStemmer.cs``): possessive -s then ONE
    longest-first suffix strip; length guards are on the pre-strip
    length at each step like the reference's running ``len``."""
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]
        n -= 1
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:-5]
    if n > 6 and w.endswith(_SV_4SUF):
        return w[:-4]
    if n > 5 and (w.endswith("are") or w.endswith("ast")
                  or w.endswith("het")):
        return w[:-3]
    if n > 4 and w.endswith(_SV_2SUF):
        return w[:-2]
    if n > 3 and w[-1] in "taen":
        return w[:-1]
    return w


_NO_4SUF = ("ende", "else", "este", "eren")  # Bokmål set
_NO_3SUF = ("ere", "est", "ene")
_NO_2SUF = ("er", "en", "et", "st", "te")


def norwegian_light_stem(w: str) -> str:
    """NorwegianLightStemmer.Stem with the default BOKMAAL flag
    (``Analysis/No/NorwegianLightStemmer.cs``): possessive -s, then one
    longest-first strip from the Bokmål ending sets."""
    n = len(w)
    if n > 4 and w[-1] == "s":
        w = w[:-1]
        n -= 1
    if n > 7 and (w.endswith("heter") or w.endswith("heten")):
        return w[:-5]
    if n > 5 and (w.endswith("dom") or w.endswith("het")):
        return w[:-3]
    if n > 7 and (w.endswith("elser") or w.endswith("elsen")):
        return w[:-5]
    if n > 6 and w.endswith(_NO_4SUF):
        return w[:-4]
    if n > 5 and w.endswith(_NO_3SUF):
        return w[:-3]
    if n > 4 and w.endswith(_NO_2SUF):
        return w[:-2]
    if n > 3 and w[-1] in "aen":
        return w[:-1]
    return w


_STEM_FN = {"de": german_light_stem, "es": spanish_light_stem,
            "fr": french_minimal_stem, "it": italian_light_stem,
            "pt": portuguese_light_stem, "ru": russian_light_stem,
            "sv": swedish_light_stem, "no": norwegian_light_stem}


class StemmingLangAnalyzer(LangAnalyzer):
    """LangAnalyzer + the language's light stemmer (the GermanAnalyzer /
    SpanishAnalyzer / FrenchAnalyzer chain shape: tokenizer → lowercase →
    stop → stem)."""

    def __init__(self, stop_words: frozenset[str], lang: str):
        super().__init__(stop_words)
        self._stem = _STEM_FN[lang]
        self._cache: dict[str, str] = {}

    def __call__(self, text: str):
        terms, positions = super().__call__(text)
        cache = self._cache
        stem = self._stem
        out = []
        for t in terms:
            s = cache.get(t)
            if s is None:
                s = stem(t)
                cache[t] = s
            out.append(s)
        return out, positions
