"""Per-language light stemmers (Savoy's light-stemming family, the
reference's 4.8-default stem filters for De/Es and the minimal French one).

Semantics re-expressed rule-for-rule from:
- ``Analysis/De/GermanLightStemmer.cs`` (accent fold + 2 suffix steps)
- ``Analysis/Es/SpanishLightStemmer.cs`` (accent fold + plural/gender rules)
- ``Analysis/Fr/FrenchMinimalStemmer.cs`` (aux→al, s/r/e/é strip, dedup)

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


_STEM_FN = {"de": german_light_stem, "es": spanish_light_stem,
            "fr": french_minimal_stem}


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
