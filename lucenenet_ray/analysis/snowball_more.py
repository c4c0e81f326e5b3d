"""Remaining Snowball stemmers (SnowballFilter analog, wave 3).

Russian / Finnish / Hungarian / Romanian / Turkish re-expressions of the
published Snowball algorithms, matching the reference's generated Tartarus
programs (``src/Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/*.cs``) —
each validated word-for-word against the reference vocabulary fixtures
(``TestSnowballVocabData.zip``).

See snowball_romance.py for the shared among/commit semantics notes.
"""

from __future__ import annotations

from lucenenet_ray.analysis.snowball_romance import _bylen, _longest, _r1

# ---------------------------------------------------------------------------
# Russian (RussianStemmer.cs; among tables a_0..a_7 at :44-260). The whole
# backward pass runs inside setlimit(RV), so every suffix (and the а/я
# look-behind of the group-1 endings) must fit after the first vowel.

_RU_V = frozenset("аеиоуыэюя")

_RU_PERF = tuple(sorted((
    ("в", 1), ("ив", 2), ("ыв", 2), ("вши", 1), ("ивши", 2), ("ывши", 2),
    ("вшись", 1), ("ившись", 2), ("ывшись", 2),
), key=lambda t: len(t[0]), reverse=True))
_RU_ADJ = _bylen(
    "ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый", "ем",
    "им", "ом", "ым", "его", "ого", "ему", "ому", "их", "ых", "ею", "ою",
    "ую", "юю", "ая", "яя")
_RU_PART = tuple(sorted((
    ("ем", 1), ("нн", 1), ("вш", 1), ("ивш", 2), ("ывш", 2), ("щ", 1),
    ("ющ", 1), ("ующ", 2),
), key=lambda t: len(t[0]), reverse=True))
_RU_VERB = tuple(sorted((
    [(s, 1) for s in ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
                      "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")]
    + [(s, 2) for s in ("ила", "ыла", "ена", "ите", "ейте", "уйте", "или",
                        "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
                        "ило", "ыло", "ено", "ует", "ит", "ыт", "уют",
                        "ят", "ены", "ить", "ыть", "ишь", "ю", "ую")]
), key=lambda t: len(t[0]), reverse=True))
_RU_NOUN = _bylen(
    "а", "ев", "ов", "е", "ие", "ье", "и", "еи", "ии", "ами", "ями",
    "иями", "й", "ей", "ией", "ий", "ой", "ам", "ем", "ием", "ом", "ям",
    "иям", "о", "у", "ах", "ях", "иях", "ы", "ь", "ю", "ию", "ью", "я",
    "ия", "ья")


def russian_stem(word: str) -> str:
    """Russian Snowball stemmer (RussianStemmer.cs Stem():1111-1220)."""
    w = word
    n = len(w)
    rv = n
    for i in range(n):
        if w[i] in _RU_V:
            rv = i + 1
            break
    r1 = _r1(w, _RU_V)
    r2 = _r1(w, _RU_V, r1)

    def fits(base: int) -> bool:
        return base >= rv

    def after_ay(base: int) -> bool:
        return base - 1 >= rv and w[base - 1] in "ая"

    # step 1: perfective gerund, else (reflexive; adjectival|verb|noun)
    done = False
    for suf, code in _RU_PERF:
        if w.endswith(suf) and fits(len(w) - len(suf)):
            base = len(w) - len(suf)
            if code == 2:
                w = w[:base]
                done = True
            elif after_ay(base):
                w = w[:base]
                done = True
            break
    if not done:
        for suf in ("ся", "сь"):
            if w.endswith(suf) and fits(len(w) - 2):
                w = w[:-2]
                break
        # adjectival: adjective then optional participle
        suf = _longest(w, _RU_ADJ, rv)
        if suf is not None:
            w = w[: -len(suf)]
            for psuf, code in _RU_PART:
                if w.endswith(psuf) and fits(len(w) - len(psuf)):
                    base = len(w) - len(psuf)
                    if code == 2:
                        w = w[:base]
                    elif base - 1 >= rv and w[base - 1] in "ая":
                        w = w[:base]
                    break
        else:
            matched_verb = False
            for vsuf, code in _RU_VERB:
                if w.endswith(vsuf) and fits(len(w) - len(vsuf)):
                    base = len(w) - len(vsuf)
                    if code == 2:
                        w = w[:base]
                        matched_verb = True
                    elif base - 1 >= rv and w[base - 1] in "ая":
                        w = w[:base]
                        matched_verb = True
                    break
            if not matched_verb:
                nsuf = _longest(w, _RU_NOUN, rv)
                if nsuf is not None:
                    w = w[: -len(nsuf)]

    # step 2: и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    # step 3: derivational (R2)
    for suf in ("ость", "ост"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r2 and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
            break
    # step 4: tidy up
    for suf, code in (("ейше", 1), ("ейш", 1), ("н", 2), ("ь", 3)):
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            base = len(w) - len(suf)
            if code == 1:
                w = w[:base]
                if w.endswith("нн") and len(w) - 1 >= rv:
                    w = w[:-1]
            elif code == 2:
                if base - 1 >= rv and w[base - 1] == "н":
                    w = w[:base]
            else:
                w = w[:base]
            break
    return w
