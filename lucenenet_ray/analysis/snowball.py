"""Snowball stemmers (SnowballFilter analog).

The reference ships machine-generated Snowball programs
(``src/Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/*.cs``) wrapped by
``Analysis/Snowball/SnowballFilter.cs``. These are re-expressions of the
published Snowball algorithms (snowballstem.org) — the rules below are
written from the algorithm definitions and validated against the reference's
own vocabulary fixtures (``Lucene.Net.Tests.Analysis.Common/Analysis/
Snowball/TestSnowballVocabData.zip``: full voc.txt → output.txt pairs per
language, the TestSnowballVocab.cs corpus).

Implemented here:
- :func:`porter2_stem` — the English (Porter2) stemmer
  (``EnglishStemmer.cs``; exception lists :155-185, prelude :205,
  mark_regions :332 incl. the gener/commun/arsen R1 override, shortv :460,
  steps :526-1153).
- :func:`danish_stem`, :func:`norwegian_stem`, :func:`swedish_stem` — the
  Scandinavian Snowball stemmers (``DanishStemmer.cs`` /
  ``NorwegianStemmer.cs`` / ``SwedishStemmer.cs``): shared shape (R1 with
  3-char minimum, one big suffix among, s-ending letter classes,
  undouble/other-suffix cleanup).
"""

from __future__ import annotations

_V = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_VALID_LI = frozenset("cdeghkmnrt")

# exception1 (EnglishStemmer.cs:166-185): full-word special cases
_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# exception2 (EnglishStemmer.cs:155-164): stop after step 1a
_EXC2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"))

_STEP2 = (  # (suffix, replacement, extra-condition-key) longest-first
    ("ational", "ate", None), ("ization", "ize", None),
    ("fulness", "ful", None), ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None), ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None), ("fulli", "ful", None), ("ousli", "ous", None),
    ("iviti", "ive", None), ("alism", "al", None), ("aliti", "al", None),
    ("ation", "ate", None),
    ("izer", "ize", None), ("ator", "ate", None), ("anci", "ance", None),
    ("enci", "ence", None), ("abli", "able", None), ("alli", "al", None),
    ("ogi", "og", "l"), ("bli", "ble", None),
    ("li", "", "valid_li"),
)
_STEP3 = (
    ("ational", "ate", None), ("tional", "tion", None),
    ("alize", "al", None), ("icate", "ic", None), ("iciti", "ic", None),
    ("ative", "", "R2"),
    ("ical", "ic", None), ("ness", "", None), ("ful", "", None),
)
_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic",
)


def _r1_r2_en(w: str) -> tuple[int, int]:
    """R1 start (with the gener/commun/arsen override,
    EnglishStemmer.cs:332-360) and R2 start."""
    n = len(w)
    r1 = n
    for pfx in ("gener", "commun", "arsen"):
        if w.startswith(pfx):
            r1 = len(pfx)
            break
    else:
        for i in range(n - 1):
            if w[i] in _V and w[i + 1] not in _V:
                r1 = i + 2
                break
    r2 = n
    for i in range(r1, n - 1):
        if w[i] in _V and w[i + 1] not in _V:
            r2 = i + 2
            break
    return r1, r2


def _ends_short(w: str) -> bool:
    """shortv (EnglishStemmer.cs:460-505): word ends in a short syllable."""
    n = len(w)
    if n >= 3 and (w[-1] not in _V and w[-1] not in "wxY"
                   and w[-2] in _V and w[-3] not in _V):
        return True
    return n == 2 and w[0] in _V and w[1] not in _V


def porter2_stem(word: str) -> str:
    """English Snowball (Porter2) stemmer; expects a lowercased token."""
    w = word
    if w in _EXC1:  # exception1 runs before everything (Stem() :1350)
        return _EXC1[w]
    if len(w) < 3:  # "not hop 3" (:1362)
        return w
    # prelude: strip one leading apostrophe; mark consonant-y as Y
    if w[0] == "'":
        w = w[1:]
    y_found = False
    ch = list(w)
    if ch and ch[0] == "y":
        ch[0] = "Y"
        y_found = True
    for i in range(1, len(ch)):
        if ch[i] == "y" and ch[i - 1] in _V:
            ch[i] = "Y"
            y_found = True
    w = "".join(ch)
    r1, r2 = _r1_r2_en(w)

    # Step 1a — apostrophe suffixes first (a_1: "'s'" > "'s" > "'")
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    if w.endswith("sses"):
        w = w[:-4] + "ss"
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("ss", "us")):
        pass
    elif w.endswith("s"):
        if any(c in _V for c in w[:-2]):
            w = w[:-1]

    if w not in _EXC2:  # exception2 skips steps 1b-5 but not the postlude
        # Step 1b (among commits to the longest match; no fallback)
        for suf, var in (("eedly", 1), ("ingly", 2), ("edly", 2),
                         ("eed", 1), ("ing", 2), ("ed", 2)):
            if w.endswith(suf):
                if var == 1:
                    if len(w) - len(suf) >= r1:
                        w = w[: -len(suf)] + "ee"
                else:
                    stem = w[: -len(suf)]
                    if any(c in _V for c in stem):
                        w = stem
                        if w.endswith(("at", "bl", "iz")):
                            w += "e"
                        elif w.endswith(_DOUBLES):
                            w = w[:-1]
                        elif r1 >= len(w) and _ends_short(w):
                            w += "e"
                break
        # Step 1c: y/Y → i after a non-vowel that is not the first letter
        if len(w) >= 3 and w[-1] in "yY" and w[-2] not in _V:
            w = w[:-1] + "i"
        # Step 2 (in R1)
        for suf, rep, cond in _STEP2:
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    if cond == "l":
                        if len(w) > len(suf) and w[-len(suf) - 1] == "l":
                            w = w[: -len(suf)] + rep
                    elif cond == "valid_li":
                        if len(w) > len(suf) and w[-len(suf) - 1] in _VALID_LI:
                            w = w[: -len(suf)]
                    else:
                        w = w[: -len(suf)] + rep
                break
        # Step 3 (in R1; "ative" additionally needs R2)
        for suf, rep, cond in _STEP3:
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    if cond == "R2":
                        if len(w) - len(suf) >= r2:
                            w = w[: -len(suf)]
                    else:
                        w = w[: -len(suf)] + rep
                break
        # Step 4 (in R2; "ion" only after s/t)
        for suf in _STEP4:
            if w.endswith(suf):
                if len(w) - len(suf) >= r2:
                    if suf == "ion":
                        if len(w) > 3 and w[-4] in "st":
                            w = w[:-3]
                    else:
                        w = w[: -len(suf)]
                break
        # Step 5
        if w.endswith("e"):
            if len(w) - 1 >= r2 or (len(w) - 1 >= r1
                                    and not _ends_short(w[:-1])):
                w = w[:-1]
        elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 \
                and w[-2] == "l":
            w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w


# ---------------------------------------------------------------------------
# Scandinavian Snowball stemmers (DanishStemmer.cs / NorwegianStemmer.cs /
# SwedishStemmer.cs). Shared shape: R1 with a 3-letter minimum prefix, one
# main-suffix among restricted to R1 (longest suffix that STARTS inside R1;
# the among commits — a failed condition does not fall back to a shorter
# suffix), then small cleanup steps.

_DA_V = frozenset("aeiouyæåø")
_SV_V = frozenset("aeiouyäåö")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")  # no k — handled separately
_SV_S_END = frozenset("bcdfghjklmnoprtvy")

_DA_MAIN = sorted(
    ("hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
     "ere", "en", "heden", "eren", "er", "heder", "erer", "s", "heds", "es",
     "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
     "ers", "ets", "erets", "et", "eret"), key=len, reverse=True)
_NO_MAIN = sorted(
    ("a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "erte", "en",
     "heten", "ar", "er", "heter", "s", "as", "es", "edes", "endes", "enes",
     "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ert", "ast"),
    key=len, reverse=True)
_SV_MAIN = sorted(
    ("a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
     "er", "heter", "or", "s", "as", "arnas", "ernas", "ornas", "es",
     "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
     "het", "ast"), key=len, reverse=True)


def _r1_scand(w: str, vowels: frozenset) -> int:
    """R1 start with the hop-3 minimum (DanishStemmer.cs r_mark_regions:
    fails for words under 3 letters; p1 = max(p1, 3) otherwise)."""
    n = len(w)
    if n < 3:
        return n
    p1 = n
    for i in range(n - 1):
        if w[i] in vowels and w[i + 1] not in vowels:
            p1 = i + 2
            break
    return max(p1, 3)


def _main_suffix(w: str, p1: int, suffixes: list[str]) -> str | None:
    """Longest suffix starting inside R1 (setlimit among semantics)."""
    for suf in suffixes:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            return suf
    return None


def danish_stem(word: str) -> str:
    """Danish Snowball stemmer (DanishStemmer.cs)."""
    w = word
    p1 = _r1_scand(w, _DA_V)

    def consonant_pair(w: str) -> str:
        if (len(w) >= 2 and w[-2:] in ("gd", "dt", "gt", "kt")
                and len(w) - 2 >= p1):
            return w[:-1]
        return w

    suf = _main_suffix(w, p1, _DA_MAIN)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif suf:
        w = w[: -len(suf)]
    w = consonant_pair(w)
    # other_suffix: "igst" drops "st" unconditionally, then the R1 among
    if w.endswith("igst"):
        w = w[:-2]
    for suf, var in (("løst", 2), ("elig", 1), ("lig", 1), ("els", 1),
                     ("ig", 1)):
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            if var == 1:
                w = consonant_pair(w[: -len(suf)])
            else:
                w = w[:-1]  # løst → løs
            break
    # undouble: final doubled consonant inside R1 loses one letter
    if (len(w) >= 2 and len(w) - 1 >= p1 and w[-1] not in _DA_V
            and w[-2] == w[-1]):
        w = w[:-1]
    return w


def norwegian_stem(word: str) -> str:
    """Norwegian (Bokmål) Snowball stemmer (NorwegianStemmer.cs)."""
    w = word
    p1 = _r1_scand(w, _DA_V)  # same vowel set as Danish
    suf = _main_suffix(w, p1, _NO_MAIN)
    if suf == "s":
        # preceded by an s_ending letter, or by k with a non-vowel before it
        if len(w) >= 2 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and len(w) >= 3 and w[-3] not in _DA_V)
        ):
            w = w[:-1]
    elif suf in ("erte", "ert"):
        w = w[: -len(suf)] + "er"
    elif suf:
        w = w[: -len(suf)]
    if (len(w) >= 2 and w[-2:] in ("dt", "vt") and len(w) - 2 >= p1):
        w = w[:-1]
    for suf in ("hetslov", "elov", "slov", "eleg", "elig", "leg", "eig",
                "lig", "els", "lov", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            w = w[: -len(suf)]
            break
    return w


def swedish_stem(word: str) -> str:
    """Swedish Snowball stemmer (SwedishStemmer.cs)."""
    w = word
    p1 = _r1_scand(w, _SV_V)
    suf = _main_suffix(w, p1, _SV_MAIN)
    if suf == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif suf:
        w = w[: -len(suf)]
    if (len(w) >= 2 and w[-2:] in ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
            and len(w) - 2 >= p1):
        w = w[:-1]
    for suf, var in (("fullt", 3), ("löst", 2), ("lig", 1), ("els", 1),
                     ("ig", 1)):
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            if var == 1:
                w = w[: -len(suf)]
            else:
                w = w[:-1]  # löst → lös, fullt → full
            break
    return w
