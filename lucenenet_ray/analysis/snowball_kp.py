"""Kraaij-Pohlmann Dutch stemmer (SnowballFilter "Kp" analog).

Re-expression of the published Kraaij-Pohlmann Snowball program, matching
the reference's generated Tartarus code
(``src/Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/KpStemmer.cs``) —
validated word-for-word on the reference vocabulary fixture
(kraaij_pohlmann/voc.txt, 45k words).

Positions: helpers take the word and a position ``p`` (the suffix start /
cursor). ``ij`` counts as one vowel unit in ``measure``; Y-marked y (after
a vowel) is a consonant for all checks.
"""

from __future__ import annotations

_KP_V = frozenset("aeiouy")
_KP_VWX = _KP_V | {"w", "x"}
_KP_AOU = frozenset("aou")
_KP_AIOU = frozenset("aiou")


def _kp_measure(w: str) -> tuple[int, int]:
    """r_measure (KpStemmer.cs:1858): skip non-vowels, >=1 (ij|vowel)
    units, one non-vowel -> p1; repeat -> p2."""
    n = len(w)
    p1 = p2 = n
    i = 0
    for mark in range(2):
        while i < n and w[i] not in _KP_V:
            i += 1
        cnt = 0
        while i < n:
            if w.startswith("ij", i):
                i += 2
                cnt += 1
            elif w[i] in _KP_V:
                i += 1
                cnt += 1
            else:
                break
        if cnt == 0 or i >= n:
            return p1, p2
        i += 1
        if mark == 0:
            p1 = i
        else:
            p2 = i
    return p1, p2


def _V(w: str, p: int) -> bool:
    """char before p is a vowel, or "ij" ends at p."""
    return (p >= 1 and w[p - 1] in _KP_V) or (p >= 2
                                              and w[p - 2: p] == "ij")


def _VX(w: str, p: int) -> bool:
    """one char back, then V."""
    return p >= 1 and _V(w, p - 1)


def _C(w: str, p: int) -> bool:
    """not "ij", and a non-vowel before p."""
    return (not (p >= 2 and w[p - 2: p] == "ij")
            and p >= 1 and w[p - 1] not in _KP_V)


def _lengthen_V(w: str) -> str:
    """r_lengthen_V (:298): double a/o/u/e before a final non-(v/w/x)
    consonant when the vowel opens the syllable."""
    p = len(w)
    if p < 2 or w[p - 1] in _KP_VWX:
        return w
    i = p - 2
    ch = w[i]
    if ch in _KP_AOU:
        if i == 0 or w[i - 1] not in _KP_V:
            return w[:i] + ch + w[i:]
        return w
    if ch == "e":
        # the open-syllable test consumes the consonant before the e, so
        # both vetoes look one position further back
        if not (i == 0 or w[i - 1] not in _KP_V):
            return w
        if i >= 2 and w[i - 2] in _KP_AIOU:
            return w
        if i >= 4 and w[i - 3] in _KP_AIOU and w[i - 4] not in _KP_V:
            return w
        return w[:i] + "e" + w[i:]
    return w


def _match(w: str, p: int, sufs) -> tuple[str, int] | None:
    for s in sufs:
        q = p - len(s)
        if q >= 0 and w.startswith(s, q):
            return s, q
    return None


_A0 = ("ies", "aus", "nde", "'s", "es", "en", "s")
_A1 = ("ische", "lijke", "ieve", "ene", "de", "ge", "je", "le", "re",
       "se", "te")
_A2 = ("iteit", "atie", "isme", "arij", "erij", "heid", "rder", "ster",
       "fie", "gie", "ing", "sel", "dst", "tst")
_A3 = ("achtiger", "achtigst", "eriger", "erigst", "ioneel", "achtig",
       "lijker", "lijkst", "atief", "baar", "laar", "naar", "raar",
       "tant", "end", "erig")
_A6 = ("ccs",)  # placeholder — Kp has no digraph doubles; see _STEP6


def kp_stem(word: str) -> str:
    """Kraaij-Pohlmann stemmer (KpStemmer.cs Stem():2196-2320)."""
    w = word
    # prelude: initial y and y-after-vowel -> Y
    ch = list(w)
    y_found = False
    if ch and ch[0] == "y":
        ch[0] = "Y"
        y_found = True
    for i in range(1, len(ch)):
        if ch[i] == "y" and ch[i - 1] in _KP_V:
            ch[i] = "Y"
            y_found = True
    w = "".join(ch)
    p1, p2 = _kp_measure(w)
    stemmed = False

    def R1(q: int) -> bool:
        return q >= p1

    def R2(q: int) -> bool:
        return q >= p2

    # ---- Step 1 (a_0)
    m = _match(w, len(w), _A0)
    if m is not None:
        s, q = m
        if s == "'s":
            w = w[:q]
            stemmed = True
        elif s == "s":
            if (R1(q) and not (q >= 1 and w[q - 1] == "t"
                               and R1(q - 1)) and _C(w, q)):
                w = w[:q]
                stemmed = True
        elif s == "ies":
            if R1(q):
                w = w[:q] + "ie"
                stemmed = True
        elif s == "es":
            if w.startswith("ar", q - 2) and q - 2 >= 0 \
                    and R1(q - 2) and _C(w, q - 2):
                w = _lengthen_V(w[: q - 2])
                stemmed = True
            elif w.startswith("er", q - 2) and q - 2 >= 0 \
                    and R1(q - 2) and _C(w, q - 2):
                w = w[: q - 2]
                stemmed = True
            elif R1(q) and _C(w, q):
                w = w[:q] + "e"
                stemmed = True
        elif s == "aus":
            if R1(q) and _V(w, q):
                w = w[:q] + "au"
                stemmed = True
        elif s == "en":
            if w.startswith("hed", q - 3) and q - 3 >= 0 and R1(q - 3):
                w = w[: q - 3] + "heid"
                stemmed = True
            elif w.startswith("nd", q - 2) and q - 2 >= 0:
                w = w[:q]
                stemmed = True
            elif q - 1 >= 0 and w[q - 1] == "d" and R1(q - 1) \
                    and _C(w, q - 1):
                w = w[: q - 1]
                stemmed = True
            elif q - 1 >= 0 and w[q - 1] in "ij" and _V(w, q - 1):
                w = w[:q]
                stemmed = True
            elif R1(q) and _C(w, q):
                w = _lengthen_V(w[:q])
                stemmed = True
        elif s == "nde":
            w = w[:q] + "nd"
            stemmed = True

    # ---- Step 2 (a_1)
    m = _match(w, len(w), _A1)
    if m is not None:
        s, q = m
        if s == "je":
            if w.startswith("'t", q - 2) and q - 2 >= 0:
                w = w[: q - 2]
                stemmed = True
            elif w.startswith("et", q - 2) and q - 2 >= 0 \
                    and R1(q - 2) and _C(w, q - 2):
                w = w[: q - 2]
                stemmed = True
            elif w.startswith("rnt", q - 3) and q - 3 >= 0:
                w = w[: q - 3] + "rn"
                stemmed = True
            elif q - 1 >= 0 and w[q - 1] == "t" and R1(q - 1) \
                    and _VX(w, q - 1):
                w = w[: q - 1]
                stemmed = True
            elif w.startswith("ink", q - 3) and q - 3 >= 0:
                w = w[: q - 3] + "ing"
                stemmed = True
            elif w.startswith("mp", q - 2) and q - 2 >= 0:
                w = w[: q - 2] + "m"
                stemmed = True
            elif q - 1 >= 0 and w[q - 1] == "'" and R1(q - 1):
                w = w[: q - 1]
                stemmed = True
            elif R1(q) and _C(w, q):
                w = w[:q]
                stemmed = True
        elif s == "ge":
            if R1(q):
                w = w[:q] + "g"
                stemmed = True
        elif s == "lijke":
            if R1(q):
                w = w[:q] + "lijk"
                stemmed = True
        elif s == "ische":
            if R1(q):
                w = w[:q] + "isch"
                stemmed = True
        elif s == "de":
            if R1(q) and _C(w, q):
                w = w[:q]
                stemmed = True
        elif s == "te":
            if R1(q):
                w = w[:q] + "t"
                stemmed = True
        elif s == "se":
            if R1(q):
                w = w[:q] + "s"
                stemmed = True
        elif s == "re":
            if R1(q):
                w = w[:q] + "r"
                stemmed = True
        elif s == "le":
            if R1(q):
                w = _lengthen_V(w[:q] + "l")
                stemmed = True
        elif s == "ene":
            if R1(q) and _C(w, q):
                w = _lengthen_V(w[:q] + "en")
                stemmed = True
        elif s == "ieve":
            if R1(q) and _C(w, q):
                w = w[:q] + "ief"
                stemmed = True

    # ---- Step 3 (a_2)
    m = _match(w, len(w), _A2)
    if m is not None:
        s, q = m
        if s == "atie":
            if R1(q):
                w = w[:q] + "eer"
                stemmed = True
        elif s == "iteit":
            if R1(q):
                w = _lengthen_V(w[:q])
                stemmed = True
        elif s in ("heid", "sel", "ster"):
            if R1(q):
                w = w[:q]
                stemmed = True
        elif s == "rder":
            w = w[:q] + "r"
            stemmed = True
        elif s in ("isme", "ing", "erij"):
            if R1(q):
                w = _lengthen_V(w[:q])
                stemmed = True
        elif s == "arij":
            if R1(q) and _C(w, q):
                w = w[:q] + "aar"
                stemmed = True
        elif s == "fie":
            if R2(q):
                w = _lengthen_V(w[:q] + "f")
                stemmed = True
        elif s == "gie":
            if R2(q):
                w = _lengthen_V(w[:q] + "g")
                stemmed = True
        elif s == "tst":
            if R1(q) and _C(w, q):
                w = w[:q] + "t"
                stemmed = True
        elif s == "dst":
            if R1(q) and _C(w, q):
                w = w[:q] + "d"
                stemmed = True

    # ---- Step 4 (a_3, falling through to ig/iger/igst)
    done4 = False
    m = _match(w, len(w), _A3)
    if m is not None:
        s, q = m
        if s == "ioneel" and R1(q):
            w = w[:q] + "ie"
            stemmed = done4 = True
        elif s == "atief" and R1(q):
            w = w[:q] + "eer"
            stemmed = done4 = True
        elif s == "baar" and R1(q):
            w = w[:q]
            stemmed = done4 = True
        elif s == "naar" and R1(q) and _V(w, q):
            w = w[:q] + "n"
            stemmed = done4 = True
        elif s == "laar" and R1(q) and _V(w, q):
            w = w[:q] + "l"
            stemmed = done4 = True
        elif s == "raar" and R1(q) and _V(w, q):
            w = w[:q] + "r"
            stemmed = done4 = True
        elif s == "tant" and R1(q):
            w = w[:q] + "teer"
            stemmed = done4 = True
        elif s in ("lijker", "lijkst") and R1(q):
            w = w[:q] + "lijk"
            stemmed = done4 = True
        elif s in ("achtig", "achtiger", "achtigst") and R1(q):
            w = w[:q]
            stemmed = done4 = True
        elif s in ("end", "erig", "eriger", "erigst") and R1(q) \
                and _C(w, q):
            w = _lengthen_V(w[:q])
            stemmed = done4 = True
    if not done4:
        m = _match(w, len(w), ("iger", "igst", "ig"))
        if m is not None:
            s, q = m
            if R1(q) and _C(w, q):
                w = _lengthen_V(w[:q])
                stemmed = True

    # ---- Lose_prefix, then Step_1c
    ge_removed = False
    if w.startswith("ge") and len(w) >= 5:
        i = 2
        while i < len(w) and w[i] not in _KP_V:
            i += 1
        if i < len(w):
            j = i
            while j < len(w) and w[j] in _KP_V:
                j += 1
            if j < len(w):
                w = w[2:]
                ge_removed = True
                p1, p2 = _kp_measure(w)
    if ge_removed:
        w = _step_1c(w, p1)

    # ---- Lose_infix, then Step_1c
    ge_removed = False
    k = w.find("ge", 1)
    if k >= 1 and k + 5 <= len(w):
        i = k + 2
        while i < len(w) and w[i] not in _KP_V:
            i += 1
        if i < len(w):
            j = i
            while j < len(w) and w[j] in _KP_V:
                j += 1
            if j < len(w):
                w = w[:k] + w[k + 2:]
                ge_removed = True
                p1, p2 = _kp_measure(w)
    if ge_removed:
        w = _step_1c(w, p1)

    # ---- Step 7 (undo consonant assimilation)
    m = _match(w, len(w), ("kt", "ft", "pt"))
    if m is not None:
        s, q = m
        w = w[:q] + {"kt": "k", "ft": "f", "pt": "p"}[s]
        stemmed = True

    # ---- Step 6 (undouble / final devoice) when anything changed
    if stemmed or ge_removed:
        m = _match(w, len(w), (
            "bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll", "mm",
            "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz",
            "v", "z"))
        if m is not None:
            s, q = m
            if s == "v":
                w = w[:q] + "f"
            elif s == "z":
                w = w[:q] + "s"
            else:
                w = w[:q] + s[0]

    if y_found:
        w = w.replace("Y", "y")
    return w


def _step_1c(w: str, p1: int) -> str:
    """r_Step_1c (:1591): final d/t in R1 after a consonant, vetoed when
    preceded by n/h also in R1."""
    if not w:
        return w
    q = len(w) - 1
    c = w[q]
    if c not in "dt" or q < p1 or not _C(w, q):
        return w
    veto = "n" if c == "d" else "h"
    if q >= 1 and w[q - 1] == veto and q - 1 >= p1:
        return w
    return w[:q]
