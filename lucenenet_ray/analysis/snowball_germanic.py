"""Germanic Snowball stemmers (SnowballFilter analog, wave 2).

German / German2 / Dutch re-expressions of the published Snowball
algorithms, matching the reference's generated Tartarus programs
(``src/Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/
{German,German2,Dutch}Stemmer.cs``) — validated word-for-word against the
reference vocabulary fixtures (``TestSnowballVocabData.zip``).

See snowball_romance.py for the shared among/commit semantics notes.
"""

from __future__ import annotations

from lucenenet_ray.analysis.snowball_romance import _r1

_DE_V = frozenset("aeiouyäöü")
_DE_S_END = frozenset("bdfghklmnrt")   # g_s_ending (GermanStemmer.cs:86)
_DE_ST_END = frozenset("bdfghklmnt")   # g_st_ending (GermanStemmer.cs:88)

_DE_STEP1 = tuple(sorted((
    ("e", 1), ("em", 1), ("en", 1), ("ern", 1), ("er", 1), ("s", 2),
    ("es", 1),
), key=lambda t: len(t[0]), reverse=True))
_DE_STEP2 = tuple(sorted((
    ("en", 1), ("er", 1), ("st", 2), ("est", 1),
), key=lambda t: len(t[0]), reverse=True))
_DE_STEP3 = tuple(sorted((
    ("end", 1), ("ig", 2), ("ung", 1), ("lich", 3), ("isch", 2),
    ("ik", 2), ("heit", 3), ("keit", 4),
), key=lambda t: len(t[0]), reverse=True))

_DE_POST = str.maketrans({"Y": "y", "U": "u", "ä": "a", "ö": "o",
                          "ü": "u"})


def _de_mark_uv(w: str) -> str:
    """u/y between vowels -> U/Y (GermanStemmer.cs r_prelude second loop)."""
    ch = list(w)
    for i in range(1, len(ch) - 1):
        if ch[i] in "uy" and ch[i - 1] in _DE_V and ch[i + 1] in _DE_V:
            ch[i] = ch[i].upper()
    return "".join(ch)


def _de_backward(w: str) -> str:
    """Shared German/German2 standard_suffix (GermanStemmer.cs:512-710):
    three sequential try-steps, R1 with the 3-char minimum, R2."""
    r1 = max(_r1(w, _DE_V), min(3, len(w)))
    r2 = _r1(w, _DE_V, _r1(w, _DE_V))

    # step 1 (a_1, R1)
    for suf, code in _DE_STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if code == 1:
                w = w[: -len(suf)]
            elif len(w) >= 2 and w[-2] in _DE_S_END:
                w = w[:-1]
            break
    # step 2 (a_2, R1); st needs a valid st-ending itself preceded by
    # >= 3 letters
    for suf, code in _DE_STEP2:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if code == 1:
                w = w[: -len(suf)]
            elif (len(w) >= 6 and w[-3] in _DE_ST_END):
                w = w[:-2]
            break
    # step 3 (a_4, R2, derivational)
    for suf, code in _DE_STEP3:
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            base = len(w) - len(suf)
            if code == 1:                     # end/ung
                w = w[:base]
                if (w.endswith("ig") and not w.endswith("eig")
                        and len(w) - 2 >= r2):
                    w = w[:-2]
            elif code == 2:                   # ig/isch/ik, not after e
                if not (base >= 1 and w[base - 1] == "e"):
                    w = w[:base]
            elif code == 3:                   # lich/heit
                w = w[:base]
                for pre in ("er", "en"):
                    if w.endswith(pre) and len(w) - 2 >= r1:
                        w = w[:-2]
                        break
            else:                             # keit
                w = w[:base]
                for pre in ("lich", "ig"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
            break
    return w


def german_snowball_stem(word: str) -> str:
    """German Snowball stemmer (GermanStemmer.cs): ss-fold prelude first,
    then u/y marking."""
    w = _de_mark_uv(word.replace("ß", "ss"))
    return _de_backward(w).translate(_DE_POST)


def german2_stem(word: str) -> str:
    """German2 Snowball variant (German2Stemmer.cs): u/y marking FIRST,
    then ß->ss and ae/oe/ue -> umlauts with qu protected."""
    w = _de_mark_uv(word)
    out = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        if c == "ß":
            out.append("ss")
            i += 1
        elif c == "a" and nxt == "e":
            out.append("ä")
            i += 2
        elif c == "o" and nxt == "e":
            out.append("ö")
            i += 2
        elif c == "u" and nxt == "e":
            out.append("ü")
            i += 2
        elif c == "q" and nxt == "u":
            # the among leaves the cursor after "qu" and then hops 2 MORE
            # chars, so the two letters following qu are protected
            out.append(w[i: i + 4])
            i += 4
        else:
            out.append(c)
            i += 1
    return _de_backward("".join(out)).translate(_DE_POST)


# ---------------------------------------------------------------------------
# Dutch (DutchStemmer.cs; among tables a_0..a_5 at :44-90)

_NL_V = frozenset("aeiouyè")
_NL_V_I = _NL_V | {"I"}
_NL_V_J = _NL_V | {"j"}
_NL_DEACCENT = str.maketrans("áäéëíïóöúü", "aaeeiioouu")


def _nl_prelude(w: str) -> str:
    w = w.translate(_NL_DEACCENT)
    ch = list(w)
    if ch and ch[0] == "y":
        ch[0] = "Y"
    for i in range(1, len(ch)):
        if ch[i] == "y" and ch[i - 1] in _NL_V:
            ch[i] = "Y"
        elif (ch[i] == "i" and ch[i - 1] in _NL_V
                and i + 1 < len(ch) and ch[i + 1] in _NL_V):
            ch[i] = "I"
    return "".join(ch)


def _nl_undouble(w: str) -> str:
    if w.endswith(("dd", "kk", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    """Dutch Snowball stemmer (DutchStemmer.cs Stem():937-992)."""
    w = _nl_prelude(word)
    r1 = max(_r1(w, _NL_V), min(3, len(w)))
    r2 = _r1(w, _NL_V, _r1(w, _NL_V))
    e_found = False

    def en_ending(w: str, base: int) -> str | None:
        """R1, preceded by a non-vowel that is not part of 'gem'."""
        if (base >= r1 and base >= 1 and w[base - 1] not in _NL_V
                and not w[:base].endswith("gem")):
            return _nl_undouble(w[:base])
        return None

    # step 1 (a_3)
    for suf, code in (("heden", 1), ("ene", 2), ("en", 2), ("se", 3),
                      ("s", 3)):
        if w.endswith(suf):
            base = len(w) - len(suf)
            if code == 1 and base >= r1:
                w = w[:base] + "heid"
            elif code == 2:
                w2 = en_ending(w, base)
                if w2 is not None:
                    w = w2
            elif code == 3 and base >= r1 and base >= 1 \
                    and w[base - 1] not in _NL_V_J:
                w = w[:base]
            break

    # step 2: e-ending
    if (w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2
            and w[-2] not in _NL_V):
        w = _nl_undouble(w[:-1])
        e_found = True

    # step 3a: heid (not after c) + en-ending
    if w.endswith("heid") and len(w) - 4 >= r2 \
            and not w[: -4].endswith("c"):
        w = w[:-4]
        if w.endswith("en"):
            w2 = en_ending(w, len(w) - 2)
            if w2 is not None:
                w = w2

    # step 3b: derivational (a_4)
    for suf, code in (("lijk", 3), ("baar", 4), ("end", 1), ("ing", 1),
                      ("bar", 5), ("ig", 2)):
        if w.endswith(suf):
            base = len(w) - len(suf)
            if code == 1 and base >= r2:
                w = w[:base]
                if (w.endswith("ig") and len(w) - 2 >= r2
                        and not w[:-2].endswith("e")):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
            elif code == 2 and base >= r2 and base >= 1 \
                    and w[base - 1] != "e":
                w = w[:base]
            elif code == 3 and base >= r2:
                w = w[:base]
                if (w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2
                        and w[-2] not in _NL_V):
                    w = _nl_undouble(w[:-1])
                    e_found = True
            elif code == 4 and base >= r2:
                w = w[:base]
            elif code == 5 and base >= r2 and e_found:
                w = w[:base]
            break

    # step 4: undouble vowel — C V V D with D a non-vowel other than I
    # and C a non-vowel: drop one vowel of aa/ee/oo/uu
    if (len(w) >= 4 and w[-1] not in _NL_V_I
            and w[-3:-1] in ("aa", "ee", "oo", "uu")
            and w[-4] not in _NL_V):
        w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")
