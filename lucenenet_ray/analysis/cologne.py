"""Kölner Phonetik (``Language/ColognePhonetic.cs`` — commons-codec's
implementation of Hans Joachim Postel's 1969 Cologne phonetics for
German).

Re-expressed from the public algorithm (NOT ported), including the
reference's exact streaming quirks: umlaut/ß preprocessing, the X →
'4' + re-queued 'S' expansion, the C rules keyed on BOTH the previous
character and the word-start state, H and non-letters producing the
'-' separator (silently skipped at word start WITHOUT updating state),
'0' vowel codes kept only at the word start, and the
adjacent-duplicate-code suppression with '-' breaking runs."""

from __future__ import annotations

_AEIJOUY = set("AEIJOUY")
_SCZ = set("SCZ")
_WFPV = set("WFPV")
_GKQ = set("GKQ")
_CKQ = set("CKQ")
_AHKLOQRUX = set("AHKLOQRUX")
_SZ = set("SZ")
_AHOUKQX = set("AHOUKQX")
_TDX = set("TDX")
_PRE = {"Ä": "A", "Ü": "U", "Ö": "O", "ß": "S"}


def cologne_phonetic(text: str | None) -> str | None:
    if text is None:
        return None
    chars = [_PRE.get(c, c) for c in text.upper()]
    out: list[str] = []
    queue = list(reversed(chars))  # pop() takes the next input char
    last_char = "-"
    last_code = "/"
    while queue:
        chr_ = queue.pop()
        next_char = queue[-1] if queue else "-"
        if chr_ in _AEIJOUY:
            code = "0"
        elif chr_ == "H" or chr_ < "A" or chr_ > "Z":
            if last_code == "/":
                continue  # word start: skip WITHOUT updating state
            code = "-"
        elif chr_ == "B" or (chr_ == "P" and next_char != "H"):
            code = "1"
        elif chr_ in "DT" and next_char not in _SCZ:
            code = "2"
        elif chr_ in _WFPV:
            code = "3"
        elif chr_ in _GKQ:
            code = "4"
        elif chr_ == "X" and last_char not in _CKQ:
            code = "4"
            queue.append("S")  # re-queue the S half of X
        elif chr_ in "SZ":
            code = "8"
        elif chr_ == "C":
            if last_code == "/":
                code = "4" if next_char in _AHKLOQRUX else "8"
            else:
                code = "8" if (last_char in _SZ
                               or next_char not in _AHOUKQX) else "4"
        elif chr_ in _TDX:
            code = "8"
        elif chr_ == "R":
            code = "7"
        elif chr_ == "L":
            code = "5"
        elif chr_ in "MN":
            code = "6"
        else:
            code = chr_
        if code != "-" and ((last_code != code
                             and (code != "0" or last_code == "/"))
                            or code < "0" or code > "8"):
            out.append(code)
        last_char = chr_
        last_code = code
    return "".join(out)


# ---------------------------------------------------------------------------
# Match Rating Approach (``Language/MatchRatingApproachEncoder.cs`` —
# Western Airlines' 1977 MRA, public via commons-codec)


def _mra_remove_accents(s: str) -> str:
    import unicodedata

    out = []
    for ch in s:
        if ch == "ß":  # no decomposition; the reference keeps it
            out.append(ch)
            continue
        d = unicodedata.normalize("NFD", ch)
        out.append("".join(c for c in d
                           if not unicodedata.combining(c)) or ch)
    return "".join(out)


def match_rating_encode(name: str | None) -> str:
    """6-char MRA code: clean (upper, strip -&'.,, fold accents, drop
    whitespace), drop vowels except a leading one, collapse double
    consonants, keep first-3 + last-3; names shorter than 2 encode ''."""
    import re

    if name is None:
        return ""
    s = name.upper()
    for pat in (r"\-", r"[&]", r"\'", r"\.", r"[\,]"):
        s = re.sub(pat, "", s)
    s = _mra_remove_accents(s)
    s = re.sub(r"\s+", "", s)
    if len(s) < 2:
        return ""
    first = s[0]
    body = re.sub("[AEIOU]", "", s)
    s = first + body if first in "AEIOU" else body
    for dc in ("BB", "CC", "DD", "FF", "GG", "HH", "JJ", "KK", "LL", "MM",
               "NN", "PP", "QQ", "RR", "SS", "TT", "VV", "WW", "XX", "YY",
               "ZZ"):
        s = s.replace(dc, dc[0])
    return s[:3] + s[-3:] if len(s) > 6 else s
