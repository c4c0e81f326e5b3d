"""Original Metaphone (``Language/Metaphone.cs`` — the commons-codec port
of Lawrence Philips' 1990 Metaphone, Computer Language 7(12)).

Re-expressed from the PUBLIC algorithm (NOT a port): initial-cluster
rewrites (AE/GN/KN/PN/WR drop the first letter, X→S, WH→W), duplicate
letters collapse except C, and the per-letter sound rules (soft C, SCH,
CH/TCH, DGE/DGI/DGY, silent GH/GN, H after VARSON, silent K after C,
PH→F, SH/SIO/SIA→X, TIA/TIO→X, TH→0, W/Y only before vowels, X→KS).
Default max code length 4, truncated after the final append like the
reference (AXEAXE→AKSK).  Parity pinned by the reference suite's vectors
(tests/test_metaphone.py, from
``Tests.Analysis.Phonetic/Language/MetaphoneTest.cs:380-500``).
"""

from __future__ import annotations

VOWELS = "AEIOU"
FRONTV = "EIY"   # letters that soften C/G/D
VARSON = "CSPTG"  # letters that silence a following H


def metaphone(txt: str | None, max_code_len: int = 4) -> str:
    if not txt:
        return ""
    if len(txt) == 1:
        return txt.upper()
    inwd = txt.upper()

    # initial-cluster rewrites
    first, second = inwd[0], inwd[1]
    if first in "KGP" and second == "N":
        local = inwd[1:]
    elif first == "A" and second == "E":
        local = inwd[1:]
    elif first == "W" and second == "R":
        local = inwd[1:]
    elif first == "W" and second == "H":
        local = "W" + inwd[2:]
    elif first == "X":
        local = "S" + inwd[1:]
    else:
        local = inwd

    wdsz = len(local)
    code: list[str] = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in VOWELS

    def prev_is(i: int, ch: str) -> bool:
        return i > 0 and local[i - 1] == ch

    def next_is(i: int, ch: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == ch

    def region(i: int, s: str) -> bool:
        return local[i:i + len(s)] == s

    def last(i: int) -> bool:
        return i == wdsz - 1

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):  # collapse duplicates except C
            n += 1
            continue
        if symb in VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (prev_is(n, "M") and last(n)):  # silent B in terminal MB
                code.append("B")
        elif symb == "C":
            if (prev_is(n, "S") and not last(n)
                    and local[n + 1] in FRONTV):
                pass  # silent in SCI/SCE/SCY
            elif region(n, "CIA"):
                code.append("X")
            elif not last(n) and local[n + 1] in FRONTV:
                code.append("S")  # soft C
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and is_vowel(2):
                    code.append("K")  # word-initial CH + vowel (CHARACTER)
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if (n + 2 < wdsz and next_is(n, "G")
                    and local[n + 2] in FRONTV):
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = False
            if last(n + 1) and next_is(n, "H"):
                silent = True  # terminal GH
            elif (n + 1 < wdsz - 1 and next_is(n, "H")
                  and not is_vowel(n + 2)):
                silent = True  # GH not before a vowel
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                silent = True  # silent G in (ends with) GN / GNED
            if not silent:
                hard = prev_is(n, "G")
                if not last(n) and local[n + 1] in FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if last(n):
                pass  # terminal H silent
            elif n > 0 and local[n - 1] in VARSON:
                pass  # silent after CSPTG
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if not prev_is(n, "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in TCH
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if not last(n) and is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
        if len(code) > max_code_len:  # X's "KS" can overflow by one
            del code[max_code_len:]
    return "".join(code)
