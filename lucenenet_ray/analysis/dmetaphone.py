"""Double Metaphone (Lucene.Net.Analysis.Phonetic DoubleMetaphoneFilter's
encoder — ``Language/DoubleMetaphone.cs``, the commons-codec port of
Lawrence Philips' published Double Metaphone algorithm, C/C++ Users
Journal June 2000).

Re-expressed from the PUBLIC algorithm (NOT a port of the reference
file): primary + alternate 4-char codes, the full per-letter rule set
(Germanic/Slavic/Romance context conditions, silent initials, terminal
devoicing).  Behavioral parity is pinned by the reference test-suite's
golden vectors (tests/test_dmetaphone.py, from
``Tests.Analysis.Phonetic/Language/DoubleMetaphoneTest.cs:1063-1100``).
"""

from __future__ import annotations

VOWELS = "AEIOUY"
SILENT_START = ("GN", "KN", "PN", "WR", "PS")
L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = ("ES", "EP", "EB", "EL", "EY", "IB",
                                    "IL", "IN", "IE", "EI", "ER")
L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


def _contains(value: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(value):
        return False
    return value[start:start + length] in criteria


class _Result:
    def __init__(self, max_len: int = 4):
        self.max_len = max_len
        self.primary: list[str] = []
        self.alternate: list[str] = []

    def append(self, p: str, a: str | None = None) -> None:
        self.append_primary(p)
        self.append_alternate(p if a is None else a)

    def append_primary(self, s: str) -> None:
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s: str) -> None:
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def complete(self) -> bool:
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)


def double_metaphone(value: str | None, alternate: bool = False,
                     max_len: int = 4) -> str | None:
    """The primary (or alternate) Double Metaphone code; None for empty
    input (commons-codec cleanInput)."""
    value = value.strip().upper() if value is not None else None
    if not value:
        return None
    slavo = any(s in value for s in ("W", "K", "CZ", "WITZ"))
    r = _Result(max_len)
    n = len(value)
    last = n - 1

    def char_at(i: int) -> str:
        return value[i] if 0 <= i < n else "\0"

    def is_vowel(ch: str) -> bool:
        return ch in VOWELS

    index = 1 if value[:2] in SILENT_START else 0
    if value[0] == "X":
        r.append("S")
        index = 1

    while not r.complete() and index <= n - 1:
        ch = value[index]
        if ch in "AEIOUY":
            if index == 0:
                r.append("A")
            index += 1
        elif ch == "B":
            r.append("P")
            index += 2 if char_at(index + 1) == "B" else 1
        elif ch == "Ç":  # Ç
            r.append("S")
            index += 1
        elif ch == "C":
            index = _handle_c(value, r, index, char_at, is_vowel, last)
        elif ch == "D":
            if _contains(value, index, 2, "DG"):
                if _contains(value, index + 2, 1, "I", "E", "Y"):
                    r.append("J")
                    index += 3
                else:
                    r.append("TK")
                    index += 2
            elif _contains(value, index, 2, "DT", "DD"):
                r.append("T")
                index += 2
            else:
                r.append("T")
                index += 1
        elif ch == "F":
            r.append("F")
            index += 2 if char_at(index + 1) == "F" else 1
        elif ch == "G":
            index = _handle_g(value, r, index, slavo, char_at, is_vowel,
                              last)
        elif ch == "H":
            if ((index == 0 or is_vowel(char_at(index - 1)))
                    and is_vowel(char_at(index + 1))):
                r.append("H")
                index += 2
            else:
                index += 1
        elif ch == "J":
            index = _handle_j(value, r, index, slavo, char_at, is_vowel,
                              last)
        elif ch == "K":
            r.append("K")
            index += 2 if char_at(index + 1) == "K" else 1
        elif ch == "L":
            if char_at(index + 1) == "L":
                if _condition_l0(value, index, last):
                    r.append_primary("L")
                else:
                    r.append("L")
                index += 2
            else:
                r.append("L")
                index += 1
        elif ch == "M":
            r.append("M")
            index += 2 if _condition_m0(value, index, char_at, last) else 1
        elif ch == "N":
            r.append("N")
            index += 2 if char_at(index + 1) == "N" else 1
        elif ch == "Ñ":  # Ñ
            r.append("N")
            index += 1
        elif ch == "P":
            if char_at(index + 1) == "H":
                r.append("F")
                index += 2
            else:
                r.append("P")
                index += 2 if _contains(value, index + 1, 1, "P", "B") else 1
        elif ch == "Q":
            r.append("K")
            index += 2 if char_at(index + 1) == "Q" else 1
        elif ch == "R":
            if (index == last and not slavo
                    and _contains(value, index - 2, 2, "IE")
                    and not _contains(value, index - 4, 2, "ME", "MA")):
                r.append_alternate("R")
            else:
                r.append("R")
            index += 2 if char_at(index + 1) == "R" else 1
        elif ch == "S":
            index = _handle_s(value, r, index, slavo, char_at, is_vowel,
                              last)
        elif ch == "T":
            index = _handle_t(value, r, index, char_at)
        elif ch == "V":
            r.append("F")
            index += 2 if char_at(index + 1) == "V" else 1
        elif ch == "W":
            index = _handle_w(value, r, index, char_at, is_vowel, last)
        elif ch == "X":
            if index == 0:
                r.append("S")
                index += 1
            else:
                if not (index == last
                        and (_contains(value, index - 3, 3, "IAU", "EAU")
                             or _contains(value, index - 2, 2, "AU", "OU"))):
                    r.append("KS")
                index += 2 if _contains(value, index + 1, 1, "C", "X") else 1
        elif ch == "Z":
            if char_at(index + 1) == "H":
                r.append("J")
                index += 2
            else:
                if (_contains(value, index + 1, 2, "ZO", "ZI", "ZA")
                        or (slavo and index > 0
                            and char_at(index - 1) != "T")):
                    r.append("S", "TS")
                else:
                    r.append("S")
                index += 2 if char_at(index + 1) == "Z" else 1
        else:
            index += 1
    return "".join(r.alternate if alternate else r.primary)


# ---------------------------------------------------------------------------
# complex-letter handlers


def _condition_c0(value, index, char_at, is_vowel) -> bool:
    if _contains(value, index, 4, "CHIA"):
        return True
    if index <= 1:
        return False
    if is_vowel(char_at(index - 2)):
        return False
    if not _contains(value, index - 1, 3, "ACH"):
        return False
    c2 = char_at(index + 2)
    return ((c2 != "I" and c2 != "E")
            or _contains(value, index - 2, 6, "BACHER", "MACHER"))


def _condition_ch0(value, index) -> bool:
    if index != 0:
        return False
    if (not _contains(value, index + 1, 5, "HARAC", "HARIS")
            and not _contains(value, index + 1, 3, "HOR", "HYM", "HIA",
                              "HEM")):
        return False
    return not _contains(value, 0, 5, "CHORE")


def _condition_ch1(value, index, last) -> bool:
    return (_contains(value, 0, 4, "VAN ", "VON ")
            or _contains(value, 0, 3, "SCH")
            or _contains(value, index - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _contains(value, index + 2, 1, "T", "S")
            or ((_contains(value, index - 1, 1, "A", "O", "U", "E")
                 or index == 0)
                and (_contains(value, index + 2, 1,
                               *L_R_N_M_B_H_F_V_W_SPACE)
                     or index + 1 == last)))


def _handle_ch(value, r, index, last) -> int:
    if index > 0 and _contains(value, index, 4, "CHAE"):
        r.append("K", "X")
    elif _condition_ch0(value, index):
        r.append("K")
    elif _condition_ch1(value, index, last):
        r.append("K")
    else:
        if index > 0:
            if _contains(value, 0, 2, "MC"):
                r.append("K")
            else:
                r.append("X", "K")
        else:
            r.append("X")
    return index + 2


def _handle_cc(value, r, index, char_at) -> int:
    if (_contains(value, index + 2, 1, "I", "E", "H")
            and not _contains(value, index + 2, 2, "HU")):
        if ((index == 1 and char_at(index - 1) == "A")
                or _contains(value, index - 1, 5, "UCCEE", "UCCES")):
            r.append("KS")
        else:
            r.append("X")
        return index + 3
    r.append("K")
    return index + 2


def _handle_c(value, r, index, char_at, is_vowel, last) -> int:
    if _condition_c0(value, index, char_at, is_vowel):
        r.append("K")
        return index + 2
    if index == 0 and _contains(value, index, 6, "CAESAR"):
        r.append("S")
        return index + 2
    if _contains(value, index, 2, "CH"):
        return _handle_ch(value, r, index, last)
    if (_contains(value, index, 2, "CZ")
            and not _contains(value, index - 2, 4, "WICZ")):
        r.append("S", "X")
        return index + 2
    if _contains(value, index + 1, 3, "CIA"):
        r.append("X")
        return index + 3
    if (_contains(value, index, 2, "CC")
            and not (index == 1 and char_at(0) == "M")):
        return _handle_cc(value, r, index, char_at)
    if _contains(value, index, 2, "CK", "CG", "CQ"):
        r.append("K")
        return index + 2
    if _contains(value, index, 2, "CI", "CE", "CY"):
        if _contains(value, index, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")
        else:
            r.append("S")
        return index + 2
    r.append("K")
    if _contains(value, index + 1, 2, " C", " Q", " G"):
        return index + 3
    if (_contains(value, index + 1, 1, "C", "K", "Q")
            and not _contains(value, index + 1, 2, "CE", "CI")):
        return index + 2
    return index + 1


def _handle_gh(value, r, index, char_at, is_vowel) -> int:
    if index > 0 and not is_vowel(char_at(index - 1)):
        r.append("K")
        return index + 2
    if index == 0:
        if char_at(index + 2) == "I":
            r.append("J")
        else:
            r.append("K")
        return index + 2
    if ((index > 1 and _contains(value, index - 2, 1, "B", "H", "D"))
            or (index > 2 and _contains(value, index - 3, 1, "B", "H", "D"))
            or (index > 3 and _contains(value, index - 4, 1, "B", "H"))):
        return index + 2
    if (index > 2 and char_at(index - 1) == "U"
            and _contains(value, index - 3, 1, "C", "G", "L", "R", "T")):
        r.append("F")
    elif index > 0 and char_at(index - 1) != "I":
        r.append("K")
    return index + 2


def _handle_g(value, r, index, slavo, char_at, is_vowel, last) -> int:
    if char_at(index + 1) == "H":
        return _handle_gh(value, r, index, char_at, is_vowel)
    if char_at(index + 1) == "N":
        if index == 1 and is_vowel(char_at(0)) and not slavo:
            r.append("KN", "N")
        elif (not _contains(value, index + 2, 2, "EY")
              and char_at(index + 1) != "Y" and not slavo):
            r.append("N", "KN")
        else:
            r.append("KN")
        return index + 2
    if _contains(value, index + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return index + 2
    if (index == 0
            and (char_at(index + 1) == "Y"
                 or _contains(value, index + 1, 2,
                              *ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER))):
        r.append("K", "J")
        return index + 2
    if ((_contains(value, index + 1, 2, "ER")
         or char_at(index + 1) == "Y")
            and not _contains(value, 0, 6, "DANGER", "RANGER", "MANGER")
            and not _contains(value, index - 1, 1, "E", "I")
            and not _contains(value, index - 1, 3, "RGY", "OGY")):
        r.append("K", "J")
        return index + 2
    if (_contains(value, index + 1, 1, "E", "I", "Y")
            or _contains(value, index - 1, 4, "AGGI", "OGGI")):
        if (_contains(value, 0, 4, "VAN ", "VON ")
                or _contains(value, 0, 3, "SCH")
                or _contains(value, index + 1, 2, "ET")):
            r.append("K")
        elif _contains(value, index + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return index + 2
    if char_at(index + 1) == "G":
        r.append("K")
        return index + 2
    r.append("K")
    return index + 1


def _handle_j(value, r, index, slavo, char_at, is_vowel, last) -> int:
    if (_contains(value, index, 4, "JOSE")
            or _contains(value, 0, 4, "SAN ")):
        if ((index == 0 and char_at(index + 4) == " ")
                or len(value) == 4 or _contains(value, 0, 4, "SAN ")):
            r.append("H")
        else:
            r.append("J", "H")
        return index + 1
    if index == 0 and not _contains(value, index, 4, "JOSE"):
        r.append("J", "A")
    elif (is_vowel(char_at(index - 1)) and not slavo
          and (char_at(index + 1) == "A" or char_at(index + 1) == "O")):
        r.append("J", "H")
    elif index == last:
        r.append("J", " ")
    elif (not _contains(value, index + 1, 1, *L_T_K_S_N_M_B_Z)
          and not _contains(value, index - 1, 1, "S", "K", "L")):
        r.append("J")
    return index + 2 if char_at(index + 1) == "J" else index + 1


def _condition_l0(value, index, last) -> bool:
    if (index == len(value) - 3
            and _contains(value, index - 1, 4, "ILLO", "ILLA", "ALLE")):
        return True
    return ((_contains(value, last - 1, 2, "AS", "OS")
             or _contains(value, last, 1, "A", "O"))
            and _contains(value, index - 1, 4, "ALLE"))


def _condition_m0(value, index, char_at, last) -> bool:
    if char_at(index + 1) == "M":
        return True
    return (_contains(value, index - 1, 3, "UMB")
            and (index + 1 == last
                 or _contains(value, index + 2, 2, "ER")))


def _handle_sc(value, r, index, char_at, is_vowel) -> int:
    if char_at(index + 2) == "H":
        if _contains(value, index + 3, 2, "OO", "ER", "EN", "UY", "ED",
                     "EM"):
            if _contains(value, index + 3, 2, "ER", "EN"):
                r.append("X", "SK")
            else:
                r.append("SK")
        else:
            if index == 0 and not is_vowel(char_at(3)) and char_at(3) != "W":
                r.append("X", "S")
            else:
                r.append("X")
    elif _contains(value, index + 2, 1, "I", "E", "Y"):
        r.append("S")
    else:
        r.append("SK")
    return index + 3


def _handle_s(value, r, index, slavo, char_at, is_vowel, last) -> int:
    if _contains(value, index - 1, 3, "ISL", "YSL"):
        return index + 1
    if index == 0 and _contains(value, index, 5, "SUGAR"):
        r.append("X", "S")
        return index + 1
    if _contains(value, index, 2, "SH"):
        if _contains(value, index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")
        else:
            r.append("X")
        return index + 2
    if (_contains(value, index, 3, "SIO", "SIA")
            or _contains(value, index, 4, "SIAN")):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return index + 3
    if ((index == 0 and _contains(value, index + 1, 1, "M", "N", "L", "W"))
            or _contains(value, index + 1, 1, "Z")):
        r.append("S", "X")
        return index + 2 if _contains(value, index + 1, 1, "Z") else index + 1
    if _contains(value, index, 2, "SC"):
        return _handle_sc(value, r, index, char_at, is_vowel)
    if index == last and _contains(value, index - 2, 2, "AI", "OI"):
        r.append_alternate("S")
    else:
        r.append("S")
    return index + 2 if _contains(value, index + 1, 1, "S", "Z") else index + 1


def _handle_t(value, r, index, char_at) -> int:
    if _contains(value, index, 4, "TION"):
        r.append("X")
        return index + 3
    if _contains(value, index, 3, "TIA", "TCH"):
        r.append("X")
        return index + 3
    if (_contains(value, index, 2, "TH")
            or _contains(value, index, 3, "TTH")):
        if (_contains(value, index + 2, 2, "OM", "AM")
                or _contains(value, 0, 4, "VAN ", "VON ")
                or _contains(value, 0, 3, "SCH")):
            r.append("T")
        else:
            r.append("0", "T")
        return index + 2
    r.append("T")
    return index + 2 if _contains(value, index + 1, 1, "T", "D") else index + 1


def _handle_w(value, r, index, char_at, is_vowel, last) -> int:
    if _contains(value, index, 2, "WR"):
        r.append("R")
        return index + 2
    if (index == 0
            and (is_vowel(char_at(index + 1))
                 or _contains(value, index, 2, "WH"))):
        if is_vowel(char_at(index + 1)):
            r.append("A", "F")
        else:
            r.append("A")
        return index + 1
    if ((index == last and is_vowel(char_at(index - 1)))
            or _contains(value, index - 1, 5, "EWSKI", "EWSKY", "OWSKI",
                         "OWSKY")
            or _contains(value, 0, 3, "SCH")):
        r.append_alternate("F")
        return index + 1
    if _contains(value, index, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return index + 4
    return index + 1
