"""Daitch-Mokotoff Soundex (``Language/DaitchMokotoffSoundex.cs`` —
commons-codec's implementation of the public Avotaynu / JewishGen D-M
standard; the rule table below IS that public standard, the same table
``dmrules.txt`` encodes).

Re-expressed from the public algorithm (NOT ported): context rules
(code at word start / before a vowel / otherwise), longest-pattern-first
matching per position, BRANCHING alternatives ('|' codes like c → 4|5),
adjacent-duplicate code suppression keyed on the previous replacement
(with the m↔n adjacency force-append exception), 6-digit zero-padded
codes; ``soundex()`` returns every branch joined by '|', ``encode()``
the first-alternative single code.
"""

from __future__ import annotations

MAX_LENGTH = 6

# (pattern, at_start, before_vowel, default) — the public D-M table
_RAW_RULES = [
    # vowels
    ("a", "0", "", ""), ("e", "0", "", ""), ("i", "0", "", ""),
    ("o", "0", "", ""), ("u", "0", "", ""),
    # consonants
    ("b", "7", "7", "7"), ("d", "3", "3", "3"), ("f", "7", "7", "7"),
    ("g", "5", "5", "5"), ("h", "5", "5", ""), ("k", "5", "5", "5"),
    ("l", "8", "8", "8"), ("m", "6", "6", "6"), ("n", "6", "6", "6"),
    ("p", "7", "7", "7"), ("q", "5", "5", "5"), ("r", "9", "9", "9"),
    ("s", "4", "4", "4"), ("t", "3", "3", "3"), ("v", "7", "7", "7"),
    ("w", "7", "7", "7"), ("x", "5", "54", "54"), ("y", "1", "", ""),
    ("z", "4", "4", "4"),
    # Romanian t-cedilla / t-comma
    ("ţ", "3|4", "3|4", "3|4"), ("ț", "3|4", "3|4", "3|4"),
    # Polish ogonki
    ("ę", "", "", "|6"), ("ą", "", "", "|6"),
    # multi-letter sequences
    ("schtsch", "2", "4", "4"), ("schtsh", "2", "4", "4"),
    ("schtch", "2", "4", "4"), ("shtch", "2", "4", "4"),
    ("shtsh", "2", "4", "4"), ("stsch", "2", "4", "4"),
    ("ttsch", "4", "4", "4"), ("zhdzh", "2", "4", "4"),
    ("shch", "2", "4", "4"), ("scht", "2", "43", "43"),
    ("schd", "2", "43", "43"), ("stch", "2", "4", "4"),
    ("strz", "2", "4", "4"), ("strs", "2", "4", "4"),
    ("stsh", "2", "4", "4"), ("szcz", "2", "4", "4"),
    ("szcs", "2", "4", "4"), ("ttch", "4", "4", "4"),
    ("tsch", "4", "4", "4"), ("ttsz", "4", "4", "4"),
    ("zdzh", "2", "4", "4"), ("zsch", "4", "4", "4"),
    ("chs", "5", "54", "54"), ("csz", "4", "4", "4"),
    ("czs", "4", "4", "4"), ("drz", "4", "4", "4"),
    ("drs", "4", "4", "4"), ("dsh", "4", "4", "4"),
    ("dsz", "4", "4", "4"), ("dzh", "4", "4", "4"),
    ("dzs", "4", "4", "4"), ("sch", "4", "4", "4"),
    ("sht", "2", "43", "43"), ("szt", "2", "43", "43"),
    ("shd", "2", "43", "43"), ("szd", "2", "43", "43"),
    ("tch", "4", "4", "4"), ("trz", "4", "4", "4"),
    ("trs", "4", "4", "4"), ("tsh", "4", "4", "4"),
    ("tts", "4", "4", "4"), ("ttz", "4", "4", "4"),
    ("tzs", "4", "4", "4"), ("tsz", "4", "4", "4"),
    ("zdz", "2", "4", "4"), ("zhd", "2", "43", "43"),
    ("zsh", "4", "4", "4"),
    ("ai", "0", "1", ""), ("aj", "0", "1", ""), ("ay", "0", "1", ""),
    ("au", "0", "7", ""), ("cz", "4", "4", "4"), ("cs", "4", "4", "4"),
    ("ds", "4", "4", "4"), ("dz", "4", "4", "4"), ("dt", "3", "3", "3"),
    ("ei", "0", "1", ""), ("ej", "0", "1", ""), ("ey", "0", "1", ""),
    ("eu", "1", "1", ""), ("fb", "7", "7", "7"), ("ia", "1", "", ""),
    ("ie", "1", "", ""), ("io", "1", "", ""), ("iu", "1", "", ""),
    ("ks", "5", "54", "54"), ("kh", "5", "5", "5"),
    ("mn", "66", "66", "66"), ("nm", "66", "66", "66"),
    ("oi", "0", "1", ""), ("oj", "0", "1", ""), ("oy", "0", "1", ""),
    ("pf", "7", "7", "7"), ("ph", "7", "7", "7"), ("sh", "4", "4", "4"),
    ("sc", "2", "4", "4"), ("st", "2", "43", "43"),
    ("sd", "2", "43", "43"), ("sz", "4", "4", "4"), ("th", "3", "3", "3"),
    ("ts", "4", "4", "4"), ("tc", "4", "4", "4"), ("tz", "4", "4", "4"),
    ("ui", "0", "1", ""), ("uj", "0", "1", ""), ("uy", "0", "1", ""),
    ("ue", "0", "1", ""), ("zd", "2", "43", "43"), ("zh", "4", "4", "4"),
    ("zs", "4", "4", "4"),
    # branching cases
    ("c", "4|5", "4|5", "4|5"), ("ch", "4|5", "4|5", "4|5"),
    ("ck", "5|45", "5|45", "5|45"), ("rs", "4|94", "4|94", "4|94"),
    ("rz", "4|94", "4|94", "4|94"), ("j", "1|4", "|4", "|4"),
]

_FOLDINGS = {
    "ß": "s", "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "æ": "a", "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e", "ì": "i",
    "í": "i", "î": "i", "ï": "i", "ð": "d", "ñ": "n", "ò": "o", "ó": "o",
    "ô": "o", "õ": "o", "ö": "o", "ø": "o", "ù": "u", "ú": "u", "û": "u",
    "ý": "y", "þ": "b", "ÿ": "y", "ć": "c", "ł": "l", "ś": "s", "ż": "z",
    "ź": "z",
}

_VOWELS = set("aeiou")

# group by first char, longest pattern first (the matcher's order)
_RULES: dict[str, list[tuple[str, list[str], list[str], list[str]]]] = {}
for pat, at_start, before_vowel, default in _RAW_RULES:
    _RULES.setdefault(pat[0], []).append(
        (pat, at_start.split("|"), before_vowel.split("|"),
         default.split("|")))
for lst in _RULES.values():
    lst.sort(key=lambda r: -len(r[0]))


class _Branch:
    __slots__ = ("code", "last")

    def __init__(self, code: str = "", last: str | None = None):
        self.code = code
        self.last = last

    def copy(self) -> "_Branch":
        return _Branch(self.code, self.last)

    def process(self, replacement: str, force: bool) -> None:
        append = (self.last is None
                  or not self.last.endswith(replacement) or force)
        if append and len(self.code) < MAX_LENGTH:
            self.code = (self.code + replacement)[:MAX_LENGTH]
        self.last = replacement

    def finished(self) -> str:
        return (self.code + "0" * MAX_LENGTH)[:MAX_LENGTH]


def _cleanup(source: str) -> str:
    out = []
    for ch in source:
        if ch.isspace():
            continue
        ch = ch.lower()
        out.append(_FOLDINGS.get(ch, ch))
    return "".join(out)


def _soundexes(source: str, branching: bool) -> list[str]:
    text = _cleanup(source)
    branches = [_Branch()]
    last_char = "\0"
    index = 0
    n = len(text)
    while index < n:
        ch = text[index]
        rules = _RULES.get(ch)
        if rules is None:
            index += 1
            continue
        context = text[index:]
        for pat, at_start, before_vowel, default in rules:
            if not context.startswith(pat):
                continue
            if last_char == "\0":
                replacements = at_start
            else:
                nxt = text[index + len(pat)] if index + len(pat) < n else ""
                replacements = before_vowel if nxt in _VOWELS else default
            branch_req = len(replacements) > 1 and branching
            if branching:
                nxt_branches: list[_Branch] = []
                seen: set[str] = set()
                for br in branches:
                    for rep in replacements:
                        nb = br.copy() if branch_req else br
                        force = ((last_char == "m" and ch == "n")
                                 or (last_char == "n" and ch == "m"))
                        nb.process(rep, force)
                        if nb.code not in seen:
                            seen.add(nb.code)
                            nxt_branches.append(nb)
                branches = nxt_branches
            else:
                force = ((last_char == "m" and ch == "n")
                         or (last_char == "n" and ch == "m"))
                branches[0].process(replacements[0], force)
            index += len(pat) - 1
            break
        last_char = ch
        index += 1
    return [b.finished() for b in branches]


def dm_soundex(source: str | None) -> str | None:
    """All branch codes joined by '|' (GetSoundex)."""
    if source is None:
        return None
    return "|".join(_soundexes(source, branching=True))


def dm_encode(source: str | None) -> str | None:
    """The single first-alternative code (Encode)."""
    if source is None:
        return None
    return _soundexes(source, branching=False)[0]
