"""Original German stemmer (``Analysis/De/GermanStemmer.cs`` — the
Caumanns '99 algorithm behind GermanStemFilter; the 4.8 GermanAnalyzer
default is the LIGHT stemmer in lang_stem.py, this one is the classic
opt-in filter).

Phases: Substitute (umlaut folds, ß→ss, duplicate-char and digraph
markers *, $, §, %, &, #, !), recursive suffix Strip gated on
length+substCount, Optimize (erin* repair, z→x), Resubstitute (markers
back to their digraphs), RemoveParticleDenotion (infix 'gege'→'ge').

One reference bug reproduced: the 'sch' branch ASSIGNS ``substCount = 2``
instead of adding (``GermanStemmer.cs:153`` ``substCount = +2``).
"""

from __future__ import annotations


def _substitute(buf: list[str]) -> int:
    subst = 0
    c = 0
    while c < len(buf):
        if c > 0 and buf[c] == buf[c - 1]:
            buf[c] = "*"
        elif buf[c] == "ä":
            buf[c] = "a"
        elif buf[c] == "ö":
            buf[c] = "o"
        elif buf[c] == "ü":
            buf[c] = "u"
        elif buf[c] == "ß":
            buf[c] = "s"
            buf.insert(c + 1, "s")
            subst += 1
        if c < len(buf) - 1:
            if (c < len(buf) - 2 and buf[c] == "s" and buf[c + 1] == "c"
                    and buf[c + 2] == "h"):
                buf[c] = "$"
                del buf[c + 1:c + 3]
                subst = 2   # reference bug: '=' not '+='
            elif buf[c] == "c" and buf[c + 1] == "h":
                buf[c] = "§"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "e" and buf[c + 1] == "i":
                buf[c] = "%"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "e":
                buf[c] = "&"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "i" and buf[c + 1] == "g":
                buf[c] = "#"
                del buf[c + 1]
                subst += 1
            elif buf[c] == "s" and buf[c + 1] == "t":
                buf[c] = "!"
                del buf[c + 1]
                subst += 1
        c += 1
    return subst


def _strip(buf: list[str], subst: int) -> None:
    while len(buf) > 3:
        n = len(buf)
        if n + subst > 5 and buf[-2] == "n" and buf[-1] == "d":
            del buf[-2:]
        elif n + subst > 4 and buf[-2] == "e" and buf[-1] == "m":
            del buf[-2:]
        elif n + subst > 4 and buf[-2] == "e" and buf[-1] == "r":
            del buf[-2:]
        elif buf[-1] in ("e", "s", "n", "t"):
            del buf[-1]
        else:
            break


def _resubstitute(buf: list[str]) -> None:
    repl = {"$": "sch", "§": "ch", "%": "ei", "&": "ie", "#": "ig",
            "!": "st"}
    c = 0
    while c < len(buf):
        ch = buf[c]
        if ch == "*":
            buf[c] = buf[c - 1]
        elif ch in repl:
            expansion = repl[ch]
            buf[c] = expansion[0]
            for k, x in enumerate(expansion[1:], start=1):
                buf.insert(c + k, x)
        c += 1


def german_stem(term: str) -> str:
    """GermanStemmer.Stem."""
    term = term.lower()
    if not term.isalpha() or not term:
        return term
    buf = list(term)
    subst = _substitute(buf)
    _strip(buf, subst)
    # optimize
    if len(buf) > 5 and buf[-5:] == list("erin*"):
        del buf[-1]
        _strip(buf, subst)
    if buf and buf[-1] == "z":
        buf[-1] = "x"
    _resubstitute(buf)
    # remove particle denotion: infix 'gege' -> drop the first 'ge'
    if len(buf) > 4:
        for c in range(len(buf) - 3):
            if buf[c:c + 4] == list("gege"):
                del buf[c:c + 2]
                break
    return "".join(buf)
