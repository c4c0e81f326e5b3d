"""Caverphone 2.0 (``Language/Caverphone2.cs`` — commons-codec's port of
David Hood's Caverphone 2.0, Caversham Project, University of Otago).

Re-expressed from the public specification (NOT ported): the fixed
ordered regex rewrite pipeline — lowercase/clean, trailing-e drop, the
{c,r,t,en,tr}ough 2f rewrites, soft-c, dg/tio/tia, b→p d→t v→f,
vowel→3 with initial-vowel→A, the 2.0 y/j rules, gh/w/h/r/l eliding with
vowel-context uppercase retention, run collapsing (s+→S etc.), trailing
3→A, and the 10-char '1' pad."""

from __future__ import annotations

import re

_TEN_1 = "1111111111"

_RULES = [
    ("e$", ""), ("^cough", "cou2f"), ("^rough", "rou2f"),
    ("^tough", "tou2f"), ("^enough", "enou2f"), ("^trough", "trou2f"),
    ("^gn", "2n"), ("mb$", "m2"), ("cq", "2q"), ("ci", "si"),
    ("ce", "se"), ("cy", "sy"), ("tch", "2ch"), ("c", "k"), ("q", "k"),
    ("x", "k"), ("v", "f"), ("dg", "2g"), ("tio", "sio"), ("tia", "sia"),
    ("d", "t"), ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ("^[aeiou]", "A"), ("[aeiou]", "3"), ("j", "y"), ("^y3", "Y3"),
    ("^y", "A"), ("y", "3"), ("3gh3", "3kh3"), ("gh", "22"), ("g", "k"),
    ("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"), ("f+", "F"),
    ("m+", "M"), ("n+", "N"), ("w3", "W3"), ("wh3", "Wh3"), ("w$", "3"),
    ("w", "2"), ("^h", "A"), ("h", "2"), ("r3", "R3"), ("r$", "3"),
    ("r", "2"), ("l3", "L3"), ("l$", "3"), ("l", "2"), ("2", ""),
    ("3$", "A"), ("3", ""),
]
_COMPILED = [(re.compile(p), rep) for p, rep in _RULES]


def caverphone2(source: str | None) -> str:
    """10-char Caverphone 2.0 code ('1111111111' for empty input)."""
    if not source:
        return _TEN_1
    txt = re.sub("[^a-z]", "", source.lower())
    for pat, rep in _COMPILED:
        txt = pat.sub(rep, txt)
    return (txt + _TEN_1)[:len(_TEN_1)]


_SIX_1 = "111111"

# Caverphone 1.0 (``Language/Caverphone1.cs``): the original 1.0 pipeline —
# no trailing-e drop or ^trough, w/r/l are elided unconditionally at the
# end (no $→3 retention), 1.0-only wy/why/ry/ly/j/y rules, 6-char code.
_RULES_V1 = [
    ("^cough", "cou2f"), ("^rough", "rou2f"), ("^tough", "tou2f"),
    ("^enough", "enou2f"), ("^gn", "2n"), ("mb$", "m2"), ("cq", "2q"),
    ("ci", "si"), ("ce", "se"), ("cy", "sy"), ("tch", "2ch"), ("c", "k"),
    ("q", "k"), ("x", "k"), ("v", "f"), ("dg", "2g"), ("tio", "sio"),
    ("tia", "sia"), ("d", "t"), ("ph", "fh"), ("b", "p"), ("sh", "s2"),
    ("z", "s"), ("^[aeiou]", "A"), ("[aeiou]", "3"), ("3gh3", "3kh3"),
    ("gh", "22"), ("g", "k"), ("s+", "S"), ("t+", "T"), ("p+", "P"),
    ("k+", "K"), ("f+", "F"), ("m+", "M"), ("n+", "N"), ("w3", "W3"),
    ("wy", "Wy"), ("wh3", "Wh3"), ("why", "Why"), ("w", "2"),
    ("^h", "A"), ("h", "2"), ("r3", "R3"), ("ry", "Ry"), ("r", "2"),
    ("l3", "L3"), ("ly", "Ly"), ("l", "2"), ("j", "y"), ("y3", "Y3"),
    ("y", "2"), ("2", ""), ("3", ""),
]
_COMPILED_V1 = [(re.compile(p), rep) for p, rep in _RULES_V1]


def caverphone1(source: str | None) -> str:
    """6-char Caverphone 1.0 code ('111111' for empty input)."""
    if not source:
        return _SIX_1
    txt = re.sub("[^a-z]", "", source.lower())
    for pat, rep in _COMPILED_V1:
        txt = pat.sub(rep, txt)
    return (txt + _SIX_1)[:len(_SIX_1)]
