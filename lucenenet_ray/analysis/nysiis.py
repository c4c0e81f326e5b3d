"""NYSIIS phonetic encoder (``Language/Nysiis.cs`` — commons-codec's
New York State Identification and Intelligence System codec).

Re-expressed from the public algorithm (NOT ported), matching the
reference's exact quirks:

- Clean to letters/upper, then the FIRST-CHARACTER rewrites applied as
  anchored regex replacements in order: ``MAC→MCC``, ``KN→NN``, ``K→C``,
  ``PH|PF→FF``, ``SCH→SSS`` and the LAST-CHARACTER rewrites ``EE|IE→Y``,
  ``DT|RT|RD|NT|ND→D`` (:121-127).
- The main scan transcodes char i IN PLACE (multi-char codes overwrite
  the following letters, exactly like the reference's Array.Copy at
  :141): EV→AF, vowels→A, Q→G, Z→S, M→N, KN→NN / K→C, SCH→SSS, PH→FF,
  H→prev when prev or next is not a vowel, W→prev after a vowel; a char
  is appended only when it differs from its predecessor (:143-146).
- Trailing S dropped, AY→Y, trailing A dropped (:148-168); strict mode
  truncates to 6.
"""

from __future__ import annotations

import re

_VOWELS = "AEIOU"
_PAT_FIRST = [(re.compile(r"^MAC"), "MCC"), (re.compile(r"^KN"), "NN"),
              (re.compile(r"^K"), "C"), (re.compile(r"^(PH|PF)"), "FF"),
              (re.compile(r"^SCH"), "SSS")]
_PAT_LAST = [(re.compile(r"(EE|IE)$"), "Y"),
             (re.compile(r"(DT|RT|RD|NT|ND)$"), "D")]


def _is_vowel(c: str) -> bool:
    return c in _VOWELS


def _transcode(prev: str, curr: str, nxt: str, anxt: str) -> str:
    if curr == "E" and nxt == "V":
        return "AF"
    if _is_vowel(curr):
        return "A"
    if curr == "Q":
        return "G"
    if curr == "Z":
        return "S"
    if curr == "M":
        return "N"
    if curr == "K":
        return "NN" if nxt == "N" else "C"
    if curr == "S" and nxt == "C" and anxt == "H":
        return "SSS"
    if curr == "P" and nxt == "H":
        return "FF"
    if curr == "H" and (not _is_vowel(prev) or not _is_vowel(nxt)):
        return prev
    if curr == "W" and _is_vowel(prev):
        return prev
    return curr


def nysiis(s: str | None, strict: bool = True) -> str | None:
    if s is None:
        return None
    s = "".join(ch for ch in s if ch.isalpha()).upper()
    if not s:
        return s
    for pat, rep in _PAT_FIRST:
        s = pat.sub(rep, s, count=1)
    for pat, rep in _PAT_LAST:
        s = pat.sub(rep, s, count=1)
    chars = list(s)
    key = [chars[0]]
    n = len(chars)
    for i in range(1, n):
        nxt = chars[i + 1] if i < n - 1 else " "
        anxt = chars[i + 2] if i < n - 2 else " "
        t = _transcode(chars[i - 1], chars[i], nxt, anxt)
        # in-place write: multi-char codes overwrite the following letters
        for j, ch in enumerate(t):
            if i + j < n:
                chars[i + j] = ch
        if chars[i] != chars[i - 1]:
            key.append(chars[i])
    if len(key) > 1:
        if key[-1] == "S":
            key.pop()
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            del key[-2]
        if key and key[-1] == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out
