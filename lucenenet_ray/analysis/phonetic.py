"""Phonetic encoders + filter (Lucene.Net.Analysis.Phonetic analogs).

Reference semantics re-expressed (NOT ported):

- :func:`soundex` — ``Language/Soundex.cs`` US_ENGLISH (mapping string
  :59, GetSoundex :281-316): clean to letters/uppercase, keep the first
  letter, map the rest through ``01230120022455012623010202``; H and W are
  skipped WITHOUT updating the last digit (specialCaseHW — letters
  separated by H/W collapse), vowels are dropped but DO update it (they
  break runs); the first letter's own code participates in the collapse;
  pad/truncate to 4.

- :func:`refined_soundex` — ``Language/RefinedSoundex.cs`` (mapping :36,
  GetSoundex :164-199): first letter + the code of EVERY letter (vowel
  codes '0' included) with adjacent-duplicate collapse, unlimited length.

- :func:`phonetic_filter` — ``PhoneticFilter.cs:60-110``: per token,
  encode; if the code is non-empty and differs from the term, emit the
  phonetic token first at the token's position and (when ``inject``) the
  original stacked behind it with position-increment 0; encoder errors
  fall back to the plain token (:72-79 catch).

The encoders raise ``ValueError`` for letters outside A-Z after cleaning
(Soundex.Map :268 ArgumentException); ``phonetic_filter`` catches it like
the reference filter does.
"""

from __future__ import annotations

from lucenenet_ray.analysis.standard import StandardAnalyzer

_SOUNDEX_MAP = "01230120022455012623010202"
_REFINED_MAP = "01360240043788015936020505"


def _clean(s: str) -> str:
    """SoundexUtils.Clean (:41-63): letters only, uppercased."""
    return "".join(ch for ch in s if ch.isalpha()).upper()


def _map_code(ch: str, mapping: str) -> str:
    i = ord(ch) - 65
    if i < 0 or i >= 26:
        raise ValueError(f"character is not mapped: {ch}")
    return mapping[i]


def soundex(s: str) -> str:
    """4-char US-English Soundex code ('' for no-letter input)."""
    s = _clean(s)
    if not s:
        return ""
    out = [s[0]]
    last = _map_code(s[0], _SOUNDEX_MAP)
    for ch in s[1:]:
        if len(out) >= 4:
            break
        if ch in ("H", "W"):  # ignored completely, last digit unchanged
            continue
        d = _map_code(ch, _SOUNDEX_MAP)
        if d != "0" and d != last:
            out.append(d)
        last = d
    return "".join(out) + "0" * (4 - len(out))


def refined_soundex(s: str) -> str:
    """Variable-length refined Soundex code ('' for no-letter input)."""
    s = _clean(s)
    if not s:
        return ""
    out = [s[0]]
    last = None
    for ch in s:
        c = _map_code(ch, _REFINED_MAP)
        if c == last:
            continue
        out.append(c)
        last = c
    return "".join(out)


def phonetic_filter(terms: list[str], positions: list[int], encoder,
                    inject: bool = True) -> tuple[list[str], list[int]]:
    """Apply a phonetic encoder to a (terms, positions) stream."""
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        try:
            code = encoder(t)
        except ValueError:
            code = ""
        if not code or code == t:
            out_t.append(t)
            out_p.append(p)
            continue
        out_t.append(code)
        out_p.append(p)
        if inject:  # original stacked at the same position (posIncr=0)
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


class PhoneticAnalyzer(StandardAnalyzer):
    """StandardAnalyzer chain + PhoneticFilter (PhoneticFilterFactory
    default: inject=true)."""

    def __init__(self, encoder=soundex, inject: bool = True):
        super().__init__()
        self.encoder = encoder
        self.inject = inject

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        terms, pos = super().__call__(text)
        return phonetic_filter(terms, pos, self.encoder, self.inject)
