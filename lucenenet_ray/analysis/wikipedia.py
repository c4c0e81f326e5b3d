"""WikipediaTokenizer analog — typed tokens over English-Wikipedia-style
markup (``Analysis/Wikipedia/WikipediaTokenizer.cs`` token types +
``WikipediaTokenizerImpl.cs`` state semantics, re-expressed as a
hand-written scanner; the contract is pinned by the reference's own
``WikipediaTokenizerTest.cs`` vectors — TestSimple, TestHandwritten,
TestLinkPhrases, TestLinks, TestLucene1133, TestBoth).

Covered contract:

- ``[[link]]`` / ``[[link|display info]]`` → every inner word typed
  ``il`` (INTERNAL_LINK); ``[[Category:...]]`` / ``[[:Category:...]]``
  → ``c`` (CATEGORY);
- ``[http(s)://url display words]`` → the URL chunk typed ``elu``, the
  display words ``el`` with the FIRST display word at posInc 0 (the
  reference stacks it on the URL position — TestLinkPhrases);
- quote runs: ``''`` italics (``i``), ``'''`` bold (``b``), ``'''''``
  bold-italics (``bi``); a ``[[``/``[`` structure drops the active
  format state back to initial WITHOUT consuming the pending
  two-quote balance, so a later ``''`` closes instead of reopening
  (the numBalanced counter of WikipediaTokenizerImpl case 22 — this is
  what makes ``''[[Category:x]]'' word`` type ``word`` ALPHANUM while
  ``''italics [[Category:x]] word`` also types ``word`` ALPHANUM);
- ``==h==`` → ``h`` (HEADING), ``===h===`` → ``sh`` (SUB_HEADING);
- ``<ref>...</ref>`` and ``{{...}}`` templates → ``ci`` (CITATION; both
  feed DOUBLE_BRACE_STATE in the reference DFA); any other ``<...>``
  tag is stripped;
- plain text uses the ClassicTokenizer word classes
  (core_tokenizers._CLASSIC_RULES: ALPHANUM/APOSTROPHE/NUM/HOST/...);
- the three emit modes with an ``untokenizedTypes`` set: TOKENS_ONLY,
  UNTOKENIZED_ONLY (one raw-span token per untok region), BOTH (the
  raw span flagged UNTOKENIZED_TOKEN_FLAG, then the individual tokens
  with the first at posInc 0).

Out of subset (documented): nested structures inside untokenized
regions, and non-http(s) external-link schemes.
"""

from __future__ import annotations

import re

from lucenenet_ray.analysis.core_tokenizers import _CLASSIC_RULES

INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

_SCHEME = re.compile(r"https?://")
_NONSPACE = re.compile(r"\S+")

# The wikipedia grammar resolves equal-length HOST/NUM ties to NUM
# ("$3.25" → 3.25 <NUM> in TestHandwritten, where the classic rule
# order would say <HOST>): same rules, NUM listed before HOST.
_WIKI_RULES = tuple(sorted(
    _CLASSIC_RULES,
    key=lambda r: 0 if r[0] == "<NUM>" else 1 if r[0] == "<HOST>" else 0))

_QUOTE_CLOSE = {ITALICS: "''", BOLD: "'''", BOLD_ITALICS: "'''''"}


def _match_at(text: str, i: int, hi: int):
    """Longest _WIKI_RULES match starting at i (None if no rule
    matches): (term, classic_type)."""
    best = None
    btyp = None
    for typ, rx in _WIKI_RULES:
        m = rx.match(text, i, hi)
        if m is not None and (best is None or len(m.group()) > len(best)):
            best = m.group()
            btyp = typ
    return best, btyp


def _classic_spans(text: str, lo: int, hi: int):
    """(term, classic_type, start, end) tokens within text[lo:hi]."""
    out = []
    i = lo
    while i < hi:
        best, btyp = _match_at(text, i, hi)
        if best is None:
            i += 1
            continue
        out.append((best, btyp, i, i + len(best)))
        i += len(best)
    return out


def wikipedia_tokenize(text: str, mode: int = TOKENS_ONLY,
                       untoks: frozenset[str] = frozenset()):
    """→ list of (term, type, start_offset, end_offset, pos_inc, flags)."""
    out: list[tuple[str, str, int, int, int, int]] = []
    n = len(text)
    i = 0
    fmt: str | None = None      # active quote format type
    heading: str | None = None  # active heading type
    two_balance = 0             # the '' open/close counter (case 22)

    def emit(term, typ, s, e, inc=1, flags=0):
        out.append((term, typ, s, e, inc, flags))

    def emit_region(typ, cs, ce):
        """A structured region (link/category/quote span): whole-span
        token and/or individual classic tokens per mode."""
        toks = _classic_spans(text, cs, ce)
        if typ in untoks and mode != TOKENS_ONLY:
            emit(text[cs:ce], typ, cs, ce, 1, UNTOKENIZED_TOKEN_FLAG)
            if mode == UNTOKENIZED_ONLY:
                return
            for k, (t2, _ct, s2, e2) in enumerate(toks):
                emit(t2, typ, s2, e2, 0 if k == 0 else 1)
            return
        for t2, _ct, s2, e2 in toks:
            emit(t2, typ, s2, e2)

    while i < n:
        ch = text[i]
        if text.startswith("[[", i):
            j = text.find("]]", i + 2)
            if j == -1:
                j = n
            k = i + 2
            typ = INTERNAL_LINK
            if k < n and text[k] == ":":
                k += 1
            if text.startswith("Category:", k):
                k += 9
                typ = CATEGORY
            elif k != i + 2:       # bare leading ':' without Category
                k = i + 2
            emit_region(typ, k, j)
            fmt = None             # structure drops the format state
            i = j + 2 if j < n else n
            continue
        if ch == "[" and _SCHEME.match(text, i + 1):
            j = text.find("]", i + 1)
            if j == -1:
                j = n
            m = _NONSPACE.match(text, i + 1, j)
            ue = m.end()
            emit(text[i + 1:ue], EXTERNAL_LINK_URL, i + 1, ue)
            if EXTERNAL_LINK in untoks and mode != TOKENS_ONLY and ue < j:
                dsp = ue + 1 if text[ue:ue + 1] == " " else ue
                if dsp < j:
                    emit_region(EXTERNAL_LINK, dsp, j)
            else:
                for k2, (t2, _ct, s2, e2) in enumerate(
                        _classic_spans(text, ue, j)):
                    emit(t2, EXTERNAL_LINK, s2, e2, 0 if k2 == 0 else 1)
            fmt = None
            i = j + 1 if j < n else n
            continue
        if ch == "'":
            run = 1
            while i + run < n and text[i + run] == "'":
                run += 1
            if run >= 2:
                if run >= 5:
                    new = None if fmt == BOLD_ITALICS else BOLD_ITALICS
                elif run >= 3:
                    new = None if fmt == BOLD else BOLD
                else:
                    if two_balance == 0:
                        two_balance, new = 1, ITALICS
                    else:
                        two_balance, new = 0, None
                if (new is not None and new in untoks
                        and mode != TOKENS_ONLY):
                    close = _QUOTE_CLOSE[new]
                    j = text.find(close, i + run)
                    ce = j if j != -1 else n
                    emit_region(new, i + run, ce)
                    if new == ITALICS:
                        two_balance = 0
                    i = (ce + len(close)) if j != -1 else n
                    continue
                fmt = new
                i += run
                continue
            i += 1
            continue
        if ch == "=":
            run = 1
            while i + run < n and text[i + run] == "=":
                run += 1
            if run >= 2:
                if heading is None:
                    htyp = HEADING if run == 2 else SUB_HEADING
                    if htyp in untoks and mode != TOKENS_ONLY:
                        close = "=" * run
                        j = text.find(close, i + run)
                        ce = j if j != -1 else n
                        emit_region(htyp, i + run, ce)
                        i = (ce + run) if j != -1 else n
                        continue
                    heading = htyp
                else:
                    heading = None
                i += run
                continue
            i += 1
            continue
        if text.startswith("{{", i):
            # DoubleBrace templates share the citation state
            # (WikipediaTokenizerImpl YYINITIAL "{{" → currentTokType =
            # CITATION, DOUBLE_BRACE_STATE)
            j = text.find("}}", i + 2)
            ce = j if j != -1 else n
            emit_region(CITATION, i + 2, ce)
            fmt = None
            i = (ce + 2) if j != -1 else n
            continue
        if ch == "<":
            if text.startswith("<ref>", i):
                j = text.find("</ref>", i + 5)
                ce = j if j != -1 else n
                emit_region(CITATION, i + 5, ce)
                i = (ce + 6) if j != -1 else n
                continue
            j = text.find(">", i)
            i = j + 1 if j != -1 else n
            continue
        best, btyp = _match_at(text, i, n)
        if best is None:
            i += 1
            continue
        typ = fmt if fmt is not None else (
            heading if heading is not None else btyp)
        emit(best, typ, i, i + len(best))
        i += len(best)
    return out
