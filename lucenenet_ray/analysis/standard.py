"""StandardAnalyzer-equivalent analysis chain.

Reference semantics reproduced here (file:line cites into /root/reference):

- ``StandardTokenizer``: UAX#29 word-break tokenization
  (``src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardTokenizer.cs:59-104``
  + generated JFlex DFA ``StandardTokenizerImpl.cs``).  Implemented with the
  ``regex`` module's Unicode ``Word_Break`` property classes: rules WB5-WB13b
  (letter/number runs with MidLetter/MidNum/MidNumLet/Single_Quote medials,
  ExtendNumLet glue, Katakana runs), plus Lucene's extra token classes: one
  token per Han ideograph (IDEOGRAPHIC), one per Hiragana syllable (HIRAGANA),
  Southeast-Asian script runs (SOUTHEAST_ASIAN).
- Tokens longer than ``maxTokenLength`` (255, ``StandardAnalyzer.cs:51``) are
  DISCARDED and contribute a position hole (``StandardTokenizer.cs:206-214``).
- ``StandardFilter``: no-op for 4.x (``Analysis/Standard/StandardFilter.cs``).
- ``LowerCaseFilter``: per-code-point Unicode lowercase à la Java
  ``Character.toLowerCase(int)`` (``Analysis/Core/LowerCaseFilter.cs:33-54``);
  differs from Python ``str.lower()`` only for the handful of code points with
  1:N full case mappings (e.g. U+0130), which we map 1:1 like Java.
- ``StopFilter``: the 33-word English default set (``StopAnalyzer.cs:44-56``);
  dropped tokens add their position increment to the next kept token
  (``Analysis/Util/FilteringTokenFilter.cs:84-101``) so positions keep holes.
- Field length for norms counts only tokens that reach the inverter, i.e.
  post-stop kept tokens (``Index/DocInverterPerField.cs:155-196``).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import regex

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.cs:51

# StopAnalyzer.cs:44-56 — ENGLISH_STOP_WORDS_SET (case-sensitive set; input is
# already lowercased by the time StopFilter runs in StandardAnalyzer's chain).
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

# --- UAX#29 word-break token pattern -----------------------------------------
# Character classes via the regex module's Word_Break property support.
# Hangul is EXCLUDED from the letter class: Lucene's grammar gives Hangul its
# own <HANGUL> token type (StandardTokenizer.cs:97-100), so an unspaced
# hangul/latin boundary splits ("한글abc" → 한글, abc) instead of forming one
# UAX#29 ALetter run.
_AHL = r"(?:(?!\p{Script=Hangul})[\p{WB=ALetter}\p{WB=Hebrew_Letter}])"
_NU = r"\p{WB=Numeric}"
_KA = r"\p{WB=Katakana}"
_EX = r"[\p{WB=Extend}\p{WB=Format}]"
_ML = r"[\p{WB=MidLetter}\p{WB=MidNumLet}\p{WB=Single_Quote}]"
_MN = r"[\p{WB=MidNum}\p{WB=MidNumLet}\p{WB=Single_Quote}]"
_EN = r"\p{WB=ExtendNumLet}"

# Atoms: a base char plus trailing Extend/Format (WB4).
_L = f"(?:{_AHL}{_EX}*)"
_D = f"(?:{_NU}{_EX}*)"
_K = f"(?:{_KA}{_EX}*)"
_E = f"(?:{_EN}{_EX}*)"
# Medials need letter (resp. numeric) context on both sides (WB6/7, WB11/12).
_MIDL = f"(?:(?<={_AHL}{_EX}*){_ML}{_EX}*(?={_AHL}))"
_MIDN = f"(?:(?<={_NU}{_EX}*){_MN}{_EX}*(?={_NU}))"
# A word unit: katakana run, or letter/number run with valid medials (WB5-12).
_UNIT = f"(?:{_K}+|(?:{_L}|{_D})(?:{_L}|{_D}|{_MIDL}|{_MIDN})*)"
# ExtendNumLet glues units (WB13a/13b) and may lead/trail.
_WORD = f"{_E}*{_UNIT}(?:{_E}+{_UNIT})*{_E}*|{_E}+"

# Lucene's extra classes (StandardTokenizer.cs:85-104): single Han ideograph,
# single Hiragana, Southeast-Asian run (we keep the run unsegmented — Lucene
# routes these through ICU "complex context"; a run is its own token here).
_SEA = r"[\p{Script=Thai}\p{Script=Lao}\p{Script=Khmer}\p{Script=Myanmar}]+"
_HAN = r"\p{Script=Han}"
_HIRA = r"\p{Script=Hiragana}"

# Hangul syllable/jamo run with trailing Extend/Format (WB4) — one <HANGUL>
# token per run (TestStandardAnalyzer.cs TestKorean: "훈민정음" → 1 token).
_HANGUL = f"(?:\\p{{Script=Hangul}}{_EX}*)+"

_TOKEN_RE = regex.compile(
    f"(?:{_WORD})|(?:{_SEA})|(?:{_HANGUL})|(?:{_HAN})|(?:{_HIRA})", regex.V0)

# Java Character.toLowerCase(int) is a 1:1 code-point mapping; Python's
# str.lower() applies full (1:N) mappings for a few code points. Patch those.
_JAVA_LOWER_EXCEPTIONS = {
    "İ": "i",  # LATIN CAPITAL LETTER I WITH DOT ABOVE -> 'i' in Java
}
_HAS_EXCEPTION = regex.compile("[" + "".join(_JAVA_LOWER_EXCEPTIONS) + "]")


def _java_lower(s: str) -> str:
    if _HAS_EXCEPTION.search(s) is not None:
        s = "".join(_JAVA_LOWER_EXCEPTIONS.get(c, c) for c in s)
    out = s.lower()
    # Guard: 1:N expansions not covered above are kept 1:1 by per-char mapping.
    if len(out) != len(s):
        out = "".join(
            (c.lower() if len(c.lower()) == 1 else _JAVA_LOWER_EXCEPTIONS.get(c, c))
            for c in s
        )
    return out


def tokenize(text: str) -> list[str]:
    """Raw StandardTokenizer output (pre-filters): token strings in order.

    Over-long tokens (>255 chars) are represented as ``None`` placeholders by
    ``analyze``; here they are simply included so callers can see raw output.
    """
    return _TOKEN_RE.findall(text)


def analyze(text: str) -> tuple[list[str], list[int]]:
    """Full StandardAnalyzer chain: returns (terms, positions).

    Positions are absolute token positions (0-based) with holes for dropped
    stopwords and over-long tokens, exactly as Lucene's posIncr accumulation
    produces (FilteringTokenFilter.cs:84-101, StandardTokenizer.cs:206-214).
    Field length for norms == len(terms).
    """
    terms: list[str] = []
    positions: list[int] = []
    pos = -1
    for raw in _TOKEN_RE.findall(text):
        pos += 1  # every emitted-or-skipped token advances the position
        if len(raw) > MAX_TOKEN_LENGTH:
            continue  # discarded, position hole remains
        term = _java_lower(raw)
        if term in ENGLISH_STOP_WORDS:
            continue  # stopword hole
        terms.append(term)
        positions.append(pos)
    return terms, positions


_ASCII_SIMPLE = regex.compile(r"[^ a-z0-9]")

# non-space runs with spans — the offset-bearing fast tokenizer
import re as _stdre

_WS_RUN_RE = _stdre.compile(r"\S+")

# --- ASCII fast tokenizer -----------------------------------------------------
# For pure-ASCII text the UAX#29 pattern simplifies: no Extend/Format chars
# exist below 0x80 (asserted at import), so atoms are single chars and the
# medial lookbehinds become fixed-width — expressible in the stdlib ``re``
# module, which runs ~4× faster than the ``regex`` Unicode-property engine.
# The ASCII members of each Word_Break class are derived FROM the property
# classes themselves, so the two patterns agree by construction (tested over
# random ASCII inputs in test_analysis).


def _ascii_members(*props: str) -> str:
    import re as _re

    pat = regex.compile("[" + "".join(rf"\p{{WB={p}}}" for p in props) + "]")
    return "".join(_re.escape(chr(c)) for c in range(128) if pat.fullmatch(chr(c)))


def _build_ascii_re():
    import re as _re

    ex = _ascii_members("Extend", "Format")
    if ex:  # pragma: no cover — would invalidate the simplification
        return None
    la = f"[{_ascii_members('ALetter', 'Hebrew_Letter')}]"
    da = f"[{_ascii_members('Numeric')}]"
    ml = f"[{_ascii_members('MidLetter', 'MidNumLet', 'Single_Quote')}]"
    mn = f"[{_ascii_members('MidNum', 'MidNumLet', 'Single_Quote')}]"
    en = f"[{_ascii_members('ExtendNumLet')}]"
    midl = f"(?:(?<={la}){ml}(?={la}))"
    midn = f"(?:(?<={da}){mn}(?={da}))"
    unit = f"(?:(?:{la}|{da})(?:{la}|{da}|{midl}|{midn})*)"
    word = f"{en}*{unit}(?:{en}+{unit})*{en}*|{en}+"
    return _re.compile(word)


_ASCII_TOKEN_RE = _build_ascii_re()


def _analyze_fast_ascii(text: str) -> tuple[list[str], list[int]] | None:
    """Fast path for already-lowercase space-separated ASCII text (the common
    shape of cleaned web text): identical output to ``analyze`` when the text
    contains only [a-z0-9 ]."""
    if _ASCII_SIMPLE.search(text) is not None:
        return None
    terms: list[str] = []
    positions: list[int] = []
    pos = -1
    for tok in text.split():
        pos += 1
        if tok in ENGLISH_STOP_WORDS or len(tok) > MAX_TOKEN_LENGTH:
            continue
        terms.append(tok)
        positions.append(pos)
    return terms, positions


class StandardAnalyzer:
    """Callable analyzer matching Lucene's StandardAnalyzer chain
    (StandardAnalyzer.cs:107-115). Stateless and cheap; exists as a class so
    per-language variants can subclass (stop set / extra filters)."""

    stop_words = ENGLISH_STOP_WORDS
    max_token_length = MAX_TOKEN_LENGTH

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        # fast path is valid for ANY stop set: on [a-z0-9 ]-only text the
        # UAX#29 tokenizer degenerates to whitespace split
        if _ASCII_SIMPLE.search(text) is None:
            terms: list[str] = []
            positions: list[int] = []
            pos = -1
            stop = self.stop_words
            maxlen = self.max_token_length
            for tok in text.split():
                pos += 1
                if tok in stop or len(tok) > maxlen:
                    continue
                terms.append(tok)
                positions.append(pos)
            return terms, positions
        if _ASCII_TOKEN_RE is not None and text.isascii():
            return self._analyze_ascii(text)
        return self._analyze_slow(text)

    def _analyze_ascii(self, text: str) -> tuple[list[str], list[int]]:
        """Pure-ASCII path: stdlib-re tokenizer + C-level str.lower (ASCII
        lowercase is 1:1, so it equals _java_lower exactly here)."""
        terms: list[str] = []
        positions: list[int] = []
        pos = -1
        stop = self.stop_words
        maxlen = self.max_token_length
        for raw in _ASCII_TOKEN_RE.findall(text):
            pos += 1
            if len(raw) > maxlen:
                continue
            term = raw.lower()
            if term in stop:
                continue
            terms.append(term)
            positions.append(pos)
        return terms, positions

    def _analyze_slow(self, text: str) -> tuple[list[str], list[int]]:
        terms: list[str] = []
        positions: list[int] = []
        pos = -1
        for raw in _TOKEN_RE.findall(text):
            pos += 1
            if len(raw) > self.max_token_length:
                continue
            term = _java_lower(raw)
            if term in self.stop_words:
                continue
            terms.append(term)
            positions.append(pos)
        return terms, positions

    def call_with_offsets(
        self, text: str
    ) -> tuple[list[str], list[int], list[int]]:
        """Like ``__call__`` but also returns each kept token's START
        character offset — the OffsetAttribute the tokenizer fills
        (``StandardTokenizer.cs:180-214`` sets startOffset per token; offsets
        are code-point indexes here vs Java UTF-16 units — identical for
        BMP-only text). Feeds offset-payload indexing
        (IndexConfig.payloads='offset', TokenOffsetPayloadTokenFilter
        analog — Analysis/Payloads/TokenOffsetPayloadTokenFilter.cs)."""
        terms: list[str] = []
        positions: list[int] = []
        offsets: list[int] = []
        pos = -1
        stop = self.stop_words
        maxlen = self.max_token_length
        if _ASCII_SIMPLE.search(text) is None:
            # [a-z0-9 ]-only: tokens are the non-space runs
            for m in _WS_RUN_RE.finditer(text):
                tok = m.group()
                pos += 1
                if tok in stop or len(tok) > maxlen:
                    continue
                terms.append(tok)
                positions.append(pos)
                offsets.append(m.start())
            return terms, positions, offsets
        ascii_ok = _ASCII_TOKEN_RE is not None and text.isascii()
        token_iter = (_ASCII_TOKEN_RE if ascii_ok else _TOKEN_RE).finditer(text)
        for m in token_iter:
            raw = m.group()
            pos += 1
            if len(raw) > maxlen:
                continue
            term = raw.lower() if ascii_ok else _java_lower(raw)
            if term in stop:
                continue
            terms.append(term)
            positions.append(pos)
            offsets.append(m.start())
        return terms, positions, offsets


def analyze_batch(texts: Iterable[str]) -> tuple[pa.ListArray, pa.ListArray]:
    """Analyze a batch of texts → (tokens list<string>, positions list<int32>)
    Arrow arrays. Used by map_batches stages."""
    analyzer = StandardAnalyzer()
    all_terms: list[str] = []
    all_pos: list[int] = []
    offsets = np.empty(0, dtype=np.int32)
    offs = [0]
    for t in texts:
        terms, pos = analyzer(t if t is not None else "")
        all_terms.extend(terms)
        all_pos.extend(pos)
        offs.append(len(all_terms))
    offsets = pa.array(offs, type=pa.int32())
    tok_arr = pa.ListArray.from_arrays(offsets, pa.array(all_terms, type=pa.string()))
    pos_arr = pa.ListArray.from_arrays(offsets, pa.array(all_pos, type=pa.int32()))
    return tok_arr, pos_arr
