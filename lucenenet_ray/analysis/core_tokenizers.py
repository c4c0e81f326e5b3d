"""Core tokenizers + the Classic (pre-3.1 Standard) grammar.

References:
- ``Analysis/Util/CharTokenizer.cs`` (:30-120) — split on non-token chars,
  255-char max token, per-char normalize hook. Subclasses:
  ``Analysis/Core/{WhitespaceTokenizer,LetterTokenizer,LowerCaseTokenizer}``.
- ``Analysis/Core/KeywordTokenizer.cs`` — the whole input as one token.
- ``Analysis/Pattern/PatternTokenizer.cs`` — group=-1 split mode, else
  match-group mode; empty tokens dropped.
- ``Analysis/NGram/{NGramTokenizer,EdgeNGramTokenizer}.cs`` (4.4+
  semantics) — grams over the whole input stream.
- ``Analysis/Standard/ClassicTokenizer.cs`` + ``ClassicTokenizerImpl.cs``
  (the JFlex grammar at ClassicTokenizerImpl.jflex) + ``ClassicFilter.cs``
  + ``ClassicAnalyzer.cs``. The grammar is re-expressed as a
  longest-match-first rule scan (JFlex picks the longest match, ties by
  rule order); validated on the TestClassicAnalyzer.cs vectors.
"""

from __future__ import annotations

import regex as _re

_MAX_TOKEN = 255


def char_tokenize(text: str, is_token_char, normalize=None,
                  max_token: int = _MAX_TOKEN) -> list[str]:
    """CharTokenizer.IncrementToken: runs of token chars, split when a run
    exceeds max_token."""
    out = []
    cur = []
    for ch in text:
        if is_token_char(ch):
            cur.append(ch if normalize is None else normalize(ch))
            if len(cur) == max_token:
                out.append("".join(cur))
                cur = []
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def whitespace_tokenize(text: str) -> list[str]:
    return char_tokenize(text, lambda c: not c.isspace())


def letter_tokenize(text: str) -> list[str]:
    return char_tokenize(text, str.isalpha)


def lowercase_tokenize(text: str) -> list[str]:
    return char_tokenize(text, str.isalpha, normalize=str.lower)


def keyword_tokenize(text: str) -> list[str]:
    return [text] if text else []


def pattern_tokenize(text: str, pattern: str, group: int = -1
                     ) -> list[str]:
    """PatternTokenizer.cs: group=-1 -> the pattern splits (like
    String.split), group>=0 -> emit that group of each match; empty
    tokens are dropped."""
    rx = _re.compile(pattern)
    if group >= 0:
        return [m.group(group) for m in rx.finditer(text)
                if m.group(group)]
    return [t for t in rx.split(text) if t]


def ngram_tokenize(text: str, min_gram: int = 1, max_gram: int = 2
                   ) -> list[str]:
    """NGramTokenizer.cs (4.4+ stream semantics): all grams at each start
    offset, gram sizes min..max, in (start, size) order."""
    out = []
    n = len(text)
    for i in range(n):
        for g in range(min_gram, max_gram + 1):
            if i + g <= n:
                out.append(text[i: i + g])
    return out


def edge_ngram_tokenize(text: str, min_gram: int = 1, max_gram: int = 1
                        ) -> list[str]:
    """EdgeNGramTokenizer.cs: prefix grams of the input."""
    return [text[:g] for g in range(min_gram, max_gram + 1)
            if g <= len(text)]


# ---------------------------------------------------------------------------
# Classic grammar (ClassicTokenizerImpl.jflex). Rule order = JFlex priority
# on equal-length matches; the scanner takes the longest match at each
# position.

_AN = r"[\p{L}\p{Nd}]+"
_HD = r"[\p{L}\p{Nd}]*\p{Nd}[\p{L}\p{Nd}]*"   # HAS_DIGIT
_P = r"[_\-/.,]"

_CLASSIC_RULES = (
    ("<EMAIL>", _re.compile(
        rf"{_AN}(?:[.\-_]{_AN})*@{_AN}(?:[.\-]{_AN})+")),
    ("<ACRONYM>", _re.compile(r"\p{L}\.(?:\p{L}\.)+")),
    ("<COMPANY>", _re.compile(r"\p{L}+[&@]\p{L}+")),
    ("<HOST>", _re.compile(rf"{_AN}(?:\.{_AN})+")),
    # the six NUM alternatives are separate rules so the scanner's
    # longest-match-wins pass emulates the JFlex DFA (a single regex
    # alternation would commit to the first alternative, not the longest)
    ("<NUM>", _re.compile(rf"{_AN}{_P}{_HD}(?:{_P}{_AN}{_P}{_HD})*")),
    ("<NUM>", _re.compile(rf"{_HD}{_P}{_AN}(?:{_P}{_HD}{_P}{_AN})*")),
    ("<NUM>", _re.compile(rf"{_AN}(?:{_P}{_HD}{_P}{_AN})+")),
    ("<NUM>", _re.compile(rf"{_HD}(?:{_P}{_AN}{_P}{_HD})+")),
    ("<APOSTROPHE>", _re.compile(r"\p{L}+(?:'\p{L}+)+")),
    ("<ALPHANUM>", _re.compile(_AN)),
)


def classic_tokenize(text: str) -> list[tuple[str, str]]:
    """ClassicTokenizer: (term, type) pairs, longest rule match wins."""
    out = []
    i, n = 0, len(text)
    while i < n:
        best = None
        best_type = None
        for typ, rx in _CLASSIC_RULES:
            m = rx.match(text, i)
            if m is not None and (best is None
                                  or len(m.group()) > len(best)):
                best = m.group()
                best_type = typ
        if best is None:
            i += 1
            continue
        if len(best) <= _MAX_TOKEN:
            out.append((best, best_type))
        i += len(best)
    return out


def classic_filter(term: str, typ: str) -> str:
    """ClassicFilter.cs: strip trailing 's from APOSTROPHE tokens and all
    dots from ACRONYM tokens."""
    if typ == "<APOSTROPHE>" and (term.endswith("'s")
                                  or term.endswith("'S")):
        return term[:-2]
    if typ == "<ACRONYM>":
        return term.replace(".", "")
    return term


def classic_analyze(text: str, stop_words=None) -> list[str]:
    """ClassicAnalyzer.cs: ClassicTokenizer + ClassicFilter + lowercase +
    English stop words."""
    if stop_words is None:
        from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS
        stop_words = ENGLISH_STOP_WORDS
    out = []
    for term, typ in classic_tokenize(text):
        t = classic_filter(term, typ).lower()
        if t not in stop_words:
            out.append(t)
    return out
