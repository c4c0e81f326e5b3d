"""Misc tokenizer/filter family — small per-token components re-expressed
from the reference:

- :func:`path_hierarchy_tokenize` — ``Analysis/Path/PathHierarchyTokenizer.cs``
  (prefix tokens at each delimiter boundary; skip support; replacement char)
- :func:`elision` — ``Analysis/Util/ElisionFilter.cs`` (strip leading
  article + apostrophe; FrenchAnalyzer's DEFAULT_ARTICLES)
- :func:`reverse_string` — ``Analysis/Reverse/ReverseStringFilter.cs``
  (plain reverse; the leading-wildcard indexing trick)
- :func:`keep_words` — ``Analysis/Miscellaneous/KeepWordFilter.cs``
  (inverse stop: keep only listed words, position holes preserved)
- :func:`truncate_tokens` — ``Analysis/Miscellaneous/TruncateTokenFilter.cs``
- :func:`codepoint_count_keep` —
  ``Analysis/Miscellaneous/CodepointCountFilter.cs``

All are pure per-token kernels meant to run inside ``map_batches`` stages;
none hold state, so they need no actor pool.
"""

from __future__ import annotations

# FrenchAnalyzer.DEFAULT_ARTICLES (Analysis/Fr/FrenchAnalyzer.cs:72-76)
FRENCH_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split())

_APOSTROPHES = ("'", "’")


def path_hierarchy_tokenize(path: str, delimiter: str = "/",
                            replacement: str | None = None, skip: int = 0
                            ) -> tuple[list[str], list[int]]:
    """PathHierarchyTokenizer.IncrementToken semantics: one token per
    delimiter boundary — each is the prefix of the input up to (not
    including) that delimiter, plus a final whole-string token; a leading
    delimiter attaches to the first component, a trailing one yields an
    extra token. ``skip`` drops the first N components and re-prefixes the
    rest from the skipped boundary (reference TestBasicSkip shapes).
    Returns (tokens, position_increments): first emitted posInc 1, rest 0.
    """
    if not path:
        return [], []
    rep = replacement if replacement is not None else delimiter
    ends = [i for i in range(1, len(path)) if path[i] == delimiter]
    ends.append(len(path))
    start = 0
    if skip > 0:
        if len(ends) <= skip:
            return [], []
        start = ends[skip - 1]
        ends = ends[skip:]
    toks = [path[start:e].replace(delimiter, rep) for e in ends]
    return toks, [1] + [0] * (len(toks) - 1)


def elision(term: str, articles: frozenset[str] = FRENCH_ARTICLES) -> str:
    """ElisionFilter: if the prefix before the FIRST apostrophe (' or ’)
    is an article, drop prefix + apostrophe; otherwise unchanged."""
    idx = -1
    for i, ch in enumerate(term):
        if ch in _APOSTROPHES:
            idx = i
            break
    if idx >= 0 and term[:idx] in articles:
        return term[idx + 1:]
    return term


def reverse_string(term: str) -> str:
    """ReverseStringFilter.Reverse (no marker variant)."""
    return term[::-1]


def keep_words(terms: list[str], positions: list[int],
               keep: frozenset[str]) -> tuple[list[str], list[int]]:
    """KeepWordFilter: FilteringTokenFilter Accept = term in keep; position
    increments of dropped tokens accumulate (holes preserved), like the
    engine's stop filtering."""
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        if t in keep:
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


def truncate_tokens(terms: list[str], length: int) -> list[str]:
    """TruncateTokenFilter: hard-truncate every token to ``length``."""
    return [t[:length] for t in terms]


def codepoint_count_keep(terms: list[str], positions: list[int],
                         min_cp: int, max_cp: int
                         ) -> tuple[list[str], list[int]]:
    """CodepointCountFilter: keep tokens whose codepoint count is within
    [min_cp, max_cp] (Python len() counts codepoints already)."""
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        if min_cp <= len(t) <= max_cp:
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


def hyphenated_words(terms: list[str]) -> list[str]:
    """HyphenatedWordsFilter
    (``Analysis/Miscellaneous/HyphenatedWordsFilter.cs``): tokens ending
    in '-' are joined (hyphen dropped) with following tokens until one
    does not end in '-'; a trailing unclosed run keeps a final '-'."""
    out: list[str] = []
    pending: list[str] = []
    for t in terms:
        if t and t.endswith("-"):
            pending.append(t[:-1])
        elif pending:
            pending.append(t)
            out.append("".join(pending))
            pending = []
        else:
            out.append(t)
    if pending:
        out.append("".join(pending) + "-")
    return out


def scandinavian_fold(term: str) -> str:
    """ScandinavianFoldingFilter
    (``Analysis/Miscellaneous/ScandinavianFoldingFilter.cs``): å/ä/æ→a,
    ö/ø→o (case kept) and the aa/ae/ao/oe/oo digraph collapses, scanning
    left to right with in-place deletes like the reference."""
    buf = list(term)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in ("å", "ä", "æ"):
            buf[i] = "a"
        elif c in ("Å", "Ä", "Æ"):
            buf[i] = "A"
        elif c in ("ø", "ö"):
            buf[i] = "o"
        elif c in ("Ø", "Ö"):
            buf[i] = "O"
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAeEoO":
                del buf[i + 1]
            elif c in "oO" and nxt in "eEoO":
                del buf[i + 1]
        i += 1
    return "".join(buf)


def scandinavian_normalize(term: str) -> str:
    """ScandinavianNormalizationFilter
    (``Analysis/Miscellaneous/ScandinavianNormalizationFilter.cs``):
    ä→æ, ö→ø, and aa→å / ae→æ / ao→å / oe→ø / oo→ø digraph folds."""
    buf = list(term)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c == "a" and nxt in "aoAO":
                del buf[i + 1]
                buf[i] = "å"
            elif c == "A" and nxt in "aAoO":
                del buf[i + 1]
                buf[i] = "Å"
            elif c == "a" and nxt in "eE":
                del buf[i + 1]
                buf[i] = "æ"
            elif c == "A" and nxt in "eE":
                del buf[i + 1]
                buf[i] = "Æ"
            elif c == "o" and nxt in "eEoO":
                del buf[i + 1]
                buf[i] = "ø"
            elif c == "O" and nxt in "eEoO":
                del buf[i + 1]
                buf[i] = "Ø"
        i += 1
    return "".join(buf)


def apostrophe_filter(term: str) -> str:
    """ApostropheFilter (``Analysis/Tr/ApostropheFilter.cs``): keep only
    the part before the FIRST apostrophe (' or ’) — Turkish possessive
    truncation."""
    for i, ch in enumerate(term):
        if ch in ("'", "’"):
            return term[:i]
    return term


def pattern_replace(terms: list[str], pattern: str, replacement: str,
                    replace_all: bool = True) -> list[str]:
    """PatternReplaceFilter (``Analysis/Pattern/PatternReplaceFilter.cs``):
    regex replace inside each token (all matches or first only)."""
    import re as _re

    rx = _re.compile(pattern)
    count = 0 if replace_all else 1
    return [rx.sub(replacement, t, count=count) for t in terms]


def remove_duplicates(terms: list[str], positions: list[int]
                      ) -> tuple[list[str], list[int]]:
    """RemoveDuplicatesTokenFilter
    (``Analysis/Miscellaneous/RemoveDuplicatesTokenFilter.cs``): drop a
    token when the SAME term already occurred at the SAME position."""
    seen: set[tuple[int, str]] = set()
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        if (p, t) in seen:
            continue
        seen.add((p, t))
        out_t.append(t)
        out_p.append(p)
    return out_t, out_p
