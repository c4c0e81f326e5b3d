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


def pattern_capture_group(terms: list[str], positions: list[int],
                          patterns: list[str],
                          preserve_original: bool = False
                          ) -> tuple[list[str], list[int]]:
    """PatternCaptureGroupTokenFilter
    (``Analysis/Pattern/PatternCaptureGroupTokenFilter.cs:108-207``): one
    output token per capture group per match per pattern. Per input
    token: with ``preserve_original`` the original is emitted first (its
    posInc kept) and every capture follows at posInc 0; otherwise the
    FIRST capture replaces the original (no match → original passes
    through). Captures across patterns interleave by the CURRENT
    candidate's start offset (ties → lower pattern index) — each
    pattern's own stream stays in (match, group-index) order, exactly
    the NextCapture min-offset merge, NOT a global sort. Empty captures
    are skipped; with preserve_original a capture spanning the whole
    token is skipped (it would duplicate the original)."""
    import re as _re

    rxs = [_re.compile(p) for p in patterns]
    out_t: list[str] = []
    out_p: list[int] = []
    for term, pos in zip(terms, positions):
        streams: list[list[tuple[int, int]]] = []
        for rx in rxs:
            caps: list[tuple[int, int]] = []
            for m in rx.finditer(term):
                for g in range(1, (m.re.groups or 0) + 1):
                    s, e = m.span(g)
                    if s == e or s < 0:
                        continue
                    if preserve_original and s == 0 and e == len(term):
                        continue
                    caps.append((s, e))
            streams.append(caps)
        heads = [0] * len(streams)
        emitted: list[str] = []
        while True:
            best = -1
            best_start = None
            for i, st in enumerate(streams):
                if heads[i] < len(st):
                    s = st[heads[i]][0]
                    if best_start is None or s < best_start:
                        best_start, best = s, i
            if best == -1:
                break
            s, e = streams[best][heads[best]]
            heads[best] += 1
            emitted.append(term[s:e])
        if preserve_original:
            out_t.append(term)
            out_p.append(pos)
            for t in emitted:
                out_t.append(t)
                out_p.append(pos)  # posInc 0 → same position
        elif emitted:
            for t in emitted:
                out_t.append(t)
                out_p.append(pos)
        else:
            out_t.append(term)
            out_p.append(pos)
    return out_t, out_p


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


def capitalization(term: str, only_first_word: bool = True,
                   keep: frozenset[str] | None = None,
                   force_first_letter: bool = True,
                   ok_prefix: tuple[str, ...] = (),
                   min_word_length: int = 0,
                   max_word_count: int = 2147483647,
                   max_token_length: int = 2147483647) -> str:
    """CapitalizationFilter.cs:143-250: capitalize sub-words (split on
    space/control/dot) inside the token, with keep-set / prefix / length
    escapes; over max_word_count restores the original token."""
    if len(term) >= max_token_length:
        return term

    def process(word: str, word_count: int) -> str:
        if not word:
            return word
        if only_first_word and word_count > 0:
            return word.lower()
        if keep is not None and word in keep:
            if word_count == 0 and force_first_letter:
                return word[0].upper() + word[1:]
            return word
        if len(word) < min_word_length:
            return word
        for p in ok_prefix:
            if word.startswith(p):
                return word
        return word[0].upper() + word[1:].lower()

    out = []
    count = 0
    cur = []
    for ch in term:
        if ch <= " " or ch == ".":
            if cur:
                out.append(process("".join(cur), count))
                count += 1
                cur = []
            out.append(ch)
        else:
            cur.append(ch)
    if cur:
        out.append(process("".join(cur), count))
        count += 1
    if count > max_word_count:
        return term
    return "".join(out)


def keyword_repeat(terms: list[str], positions: list[int]
                   ) -> tuple[list[str], list[int], list[bool]]:
    """KeywordRepeatFilter.cs: each token emitted twice — first copy
    keyword-marked (posInc preserved), second at posInc 0."""
    out_t, out_p, out_kw = [], [], []
    for t, p in zip(terms, positions):
        out_t += [t, t]
        out_p += [p, p]
        out_kw += [True, False]
    return out_t, out_p, out_kw


def stemmer_override(terms: list[str], overrides: dict[str, str],
                     stem=None) -> list[str]:
    """StemmerOverrideFilter.cs: dictionary hits replace the term and are
    keyword-marked (so a downstream stemmer skips them); misses flow to
    the stemmer."""
    out = []
    for t in terms:
        o = overrides.get(t)
        if o is not None:
            out.append(o)
        else:
            out.append(stem(t) if stem is not None else t)
    return out


def type_token_filter(terms: list[str], types: list[str],
                      stop_types: frozenset[str],
                      use_white_list: bool = False) -> list[str]:
    """TypeTokenFilter.cs: drop (or keep, when white-listing) tokens whose
    type is in the set."""
    if use_white_list:
        return [t for t, ty in zip(terms, types) if ty in stop_types]
    return [t for t, ty in zip(terms, types) if ty not in stop_types]


def limit_token_position(terms: list[str], positions: list[int],
                         max_token_position: int) -> list[str]:
    """LimitTokenPositionFilter.cs: keep tokens whose position is
    <= max_token_position (positions are 1-based accumulated posIncs)."""
    return [t for t, p in zip(terms, positions)
            if p <= max_token_position]


def position_filter(increments: list[int], position_increment: int = 0
                    ) -> list[int]:
    """PositionFilter.cs:103-118 — the first token keeps its incoming
    position increment; every later token's increment is overwritten with
    ``position_increment`` (default 0, stacking all tokens on the first
    position — the pre-4.4 QueryParser boolean-isation trick). Negative
    ``position_increment`` raises, matching the ctor guard (:94-97)."""
    if position_increment < 0:
        raise ValueError("positionIncrement may not be negative")
    return [inc if i == 0 else position_increment
            for i, inc in enumerate(increments)]


def tee_sink(tokens: list[tuple], sinks: dict[str, object]
             ) -> dict[str, list[tuple]]:
    """TeeSinkTokenFilter analog (``Analysis/Sinks/TeeSinkTokenFilter.cs``):
    one pass over the stream feeds every sink whose filter accepts the
    token; the primary stream is unchanged. `tokens` are (term, pos, type)
    triples; `sinks` maps name -> predicate(term, pos, type)."""
    out = {name: [] for name in sinks}
    for tok in tokens:
        for name, accept in sinks.items():
            if accept(*tok):
                out[name].append(tok)
    return out


def date_recognizer_sink(term: str, pos: int = 0, typ: str = "") -> bool:
    """DateRecognizerSinkFilter.Accept: token parses as a date."""
    import datetime

    for fmt in ("%Y-%m-%d", "%m/%d/%Y", "%d.%m.%Y", "%Y/%m/%d"):
        try:
            datetime.datetime.strptime(term, fmt)
            return True
        except ValueError:
            continue
    return False


def token_range_sink(lower: int, upper: int):
    """TokenRangeSinkFilter: accept tokens with lower <= ordinal < upper
    (the filter counts tokens as they stream by)."""
    state = {"n": -1}

    def accept(term: str, pos: int = 0, typ: str = "") -> bool:
        state["n"] += 1
        return lower <= state["n"] < upper
    return accept


def token_type_sink(type_to_match: str):
    """TokenTypeSinkFilter: accept tokens of one type."""
    def accept(term: str, pos: int = 0, typ: str = "") -> bool:
        return typ == type_to_match
    return accept


def delimited_payload(terms: list[str], delimiter: str = "|",
                      encoder: str = "float"
                      ) -> tuple[list[str], list[bytes | None]]:
    """DelimitedPayloadTokenFilter (``Analysis/Payloads/
    DelimitedPayloadTokenFilter.cs``): split each token at the LAST
    delimiter; the tail becomes the payload via the encoder
    (FloatEncoder/IntegerEncoder/IdentityEncoder — PayloadHelper byte
    order, big-endian like Lucene's)."""
    import struct

    out_t, out_p = [], []
    for t in terms:
        i = t.rfind(delimiter)
        if i < 0:
            out_t.append(t)
            out_p.append(None)
            continue
        term, tail = t[:i], t[i + 1:]
        if encoder == "float":
            p = struct.pack(">f", float(tail))
        elif encoder == "int":
            p = struct.pack(">i", int(tail))
        else:
            p = tail.encode("utf-8")
        out_t.append(term)
        out_p.append(p)
    return out_t, out_p


def numeric_payload(terms: list[str], types: list[str], payload: float,
                    type_match: str) -> list[bytes | None]:
    """NumericPayloadTokenFilter: attach the float payload to tokens of
    one type."""
    import struct

    p = struct.pack(">f", payload)
    return [p if ty == type_match else None for ty in types]


def type_as_payload(types: list[str]) -> list[bytes]:
    """TypeAsPayloadTokenFilter: the token type becomes the payload."""
    return [ty.encode("utf-8") for ty in types]
