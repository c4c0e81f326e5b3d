"""Token-filter library: the common-analysis chain pieces (SURVEY §2.2).

Re-expressions of the reference's most-used TokenFilters
(``src/Lucene.Net.Analysis.Common/Analysis/...``), operating on the
(terms, positions) streams produced by ``StandardAnalyzer`` — Lucene's
attribute-pipeline becomes plain list transforms, vectorized/cached where it
pays:

- ``ascii_fold``        — ASCIIFoldingFilter (Miscellaneous/ASCIIFoldingFilter.cs)
- ``PorterStemmer``     — PorterStemFilter (En/PorterStemmer.cs; the original
                          public 1980 Porter algorithm, which Lucene ports)
- ``english_possessive``— EnglishPossessiveFilter (En/EnglishPossessiveFilter.cs)
- ``ShingleFilter``     — Shingle/ShingleFilter.cs (word n-grams + "_" filler)
- ``ngram_filter`` / ``edge_ngram_filter`` — NGram/NGramTokenFilter.cs,
                          NGram/EdgeNGramTokenFilter.cs
- ``SynonymMap`` / ``synonym_filter`` — Synonym/SynonymFilter.cs (single-token
                          map subset: injected synonyms share the original's
                          position, posIncr=0)
- ``MappingCharFilter`` — CharFilter/MappingCharFilter.cs (greedy longest-match
                          char-level rewrite BEFORE tokenization)
- ``EnglishAnalyzer``   — En/EnglishAnalyzer.cs chain: StandardTokenizer →
                          EnglishPossessive → LowerCase → Stop → PorterStem
- ``ShingleAnalyzer``   — Shingle/ShingleAnalyzerWrapper.cs

Stateful pieces (stem cache, compiled maps) live in analyzer instances —
construct once per actor/process (``__init__``), apply per batch.
"""

from __future__ import annotations

import unicodedata

import regex as _regex

from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS, StandardAnalyzer

# ---------------------------------------------------------------------------
# ASCIIFoldingFilter


_FOLD_EXTRA = {
    # NFKD leaves these letters untouched; ASCIIFoldingFilter.cs maps them
    # explicitly (spot-checked against its switch table)
    "ß": "ss", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O", "œ": "oe",
    "Œ": "OE", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D", "þ": "th",
    "Þ": "TH", "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H", "ı": "i",
    "ĸ": "k", "ŋ": "n", "Ŋ": "N", "ŧ": "t", "Ŧ": "T",
}


def ascii_fold(term: str) -> str:
    """Fold Unicode letters to their ASCII base form (ASCIIFoldingFilter.cs:
    NFKD-decomposable accents stripped; the non-decomposable Latin letters
    via the filter's explicit mappings). ASCII input returns unchanged."""
    if term.isascii():
        return term
    out = []
    for ch in term:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in _FOLD_EXTRA:
            out.append(_FOLD_EXTRA[ch])
            continue
        dec = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in dec if not unicodedata.combining(c))
        out.append(kept if kept.isascii() else ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# Porter stemmer (the original algorithm, as ported by En/PorterStemmer.cs)


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC)^m[V]."""
    n = 0
    i = 0
    ln = len(stem)
    while i < ln and _is_cons(stem, i):
        i += 1
    while i < ln:
        while i < ln and not _is_cons(stem, i):
            i += 1
        if i >= ln:
            break
        n += 1
        while i < ln and _is_cons(stem, i):
            i += 1
    return n


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    """Porter 1980 'An algorithm for suffix stripping' — matches
    En/PorterStemmer.cs (itself a port of the reference implementation).
    Input is assumed lowercased; words of length <= 2 return unchanged."""
    if len(w) <= 2 or not w.isalpha() or not w.isascii():
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _ends_double_cons(w) and w[-1] == "l" and _measure(w[:-1]) > 1:
        w = w[:-1]
    return w


class PorterStemmer:
    """Per-instance memo cache: web text repeats tokens heavily, so stemming
    unique strings once per actor dominates (the stateful-stage pattern —
    build in ``__init__``, reuse per batch)."""

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}

    def __call__(self, term: str) -> str:
        s = self._cache.get(term)
        if s is None:
            s = porter_stem(term)
            self._cache[term] = s
        return s


def english_possessive(term: str) -> str:
    """EnglishPossessiveFilter: strip trailing 's / ’s / ＇s."""
    if len(term) >= 2 and term[-1] in "sS" and term[-2] in "'’＇":
        return term[:-2]
    return term


# ---------------------------------------------------------------------------
# ShingleFilter (word n-grams)

FILLER_TOKEN = "_"  # ShingleFilter.DEFAULT_FILLER_TOKEN
SHINGLE_SEP = " "   # ShingleFilter.DEFAULT_TOKEN_SEPARATOR


def shingles(terms: list[str], positions: list[int],
             min_size: int = 2, max_size: int = 2,
             output_unigrams: bool = True) -> tuple[list[str], list[int]]:
    """ShingleFilter.cs semantics over a positioned token stream: position
    holes (dropped stopwords/over-long tokens) become ``_`` filler tokens
    inside shingles; shingles are emitted at the position of their first
    REAL token; all-filler shingles and filler unigrams are never emitted
    (ShingleFilter.cs filler handling; TestShingleFilter stopword cases)."""
    if not terms:
        return [], []
    maxpos = positions[-1]
    slots = [FILLER_TOKEN] * (maxpos + 1)
    for t, p in zip(terms, positions):
        slots[p] = t
    out_t: list[str] = []
    out_p: list[int] = []
    for p in range(maxpos + 1):
        if output_unigrams and slots[p] != FILLER_TOKEN:
            out_t.append(slots[p])
            out_p.append(p)
        for size in range(min_size, max_size + 1):
            if p + size - 1 > maxpos:
                break
            window = slots[p : p + size]
            if all(w == FILLER_TOKEN for w in window):
                continue
            if slots[p] == FILLER_TOKEN and not output_unigrams:
                # a shingle starting at a filler is still emitted in Lucene;
                # keep it (its position is the filler slot)
                pass
            out_t.append(SHINGLE_SEP.join(window))
            out_p.append(p)
    return out_t, out_p


# ---------------------------------------------------------------------------
# character n-grams


def ngram_filter(term: str, min_gram: int = 1, max_gram: int = 2) -> list[str]:
    """NGramTokenFilter.cs: all char n-grams, gram-size-major then offset
    order (Lucene 4.4+ emits by position; grams share the origin token's
    position — posIncr 0 after the first)."""
    out = []
    for n in range(min_gram, max_gram + 1):
        for i in range(len(term) - n + 1):
            out.append(term[i : i + n])
    return out


def edge_ngram_filter(term: str, min_gram: int = 1, max_gram: int = 2) -> list[str]:
    """EdgeNGramTokenFilter.cs (Side.FRONT): leading n-grams."""
    return [term[:n] for n in range(min_gram, min(max_gram, len(term)) + 1)]


# ---------------------------------------------------------------------------
# synonyms (single-token subset of Synonym/SynonymFilter.cs)


class SynonymMap:
    """token → additional tokens injected at the same position (posIncr=0).

    The single-token subset of the FST SynonymFilter: covers the classic
    "inject equivalents" use (TestSynonymMapFilter single-token cases);
    multi-word rules are out of scope for v1 (documented).
    """

    def __init__(self, rules: dict[str, list[str]], expand: bool = True):
        self.map: dict[str, tuple[str, ...]] = {}
        for src, dsts in rules.items():
            bag = [d for d in dsts if d != src]
            self.map[src] = tuple(bag)
            if expand:
                # expand=true (SolrSynonymParser): every member maps to the
                # full equivalence class
                group = [src] + bag
                for m in group:
                    self.map[m] = tuple(x for x in group if x != m)

    def lookup(self, term: str) -> tuple[str, ...]:
        return self.map.get(term, ())


def synonym_filter(terms: list[str], positions: list[int],
                   smap: SynonymMap) -> tuple[list[str], list[int]]:
    """Inject synonyms at the source token's position. Output remains sorted
    by position (stacked tokens adjacent), like the attribute stream."""
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        out_t.append(t)
        out_p.append(p)
        for s in smap.lookup(t):
            out_t.append(s)
            out_p.append(p)
    return out_t, out_p


# ---------------------------------------------------------------------------
# WordDelimiterFilter (Miscellaneous/WordDelimiterFilter.cs)


def _wd_parts(term: str, split_on_case: bool, split_on_numerics: bool
              ) -> list[str]:
    """Sub-word runs: split at non-alphanumerics, lower→Upper case
    transitions, and letter↔digit boundaries (WordDelimiterIterator.cs)."""
    parts: list[str] = []
    cur: list[str] = []

    def kind(c: str) -> str:
        if c.isdigit():
            return "d"
        if c.isalpha():
            return "U" if c.isupper() else "l"
        return "-"

    prev = ""
    for c in term:
        k = kind(c)
        if k == "-":
            if cur:
                parts.append("".join(cur))
                cur = []
            prev = k
            continue
        if cur:
            boundary = (
                (split_on_case and prev == "l" and k == "U")
                or (split_on_numerics and (prev == "d") != (k == "d")
                    and prev in "lUd" and k in "lUd")
            )
            if boundary:
                parts.append("".join(cur))
                cur = []
        cur.append(c)
        prev = k
    if cur:
        parts.append("".join(cur))
    return parts


def word_delimiter(term: str,
                   generate_parts: bool = True,
                   catenate_all: bool = False,
                   preserve_original: bool = False,
                   split_on_case_change: bool = True,
                   split_on_numerics: bool = True) -> list[str]:
    """WordDelimiterFilter.cs subset for ONE token → emitted terms in order.

    "PowerShot500" → ["power", "shot", "500"] (parts are NOT lowercased by
    the reference filter — lowercasing belongs to a later LowerCaseFilter;
    here we return the raw parts). catenate_all adds the joined run
    ("PowerShot500"→"PowerShot500" parts joined), preserve_original keeps
    the input verbatim first. Position bookkeeping (parts at consecutive
    positions, injected forms stacked at the first part) is the caller's —
    the common indexing use feeds these straight into a bag-of-terms."""
    parts = _wd_parts(term, split_on_case_change, split_on_numerics)
    out: list[str] = []
    if preserve_original:
        out.append(term)
    if generate_parts:
        out.extend(p for p in parts if p)
    if catenate_all and parts:
        cat = "".join(parts)
        if cat not in out:
            out.append(cat)
    return out


# ---------------------------------------------------------------------------
# small filters (Miscellaneous/*)


def length_filter(terms: list[str], positions: list[int],
                  min_len: int = 1, max_len: int = 255
                  ) -> tuple[list[str], list[int]]:
    """LengthFilter (Miscellaneous/LengthFilter.cs): drop tokens outside
    [min, max] chars; position holes remain (FilteringTokenFilter)."""
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        if min_len <= len(t) <= max_len:
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


def trim_filter(terms: list[str]) -> list[str]:
    """TrimFilter (Miscellaneous/TrimFilter.cs): strip surrounding
    whitespace (relevant for KeywordTokenizer-style streams)."""
    return [t.strip() for t in terms]


def limit_token_count(terms: list[str], positions: list[int],
                      max_tokens: int) -> tuple[list[str], list[int]]:
    """LimitTokenCountFilter (Miscellaneous/LimitTokenCountFilter.cs):
    keep only the first max_tokens tokens (the index-prefix truncation used
    for very long docs)."""
    return terms[:max_tokens], positions[:max_tokens]


class KeywordMarkerStemmer(PorterStemmer):
    """SetKeywordMarkerFilter + PorterStem (Miscellaneous/
    SetKeywordMarkerFilter.cs): protected terms bypass the stemmer."""

    def __init__(self, protected: frozenset[str] = frozenset()):
        super().__init__()
        self.protected = protected

    def __call__(self, term: str) -> str:
        if term in self.protected:
            return term
        return super().__call__(term)


# ---------------------------------------------------------------------------
# MappingCharFilter


class MappingCharFilter:
    """Greedy longest-match string rewriting BEFORE tokenization
    (CharFilter/MappingCharFilter.cs over a NormalizeCharMap). Compiled to a
    single alternation regex at construction (longest alternatives first)."""

    def __init__(self, mapping: dict[str, str]):
        import re

        self.mapping = dict(mapping)
        keys = sorted(mapping, key=len, reverse=True)
        self._re = re.compile("|".join(re.escape(k) for k in keys)) if keys else None

    def __call__(self, text: str) -> str:
        if self._re is None:
            return text
        return self._re.sub(lambda m: self.mapping[m.group(0)], text)


# ---------------------------------------------------------------------------
# analyzer chains


class EnglishAnalyzer(StandardAnalyzer):
    """En/EnglishAnalyzer.cs chain: StandardTokenizer → EnglishPossessive →
    LowerCase → Stop(English) → PorterStem.

    (The reference chain runs possessive-stripping before lowercasing; both
    operate per-char so the order only matters for the quote variants, which
    survive lowercase — behavior matches.)
    """

    def __init__(self) -> None:
        self._stem = PorterStemmer()

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        terms, positions = super().__call__(text)
        stem = self._stem
        return [stem(english_possessive(t)) for t in terms], positions


class ShingleAnalyzer:
    """Shingle/ShingleAnalyzerWrapper.cs around a base analyzer.

    ``stop_words=frozenset()`` (the default) shingles the RAW token stream —
    no holes, no fillers; pass a stop set to get filler-token shingles."""

    def __init__(self, min_size: int = 2, max_size: int = 2,
                 output_unigrams: bool = True,
                 stop_words: frozenset[str] = frozenset()):
        base = StandardAnalyzer()
        base.stop_words = stop_words
        self.base = base
        self.min_size = min_size
        self.max_size = max_size
        self.output_unigrams = output_unigrams

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        terms, positions = self.base(text)
        return shingles(terms, positions, self.min_size, self.max_size,
                        self.output_unigrams)


# ---------------------------------------------------------------------------
# CJK bigrams


_CJK_SCRIPT_RE = {
    "han": _regex.compile(r"\p{Script=Han}+\Z"),
    "hiragana": _regex.compile(r"\p{Script=Hiragana}+\Z"),
    "katakana": _regex.compile(r"\p{Script=Katakana}+\Z"),
    "hangul": _regex.compile(r"\p{Script=Hangul}+\Z"),
}


def cjk_bigrams(terms: list[str], positions: list[int], offsets: list[int],
                scripts: tuple[str, ...] = ("han", "hiragana"),
                output_unigrams: bool = False
                ) -> tuple[list[str], list[int]]:
    """CJKBigramFilter (``Analysis/Cjk/CJKBigramFilter.cs``): form bigrams
    over runs of OFFSET-ALIGNED tokens of the selected CJK scripts
    (``IncrementToken`` clears its buffer when ``StartOffset !=
    lastEndOffset`` — whitespace between segments breaks runs even though
    positions stay consecutive). A flagged token with no aligned flagged
    neighbor is emitted in unigram form; non-flagged tokens pass through
    unmodified. ``output_unigrams=True`` interleaves unigrams and bigrams
    (the combined approach: A, AB, B, BC, C).

    Buffer semantics per the reference: a run's CODEPOINTS are what gets
    bigrammed, so a multi-char run token (e.g. a Katakana run, when
    'katakana' is flagged) contributes each of its characters."""
    pats = [_CJK_SCRIPT_RE[s] for s in scripts]

    out_t: list[str] = []
    out_p: list[int] = []

    run_chars: list[str] = []
    run_pos: list[int] = []

    def flush_run() -> None:
        n = len(run_chars)
        if not n:
            return
        if n == 1:
            out_t.append(run_chars[0])
            out_p.append(run_pos[0])
        else:
            for i in range(n - 1):
                if output_unigrams:
                    out_t.append(run_chars[i])
                    out_p.append(run_pos[i])
                out_t.append(run_chars[i] + run_chars[i + 1])
                out_p.append(run_pos[i])
            if output_unigrams:
                out_t.append(run_chars[-1])
                out_p.append(run_pos[-1])
        run_chars.clear()
        run_pos.clear()

    last_end = None
    for term, pos, off in zip(terms, positions, offsets):
        flagged = any(p.match(term) for p in pats)
        if not flagged:
            flush_run()
            out_t.append(term)
            out_p.append(pos)
            last_end = None
            continue
        if last_end is not None and off != last_end and run_chars:
            flush_run()
        for i, ch in enumerate(term):
            run_chars.append(ch)
            run_pos.append(pos if i == 0 else pos)
        last_end = off + len(term)
    flush_run()
    return out_t, out_p


class CJKBigramAnalyzer:
    """CJKAnalyzer chain shape (``Analysis/Cjk/CJKAnalyzer.cs``:
    StandardTokenizer → CJKBigramFilter → lowercase/stop already applied by
    the standard chain). ``scripts`` selects the flagged writing systems."""

    def __init__(self, scripts: tuple[str, ...] = ("han", "hiragana"),
                 output_unigrams: bool = False):
        self.base = StandardAnalyzer()
        self.scripts = scripts
        self.output_unigrams = output_unigrams

    def __call__(self, text: str) -> tuple[list[str], list[int]]:
        terms, positions, offsets = self.base.call_with_offsets(text)
        return cjk_bigrams(terms, positions, offsets, self.scripts,
                           self.output_unigrams)


# ---------------------------------------------------------------------------
# CommonGrams


def common_grams(terms: list[str], positions: list[int],
                 common: frozenset[str]
                 ) -> tuple[list[str], list[int], list[bool]]:
    """CommonGramsFilter (``Analysis/CommonGrams/CommonGramsFilter.cs``):
    keep every unigram; additionally emit ``prev_cur`` grams (separator
    '_', posIncrement 0 → the PREVIOUS token's position, posLength 2)
    for each adjacent pair where either side is in ``common``. The gram is
    emitted between its two unigrams, matching the filter's savedState
    interleave. Membership is exact-case like CharArraySet(ignoreCase=
    false); chain after lowercase. Returns (terms, positions, is_gram)."""
    out_t: list[str] = []
    out_p: list[int] = []
    out_g: list[bool] = []
    for i, (t, p) in enumerate(zip(terms, positions)):
        if i > 0 and (terms[i - 1] in common or t in common):
            out_t.append(terms[i - 1] + "_" + t)
            out_p.append(positions[i - 1])
            out_g.append(True)
        out_t.append(t)
        out_p.append(p)
        out_g.append(False)
    return out_t, out_p, out_g


def common_grams_query(terms: list[str], is_gram: list[bool]) -> list[str]:
    """CommonGramsQueryFilter (``CommonGramsQueryFilter.cs``): one-token
    lookahead over the CommonGramsFilter stream — a held token is emitted
    only when the NEXT token is not a gram (so unigrams absorbed into a
    following gram disappear), and the final held token is dropped when the
    last emission was a gram (the trailing-stopword cases)."""
    out: list[str] = []
    prev: str | None = None
    prev_gram = False
    last_emitted_gram = False
    for t, g in zip(terms, is_gram):
        if prev is not None and not g:
            out.append(prev)
            last_emitted_gram = prev_gram
        prev, prev_gram = t, g
    if prev is not None and not (out and last_emitted_gram):
        out.append(prev)
    return out
