"""Query AST + classic-syntax parser subset.

The reference's query tree (SURVEY §2.10): every node compiles to per-bucket
scorers. v0 implements the nodes needed by the north rule plus the common
rewrite family:

- TermQuery                       (``Search/TermQuery.cs:47``)
- BooleanQuery MUST/SHOULD/MUST_NOT (``Search/BooleanQuery.cs:69``; coord==1
  for BM25, ``Similarities/Similarity.cs:117-121``)
- PhraseQuery (exact, slop=0)     (``Search/PhraseQuery.cs``, ExactPhraseScorer)
- MatchAllDocsQuery               (``Search/MatchAllDocsQuery.cs:33``)
- Multi-term rewrites: Prefix / Wildcard / Regexp / Fuzzy / TermRange
  (``Search/MultiTermQuery.cs:63-196``) — expanded against the term
  dictionary into a constant-score or scoring-Boolean query. Defaults match
  Lucene: Prefix/Wildcard/Regexp/TermRange rewrite constant-score
  (CONSTANT_SCORE_AUTO_REWRITE_DEFAULT), Fuzzy rewrites top-50
  scoring-Boolean (``Search/FuzzyQuery.cs:56``).

The parser covers the classic QueryParser subset used by EnwikiQueryMaker
(``Benchmark/ByTask/Feeds/EnwikiQueryMaker.cs:40-67``): free terms (OR'd),
quoted phrases, AND / OR / NOT / +term / -term, prefix* and range [a TO b].
Query text is run through the same StandardAnalyzer as indexing
(``QueryParserBase.cs:186``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from lucenenet_ray.analysis.standard import StandardAnalyzer


class Occur(Enum):
    MUST = "+"
    SHOULD = ""
    MUST_NOT = "-"


# Multi-field postings share one term dictionary: a term of field F is stored
# as "F\x1fterm" (the unit-separator control char can never appear inside an
# analyzed token). The default field ("body") is UNPREFIXED, so single-field
# indexes/queries are unchanged. Mirrors Lucene keying postings by
# (field, term) (``Index/Term.cs``, ``FieldInfos.cs``); non-default fields
# omit norms in v1 (Lucene's omitNorms → BM25 scores with norm = k1,
# ``BM25Similarity.cs:267-268``).
FIELD_SEP = "\x1f"
DEFAULT_FIELD = "body"


def field_term(field: str, term: str) -> str:
    return term if field == DEFAULT_FIELD else f"{field}{FIELD_SEP}{term}"


@dataclass(frozen=True)
class Query:
    boost: float = 1.0


@dataclass(frozen=True)
class TermQuery(Query):
    term: str = ""


@dataclass(frozen=True)
class PhraseQuery(Query):
    # (term, relative position) pairs; holes allowed (stopword gaps), like
    # PhraseQuery.Add(term, position) via QueryParser with posIncr enabled
    terms: tuple[tuple[str, int], ...] = ()
    slop: int = 0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with ALTERNATIVE terms per position (``Search/MultiPhraseQuery.cs``):
    each slot is (frozenset-of-terms, relative position); a doc matches when
    some alignment has ANY member of every slot at its relative position.
    The natural consumer is query-time synonym injection (SynonymFilter →
    stacked tokens → MultiPhraseQuery, QueryParserBase.GetFieldQuery).

    Scoring follows MultiPhraseWeight: idf = float32 sum over ALL terms of
    all slots in add order (MultiPhraseQuery.cs:188-204 IdfExplain over the
    flattened term array); freq counts matching alignments."""

    # ((terms...), rel_pos) per slot; terms tuple kept in add order
    slots: tuple[tuple[tuple[str, ...], int], ...] = ()
    slop: int = 0


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: "Query"


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...] = ()
    # BooleanQuery.MinimumNumberShouldMatch (BooleanQuery.cs /
    # MinShouldMatchSumScorer.cs): a doc must match at least this many of the
    # SHOULD clauses (in addition to all MUST clauses).
    min_should_match: int = 0


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class NumericDocValuesRangeQuery(Query):
    """Numeric range over a doc-values field — the NumericRangeQuery /
    FieldCacheRangeFilter surface (``Search/NumericRangeQuery.cs``,
    ``Search/FieldCacheRangeFilter.cs:NewInt64Range``) re-expressed over the
    engine's numeric doc-values columns (index/docvalues.py) instead of a
    trie-encoded term hierarchy: ranges evaluate as one vectorized compare
    per bucket against the pinned column, no term expansion at all (the
    FieldCache path Lucene itself recommends once values are cached).
    Matches score a constant ``boost`` like a filter wrapped in
    ConstantScoreQuery; doc-values UPDATE generations are honored (the plan
    ships the update log, resolved per bucket against postings)."""

    field: str = ""
    lower: int | None = None
    upper: int | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class DocIdSetQuery(Query):
    """A precomputed doc-id set used as a filter clause — the Filter /
    CachingWrapperFilter surface (``Search/Filter.cs``,
    ``Search/CachingWrapperFilter.cs``): an arbitrary DocIdSet produced
    outside the query tree (e.g. ``search/duplicates.duplicate_filter``, the
    DuplicateFilter analog) attached to a scoring query as a MUST clause of
    a BooleanQuery — the FilteredQuery composition. With the default
    ``boost=0.0`` the clause adds +0.0f to the float32 clause-order sum
    (exact identity), so scores equal the unfiltered query's scores, like
    FilteredQuery's "score comes from the wrapped query" contract
    (``Search/FilteredQuery.cs:35-48``).

    ``doc_ids`` holds GLOBAL doc ids as a sorted tuple (hashable for the
    frozen dataclass); evaluation is one vectorized ``np.isin`` per bucket
    against the bucket's global-id column — no driver-side bitset."""

    doc_ids: tuple[int, ...] = ()

    def sorted_array(self):
        import numpy as np

        arr = getattr(self, "_arr", None)
        if arr is None:
            arr = np.asarray(self.doc_ids, dtype=np.int64)
            object.__setattr__(self, "_arr", arr)
        return arr


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(clause scores) + tie_breaker * (sum - max), float32 ops —
    ``Search/DisjunctionMaxQuery.cs:58`` / DisjunctionMaxScorer."""

    disjuncts: tuple[Query, ...] = ()
    tie_breaker: float = 0.0


def common_terms_query(terms: list[str], df_of, num_docs: int,
                       max_term_frequency: float = 0.01,
                       low_freq_occur: Occur = Occur.SHOULD) -> Query:
    """CommonTermsQuery rewrite (``Queries/CommonTermsQuery.cs``): terms with
    df > max_term_frequency*N are "common" and demoted to a purely optional
    sub-query; rare terms keep ``low_freq_occur``. ``df_of(term)`` supplies
    global df (0 for absent terms)."""
    cutoff = max_term_frequency * num_docs
    low = [t for t in terms if df_of(t) <= cutoff]
    high = [t for t in terms if df_of(t) > cutoff]
    clauses = [BooleanClause(low_freq_occur, TermQuery(term=t)) for t in low]
    if high:
        sub = BooleanQuery(
            clauses=tuple(BooleanClause(Occur.SHOULD, TermQuery(term=t)) for t in high)
        )
        clauses.append(BooleanClause(Occur.SHOULD, sub))
    return BooleanQuery(clauses=tuple(clauses))


@dataclass(frozen=True)
class MultiTermQuery(Query):
    """Base for term-expansion queries; concrete matching in `matches_term`."""

    constant_score: bool = True  # CONSTANT_SCORE_AUTO_REWRITE_DEFAULT
    max_expansions: int = 1024  # BooleanQuery.MaxClauseCount (BooleanQuery.cs:69)

    def matches_term(self, term: str) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass(frozen=True)
class PrefixQuery(MultiTermQuery):
    prefix: str = ""

    def matches_term(self, term: str) -> bool:
        return term.startswith(self.prefix)


@dataclass(frozen=True)
class WildcardQuery(MultiTermQuery):
    pattern: str = ""  # * and ? wildcards (WildcardQuery.cs:45)
    _re: object = field(default=None, compare=False, repr=False)

    def compiled(self):
        import re

        esc = "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c) for c in self.pattern
        )
        return re.compile(esc + r"\Z")

    def matches_term(self, term: str) -> bool:
        return self.compiled().match(term) is not None


@dataclass(frozen=True)
class RegexpQuery(MultiTermQuery):
    pattern: str = ""

    def matches_term(self, term: str) -> bool:
        import re

        return re.fullmatch(self.pattern, term) is not None


@dataclass(frozen=True)
class TermRangeQuery(MultiTermQuery):
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True

    def matches_term(self, term: str) -> bool:
        if self.lower is not None:
            if self.include_lower:
                if term < self.lower:
                    return False
            elif term <= self.lower:
                return False
        if self.upper is not None:
            if self.include_upper:
                if term > self.upper:
                    return False
            elif term >= self.upper:
                return False
        return True


@dataclass(frozen=True)
class NumericRangeQuery64(MultiTermQuery):
    """NumericRangeQuery over a *trie-indexed* int64 field
    (``Search/NumericRangeQuery.cs:340-379``; terms produced by the
    inverter's ``numeric:<precisionStep>`` extra-field mode, the
    NumericTokenStream analog). ``None`` bound = open end; exclusive bounds
    step inward by one. Expansion decomposes the range with
    NumericUtils.SplitRange into per-shift term-dict range scans
    (reader.expand_query) — the middle of the range is matched by a handful
    of low-precision terms, the boundaries by full-precision scans."""

    field_name: str = ""
    lower: int | None = None
    upper: int | None = None
    include_lower: bool = True
    include_upper: bool = True
    precision_step: int = 4

    def encoded_ranges(self) -> list[tuple[str, str]]:
        """(lo_term, hi_term) inclusive prefix-coded scan bounds, unprefixed."""
        from lucenenet_ray.index.numeric import (int64_to_prefix_coded,
                                                 normalize_bounds,
                                                 split_int64_range)

        b = normalize_bounds(self.lower, self.upper,
                             self.include_lower, self.include_upper)
        if b is None:
            return []
        return [
            (int64_to_prefix_coded(mn, sh), int64_to_prefix_coded(mx, sh))
            for mn, mx, sh in split_int64_range(self.precision_step, *b)
        ]

    def matches_term(self, term: str) -> bool:
        body = term.split(FIELD_SEP, 1)[1] if FIELD_SEP in term else term
        return any(lo <= body <= hi for lo, hi in self.encoded_ranges())


def _levenshtein_within(a: str, b: str, k: int) -> bool:
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            best = min(best, cur[j])
        if best > k:
            return False
        prev = cur
    return prev[-1] <= k


@dataclass(frozen=True)
class FuzzyQuery(MultiTermQuery):
    term: str = ""
    max_edits: int = 2  # FuzzyQuery defaultMaxEdits (FuzzyQuery.cs)
    # Lucene default rewrite = TopTermsScoringBooleanQueryRewrite(50):
    constant_score: bool = False
    max_expansions: int = 50

    def matches_term(self, term: str) -> bool:
        if term == self.term:
            return True
        return _levenshtein_within(term, self.term, self.max_edits)


# ---------------------------------------------------------------------------


def parse_query(text: str, analyzer: StandardAnalyzer | None = None,
                synonyms=None, default_operator: str = "OR",
                default_phrase_slop: int = 0,
                lowercase_expanded_terms: bool = True,
                allow_leading_wildcard: bool = False,
                fuzzy_max_edits: int = 2,
                numeric_configs: dict | None = None) -> Query:
    """Classic-QueryParser subset → Query AST.

    Grammar: tokens separated by whitespace; ``"quoted phrase"``; ``AND`` /
    ``OR`` / ``NOT`` connectives; ``+term`` / ``-term`` modifiers;
    ``prefix*``; ``[a TO b]`` ranges. Free terms default to SHOULD (OR), as
    ``QueryParser.DefaultOperator = OR`` (QueryParserBase).
    Terms and phrase words are analyzed with the StandardAnalyzer chain, so
    stopwords vanish and phrases keep position holes (QueryParserBase:186).

    ``synonyms`` (an ``analysis.filters.SynonymMap``) applies QUERY-TIME
    synonym injection the way an analyzer-with-SynonymFilter does through
    QueryParserBase.GetFieldQuery: stacked tokens at one position turn a
    free term into an OR group and a quoted phrase into a MultiPhraseQuery
    (TestQueryParser synonym cases / MultiPhraseQuery.cs).

    The keyword configs mirror the Flexible framework's
    ``StandardQueryParser`` knobs (search/flexible.py; defaults preserve
    classic behavior exactly): ``default_operator="AND"`` makes
    unconnected clauses required with classic AddClause's OR-demotion of
    the previous clause; ``default_phrase_slop`` is applied to phrases
    without an explicit ``~N`` (DefaultPhraseSlopQueryNodeProcessor);
    ``lowercase_expanded_terms=False`` keeps wildcard/prefix/fuzzy case
    (LowercaseExpandedTermsQueryNodeProcessor); ``allow_leading_wildcard``
    permits ``*foo`` (AllowLeadingWildcardProcessor raises otherwise —
    classic silently analyzed it); ``fuzzy_max_edits`` configures ``~``
    terms (FuzzyConfig); ``numeric_configs`` maps field →
    ``precision_step`` so ``field:[10 TO 20]`` builds a trie
    NumericRangeQuery64 (NumericRangeQueryNodeProcessor).
    """
    analyzer = analyzer or StandardAnalyzer()
    import re as _re

    and_default = default_operator.upper() == "AND"
    numeric_configs = numeric_configs or {}
    tokens = _re.findall(
        r'(?:[A-Za-z_][\w]*:)?"[^"]*"(?:~\d+)?(?:\^[\d.]+)?'
        r'|(?:[A-Za-z_][\w]*:)?\[[^\]]*\]|\S+',
        text)
    clauses: list[BooleanClause] = []
    next_occur = Occur.SHOULD
    prev_and = False  # AND binds the previous and next clause to MUST
    prev_or = False   # OR keeps the next (and demotes the previous) clause

    def add(q: Query | None, occur: Occur) -> None:
        nonlocal prev_and, prev_or
        if q is None:
            prev_and = False
            prev_or = False
            return
        if prev_and and clauses and clauses[-1].occur == Occur.SHOULD:
            clauses[-1] = BooleanClause(Occur.MUST, clauses[-1].query)
        if prev_and and occur == Occur.SHOULD:
            occur = Occur.MUST
        if and_default and not prev_and:
            # classic AddClause with AND_OPERATOR: conj==OR demotes the
            # previous non-prohibited clause to SHOULD; a clause not
            # introduced by OR is required
            if prev_or:
                if clauses and clauses[-1].occur == Occur.MUST:
                    clauses[-1] = BooleanClause(Occur.SHOULD,
                                                clauses[-1].query)
            elif occur == Occur.SHOULD:
                occur = Occur.MUST
        clauses.append(BooleanClause(occur, q))
        prev_and = False
        prev_or = False

    for raw in tokens:
        if raw == "AND" or raw == "&&":
            prev_and = True
            continue
        if raw == "OR" or raw == "||":
            prev_or = True
            continue
        if raw == "NOT" or raw == "!":
            next_occur = Occur.MUST_NOT
            continue
        occur = next_occur
        next_occur = Occur.SHOULD
        if raw.startswith("+"):
            occur = Occur.MUST
            raw = raw[1:]
        elif raw.startswith("-"):
            occur = Occur.MUST_NOT
            raw = raw[1:]
        if not raw:
            continue
        # `term^2` / `"phrase"^2` boost suffix (QueryParserBase.HandleBoost)
        boost = 1.0
        m = _re.match(r'^(.*[^\s^])\^([\d.]+)$', raw)
        if m and not raw.startswith("["):
            raw, boost = m.group(1), float(m.group(2))
        # `field:...` qualifier (QueryParserBase field handling); the default
        # field is unprefixed in the term dictionary
        fld = DEFAULT_FIELD
        m = _re.match(r'^([A-Za-z_][\w]*):(.+)$', raw)
        if m:
            fld, raw = m.group(1), m.group(2)
        if raw.startswith('"'):
            # "..."~N = sloppy phrase (QueryParserBase.GetFieldQuery slop
            # handling; PhraseQuery.Slop)
            slop = default_phrase_slop
            if "~" in raw:
                raw, _, s = raw.rpartition("~")
                slop = int(s)
            words = raw.strip('"')
            terms, positions = analyzer(words)
            if not terms:
                add(None, occur)
                continue
            base = positions[0]
            if synonyms is not None:
                # stacked tokens per position → MultiPhraseQuery slots
                slots: list[tuple[tuple[str, ...], int]] = []
                stacked = False
                for t, p in zip(terms, positions):
                    alts = (t,) + synonyms.lookup(t)
                    if len(alts) > 1:
                        stacked = True
                    slots.append((tuple(field_term(fld, a) for a in alts),
                                  p - base))
                if stacked:
                    add(MultiPhraseQuery(slots=tuple(slots), slop=slop,
                                         boost=boost), occur)
                    continue
            if len(terms) == 1:
                add(TermQuery(term=field_term(fld, terms[0]), boost=boost), occur)
            else:
                add(
                    PhraseQuery(terms=tuple((field_term(fld, t), p - base)
                                            for t, p in zip(terms, positions)),
                                slop=slop, boost=boost),
                    occur,
                )
            continue
        if raw.startswith("[") and " TO " in raw:
            lo, hi = raw.strip("[]").split(" TO ")
            lo, hi = lo.strip(), hi.strip()
            if fld in numeric_configs:
                # NumericRangeQueryNodeProcessor: a field with a
                # NumericConfig parses its bounds as int64 trie ranges
                add(NumericRangeQuery64(
                    field_name=fld,
                    lower=int(lo) if lo and lo != "*" else None,
                    upper=int(hi) if hi and hi != "*" else None,
                    precision_step=numeric_configs[fld],
                    boost=boost), occur)
                continue
            add(TermRangeQuery(lower=field_term(fld, lo) if lo else None,
                               upper=field_term(fld, hi) if hi else None,
                               boost=boost), occur)
            continue

        def expcase(s: str) -> str:
            return s.lower() if lowercase_expanded_terms else s

        if raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw and len(raw) > 1:
            add(PrefixQuery(prefix=field_term(fld, expcase(raw[:-1])),
                            boost=boost), occur)
            continue
        if ("*" in raw or "?" in raw) and (
                not raw.startswith(("*", "?")) or
                (allow_leading_wildcard and len(raw) > 1)):
            add(WildcardQuery(pattern=field_term(fld, expcase(raw)),
                              boost=boost), occur)
            continue
        if raw.endswith("~") and len(raw) > 1:
            add(FuzzyQuery(term=field_term(fld, expcase(raw[:-1])),
                           max_edits=fuzzy_max_edits, boost=boost), occur)
            continue
        terms, positions = analyzer(raw)
        if not terms:
            add(None, occur)
        elif len(terms) == 1:
            t = terms[0]
            alts = (t,) + synonyms.lookup(t) if synonyms is not None else (t,)
            if len(alts) > 1:
                # stacked free term → OR group (QueryParser's BooleanQuery
                # for posIncr==0 token stacks)
                add(BooleanQuery(clauses=tuple(
                    BooleanClause(Occur.SHOULD,
                                  TermQuery(term=field_term(fld, a), boost=boost))
                    for a in alts)), occur)
            else:
                add(TermQuery(term=field_term(fld, t), boost=boost), occur)
        else:
            # one raw token analyzing to several terms (e.g. "xyz@example.com")
            for t in terms:
                add(TermQuery(term=field_term(fld, t), boost=boost), occur)

    if not clauses:
        # all terms analyzed away (e.g. pure stopwords): an empty BooleanQuery
        # matches NOTHING, like QueryParser returning an empty BooleanQuery
        # (QueryParserBase — not MatchAllDocs).
        return BooleanQuery(clauses=())
    if len(clauses) == 1 and clauses[0].occur in (Occur.SHOULD, Occur.MUST):
        return clauses[0].query
    return BooleanQuery(clauses=tuple(clauses))


def analyzing_parse_query(text: str, analyzer=None, synonyms=None) -> Query:
    """AnalyzingQueryParser (QueryParser/Analyzing/AnalyzingQueryParser.cs):
    the classic grammar, but wildcard / prefix / fuzzy terms are analyzed —
    each non-wildcard CHUNK runs through the analyzer (GetWildcardQuery
    :30-70 splits at unescaped * and ?; GetPrefixQuery/GetFuzzyQuery
    analyze the whole term), and a chunk that analyzes to more or fewer
    than one token raises, like AnalyzeSingleChunk (:95-130)."""
    import re as _re

    analyzer = analyzer or StandardAnalyzer()

    def one(chunk: str, whole: str) -> str:
        terms, _pos = analyzer(chunk)
        if len(terms) != 1:
            raise ValueError(
                f"Unable to analyze multi-term text {whole!r}: chunk "
                f"{chunk!r} analyzed to {len(terms)} tokens")
        return terms[0]

    def rewrite(tok: str) -> str:
        body = tok
        suffix = ""
        if body.endswith("~") and not body.startswith('"'):
            body, suffix = body[:-1], "~"
        if "*" in body or "?" in body:
            out = []
            last = 0
            for m in _re.finditer(r"\\?([*?])", body):
                if m.group(0).startswith("\\"):
                    continue
                if m.start() > last:
                    out.append(one(body[last: m.start()], tok))
                out.append(m.group(1))
                last = m.end()
            if last < len(body):
                out.append(one(body[last:], tok))
            return "".join(out) + suffix
        if suffix == "~":
            return one(body, tok) + suffix
        return tok

    parts = []
    for tok in text.split():
        if (tok[0] not in '"+-[' and tok not in ("AND", "OR", "NOT")
                and ("*" in tok or "?" in tok or tok.endswith("~"))):
            mod = ""
            if tok[0] in "+-":
                mod, tok = tok[0], tok[1:]
            parts.append(mod + rewrite(tok))
        else:
            parts.append(tok)
    return parse_query(" ".join(parts), analyzer=analyzer,
                       synonyms=synonyms)


def multifield_parse_query(text: str, fields: list[str],
                           boosts: dict[str, float] | None = None,
                           analyzer=None, synonyms=None) -> Query:
    """MultiFieldQueryParser (QueryParser/Classic/MultiFieldQueryParser.cs
    :56-120 GetFieldQuery): parse with no explicit field, then expand every
    clause across `fields` as a SHOULD group, applying per-field boosts.
    The default field "" maps to the engine's unprefixed (body) terms."""
    base = parse_query(text, analyzer=analyzer, synonyms=synonyms)
    boosts = boosts or {}

    def refield(q: Query, field: str) -> Query:
        import dataclasses

        boost = boosts.get(field)

        def pref(term: str) -> str:
            return term if field == "" else field_term(field, term)

        if isinstance(q, TermQuery):
            out = dataclasses.replace(q, term=pref(q.term))
        elif isinstance(q, PrefixQuery):
            out = dataclasses.replace(q, prefix=pref(q.prefix))
        elif isinstance(q, WildcardQuery):
            out = dataclasses.replace(q, pattern=pref(q.pattern))
        elif isinstance(q, FuzzyQuery):
            out = dataclasses.replace(q, term=pref(q.term))
        elif isinstance(q, PhraseQuery):
            out = dataclasses.replace(
                q, terms=tuple(pref(t) for t in q.terms))
        elif isinstance(q, BooleanQuery):
            out = dataclasses.replace(q, clauses=tuple(
                dataclasses.replace(c, query=refield(c.query, field))
                for c in q.clauses))
        else:
            out = q
        if boost is not None and not isinstance(out, BooleanQuery):
            out = dataclasses.replace(out, boost=out.boost * boost)
        return out

    def expand(q: Query) -> Query:
        if isinstance(q, BooleanQuery):
            import dataclasses

            return dataclasses.replace(q, clauses=tuple(
                dataclasses.replace(c, query=expand(c.query))
                for c in q.clauses))
        return BooleanQuery(clauses=tuple(
            BooleanClause(Occur.SHOULD, refield(q, f)) for f in fields))

    return expand(base)


def ngram_phrase_rewrite(q: "PhraseQuery", n: int) -> "PhraseQuery":
    """NGramPhraseQuery.Rewrite (Search/NGramPhraseQuery.cs:30-70): for an
    exact (slop 0) phrase of CONSECUTIVE n-gram terms, every n-th term plus
    the last suffices — overlapping grams make the dropped positions
    redundant. Returns `q` unchanged when not optimizable (slop, < 3
    terms, n < 2, or position gaps)."""
    import dataclasses

    if getattr(q, "slop", 0) != 0 or n < 2 or len(q.terms) < 3:
        return q
    positions = [p for _t, p in q.terms]
    if any(positions[i] + 1 != positions[i + 1]
           for i in range(len(positions) - 1)):
        return q
    last = len(q.terms) - 1
    kept = tuple(tp for i, tp in enumerate(q.terms)
                 if i % n == 0 or i >= last)
    return dataclasses.replace(q, terms=kept)
