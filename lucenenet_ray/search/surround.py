"""Surround + ComplexPhrase query-parser dialects → span query trees.

Surround dialect (``QueryParser/Surround/Parser/QueryParser.jj`` /
``Surround/Query/DistanceQuery.cs`` analog): the proximity query language
with infix/prefix distance operators over span primitives.

Grammar subset (precedence loosest→tightest, mirroring the reference
production chain OrQuery → AndQuery → NotQuery → NQuery → WQuery →
Primary):

- ``a OR b`` / ``a AND b`` / ``a NOT b``  — boolean combinations
  (case-insensitive keywords). Compiled to a ``BooleanQuery`` when every
  operand is term-level; boolean-over-distance is rejected like the
  unsupported mixes the reference routes through SrndBooleanQuery only
  for compatible subtrees.
- ``a W b`` / ``a N b``                    — infix ordered / unordered
  adjacency (distance 1).
- ``nW(a, b, ...)`` / ``nN(a, b, ...)``    — prefix distance operators,
  distance ``n`` in 2..99 (``W(...)``/``N(...)`` = distance 1). Distance
  n compiles to span slop n-1 exactly as ``DistanceQuery`` hands
  ``opDistance - 1`` to ``SpanNearQuery``.
- ``mer*`` / ``m?rge``                     — truncation terms
  (``SrndTruncQuery``): expanded against the sorted term dictionary at
  rewrite time into a ``SpanOrQuery`` (the reference visits matching
  terms via ``SrndTruncQuery.VisitMatchingTerms``).
- ``( ... )`` grouping and ``,`` separators inside prefix operators.

ComplexPhrase dialect (``QueryParser/ComplexPhrase/
ComplexPhraseQueryParser.cs`` analog): ``"a (b c) d*"~slop`` — a quoted
phrase whose slots may be OR-groups or truncations; compiled to an
ordered ``SpanNearQuery`` of per-slot span queries the same way
ComplexPhraseQuery.Rewrite builds SpanNear over SpanOr/SpanTerm.

Both parsers emit placeholder ``SpanTruncQuery`` leaves; call
``rewrite_spans(q, reader)`` to expand them against the index term
dictionary (range-restricted by literal prefix — the scale path in
``reader.expand_query``) before evaluation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    Occur,
    TermQuery,
    WildcardQuery,
)
from lucenenet_ray.search.spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)


@dataclass(frozen=True)
class SpanTruncQuery(SpanQuery):
    """Unexpanded truncation leaf (SrndTruncQuery): a wildcard pattern to
    be expanded into SpanOr(SpanTerm...) against the term dictionary."""

    pattern: str = ""


MAX_DISTANCE = 99  # Surround grammar bounds prefix-op distance to 2 digits

_TOKEN_RE = re.compile(r'\(|\)|,|[^\s(),]+')
_DIST_OP_RE = re.compile(r'^(\d{1,2})?([wn])$', re.IGNORECASE)


class SurroundSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


def _is_trunc(tok: str) -> bool:
    return "*" in tok or "?" in tok


def _term_leaf(tok: str) -> SpanQuery:
    tok = tok.lower()
    if _is_trunc(tok):
        return SpanTruncQuery(pattern=tok)
    return SpanTermQuery(term=tok)


class _Parser:
    """Recursive descent over the surround token stream."""

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise SurroundSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def _kw(self, *names: str) -> str | None:
        t = self.peek()
        if t is not None and t.upper() in names:
            return self.next().upper()
        return None

    # OrQuery → AndQuery → NotQuery → NQuery → WQuery → Primary
    def parse_or(self):
        left = self.parse_and()
        parts = [left]
        while self._kw("OR"):
            parts.append(self.parse_and())
        if len(parts) == 1:
            return left
        return _combine_bool_or_span(parts, "OR")

    def parse_and(self):
        parts = [self.parse_not()]
        while self._kw("AND"):
            parts.append(self.parse_not())
        if len(parts) == 1:
            return parts[0]
        return _combine_bool_or_span(parts, "AND")

    def parse_not(self):
        left = self.parse_dist(unordered=True)
        while self._kw("NOT"):
            right = self.parse_dist(unordered=True)
            left = _combine_bool_or_span([left, right], "NOT")
        return left

    def parse_dist(self, unordered: bool):
        # NQuery: WQuery (N WQuery)* ; WQuery: Primary (W Primary)*
        sub = (lambda: self.parse_dist(unordered=False)) if unordered \
            else self.parse_primary
        parts = [sub()]
        op = "N" if unordered else "W"
        while True:
            t = self.peek()
            if t is None or t.upper() != op:
                break
            self.next()
            parts.append(sub())
        if len(parts) == 1:
            return parts[0]
        clauses = tuple(_as_span(p) for p in parts)
        return SpanNearQuery(clauses=clauses, slop=0, in_order=(op == "W"))

    def parse_primary(self):
        t = self.next()
        if t == "(":
            q = self.parse_or()
            if self.next() != ")":
                raise SurroundSyntaxError("expected )")
            return q
        m = _DIST_OP_RE.match(t)
        if m and self.peek() == "(":
            n = int(m.group(1)) if m.group(1) else 1
            if not 1 <= n <= MAX_DISTANCE:
                raise SurroundSyntaxError(f"distance out of range: {t}")
            in_order = m.group(2).upper() == "W"
            self.next()  # (
            args = [self.parse_or()]
            while self.peek() == ",":
                self.next()
                args.append(self.parse_or())
            if self.next() != ")":
                raise SurroundSyntaxError("expected )")
            clauses = tuple(_as_span(a) for a in args)
            return SpanNearQuery(clauses=clauses, slop=n - 1,
                                 in_order=in_order)
        if t.upper() in ("OR", "AND", "NOT") and self.peek() == "(":
            # prefix boolean form: OR(a, b, ...)
            kw = t.upper()
            self.next()
            args = [self.parse_or()]
            while self.peek() == ",":
                self.next()
                args.append(self.parse_or())
            if self.next() != ")":
                raise SurroundSyntaxError("expected )")
            return _combine_bool_or_span(args, kw)
        if t in (")", ","):
            raise SurroundSyntaxError(f"unexpected {t!r}")
        return _term_leaf(t)


def _as_span(q) -> SpanQuery:
    """Distance-operator operands must be span-composable
    (DistanceQuery requires DistanceSubQuery operands)."""
    if isinstance(q, SpanQuery):
        return q
    if isinstance(q, BooleanQuery):
        # OR of plain terms inside a distance op = SpanOr (SrndOrQuery
        # implements DistanceSubQuery when all children do)
        if all(c.occur == Occur.SHOULD and isinstance(c.query, TermQuery)
               for c in q.clauses):
            return SpanOrQuery(clauses=tuple(
                SpanTermQuery(term=c.query.term) for c in q.clauses))
    raise SurroundSyntaxError(
        "operand not allowed inside a distance operator")


def _combine_bool_or_span(parts: list, kw: str):
    """Boolean combination. Pure-span OR stays a span (SpanOr keeps the
    result usable inside an enclosing distance op); everything else
    becomes a BooleanQuery over term-level queries."""
    if kw == "OR" and all(isinstance(p, SpanQuery) for p in parts):
        return SpanOrQuery(clauses=tuple(parts))
    clauses = []
    for j, p in enumerate(parts):
        occur = Occur.SHOULD if kw == "OR" else Occur.MUST
        if kw == "NOT" and j > 0:
            occur = Occur.MUST_NOT
        q = p
        if isinstance(p, SpanTermQuery):
            q = TermQuery(term=p.term)
        elif isinstance(p, SpanTruncQuery):
            q = WildcardQuery(pattern=p.pattern)
        elif isinstance(p, SpanQuery):
            raise SurroundSyntaxError(
                "boolean over distance subqueries is not supported; "
                "use the distance/span form at the top level")
        clauses.append(BooleanClause(occur, q))
    return BooleanQuery(clauses=tuple(clauses))


def parse_surround(text: str):
    """Surround query text → SpanQuery tree (proximity forms) or
    BooleanQuery (pure boolean forms). Truncations stay as
    ``SpanTruncQuery`` placeholders until ``rewrite_spans``."""
    p = _Parser(_tokenize(text))
    q = p.parse_or()
    if p.peek() is not None:
        raise SurroundSyntaxError(f"trailing input at {p.peek()!r}")
    return q


# ---------------------------------------------------------------------------
# ComplexPhrase


def parse_complex_phrase(text: str) -> SpanQuery:
    """``"a (b c) d*"~slop`` → ordered SpanNear of per-slot spans
    (ComplexPhraseQueryParser.ComplexPhraseQuery.Rewrite semantics: each
    phrase slot is a SpanTerm / SpanOr-of-terms / expanded truncation)."""
    m = re.match(r'^\s*"(.*)"\s*(?:~(\d+))?\s*$', text, re.S)
    if not m:
        raise SurroundSyntaxError("complex phrase must be quoted")
    body, slop = m.group(1), int(m.group(2) or 0)
    slots: list[SpanQuery] = []
    for tok in re.findall(r'\([^)]*\)|[^\s()]+', body):
        if tok.startswith("("):
            alts = [_term_leaf(w) for w in tok[1:-1].split()]
            if not alts:
                raise SurroundSyntaxError("empty group in phrase")
            slots.append(alts[0] if len(alts) == 1
                         else SpanOrQuery(clauses=tuple(alts)))
        else:
            slots.append(_term_leaf(tok))
    if not slots:
        raise SurroundSyntaxError("empty phrase")
    if len(slots) == 1:
        return slots[0]
    return SpanNearQuery(clauses=tuple(slots), slop=slop, in_order=True)


# ---------------------------------------------------------------------------
# truncation rewrite


def rewrite_spans(q, reader):
    """Expand every SpanTruncQuery against the sorted term dictionary
    (prefix-range-restricted scan, reader.expand_query) → SpanOr of
    SpanTerms. A pattern with zero matching terms becomes an empty
    SpanOr (matches nothing), like an empty SrndTruncQuery expansion."""
    if isinstance(q, SpanTruncQuery):
        terms = reader.expand_query(WildcardQuery(pattern=q.pattern))
        return SpanOrQuery(clauses=tuple(
            SpanTermQuery(term=t) for t in terms))
    if isinstance(q, SpanNearQuery):
        return SpanNearQuery(
            clauses=tuple(rewrite_spans(c, reader) for c in q.clauses),
            slop=q.slop, in_order=q.in_order, boost=q.boost)
    if isinstance(q, SpanOrQuery):
        return SpanOrQuery(clauses=tuple(
            rewrite_spans(c, reader) for c in q.clauses), boost=q.boost)
    from lucenenet_ray.search.spans import SpanFirstQuery, SpanNotQuery

    if isinstance(q, SpanNotQuery):
        return SpanNotQuery(include=rewrite_spans(q.include, reader),
                            exclude=rewrite_spans(q.exclude, reader),
                            boost=q.boost)
    if isinstance(q, SpanFirstQuery):
        return SpanFirstQuery(match=rewrite_spans(q.match, reader),
                              end=q.end, boost=q.boost)
    return q
