"""XML query parser (``QueryParser/Xml/CoreParser.cs`` analog).

The reference's CoreParser walks an XML DOM and dispatches each element
name to a builder (``Xml/Builders/*``: TermQueryBuilder,
BooleanQueryBuilder, SpanNearBuilder, ...). Same shape here: one
``_BUILDERS`` dispatch table over ``xml.etree`` elements, producing the
same Query / SpanQuery AST every other parser dialect produces.

Supported elements (the CoreParser core set that maps onto this engine):

- ``<TermQuery boost="..">text</TermQuery>``
- ``<TermsQuery>a b c</TermsQuery>``            (OR of analyzed terms)
- ``<BooleanQuery minimumNumberShouldMatch=".."> <Clause
  occurs="must|should|mustNot"> ... </Clause> ... </BooleanQuery>``
- ``<MatchAllDocsQuery/>``
- ``<DisjunctionMaxQuery tieBreaker="..">`` over sub-queries
- ``<ConstantScoreQuery boost="..">`` wrapping a filter-ish sub-query
- ``<RangeQuery lowerTerm=".." upperTerm=".." includeLower=".."
  includeUpper=".."/>``   (TermRangeQuery)
- ``<PrefixQuery prefix=".."/>`` / ``<WildcardQuery pattern=".."/>``
- ``<SpanTerm>t</SpanTerm>``, ``<SpanNear slopFactor=".." inOrder="..">``,
  ``<SpanOr>``, ``<SpanNot><Include>..<Exclude>..``,
  ``<SpanFirst end="..">``

Field names: the engine's default field is unprefixed; a ``fieldName``
attribute other than the default prefixes terms ``field\\x1fterm`` like
every other query path.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    MultiTermQuery,
    Occur,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    field_term,
)
from lucenenet_ray.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)

DEFAULT_FIELD = "body"


class XmlParseError(ValueError):
    pass


def _text(el) -> str:
    return (el.text or "").strip()


def _boost(el) -> float:
    return float(el.get("boost", "1.0"))


def _term(el, tok: str) -> str:
    fld = el.get("fieldName")
    tok = tok.lower()
    if fld and fld != DEFAULT_FIELD:
        return field_term(fld, tok)
    return tok


def _child_queries(el) -> list:
    return [_build(c) for c in el]


def _b_term(el):
    return TermQuery(term=_term(el, _text(el)), boost=_boost(el))


def _b_terms(el):
    toks = _text(el).split()
    return BooleanQuery(clauses=tuple(
        BooleanClause(Occur.SHOULD, TermQuery(term=_term(el, t)))
        for t in toks), boost=_boost(el))


_OCCURS = {"must": Occur.MUST, "should": Occur.SHOULD,
           "mustnot": Occur.MUST_NOT, "filter": Occur.MUST}


def _b_boolean(el):
    clauses = []
    for c in el:
        if c.tag != "Clause":
            raise XmlParseError(f"BooleanQuery child must be Clause, "
                                f"got {c.tag}")
        occ = _OCCURS.get(c.get("occurs", "should").lower())
        if occ is None:
            raise XmlParseError(f"bad occurs={c.get('occurs')!r}")
        subs = list(c)
        if len(subs) != 1:
            raise XmlParseError("Clause must hold exactly one query")
        clauses.append(BooleanClause(occ, _build(subs[0])))
    return BooleanQuery(
        clauses=tuple(clauses), boost=_boost(el),
        min_should_match=int(el.get("minimumNumberShouldMatch", "0")))


def _b_dismax(el):
    return DisjunctionMaxQuery(
        disjuncts=tuple(_child_queries(el)),
        tie_breaker=float(el.get("tieBreaker", "0.0")), boost=_boost(el))


def _b_constant(el):
    """ConstantScoreQuery over a filter-ish sub-query: the engine models
    constant scoring as the ``constant_score`` rewrite flag on multi-term
    queries (ConstantScoreQuery.cs:37 boost-only scores)."""
    import dataclasses

    subs = list(el)
    if len(subs) != 1:
        raise XmlParseError("ConstantScoreQuery must hold one sub-query")
    q = _build(subs[0])
    if not isinstance(q, MultiTermQuery):
        raise XmlParseError(
            "ConstantScoreQuery supports multi-term filters here")
    return dataclasses.replace(q, constant_score=True, boost=_boost(el))


def _b_range(el):
    lo, hi = el.get("lowerTerm"), el.get("upperTerm")
    return TermRangeQuery(
        lower=None if lo is None else _term(el, lo),
        upper=None if hi is None else _term(el, hi),
        include_lower=el.get("includeLower", "true").lower() == "true",
        include_upper=el.get("includeUpper", "true").lower() == "true",
        boost=_boost(el))


def _b_prefix(el):
    return PrefixQuery(prefix=_term(el, el.get("prefix") or _text(el)),
                       boost=_boost(el))


def _b_wildcard(el):
    return WildcardQuery(pattern=_term(el, el.get("pattern") or _text(el)),
                         boost=_boost(el))


def _b_matchall(el):
    return MatchAllDocsQuery(boost=_boost(el))


def _b_span_term(el):
    return SpanTermQuery(term=_term(el, _text(el)), boost=_boost(el))


def _as_span(q):
    if not isinstance(q, (SpanTermQuery, SpanNearQuery, SpanOrQuery,
                          SpanNotQuery, SpanFirstQuery)):
        raise XmlParseError("span element requires span children")
    return q


def _b_span_near(el):
    return SpanNearQuery(
        clauses=tuple(_as_span(_build(c)) for c in el),
        slop=int(el.get("slopFactor", "0")),
        in_order=el.get("inOrder", "true").lower() == "true",
        boost=_boost(el))


def _b_span_or(el):
    return SpanOrQuery(clauses=tuple(_as_span(_build(c)) for c in el),
                       boost=_boost(el))


def _b_span_not(el):
    inc = el.find("Include")
    exc = el.find("Exclude")
    if inc is None or exc is None:
        raise XmlParseError("SpanNot needs Include and Exclude")
    return SpanNotQuery(include=_as_span(_build(list(inc)[0])),
                        exclude=_as_span(_build(list(exc)[0])),
                        boost=_boost(el))


def _b_span_first(el):
    subs = list(el)
    if len(subs) != 1:
        raise XmlParseError("SpanFirst must hold one span")
    return SpanFirstQuery(match=_as_span(_build(subs[0])),
                          end=int(el.get("end", "0")), boost=_boost(el))


_BUILDERS = {
    "TermQuery": _b_term,
    "TermsQuery": _b_terms,
    "BooleanQuery": _b_boolean,
    "DisjunctionMaxQuery": _b_dismax,
    "ConstantScoreQuery": _b_constant,
    "RangeQuery": _b_range,
    "PrefixQuery": _b_prefix,
    "WildcardQuery": _b_wildcard,
    "MatchAllDocsQuery": _b_matchall,
    "SpanTerm": _b_span_term,
    "SpanNear": _b_span_near,
    "SpanOr": _b_span_or,
    "SpanNot": _b_span_not,
    "SpanFirst": _b_span_first,
}


def _build(el):
    b = _BUILDERS.get(el.tag)
    if b is None:
        raise XmlParseError(f"unknown query element <{el.tag}>")
    return b(el)


def parse_xml_query(xml: str):
    """XML query text → Query or SpanQuery AST (CoreParser.Parse)."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise XmlParseError(str(e)) from e
    return _build(root)
