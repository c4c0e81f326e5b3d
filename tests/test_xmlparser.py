"""XML query parser dialect (QueryParser/Xml/CoreParser.cs analog):
element → AST goldens; parsed queries must equal the programmatic AST."""

import pytest

from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_ray.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucenenet_ray.search.xmlparser import XmlParseError, parse_xml_query


def test_term_and_terms():
    assert parse_xml_query("<TermQuery>Spark</TermQuery>") == \
        TermQuery(term="spark")
    assert parse_xml_query('<TermQuery boost="2.5">spark</TermQuery>') == \
        TermQuery(term="spark", boost=2.5)
    q = parse_xml_query("<TermsQuery>spark window</TermsQuery>")
    assert q == BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="window"))))


def test_boolean_with_occurs_and_msm():
    xml = """<BooleanQuery minimumNumberShouldMatch="1">
      <Clause occurs="must"><TermQuery>spark</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>window</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>dup</TermQuery></Clause>
    </BooleanQuery>"""
    q = parse_xml_query(xml)
    assert q == BooleanQuery(clauses=(
        BooleanClause(Occur.MUST, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="window")),
        BooleanClause(Occur.MUST_NOT, TermQuery(term="dup"))),
        min_should_match=1)


def test_field_prefixing():
    q = parse_xml_query('<TermQuery fieldName="source">src3</TermQuery>')
    assert q == TermQuery(term="source\x1fsrc3")
    # default field stays unprefixed
    q = parse_xml_query('<TermQuery fieldName="body">spark</TermQuery>')
    assert q == TermQuery(term="spark")


def test_multiterm_and_constant_score():
    assert parse_xml_query('<PrefixQuery prefix="sp"/>') == \
        PrefixQuery(prefix="sp")
    assert parse_xml_query('<WildcardQuery pattern="sp?rk"/>') == \
        WildcardQuery(pattern="sp?rk")
    q = parse_xml_query(
        '<RangeQuery lowerTerm="alpha" upperTerm="beta" '
        'includeUpper="false"/>')
    assert q == TermRangeQuery(lower="alpha", upper="beta",
                               include_lower=True, include_upper=False)
    q = parse_xml_query(
        '<ConstantScoreQuery boost="3.0"><PrefixQuery prefix="sp"/>'
        '</ConstantScoreQuery>')
    assert isinstance(q, PrefixQuery) and q.constant_score and q.boost == 3.0
    with pytest.raises(XmlParseError):
        parse_xml_query(
            "<ConstantScoreQuery><TermQuery>x</TermQuery>"
            "</ConstantScoreQuery>")


def test_dismax_and_matchall():
    q = parse_xml_query(
        '<DisjunctionMaxQuery tieBreaker="0.1">'
        "<TermQuery>spark</TermQuery><TermQuery>window</TermQuery>"
        "</DisjunctionMaxQuery>")
    assert q == DisjunctionMaxQuery(
        disjuncts=(TermQuery(term="spark"), TermQuery(term="window")),
        tie_breaker=0.1)
    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_span_tree():
    xml = """<SpanNear slopFactor="2" inOrder="true">
      <SpanOr><SpanTerm>spark</SpanTerm><SpanTerm>window</SpanTerm></SpanOr>
      <SpanTerm>merge</SpanTerm>
    </SpanNear>"""
    q = parse_xml_query(xml)
    assert q == SpanNearQuery(clauses=(
        SpanOrQuery(clauses=(SpanTermQuery(term="spark"),
                             SpanTermQuery(term="window"))),
        SpanTermQuery(term="merge")), slop=2, in_order=True)
    q = parse_xml_query(
        '<SpanFirst end="5"><SpanTerm>data</SpanTerm></SpanFirst>')
    assert q == SpanFirstQuery(match=SpanTermQuery(term="data"), end=5)
    with pytest.raises(XmlParseError):
        parse_xml_query("<SpanNear><TermQuery>x</TermQuery></SpanNear>")


def test_errors():
    with pytest.raises(XmlParseError):
        parse_xml_query("<NopeQuery/>")
    with pytest.raises(XmlParseError):
        parse_xml_query("not xml at all <")
    with pytest.raises(XmlParseError):
        parse_xml_query("<BooleanQuery><TermQuery>x</TermQuery>"
                        "</BooleanQuery>")  # child must be Clause


def test_xml_equals_classic_parse(documents_index):
    """The XML dialect and the classic parser must produce rank-identical
    searches for an equivalent query (CoreParser vs QueryParser parity)."""
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    path, _m = documents_index
    r = IndexReader(path)
    xml_q = parse_xml_query(
        "<BooleanQuery>"
        "<Clause occurs=\"should\"><TermQuery>spark</TermQuery></Clause>"
        "<Clause occurs=\"should\"><TermQuery>window</TermQuery></Clause>"
        "</BooleanQuery>")
    classic_q = parse_query("spark window")
    a = search(r, xml_q, k=20)
    b = search(r, classic_q, k=20)
    assert a.docs.tolist() == b.docs.tolist()
    assert a.scores.tolist() == b.scores.tolist()
