"""SimpleQueryParser dialect goldens, mirroring the structural cases of
``Lucene.Net.Tests.QueryParser/Simple/TestSimpleQueryParser.cs`` (the
reference test uses a no-stopword MockAnalyzer; `_KeepAll` plays that role
here)."""

from lucenenet_ray.analysis.standard import StandardAnalyzer
from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucenenet_ray.search.simpleparser import (
    AND_OPERATOR,
    ESCAPE_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    WHITESPACE_OPERATOR,
    SimpleQueryParser,
    parse_simple,
)

MUST, SHOULD, MUST_NOT = Occur.MUST, Occur.SHOULD, Occur.MUST_NOT


class _KeepAll(StandardAnalyzer):
    stop_words = frozenset()


def P(text, **kw):
    # the reference test helper parses with DefaultOperator = MUST (:46-47)
    kw.setdefault("default_operator", Occur.MUST)
    return parse_simple(text, analyzer=_KeepAll(), **kw)


def bq(*clauses):
    return BooleanQuery(clauses=tuple(BooleanClause(o, q) for o, q in clauses))


def tq(t):
    return TermQuery(term=t)


def test_term():
    assert P("foobar") == tq("foobar")


def test_fuzzy():
    # TestFuzzy: edit distance capped at 2; ~0 → plain term
    assert P("foobar~2") == FuzzyQuery(term="foobar", max_edits=2)
    assert P("foobar~") == tq("foobar")  # '~' at end: fuzziness 0
    assert P("foobar~a") == tq("foobar")  # non-numeric → 0
    assert P("foobar~1") == FuzzyQuery(term="foobar", max_edits=1)
    assert P("foobar~5") == FuzzyQuery(term="foobar", max_edits=2)  # cap


def test_phrase_and_slop():
    ph = PhraseQuery(terms=(("foo", 0), ("bar", 1)))
    assert P('"foo bar"') == ph
    assert P('"foo bar"~2') == PhraseQuery(terms=(("foo", 0), ("bar", 1)),
                                           slop=2)
    assert P('"foo bar"~') == ph  # tilde at end ignored
    assert P('"foo bar"~x') == PhraseQuery(terms=(("foo", 0), ("bar", 1)),
                                           slop=0)


def test_prefix():
    assert P("foobar*") == PrefixQuery(prefix="foobar")


def test_compound_and():
    expected = bq((MUST, tq("star")), (MUST, tq("wars")),
                  (MUST, tq("empire")))
    assert P("star+wars + empire") == expected
    assert P(" | --star wars empire \n\\") == expected


def test_compound_or():
    expected = bq((SHOULD, tq("star")), (SHOULD, tq("wars")),
                  (SHOULD, tq("empire")))
    assert P("star|wars|empire") == expected
    assert P("star|wars | empire") == expected
    assert P(" | --star|wars|empire \n\\") == expected


def test_complex00():
    # "star|wars empire" → ((star | wars) + empire)
    inner = bq((SHOULD, tq("star")), (SHOULD, tq("wars")))
    expected = bq((MUST, inner), (MUST, tq("empire")))
    assert P("star|wars empire") == expected
    assert P("star|wars + empire") == expected
    assert P("star| + wars + ----empire |") == expected


def test_complex01():
    # "star wars | empire" → ((star + wars) | empire) under default MUST
    inner = bq((MUST, tq("star")), (MUST, tq("wars")))
    expected = bq((SHOULD, inner), (SHOULD, tq("empire")))
    assert P("star wars | empire") == expected
    assert P("star + wars|empire") == expected
    assert P("star + | wars | ----empire +") == expected


def test_complex04():
    inner = bq((MUST, tq("star")), (MUST, tq("wars")))
    inner2 = bq((MUST, tq("strikes")), (MUST, tq("back")))
    expected = bq((SHOULD, inner), (SHOULD, tq("empire")), (SHOULD, inner2))
    assert P("(star wars) | empire | (strikes back)") == expected
    assert P("(star + wars) |empire | (strikes + back)") == expected
    assert P("(star + | wars |) | ----empire | + --(strikes + | --back) \\") \
        == expected


def test_complex05_negation_and_empty_groups():
    inner1 = bq((MUST, tq("star")), (MUST, tq("wars")))
    inner4 = bq((MUST_NOT, tq("jarjar")), (SHOULD, MatchAllDocsQuery()))
    inner3 = bq((MUST, tq("strikes")), (MUST, tq("back")), (MUST, inner4))
    inner2 = bq((SHOULD, tq("empire")), (SHOULD, inner3))
    expected = bq((SHOULD, inner1), (SHOULD, inner2))
    assert P("(star wars) | (empire | (strikes back -jarjar))") == expected
    assert P("(star + wars) |(empire | (strikes + back -jarjar) () )") \
        == expected
    assert P('(star + | wars |) | --(--empire | + --(strikes + | --back '
             '+ -jarjar) "" ) "') == expected


def test_complex06_escapes():
    # reference golden has the literal term "jar+|jar" because MockAnalyzer
    # keeps punctuation; our UAX#29 analyzer splits it into two "jar" terms
    # joined by the default operator (CreateBooleanQuery) — the ESCAPE
    # behavior under test (operators consumed into the token) is identical
    jarjar = bq((MUST, tq("jar")), (MUST, tq("jar")))
    inner3 = bq((SHOULD, tq("empire")), (SHOULD, tq("strikes")))
    inner2 = bq((MUST, inner3), (MUST, tq("back")), (MUST, jarjar))
    inner1 = bq((SHOULD, tq("wars")), (SHOULD, inner2))
    expected = bq((MUST, tq("star")), (MUST, inner1))
    assert P("star (wars | (empire | strikes back jar\\+\\|jar))") == expected
    assert P("star + (wars |(empire | strikes + back jar\\+\\|jar) () )") \
        == expected


def test_not_and_double_negation():
    expected = bq((MUST_NOT, tq("foo")), (SHOULD, MatchAllDocsQuery()))
    assert P("-foo") == expected
    assert P("--foo") == tq("foo")  # double negation cancels (:213)


def test_garbage_never_raises():
    # TestGarbage*: unmatched operators degrade, never raise
    assert P('"') == BooleanQuery()
    assert P("(") == BooleanQuery()
    assert P(")") == BooleanQuery()
    assert P("- +") == BooleanQuery()
    assert P('"foo') == tq("foo")  # unterminated quote → literal text
    assert P("(foo") == tq("foo")  # unterminated paren → literal text


def test_disable_flags():
    base = (AND_OPERATOR | NOT_OPERATOR | OR_OPERATOR | PREFIX_OPERATOR
            | PHRASE_OPERATOR | PRECEDENCE_OPERATORS | ESCAPE_OPERATOR
            | WHITESPACE_OPERATOR)
    # with PREFIX disabled the '*' stays in the token and goes through the
    # analyzer (reference golden keeps "foo*" under MockAnalyzer; UAX#29
    # strips the punctuation)
    noprefix = base & ~PREFIX_OPERATOR
    p = SimpleQueryParser(analyzer=_KeepAll(), flags=noprefix)
    assert p.parse("foo*") == tq("foo")
    nophrase = base & ~PHRASE_OPERATOR
    p = SimpleQueryParser(analyzer=_KeepAll(), flags=nophrase)
    assert p.parse('"foo bar"') == bq((SHOULD, tq("foo")),
                                      (SHOULD, tq("bar")))


def test_stopwords_drop_through_analyzer():
    # default StandardAnalyzer: stopwords vanish like CreateBooleanQuery
    q = parse_simple("the star")
    assert q == tq("star")
