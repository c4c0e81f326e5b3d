"""Flexible StandardQueryParser (search/flexible.py) — TestStandardQP /
TestQPHelper shapes: default operator, leading-wildcard gate, phrase
slop config, lowercase-expanded-terms, multi-field expansion with
boosts, numeric config, fuzzy config."""

import pytest

from lucenenet_ray.search.flexible import (NumericConfig, Operator,
                                           StandardQueryParser)
from lucenenet_ray.search.query import (BooleanQuery, FuzzyQuery,
                                        NumericRangeQuery64, Occur,
                                        PhraseQuery, PrefixQuery, TermQuery,
                                        WildcardQuery)


def test_default_operator_and():
    """TestStandardQP.TestDefaultOperator: 'a b' with AND default makes
    both required; 'a OR b' keeps both optional (classic AddClause's
    OR-demotion of the previous clause)."""
    p = StandardQueryParser()
    p.default_operator = Operator.AND
    q = p.parse("data merge")
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST]
    q = p.parse("data OR merge")
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    # mixed: 'a OR b c' -> a SHOULD (demoted), b SHOULD, +c
    q = p.parse("data OR merge line")
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD,
                                            Occur.MUST]
    # explicit modifiers override the default operator
    q = p.parse("data -merge")
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST_NOT]


def test_default_operator_or_unchanged():
    p = StandardQueryParser()
    q = p.parse("data merge")
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]


def test_leading_wildcard_gate():
    """AllowLeadingWildcardProcessor: '*foo' raises unless enabled."""
    p = StandardQueryParser()
    with pytest.raises(ValueError):
        p.parse("*merge")
    p.allow_leading_wildcard = True
    q = p.parse("*merge")
    assert isinstance(q, WildcardQuery) and q.pattern == "*merge"


def test_default_phrase_slop():
    """DefaultPhraseSlopQueryNodeProcessor: config slop applies to
    phrases without an explicit ~N; explicit ~N wins."""
    p = StandardQueryParser()
    p.phrase_slop = 3
    q = p.parse('"batch merge"')
    assert isinstance(q, PhraseQuery) and q.slop == 3
    q = p.parse('"batch merge"~1')
    assert q.slop == 1


def test_lowercase_expanded_terms():
    """LowercaseExpandedTermsQueryNodeProcessor on/off."""
    p = StandardQueryParser()
    assert p.parse("Mer*").prefix == "mer"
    p.lowercase_expanded_terms = False
    assert p.parse("Mer*").prefix == "Mer"
    assert p.parse("MerG?x").pattern == "MerG?x"


def test_multi_fields_with_boosts():
    """SetMultiFields + FieldsBoost: fieldless terms expand across fields
    as SHOULD groups with per-field boosts."""
    p = StandardQueryParser()
    p.set_multi_fields(["", "title"])
    p.fields_boost = {"title": 2.0}
    q = p.parse("merge")
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
    body, title = (c.query for c in q.clauses)
    assert isinstance(body, TermQuery) and body.term == "merge"
    assert body.boost == 1.0
    from lucenenet_ray.search.query import field_term

    assert title.term == field_term("title", "merge")
    assert title.boost == 2.0
    # explicit field is NOT expanded
    q2 = p.parse("source:src7")
    assert isinstance(q2, BooleanQuery)  # still expanded group per clause?


def test_numeric_config():
    """NumericRangeQueryNodeProcessor: a configured field parses
    [lo TO hi] as a trie NumericRangeQuery64."""
    p = StandardQueryParser()
    p.numeric_config_map["n_chars"] = NumericConfig(precision_step=4)
    q = p.parse("n_chars:[305 TO 459]")
    assert isinstance(q, NumericRangeQuery64)
    assert (q.field_name, q.lower, q.upper) == ("n_chars", 305, 459)
    assert q.include_lower and q.include_upper
    assert q.precision_step == 4
    # unconfigured fields keep term-range semantics
    from lucenenet_ray.search.query import TermRangeQuery

    assert isinstance(p.parse("other:[a TO b]"), TermRangeQuery)


def test_fuzzy_config():
    """FuzzyConfig: minSim >= 1 is an edit count; fractional maps to
    1-2 edits (FuzzyQueryNodeProcessor)."""
    p = StandardQueryParser()
    q = p.parse("merge~")
    assert isinstance(q, FuzzyQuery) and q.max_edits == 2
    p.fuzzy_min_sim = 1.0
    assert p.parse("merge~").max_edits == 1
    p.fuzzy_min_sim = 0.7
    assert p.parse("merge~").max_edits == 1
    p.fuzzy_min_sim = 0.3
    assert p.parse("merge~").max_edits == 2


def test_classic_defaults_unchanged():
    """The flexible knobs default to classic behavior: same AST as
    parse_query for a representative query."""
    from lucenenet_ray.search.query import parse_query

    p = StandardQueryParser()
    s = 'spark window "batch merge" -dup sp* n_chars:[300 TO 449]'
    assert p.parse(s) == parse_query(s)
