"""SimpleQueryParser dialect (``Lucene.Net.QueryParser/Simple/
SimpleQueryParser.cs``) re-expressed over the engine's Query tree.

The Simple parser is the "never throws" end-user dialect: any malformed
operator degrades to literal text instead of raising. Feature flags gate
each operator exactly like the reference's ``Operator`` bitmask
(``SimpleQueryParser.cs:90-118``):

  ``+`` AND between clauses · ``|`` OR · ``-`` NOT (two in a row cancel,
  :210-219) · ``"..."`` phrase, ``"..."~N`` near/slop (:316-402) ·
  ``term*`` prefix (:470-476) · ``term~N`` fuzzy (:434-468, edit distance
  capped at 2 = LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE) ·
  ``( )`` precedence (:243-314) · ``\\`` escape.

Tree-building matches BuildQueryTree (:494-543): the first clause becomes
the tree root; each later clause joins under the current operation
(explicit ``+``/``|`` if set, else the default operator), and an operation
CHANGE pushes the existing tree down as the first clause of a fresh
BooleanQuery — the reference's left-nested precedence-by-association.
Negation wraps the branch as ``(MUST_NOT branch, SHOULD MatchAll)``
(:500-506). Unterminated ``(`` or ``"`` is treated as extraneous
(:289-303, :369-383); a lone ``)`` is skipped (:172-176).

Unlike the classic dialect (``query.parse_query``), prefix and fuzzy
tokens keep their RAW text (the reference hands them to Term untouched,
:474-481); regular terms and phrases run through the analyzer chain
(QueryBuilder.CreateBooleanQuery / CreatePhraseQuery).
"""

from __future__ import annotations

from dataclasses import dataclass

from lucenenet_ray.analysis.standard import StandardAnalyzer
from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

# feature flags (Operator enum, SimpleQueryParser.cs:90-118)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_MAX_EDITS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE

_WS = {" ", "\t", "\n", "\r"}


@dataclass
class _State:
    text: str
    index: int
    length: int
    top: Query | None = None
    current_op: Occur | None = None
    previous_op: Occur | None = None
    nots: int = 0


class SimpleQueryParser:
    def __init__(self, analyzer: StandardAnalyzer | None = None,
                 flags: int = ALL_OPERATORS,
                 default_operator: Occur = Occur.SHOULD):
        if default_operator not in (Occur.SHOULD, Occur.MUST):
            raise ValueError("default operator must be SHOULD or MUST")
        self.analyzer = analyzer or StandardAnalyzer()
        self.flags = flags
        self.default_operator = default_operator

    def _has(self, flag: int) -> bool:
        return (self.flags & flag) != 0

    def parse(self, query_text: str) -> Query:
        st = _State(query_text, 0, len(query_text))
        self._parse_sub(st)
        # MatchNoDocs analog for the empty parse: the reference returns null
        # and IndexSearcher treats it as no query; an empty BooleanQuery
        # matches nothing in this engine
        return st.top if st.top is not None else BooleanQuery()

    # -- recursive descent over the raw characters --------------------------

    def _parse_sub(self, st: _State) -> None:
        while st.index < st.length:
            c = st.text[st.index]
            if c == "(" and self._has(PRECEDENCE_OPERATORS):
                self._consume_subquery(st)
            elif c == ")" and self._has(PRECEDENCE_OPERATORS):
                st.index += 1  # extraneous — ignored
            elif c == '"' and self._has(PHRASE_OPERATOR):
                self._consume_phrase(st)
            elif c == "+" and self._has(AND_OPERATOR):
                # ignored if an op is already set or no clause exists yet
                if st.current_op is None and st.top is not None:
                    st.current_op = Occur.MUST
                st.index += 1
            elif c == "|" and self._has(OR_OPERATOR):
                if st.current_op is None and st.top is not None:
                    st.current_op = Occur.SHOULD
                st.index += 1
            elif c == "-" and self._has(NOT_OPERATOR):
                st.nots += 1
                st.index += 1
                continue  # keep the not-count across consecutive '-'
            elif c in _WS and self._has(WHITESPACE_OPERATOR):
                st.index += 1
            else:
                self._consume_token(st)
            st.nots = 0

    def _consume_subquery(self, st: _State) -> None:
        start = st.index = st.index + 1
        depth, escaped = 1, False
        while st.index < st.length:
            if not escaped:
                c = st.text[st.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            escaped = False
            st.index += 1
        if st.index == st.length:
            st.index = start  # no closing ')': '(' is extraneous
        elif st.index == start:
            st.current_op = None  # '()' empty group eats the pending op
            st.index += 1
        else:
            sub = _State(st.text, start, st.index)
            self._parse_sub(sub)
            self._build(st, sub.top)
            st.index += 1

    def _consume_phrase(self, st: _State) -> None:
        start = st.index = st.index + 1
        buf: list[str] = []
        escaped = has_slop = False
        while st.index < st.length:
            if not escaped:
                c = st.text[st.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    st.index += 1
                    continue
                if c == '"':
                    if (st.index + 1 < st.length
                            and st.text[st.index + 1] == "~"
                            and self._has(NEAR_OPERATOR)):
                        st.index += 1
                        if st.index + 1 < st.length:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(st.text[st.index])
            st.index += 1
        if st.index == st.length:
            st.index = start  # no closing '"': the opener is extraneous
        elif st.index == start:
            st.current_op = None
            st.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(st) if has_slop else 0
            self._build(st, self._phrase_query(phrase, slop))
            st.index += 1

    def _consume_token(self, st: _State) -> None:
        buf: list[str] = []
        escaped = prefix = fuzzy = False
        while st.index < st.length:
            if not escaped:
                c = st.text[st.index]
                if c == "\\" and self._has(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    st.index += 1
                    continue
                if self._token_finished(st):
                    break
                if buf and c == "~" and self._has(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and self._has(PREFIX_OPERATOR)
            escaped = False
            buf.append(st.text[st.index])
            st.index += 1
        if not buf:
            return
        token = "".join(buf)
        if fuzzy:
            edits = min(self._parse_fuzziness(st), _MAX_EDITS)
            branch = (self._default_query(token) if edits == 0
                      else FuzzyQuery(term=token, max_edits=edits))
        elif prefix:
            branch = PrefixQuery(prefix=token[:-1])
        else:
            branch = self._default_query(token)
        self._build(st, branch)

    def _token_finished(self, st: _State) -> bool:
        c = st.text[st.index]
        return ((c == '"' and self._has(PHRASE_OPERATOR))
                or (c == "|" and self._has(OR_OPERATOR))
                or (c == "+" and self._has(AND_OPERATOR))
                or (c in "()" and self._has(PRECEDENCE_OPERATORS))
                or (c in _WS and self._has(WHITESPACE_OPERATOR)))

    def _parse_fuzziness(self, st: _State) -> int:
        digits: list[str] = []
        if st.index < st.length and st.text[st.index] == "~":
            while st.index < st.length:
                st.index += 1
                if st.index < st.length:
                    if self._token_finished(st):
                        break
                    digits.append(st.text[st.index])
            try:
                return max(int("".join(digits)), 0)
            except ValueError:
                return 0  # non-numeric slop text → 0 (int.TryParse)
        return 0

    # -- factories over the analyzer chain ----------------------------------

    def _default_query(self, text: str) -> Query | None:
        """QueryBuilder.CreateBooleanQuery: analyzed terms joined by the
        default operator; one term simplifies to TermQuery, none to null."""
        terms, _pos = self.analyzer(text)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(term=terms[0])
        return BooleanQuery(clauses=tuple(
            BooleanClause(self.default_operator, TermQuery(term=t))
            for t in terms))

    def _phrase_query(self, text: str, slop: int) -> Query | None:
        terms, positions = self.analyzer(text)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(term=terms[0])
        base = positions[0]
        return PhraseQuery(terms=tuple((t, p - base)
                                       for t, p in zip(terms, positions)),
                           slop=slop)

    # -- BuildQueryTree (SimpleQueryParser.cs:494-543) -----------------------

    def _build(self, st: _State, branch: Query | None) -> None:
        if branch is None:
            return
        if st.nots % 2 == 1:
            branch = BooleanQuery(clauses=(
                BooleanClause(Occur.MUST_NOT, branch),
                BooleanClause(Occur.SHOULD, MatchAllDocsQuery()),
            ))
        if st.top is None:
            st.top = branch
        else:
            if st.current_op is None:
                st.current_op = self.default_operator
            if st.previous_op is None or st.previous_op != st.current_op:
                # operation change: push the existing tree down
                st.top = BooleanQuery(clauses=(
                    BooleanClause(st.current_op, st.top),))
            assert isinstance(st.top, BooleanQuery)
            st.top = BooleanQuery(
                clauses=st.top.clauses + (BooleanClause(st.current_op, branch),),
                min_should_match=st.top.min_should_match)
            st.previous_op = st.current_op
        st.current_op = None


def parse_simple(text: str, analyzer: StandardAnalyzer | None = None,
                 flags: int = ALL_OPERATORS,
                 default_operator: Occur = Occur.SHOULD) -> Query:
    return SimpleQueryParser(analyzer, flags, default_operator).parse(text)
