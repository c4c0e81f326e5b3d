"""SpanPayloadCheckQuery / SpanNearPayloadCheckQuery (search/spans.py):
payload-carrying span algebra — accept arms, no-payload arms, near payload
concatenation order, nesting under position filters."""

import numpy as np
import pytest

from lucenenet_ray.search.spans import (
    SpanFirstQuery,
    SpanNearPayloadCheckQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanPayloadCheckQuery,
    SpanTermQuery,
    _spans_for,
)

# doc: a(0) b(1) a(2) c(3) b(4); offset payloads 0, 2, 4, 6, 8
POS = {"a": np.array([0, 2]), "b": np.array([1, 4]), "c": np.array([3])}
PL = {"a": np.array([0, 4]), "b": np.array([2, 8]), "c": np.array([6])}


def pos_of(t):
    return POS.get(t, np.empty(0, dtype=np.int64))


def pl_of(t):
    return PL.get(t, np.empty(0, dtype=np.int64))


def test_plain_check_exact_payload():
    q = SpanPayloadCheckQuery(match=SpanTermQuery(term="a"), payloads=(4,))
    assert _spans_for(q, pos_of, pl_of) == [(2, 3)]
    q = SpanPayloadCheckQuery(match=SpanTermQuery(term="a"), payloads=(5,))
    assert _spans_for(q, pos_of, pl_of) == []
    # count mismatch (term span has 1 payload, target has 2) → NO
    q = SpanPayloadCheckQuery(match=SpanTermQuery(term="a"), payloads=(0, 4))
    assert _spans_for(q, pos_of, pl_of) == []


def test_plain_check_over_or():
    q = SpanPayloadCheckQuery(
        match=SpanOrQuery(clauses=(SpanTermQuery(term="a"),
                                   SpanTermQuery(term="b"))),
        payloads=(2,))
    assert _spans_for(q, pos_of, pl_of) == [(1, 2)]


def test_plain_check_no_payload_stream_accepts():
    # SpanPayloadCheckQuery.cs:87 — payload unavailable → AcceptStatus.YES
    q = SpanPayloadCheckQuery(match=SpanTermQuery(term="a"), payloads=(99,))
    assert _spans_for(q, pos_of, lambda t: None) == [(0, 1), (2, 3)]
    assert _spans_for(q, pos_of, None) == [(0, 1), (2, 3)]


def test_plain_check_rejects_near_match():
    with pytest.raises(ValueError):
        SpanPayloadCheckQuery(
            match=SpanNearQuery(clauses=(SpanTermQuery(term="a"),)),
            payloads=(0,))


def test_near_check_membership_semantics():
    near = SpanNearQuery(clauses=(SpanTermQuery(term="a"),
                                  SpanTermQuery(term="b")),
                         slop=0, in_order=True)
    # matches: a(0)b(1) payloads (0,2); a(2)..b(4) has gap 1 → slop 0 drops
    q = SpanNearPayloadCheckQuery(match=near, payloads=(2, 0))
    assert _spans_for(q, pos_of, pl_of) == [(0, 2)]  # unordered membership
    q = SpanNearPayloadCheckQuery(match=near, payloads=(0, 2))
    assert _spans_for(q, pos_of, pl_of) == [(0, 2)]
    q = SpanNearPayloadCheckQuery(match=near, payloads=(0, 3))
    assert _spans_for(q, pos_of, pl_of) == []
    # count mismatch → NO
    q = SpanNearPayloadCheckQuery(match=near, payloads=(0,))
    assert _spans_for(q, pos_of, pl_of) == []


def test_near_check_no_payload_rejects():
    # SpanNearPayloadCheckQuery.cs:85 — no payload → AcceptStatus.NO
    near = SpanNearQuery(clauses=(SpanTermQuery(term="a"),
                                  SpanTermQuery(term="b")),
                         slop=0, in_order=True)
    q = SpanNearPayloadCheckQuery(match=near, payloads=(0, 2))
    assert _spans_for(q, pos_of, None) == []


def test_near_slop_window_payloads():
    near = SpanNearQuery(clauses=(SpanTermQuery(term="a"),
                                  SpanTermQuery(term="c")),
                         slop=1, in_order=True)
    # a(2) c(3): payloads (4, 6)
    q = SpanNearPayloadCheckQuery(match=near, payloads=(6, 4))
    assert _spans_for(q, pos_of, pl_of) == [(2, 4)]


def test_check_under_position_filter():
    inner = SpanPayloadCheckQuery(match=SpanTermQuery(term="b"),
                                  payloads=(8,))
    # b(4) has payload 8; SpanFirst(end=3) excludes it
    assert _spans_for(SpanFirstQuery(match=inner, end=5),
                      pos_of, pl_of) == [(4, 5)]
    assert _spans_for(SpanFirstQuery(match=inner, end=3),
                      pos_of, pl_of) == []
