"""QueryScorer position-sensitive highlighting
(ops/highlight.query_scorer_best_fragment — QueryScorer.cs:146-173 +
WeightedSpanTermExtractor.cs:245-335 + WeightedSpanTerm.CheckPosition)."""

from lucenenet_ray.ops.highlight import query_scorer_best_fragment


def test_phrase_match_marks_span_tokens():
    frag, n_unique, n_marked = query_scorer_best_fragment(
        "alpha batch merge beta", ["batch", "merge"])
    assert (frag, n_unique, n_marked) == (0, 2, 2)


def test_lone_phrase_word_outside_span_scores_zero():
    """QueryScorer's whole point vs QueryTermScorer: 'batch' outside any
    phrase match contributes nothing (CheckPosition gate)."""
    out = query_scorer_best_fragment(
        "batch alpha beta batch merge gamma batch", ["batch", "merge"])
    assert out is not None
    _, n_unique, n_marked = out
    assert n_marked == 2  # only the adjacent pair, not the two lone ones
    assert n_unique == 2


def test_no_adjacency_means_no_fragment():
    assert query_scorer_best_fragment(
        "batch alpha merge", ["batch", "merge"]) is None


def test_stop_word_hole_breaks_slop0_adjacency():
    """StopFilter leaves a position hole; SpanNear slop 0 does not jump
    it (positions are 0,2)."""
    assert query_scorer_best_fragment(
        "batch the merge", ["batch", "merge"]) is None


def test_reversed_order_does_not_match():
    assert query_scorer_best_fragment(
        "merge batch", ["batch", "merge"]) is None


def test_best_fragment_prefers_more_unique_marked_terms():
    # fragment 0: one span; a later fragment with another span scores the
    # same unique count -> earliest fragment wins the tie
    text = ("batch merge " + "filler " * 30 + "batch merge")
    frag, n_unique, n_marked = query_scorer_best_fragment(
        text, ["batch", "merge"], fragment_size=40)
    assert frag == 0
    assert n_unique == 2
    assert n_marked == 4


def test_empty_text():
    assert query_scorer_best_fragment("", ["batch", "merge"]) is None
