"""CommonGramsFilter / CommonGramsQueryFilter vs the reference test
vectors (CommonGramsFilterTest.cs; common set {s,a,b,c,d,the,of})."""

import pytest

from lucenenet_ray.analysis.filters import common_grams, common_grams_query

COMMON = frozenset(["s", "a", "b", "c", "d", "the", "of"])


def _cg(text):
    toks = text.split()
    return common_grams(toks, list(range(len(toks))), COMMON)


def _cgq(text):
    t, p, g = _cg(text)
    return common_grams_query(t, g)


def test_reset_vector():
    # TestReset (CommonGramsFilterTest.cs:38): case-exact membership —
    # "The" is not common but forms grams with its common neighbours
    t, p, g = _cg("How The s a brown s cow d like A B thing?")
    assert t == ["How", "The", "The_s", "s", "s_a", "a", "a_brown",
                 "brown", "brown_s", "s", "s_cow", "cow", "cow_d", "d",
                 "d_like", "like", "A", "B", "thing?"]


def test_gram_positions():
    t, p, g = _cg("the fox")
    assert t == ["the", "the_fox", "fox"]
    assert p == [0, 0, 1]          # gram at the PREVIOUS token's position
    assert g == [False, True, False]


@pytest.mark.parametrize("text,want", [
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the_fox"]),
    ("fox of", ["fox_of"]),
    ("of the", ["of_the"]),
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("quick brown the", ["quick", "brown_the"]),
    ("quick the brown", ["quick_the", "the_brown"]),
    ("fox of the", ["fox_of", "of_the"]),
    ("the quick brown", ["the_quick", "quick", "brown"]),
    ("the fox of", ["the_fox", "fox_of"]),
    ("of the fox", ["of_the", "the_fox"]),
    ("of the of", ["of_the", "the_of"]),
    ("dog the", ["dog_the"]),
])
def test_query_filter_vectors(text, want):
    assert _cgq(text) == want
