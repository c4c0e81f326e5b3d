"""Property/fuzz tests for session-5 pure functions: total (never raise),
bounded, and self-consistent on arbitrary unicode inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucenenet_ray.analysis.snowball_germanic import (
    dutch_stem,
    german2_stem,
    german_snowball_stem,
)
from lucenenet_ray.analysis.snowball_kp import kp_stem
from lucenenet_ray.analysis.snowball_more import (
    armenian_stem,
    finnish_stem,
    hungarian_stem,
    lovins_stem,
    porter_classic_stem,
    romanian_stem,
    russian_stem,
)
from lucenenet_ray.analysis.snowball_romance import (
    french_stem,
    italian_stem,
    portuguese_stem,
    spanish_stem,
)
from lucenenet_ray.analysis.snowball_turkish import turkish_stem
from lucenenet_ray.ops.spell import (
    jaro_winkler_distance,
    levenstein_distance,
    ngram_distance,
)

_STEMMERS = (spanish_stem, french_stem, italian_stem, portuguese_stem,
             german_snowball_stem, german2_stem, dutch_stem, russian_stem,
             finnish_stem, hungarian_stem, romanian_stem, turkish_stem,
             porter_classic_stem, lovins_stem, kp_stem, armenian_stem)

_word = st.text(min_size=0, max_size=24)


@settings(max_examples=300, deadline=None)
@given(_word)
def test_stemmers_total_on_arbitrary_text(w):
    for fn in _STEMMERS:
        out = fn(w.lower())
        assert isinstance(out, str)
        assert len(out) <= len(w) + 4   # lengthen/append steps add <= few


@settings(max_examples=200, deadline=None)
@given(_word, _word)
def test_distances_bounded_and_symmetric(a, b):
    d = levenstein_distance(a, b)
    assert 0.0 <= d <= 1.0
    assert d == levenstein_distance(b, a)
    jw = jaro_winkler_distance(a[:12], b[:12])
    assert 0.0 <= jw <= 1.0001
    import math

    nd = ngram_distance(a, b)
    assert math.isnan(nd) or nd <= 1.0   # NUL-laden inputs mirror C# NaN
    if a == b and a and "\x00" not in a:
        assert abs(nd - 1.0) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
                min_size=0, max_size=20))
def test_popcount_matches_python(vals):
    from lucenenet_ray.ops.neardup import _popcount64

    x = np.array(vals, dtype=np.int64)
    got = _popcount64(x)
    want = [bin(v & ((1 << 64) - 1)).count("1") for v in vals]
    assert got.tolist() == want
