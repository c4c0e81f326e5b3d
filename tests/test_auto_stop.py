"""QueryAutoStopWordAnalyzer (Analysis/Query/QueryAutoStopWordAnalyzer.cs)
and PositionFilter (Analysis/Position/PositionFilter.cs)."""

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def index_path(documents_index):
    path, _ = documents_index
    return path


def _df_oracle():
    """Direct df per body term over the corpus (analyzer-true)."""
    from lucenenet_ray.analysis import analyze

    t = pq.read_table(SF_DIR + "/documents.parquet",
                      columns=["doc_id", "text"])
    df = {}
    for text in t.column("text").to_pylist():
        for term in set(analyze(text)[0]):
            df[term] = df.get(term, 0) + 1
    return df, t.num_rows


def test_stop_set_matches_direct_df(index_path):
    from lucenenet_ray.analysis.auto_stop import auto_stop_words

    df, n = _df_oracle()
    threshold = 300
    sw = auto_stop_words(index_path, max_doc_freq=threshold)
    expect = {t: c for t, c in df.items() if c > threshold}
    assert sw == expect
    assert sw  # non-trivial at this threshold


def test_percent_form_truncates_like_the_reference(index_path):
    """(int)(NumDocs * maxPercentDocs) — float32 product truncated
    (QueryAutoStopWordAnalyzer.cs:104-107)."""
    import numpy as np

    from lucenenet_ray.analysis.auto_stop import (auto_stop_words,
                                                  derived_max_doc_freq)

    df, n = _df_oracle()
    pct = 0.765625
    thr = derived_max_doc_freq(n, pct)
    assert thr == int(np.float32(n) * np.float32(pct))
    assert auto_stop_words(index_path, max_percent_docs=pct,
                           num_docs=n) == auto_stop_words(
        index_path, max_doc_freq=thr)


def test_wrapper_drops_stop_terms_with_position_holes(index_path):
    from lucenenet_ray.analysis.auto_stop import QueryAutoStopWordAnalyzer
    from lucenenet_ray.analysis.standard import StandardAnalyzer

    df, n = _df_oracle()
    ana = QueryAutoStopWordAnalyzer(StandardAnalyzer(), index_path,
                                    max_doc_freq=300)
    stop = set(ana.stop_words())
    assert stop == {t for t, c in df.items() if c > 300}
    # a text of one stop word between two non-stop words keeps the
    # survivors' absolute positions (the StopFilter hole contract)
    rare = sorted(t for t in df if t not in stop)[0]
    head = sorted(stop)[0]
    terms, positions = ana(f"{rare} {head} {rare}")
    assert terms == [rare, rare]
    assert positions == [0, 2]  # hole at 1


def test_wrapper_unknown_field_passes_through(index_path):
    from lucenenet_ray.analysis.auto_stop import QueryAutoStopWordAnalyzer
    from lucenenet_ray.analysis.standard import StandardAnalyzer

    ana = QueryAutoStopWordAnalyzer(StandardAnalyzer(), index_path,
                                    max_doc_freq=300)
    head = ana.stop_words()[0]
    terms, _ = ana(head, field="title")  # no stop set derived for title
    assert terms == [head]


def test_exactly_one_threshold_form():
    from lucenenet_ray.analysis.auto_stop import auto_stop_words

    with pytest.raises(ValueError):
        auto_stop_words("/nonexistent")
    with pytest.raises(ValueError):
        auto_stop_words("/nonexistent", max_doc_freq=1,
                        max_percent_docs=0.5)
    with pytest.raises(ValueError):
        auto_stop_words("/nonexistent", max_percent_docs=0.5)  # no num_docs


# --- PositionFilter ---------------------------------------------------------

def test_position_filter_default_zero():
    """PositionFilterTest.TEST_TOKEN_POSITION_INCREMENTS: [1,0,0,0,0,0]."""
    from lucenenet_ray.analysis.misc_filters import position_filter

    assert position_filter([1, 1, 1, 1, 1, 1]) == [1, 0, 0, 0, 0, 0]


def test_position_filter_non_zero():
    """PositionFilterTest.TEST_TOKEN_NON_ZERO_POSITION_INCREMENTS:
    [1,5,5,5,5,5]."""
    from lucenenet_ray.analysis.misc_filters import position_filter

    assert position_filter([1, 1, 1, 1, 1, 1], 5) == [1, 5, 5, 5, 5, 5]


def test_position_filter_first_keeps_incoming_increment():
    from lucenenet_ray.analysis.misc_filters import position_filter

    assert position_filter([3, 1, 2], 0) == [3, 0, 0]
    assert position_filter([], 0) == []


def test_position_filter_negative_raises():
    from lucenenet_ray.analysis.misc_filters import position_filter

    with pytest.raises(ValueError):
        position_filter([1], -1)
