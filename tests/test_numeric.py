"""Numeric trie terms + NumericRangeQuery64 (index/numeric.py).

Reference semantics: NumericUtils.cs:150-174 (Int64ToPrefixCodedBytes),
:253-268 (PrefixCodedToInt64), :404-441 (SplitRange), :528-543
(DoubleToSortableInt64); NumericRangeQuery.cs:340-379 (bound normalization);
NumericTokenStream.cs (one term per shift level).
"""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.index.numeric import (
    INT64_MAX,
    INT64_MIN,
    PRECISION_STEP_DEFAULT,
    double_to_sortable_int64,
    int64_array_to_prefix_coded,
    int64_to_prefix_coded,
    normalize_bounds,
    prefix_coded_shift,
    prefix_coded_to_int64,
    sortable_int64_to_double,
    split_int64_range,
    trie_shifts,
    trie_tokens_int64,
)


def test_prefix_coded_golden():
    # val=0 shift=0: sortable bits = sign-flipped 0 = 0x8000...0; ten 7-bit
    # groups bottom-up leave a single leading 1 in the top group.
    s = int64_to_prefix_coded(0, 0)
    assert len(s) == 11 and ord(s[0]) == 0x20
    assert s[1] == "\x01" and set(s[2:]) == {"\x00"}
    # val=0 shift=60: one payload byte = 0x8000...>>60 = 0x8
    s = int64_to_prefix_coded(0, 60)
    assert s == chr(0x20 + 60) + chr(8)
    # val=1 shift=0 differs from val=0 only in the last byte
    a, b = int64_to_prefix_coded(0, 0), int64_to_prefix_coded(1, 0)
    assert a[:-1] == b[:-1] and ord(b[-1]) - ord(a[-1]) == 1
    # negative values sort below positives (sign flip)
    assert int64_to_prefix_coded(-1, 0) < int64_to_prefix_coded(0, 0)


def test_roundtrip_and_order():
    rng = np.random.RandomState(3)
    vals = np.concatenate([
        rng.randint(-(2**62), 2**62, size=200),
        np.array([INT64_MIN, INT64_MAX, 0, -1, 1]),
    ]).astype(np.int64)
    for shift in (0, 4, 7, 13, 60, 63):
        enc = [int64_to_prefix_coded(int(v), shift) for v in vals]
        for v, e in zip(vals, enc):
            assert prefix_coded_shift(e) == shift
            assert prefix_coded_to_int64(e) == (int(v) >> shift) << shift
        # byte order == value order at equal shift
        ev = sorted(range(len(vals)), key=lambda i: enc[i])
        vv = np.argsort(vals >> shift, kind="stable")
        assert [int(vals[i]) >> shift for i in ev] == \
               [int(vals[i]) >> shift for i in vv]


def test_vectorized_matches_scalar():
    rng = np.random.RandomState(5)
    vals = rng.randint(-(2**62), 2**62, size=300).astype(np.int64)
    for shift in (0, 4, 32, 63):
        enc = int64_array_to_prefix_coded(vals, shift)
        assert enc == [int64_to_prefix_coded(int(v), shift) for v in vals]


def test_trie_tokens():
    toks = trie_tokens_int64(12345, 4)
    assert len(toks) == 16 and trie_shifts(4) == list(range(0, 64, 4))
    assert [prefix_coded_shift(t) for t in toks] == list(range(0, 64, 4))
    with pytest.raises(ValueError):
        trie_shifts(0)


def test_split_range_exact_cover():
    """The split invariant (NumericUtils.cs SplitRange): every in-range value
    is matched by exactly one sub-range's term scan, out-of-range by none."""
    rng = np.random.RandomState(11)
    for _ in range(120):
        ps = int(rng.choice([1, 2, 4, 8, 16]))
        vals = rng.randint(-300, 300, size=80)
        lo, hi = sorted(rng.randint(-350, 350, size=2).tolist())
        subs = split_int64_range(ps, lo, hi)
        counts = np.zeros(len(vals), dtype=int)
        for mn, mx, sh in subs:
            tlo, thi = (int64_to_prefix_coded(mn, sh),
                        int64_to_prefix_coded(mx, sh))
            for i, v in enumerate(vals):
                if tlo <= int64_to_prefix_coded(int(v), sh) <= thi:
                    counts[i] += 1
        want = ((vals >= lo) & (vals <= hi)).astype(int)
        assert (counts == want).all()
    # full domain + degenerate
    assert split_int64_range(4, 5, 4) == []
    assert split_int64_range(4, 7, 7) == [(7, 7, 0)]
    assert split_int64_range(4, INT64_MIN, INT64_MAX)


def test_normalize_bounds():
    assert normalize_bounds(None, None, True, True) == (INT64_MIN, INT64_MAX)
    assert normalize_bounds(5, 10, False, False) == (6, 9)
    assert normalize_bounds(INT64_MAX, None, False, True) is None
    assert normalize_bounds(None, INT64_MIN, True, False) is None


def test_double_sortable():
    ds = [0.0, -0.0, 1.5, -1.5, 3.14e300, -2.2e-308,
          float("inf"), float("-inf")]
    for d in ds:
        assert sortable_int64_to_double(double_to_sortable_int64(d)) == d
    enc = [double_to_sortable_int64(d) for d in ds]
    assert [x for _, x in sorted(zip(enc, ds))] == sorted(ds)
    assert (double_to_sortable_int64(float("nan"))
            > double_to_sortable_int64(float("inf")))


@pytest.fixture(scope="module")
def numeric_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index

    rng = np.random.RandomState(17)
    vals = rng.randint(-500, 2000, size=400).astype(np.int64)
    vals[7] = INT64_MIN
    vals[11] = INT64_MAX
    t = pa.table({
        "doc_id": pa.array(np.arange(400, dtype=np.int64)),
        "text": pa.array([f"doc {i}" for i in range(400)]),
        "price": pa.array(vals),
    })
    path = str(tmp_path_factory.mktemp("numidx") / "idx")
    cfg = IndexConfig(index_path=path, id_min=0, id_max=399, n_buckets=4,
                      extra_fields=(("price", "price", "numeric:4"),))
    build_index(rd.from_arrow(t), cfg)
    return path, vals


def _trie_match(path, **kw):
    from lucenenet_ray.search.query import NumericRangeQuery64
    from lucenenet_ray.search.reader import IndexReader

    r = IndexReader(path)
    terms = r.expand_query(NumericRangeQuery64(field_name="price", **kw))
    parts = [c.docs() for b in r.bucket_ids
             for c in r.bucket(b).chunks_for_terms(terms).values()]
    return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)


def test_numeric_range_query_end_to_end(numeric_index):
    path, vals = numeric_index
    cases = [
        dict(lower=0, upper=1000),
        dict(lower=-100, upper=99, include_upper=False),
        dict(lower=17, upper=17),
        dict(lower=None, upper=-400),
        dict(lower=1500, upper=None, include_lower=False),
        dict(lower=None, upper=None),  # matches all incl. INT64_MIN/MAX docs
    ]
    for kw in cases:
        got = _trie_match(path, **kw)
        lo = kw.get("lower")
        hi = kw.get("upper")
        m = np.ones(len(vals), dtype=bool)
        if lo is not None:
            m &= (vals >= lo) if kw.get("include_lower", True) else (vals > lo)
        if hi is not None:
            m &= (vals <= hi) if kw.get("include_upper", True) else (vals < hi)
        assert got.tolist() == np.flatnonzero(m).tolist(), kw


def test_numeric_range_each_doc_matched_once(numeric_index):
    """Split-cover disjointness through the real index: summed df over the
    expanded terms == number of matching docs (no doc counted twice)."""
    from lucenenet_ray.search.query import NumericRangeQuery64
    from lucenenet_ray.search.reader import IndexReader

    path, vals = numeric_index
    r = IndexReader(path)
    terms = r.expand_query(NumericRangeQuery64(
        field_name="price", lower=-250, upper=1234))
    stats = r.term_stats(terms)
    total_df = sum(df for df, _ in stats.values())
    assert total_df == int(((vals >= -250) & (vals <= 1234)).sum())


def test_double_trie_range_split_covers_exactly():
    """DoubleField trie: the SplitRange decomposition over sortable doubles
    counts each in-range value exactly once."""
    from lucenenet_ray.index.numeric import (
        double_to_sortable_int64,
        int64_to_prefix_coded,
        split_int64_range,
        trie_tokens_int64,
    )

    vals = [0.5, 1.0, 3.25, 999.99, 1000.0, 4500.5, 8999.999, 9000.0,
            -12.5, 12345.6]
    # per-term counts (the tiny index)
    from collections import Counter
    idx = Counter()
    for v in vals:
        idx.update(trie_tokens_int64(double_to_sortable_int64(v)))
    lo = double_to_sortable_int64(1000.0)
    hi = double_to_sortable_int64(9000.0) - 1
    total = 0
    for mn, mx, shift in split_int64_range(4, lo, hi):
        lo_t = int64_to_prefix_coded(mn, shift)
        hi_t = int64_to_prefix_coded(mx, shift)
        total += sum(n for t, n in idx.items() if lo_t <= t <= hi_t)
    assert total == sum(1 for v in vals if 1000.0 <= v < 9000.0) == 3


def test_double_sortable_order():
    from lucenenet_ray.index.numeric import (
        double_to_sortable_int64,
        sortable_int64_to_double,
    )

    xs = [-1e300, -2.5, -0.0, 0.0, 1e-300, 3.14, 2**60 * 1.0]
    ss = [double_to_sortable_int64(x) for x in xs]
    assert ss == sorted(ss)
    assert [sortable_int64_to_double(s) for s in ss] == xs
