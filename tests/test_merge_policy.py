"""TieredMergePolicy analog (Index/TieredMergePolicy.cs FindMerges) —
selection semantics hand-worked from the reference algorithm, plus an
end-to-end compaction whose survivors federate (MultiIndexReader)
bit-identically to one all-at-once merge."""

import pyarrow as pa
import pytest

from lucenenet_ray.index.merge_policy import (
    SegmentMeta,
    TieredMergePolicy,
    compact_indexes,
)

MB = 1024 * 1024


def _segs(sizes, prefix="s"):
    return [SegmentMeta(name=f"{prefix}{i:03d}", bytes=int(b))
            for i, b in enumerate(sizes)]


def test_equal_segments_two_full_merges():
    """20 equal 1MB segments, budget 10 -> exactly two 10-way merges."""
    p = TieredMergePolicy()
    spec = p.find_merges(_segs([1 * MB] * 20))
    assert [len(m) for m in spec] == [10, 10]
    names = [s.name for m in spec for s in m]
    assert len(set(names)) == 20


def test_under_budget_no_merge():
    p = TieredMergePolicy()
    assert p.find_merges(_segs([1 * MB] * 9)) == []
    assert p.find_merges([]) == []


def test_skew_prefers_balanced_window():
    """One huge + many small: the best merge excludes the huge segment
    (its window has skew near 1.0)."""
    p = TieredMergePolicy()
    sizes = [100 * MB] + [1 * MB] * 18
    spec = p.find_merges(_segs(sizes))
    assert spec, "over budget must merge"
    for m in spec:
        assert all(s.bytes == 1 * MB for s in m)


def test_too_big_segments_graced_out():
    """Segments >= maxMergedSegmentBytes/2 never merge and don't count
    against the budget."""
    p = TieredMergePolicy(max_merged_segment_bytes=100 * MB)
    sizes = [60 * MB, 55 * MB] + [1 * MB] * 9
    spec = p.find_merges(_segs(sizes))
    for m in spec:
        assert all(s.bytes == 1 * MB for s in m)
    # 9 small segs are within the allowed count -> possibly no merge;
    # the invariant under test is only that big ones are never selected
    p2 = TieredMergePolicy(max_merged_segment_bytes=100 * MB)
    spec2 = p2.find_merges(_segs([60 * MB] + [1 * MB] * 20))
    assert spec2 and all(s.bytes == 1 * MB for m in spec2 for s in m)


def test_max_merged_size_packs_around_large():
    """A candidate skips (not stops at) segments that would overflow the
    merged-size cap — the reference's bin-packing continue."""
    p = TieredMergePolicy(max_merge_at_once=5, segs_per_tier=2.0,
                          floor_segment_bytes=1,
                          max_merged_segment_bytes=10 * MB)
    # 4MB segments: any 3 fit (12MB > 10MB -> only 2 fit); eligible=8
    spec = p.find_merges(_segs([4 * MB] * 8))
    assert spec
    for m in spec:
        assert sum(s.bytes for s in m) <= 10 * MB


def test_merging_set_excluded():
    p = TieredMergePolicy()
    segs = _segs([1 * MB] * 20)
    merging = frozenset(s.name for s in segs[:10])
    spec = p.find_merges(segs, merging=merging)
    assert [len(m) for m in spec] == [10]
    assert {s.name for s in spec[0]} == {s.name for s in segs[10:]}


def test_fewer_eligible_than_merge_width_no_candidates():
    """Over budget but fewer eligible than maxMergeAtOnce: the reference's
    window loop runs zero iterations -> no merge."""
    p = TieredMergePolicy(max_merge_at_once=10, segs_per_tier=2.0,
                          floor_segment_bytes=1)
    # 6 segments of wildly different sizes -> allowed < 6 but only 6
    # eligible < maxMergeAtOnce=10
    sizes = [32 * MB, 16 * MB, 8 * MB, 4 * MB, 2 * MB, 1 * MB]
    assert p.find_merges(_segs(sizes)) == []


def test_reclaim_deletes_preferred():
    """With equal sizes, the window containing delete-heavy segments
    scores better (nonDelRatio < 1 lowers the score)."""
    p = TieredMergePolicy(max_merge_at_once=2, segs_per_tier=2.0,
                          floor_segment_bytes=1)
    segs = [SegmentMeta(name="a", bytes=10 * MB, del_ratio=0.5),
            SegmentMeta(name="b", bytes=10 * MB, del_ratio=0.5),
            SegmentMeta(name="c", bytes=6 * MB),
            SegmentMeta(name="d", bytes=6 * MB),
            SegmentMeta(name="e", bytes=6 * MB)]
    spec = p.find_merges(segs)
    assert spec
    # the delete-heavy pair (live size 5MB each, sorted below the 6MB
    # segs) must appear in the chosen merges
    merged_names = {s.name for m in spec for s in m}
    assert {"a", "b"} <= merged_names


@pytest.mark.parametrize("n_shards", [6])
def test_compaction_end_to_end(ray_session, tmp_path, n_shards):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.index.merge_indexes import merge_indexes
    from lucenenet_ray.search.multi_reader import MultiIndexReader
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    per = 8
    paths = []
    for sh in range(n_shards):
        lo = sh * per
        t = pa.table({
            "doc_id": pa.array(range(lo, lo + per), type=pa.int64()),
            "text": pa.array([
                " ".join(words[(lo + i + j) % len(words)]
                         for j in range((lo + i) % 4 + 1))
                for i in range(per)]),
        })
        p = str(tmp_path / f"shard{sh}")
        build_index(rd.from_arrow(t),
                    IndexConfig(index_path=p, id_min=lo, id_max=lo + per - 1,
                                n_buckets=2, n_hparts=1))
        paths.append(p)

    policy = TieredMergePolicy(max_merge_at_once=3, segs_per_tier=2.0,
                               floor_segment_bytes=1)
    survivors = compact_indexes(paths, str(tmp_path / "out"), policy)
    assert len(survivors) < n_shards

    # federated survivors == one all-at-once merge, bit for bit
    allp = str(tmp_path / "all")
    merge_indexes(paths, allp)
    ref = IndexReader(allp)
    multi = MultiIndexReader([IndexReader(p) for p in survivors])
    assert multi.num_docs == ref.num_docs
    for w in words:
        want = search(ref, TermQuery(term=w), k=50)
        got = search(multi, TermQuery(term=w), k=50)
        assert got.docs.tolist() == want.docs.tolist()
        assert got.scores.tolist() == want.scores.tolist()


def test_forced_merges_full_then_final():
    """70 segments, explicit width 30, target 1: first call = two full
    30-way merges of the SMALLEST segments (backwards), no final merge on
    the same call; a later call (12 left) does the single final merge."""
    p = TieredMergePolicy(max_merge_at_once_explicit=30)
    segs = _segs([(i + 1) * MB for i in range(70)])
    spec = p.find_forced_merges(segs, max_segment_count=1)
    assert [len(m) for m in spec] == [30, 30]
    # backwards over size-desc order = smallest segments first
    merged = {s.name for m in spec for s in m}
    smallest60 = {s.name for s in sorted(segs, key=lambda s: s.bytes)[:60]}
    assert merged == smallest60

    remaining = [s for s in segs if s.name not in merged]
    spec2 = p.find_forced_merges(remaining, max_segment_count=1)
    assert [len(m) for m in spec2] == [len(remaining)]


def test_forced_merges_target_count_and_noop():
    p = TieredMergePolicy(max_merge_at_once_explicit=30)
    segs = _segs([1 * MB] * 7)
    # down to 3: final merge of end - 3 + 1 = 5 smallest
    spec = p.find_forced_merges(segs, max_segment_count=3)
    assert [len(m) for m in spec] == [5]
    # already at/below target -> no-op
    assert p.find_forced_merges(_segs([1 * MB] * 3),
                                max_segment_count=3) == []
    # a running force-merge suppresses the final merge
    spec3 = p.find_forced_merges(segs, max_segment_count=1,
                                 merging=frozenset({"s000"}))
    assert spec3 == []


def test_force_merge_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.index.merge_indexes import merge_indexes
    from lucenenet_ray.index.merge_policy import force_merge
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    words = ["alpha", "beta", "gamma"]
    paths = []
    for sh in range(5):
        lo = sh * 4
        t = pa.table({
            "doc_id": pa.array(range(lo, lo + 4), type=pa.int64()),
            "text": pa.array([words[(lo + i) % 3] + " " + words[i % 3]
                              for i in range(4)]),
        })
        p = str(tmp_path / f"fshard{sh}")
        build_index(rd.from_arrow(t),
                    IndexConfig(index_path=p, id_min=lo, id_max=lo + 3,
                                n_buckets=2, n_hparts=1))
        paths.append(p)

    out = force_merge(paths, str(tmp_path / "forced"), max_segment_count=1,
                      policy=TieredMergePolicy(max_merge_at_once_explicit=3))
    assert len(out) == 1

    allp = str(tmp_path / "all")
    merge_indexes(paths, allp)
    ref = IndexReader(allp)
    got = IndexReader(out[0])
    assert got.num_docs == ref.num_docs
    for w in words:
        a = search(ref, TermQuery(term=w), k=50)
        b = search(got, TermQuery(term=w), k=50)
        assert b.docs.tolist() == a.docs.tolist()
        assert b.scores.tolist() == a.scores.tolist()


def test_log_policy_level_runs_in_index_order():
    """LogMergePolicy never reorders: 25 equal segments (one level) ->
    two contiguous 10-way merges, the 5-segment tail left alone."""
    from lucenenet_ray.index.merge_policy import LogMergePolicy

    p = LogMergePolicy(min_merge_size=1000, max_merge_size=10**12)
    segs = _segs([4000] * 25)
    spec = p.find_merges(segs)
    assert [[s.name for s in m] for m in spec] == [
        [f"s{i:03d}" for i in range(10)],
        [f"s{i:03d}" for i in range(10, 20)],
    ]


def test_log_policy_levels_quantize():
    """A big head segment opens its own level; the small tail merges at
    the floor level (maxLevel <= floor -> everything remaining)."""
    from lucenenet_ray.index.merge_policy import LogMergePolicy

    p = LogMergePolicy(merge_factor=3, min_merge_size=1000,
                       max_merge_size=10**12)
    # head: 1e9 (own level); tail: 11 tiny (all under floor)
    segs = _segs([10**9] + [10] * 11)
    spec = p.find_merges(segs)
    # head alone can't fill a 3-run at its level; tail yields 3 full runs
    assert [len(m) for m in spec] == [3, 3, 3]
    assert spec[0][0].name == "s001"  # head segment never merged


def test_log_policy_too_large_window_skipped():
    from lucenenet_ray.index.merge_policy import LogMergePolicy

    p = LogMergePolicy(merge_factor=2, min_merge_size=0,
                       max_merge_size=500)
    # window containing a >= max segment is SKIPPED whole, not split
    segs = _segs([600, 400, 400, 400])
    spec = p.find_merges(segs)
    for m in spec:
        assert all(s.bytes < 500 for s in m)


def test_log_policy_calibrates_deletes():
    from lucenenet_ray.index.merge_policy import LogMergePolicy

    segs = [SegmentMeta(name="a", bytes=1000, del_ratio=0.9),
            SegmentMeta(name="b", bytes=100)]
    p = LogMergePolicy(merge_factor=2, min_merge_size=0,
                       max_merge_size=10**12)
    spec = p.find_merges(segs)
    # calibrated sizes 100 and 100 -> same level -> one merge of both
    assert [len(m) for m in spec] == [2]
    p2 = LogMergePolicy(merge_factor=2, min_merge_size=0,
                        max_merge_size=10**12,
                        calibrate_size_by_deletes=False)
    # uncalibrated: 1000 vs 100 -> levels 9.97 vs 6.6 (log2) -> window
    # [maxLevel-0.75] excludes b -> no full run anywhere
    assert p2.find_merges(segs) == []


def test_forced_deletes_merges():
    """Only segments over the delete-pct threshold merge, size-desc, in
    explicit-width runs, size cap NOT enforced."""
    p = TieredMergePolicy(max_merge_at_once_explicit=3,
                          max_merged_segment_bytes=1)  # cap must be ignored
    segs = [SegmentMeta(name=f"s{i}", bytes=(i + 1) * MB,
                        del_ratio=0.2 if i % 2 == 0 else 0.05)
            for i in range(8)]
    spec = p.find_forced_deletes_merges(segs, pct_allowed=10.0)
    names = [[s.name for s in m] for m in spec]
    # deleted-heavy = even indices (sizes 1,3,5,7 MB) sorted size-desc
    assert names == [["s6", "s4", "s2"], ["s0"]]
    assert p.find_forced_deletes_merges(segs, pct_allowed=25.0) == []
    spec2 = p.find_forced_deletes_merges(
        segs, pct_allowed=10.0, merging=frozenset({"s6"}))
    assert [[s.name for s in m] for m in spec2] == [["s4", "s2", "s0"]]
