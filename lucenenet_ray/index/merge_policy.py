"""TieredMergePolicy analog — which partition-segments to compact, and a
driver that applies the selections with :func:`merge_indexes`.

Selection is a faithful re-expression of
``Index/TieredMergePolicy.cs:326-520`` (``FindMerges``) over segment
metadata rows:

* segments sorted by size desc (size = bytes net of deletes,
  ``MergePolicy.Size``); segments >= maxMergedSegmentBytes/2 are graced
  out of the budget (:369-374);
* the allowed segment count walks tiers of ``segsPerTier`` segments,
  multiplying the level size by ``maxMergeAtOnce`` each tier
  (:379-394 — the geometric staircase that keeps the index at
  O(log N) segments);
* while over budget, every window start is considered; a candidate
  packs up to ``maxMergeAtOnce`` segments, skipping (not stopping at)
  any segment that would push the merged size past
  ``maxMergedSegmentBytes`` (:441-464 bin-packing note);
* candidates score ``skew * totAfterMergeBytes^0.05 *
  nonDelRatio^reclaimDeletesWeight`` — lower is better; skew =
  floored-largest / floored-total (1/maxMergeAtOnce when the size cap
  was hit, :536-548); a too-large merge is not started while another
  max-sized merge runs (:476).

On this engine a "segment" is a whole shard index directory (disjoint
doc-id ranges, same bucket layout); applying a merge = one
AddIndexes-style :func:`merge_indexes` pass, and the survivors can be
searched in place with search/multi_reader.py — compaction is a
throughput/file-count policy, never a semantics change.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class SegmentMeta:
    """One mergeable unit: ``bytes`` = raw size (GetSizeInBytes),
    ``del_ratio`` = fraction of deleted docs (MergePolicy.Size discounts
    it for selection; reclaim-deletes scoring uses both)."""

    name: str
    bytes: int
    del_ratio: float = 0.0
    path: str | None = None


class TieredMergePolicy:
    """Defaults = the reference's (TieredMergePolicy.cs:79-84)."""

    def __init__(self, max_merge_at_once: int = 10,
                 segs_per_tier: float = 10.0,
                 floor_segment_bytes: int = 2 * 1024 * 1024,
                 max_merged_segment_bytes: int = 5 * 1024 ** 3,
                 reclaim_deletes_weight: float = 2.0,
                 max_merge_at_once_explicit: int = 30):
        if max_merge_at_once <= 1:
            raise ValueError("max_merge_at_once must be > 1")
        if max_merge_at_once_explicit <= 1:
            raise ValueError("max_merge_at_once_explicit must be > 1")
        if segs_per_tier < 2.0:
            raise ValueError("segs_per_tier must be >= 2.0")
        self.max_merge_at_once = max_merge_at_once
        self.max_merge_at_once_explicit = max_merge_at_once_explicit
        self.segs_per_tier = segs_per_tier
        self.floor_segment_bytes = floor_segment_bytes
        self.max_merged_segment_bytes = max_merged_segment_bytes
        self.reclaim_deletes_weight = reclaim_deletes_weight

    # MergePolicy.Size: live-bytes estimate
    def _size(self, s: SegmentMeta) -> int:
        return int(s.bytes * (1.0 - s.del_ratio))

    def _floor(self, b: int) -> int:
        return max(self.floor_segment_bytes, b)

    def find_merges(self, segments: list[SegmentMeta],
                    merging: frozenset[str] = frozenset()
                    ) -> list[list[SegmentMeta]]:
        """The MergeSpecification: a list of merges, each a list of
        segments, chosen exactly like FindMerges (``merging`` = names of
        segments already being merged by a running scheduler)."""
        if not segments:
            return []
        infos = sorted(segments, key=lambda s: (-self._size(s), s.name))
        tot = sum(self._size(s) for s in infos)
        min_bytes = min(self._size(s) for s in infos)

        too_big = 0
        while (too_big < len(infos)
               and self._size(infos[too_big])
               >= self.max_merged_segment_bytes / 2.0):
            tot -= self._size(infos[too_big])
            too_big += 1

        # allowed segment budget: geometric tier staircase (:379-394)
        level = self._floor(min_bytes)
        left = tot
        allowed = 0.0
        while True:
            cnt = left / level
            if cnt < self.segs_per_tier:
                allowed += math.ceil(cnt)
                break
            allowed += self.segs_per_tier
            left -= int(self.segs_per_tier * level)
            level *= self.max_merge_at_once
        allowed = int(allowed)

        spec: list[list[SegmentMeta]] = []
        to_be_merged: set[str] = set()
        while True:
            merging_bytes = 0
            eligible: list[SegmentMeta] = []
            for s in infos[too_big:]:
                if s.name in merging:
                    merging_bytes += s.bytes
                elif s.name not in to_be_merged:
                    eligible.append(s)
            max_merge_is_running = (
                merging_bytes >= self.max_merged_segment_bytes)
            if not eligible:
                return spec
            if len(eligible) < allowed:
                return spec

            best: list[SegmentMeta] | None = None
            best_score: float | None = None
            # startIdx <= count - maxMergeAtOnce (inclusive, :441) — with
            # fewer eligible than one full merge width, nothing is tried
            for start in range(0,
                               len(eligible) - self.max_merge_at_once + 1):
                candidate: list[SegmentMeta] = []
                tot_after = 0
                hit_too_large = False
                for s in eligible[start:]:
                    if len(candidate) >= self.max_merge_at_once:
                        break
                    b = self._size(s)
                    if tot_after + b > self.max_merged_segment_bytes:
                        hit_too_large = True
                        continue  # keep packing smaller ones (:452-460)
                    candidate.append(s)
                    tot_after += b
                score = self._score(candidate, hit_too_large)
                if ((best_score is None or score < best_score)
                        and (not hit_too_large or not max_merge_is_running)):
                    best = candidate
                    best_score = score
            if best is None:
                return spec
            spec.append(best)
            to_be_merged.update(s.name for s in best)

    def find_forced_merges(self, segments: list[SegmentMeta],
                           max_segment_count: int = 1,
                           merging: frozenset[str] = frozenset()
                           ) -> list[list[SegmentMeta]]:
        """ForceMerge selection (TieredMergePolicy.cs:602-684
        ``FindForcedMerges``): full ``maxMergeAtOnceExplicit``-way merges
        of the SMALLEST segments first (backwards over the size-desc
        order); the final merge down to ``max_segment_count`` only
        happens on a call where no full merge was selected — the
        IndexWriter re-invokes after merges land, so forcing is
        iterative (see :func:`force_merge`)."""
        eligible = [s for s in segments if s.name not in merging]
        force_merge_running = len(eligible) != len(segments)
        if not eligible:
            return []
        if ((max_segment_count > 1 and len(eligible) <= max_segment_count)
                or (max_segment_count == 1 and len(eligible) == 1)):
            return []  # already merged
        eligible.sort(key=lambda s: (-self._size(s), s.name))
        end = len(eligible)
        spec: list[list[SegmentMeta]] = []
        while end >= self.max_merge_at_once_explicit + max_segment_count - 1:
            spec.append(eligible[end - self.max_merge_at_once_explicit:end])
            end -= self.max_merge_at_once_explicit
        if not spec and not force_merge_running:
            num = end - max_segment_count + 1
            spec.append(eligible[end - num:end])
        return spec

    def find_forced_deletes_merges(self, segments: list[SegmentMeta],
                                   pct_allowed: float = 10.0,
                                   merging: frozenset[str] = frozenset()
                                   ) -> list[list[SegmentMeta]]:
        """ForceMergeDeletes selection (TieredMergePolicy.cs:688-740):
        every segment whose delete percentage exceeds ``pct_allowed``
        (default forceMergeDeletesPctAllowed = 10) merges, size-desc, in
        runs of ``maxMergeAtOnceExplicit`` — the merged-size cap is NOT
        enforced here (the caller explicitly asked to reclaim deletes)."""
        eligible = [s for s in segments
                    if s.del_ratio * 100.0 > pct_allowed
                    and s.name not in merging]
        if not eligible:
            return []
        eligible.sort(key=lambda s: (-self._size(s), s.name))
        return [eligible[i:i + self.max_merge_at_once_explicit]
                for i in range(0, len(eligible),
                               self.max_merge_at_once_explicit)]

    # TieredMergePolicy.Score (:520-566)
    def _score(self, candidate: list[SegmentMeta],
               hit_too_large: bool) -> float:
        tot_before = sum(s.bytes for s in candidate)
        tot_after = sum(self._size(s) for s in candidate)
        tot_after_floored = sum(self._floor(self._size(s))
                                for s in candidate)
        if hit_too_large:
            skew = 1.0 / self.max_merge_at_once
        else:
            skew = self._floor(self._size(candidate[0])) / tot_after_floored
        score = skew * (tot_after ** 0.05)
        non_del = tot_after / tot_before if tot_before else 1.0
        return score * (non_del ** self.reclaim_deletes_weight)


class LogMergePolicy:
    """LogByteSize/LogDoc merge policy (``Index/LogMergePolicy.cs:562-723``
    ``FindMerges``): segments stay in INDEX ORDER (never sorted — docID
    order is preserved across merges, the pre-4.0 contract); each
    segment's level = log_mergeFactor(size); starting from the left, the
    max remaining level opens a window [maxLevel - 0.75, maxLevel]
    (floored at log(minMergeSize)) extending to the RIGHTMOST segment
    inside it, and every full run of ``merge_factor`` segments in the
    window becomes one merge — skipped (not split) when it contains a
    too-large or already-merging segment.

    ``size_of`` picks the metric: bytes (LogByteSizeMergePolicy, default
    min 1.6 MB / max 2 GB) or docs (LogDocMergePolicy, min 1000 docs) —
    pass sizes in SegmentMeta.bytes in the chosen unit."""

    LEVEL_LOG_SPAN = 0.75

    def __init__(self, merge_factor: int = 10,
                 min_merge_size: int = int(1.6 * 1024 * 1024),
                 max_merge_size: int = 2048 * 1024 * 1024,
                 calibrate_size_by_deletes: bool = True):
        if merge_factor < 2:
            raise ValueError("merge_factor cannot be less than 2")
        self.merge_factor = merge_factor
        self.min_merge_size = min_merge_size
        self.max_merge_size = max_merge_size
        self.calibrate_size_by_deletes = calibrate_size_by_deletes

    def _size(self, s: SegmentMeta) -> int:
        if self.calibrate_size_by_deletes:
            return max(1, int(s.bytes * (1.0 - s.del_ratio)))
        return max(1, s.bytes)

    def find_merges(self, segments: list[SegmentMeta],
                    merging: frozenset[str] = frozenset()
                    ) -> list[list[SegmentMeta]]:
        if not segments:
            return []
        norm = math.log(self.merge_factor)
        levels = [math.log(self._size(s)) / norm for s in segments]
        level_floor = (0.0 if self.min_merge_size <= 0
                       else math.log(self.min_merge_size) / norm)

        spec: list[list[SegmentMeta]] = []
        n = len(segments)
        start = 0
        while start < n:
            max_level = max(levels[start:])
            if max_level <= level_floor:
                level_bottom = -1.0
            else:
                level_bottom = max_level - self.LEVEL_LOG_SPAN
                if level_bottom < level_floor <= max_level:
                    level_bottom = level_floor
            upto = n - 1
            while upto >= start and levels[upto] < level_bottom:
                upto -= 1
            # full merge_factor runs inside [start, upto]
            end = start + self.merge_factor
            while end <= 1 + upto:
                window = segments[start:end]
                any_too_large = any(
                    self._size(s) >= self.max_merge_size for s in window)
                any_merging = any(s.name in merging for s in window)
                if not any_merging and not any_too_large:
                    spec.append(window)
                start = end
                end = start + self.merge_factor
            start = 1 + upto
        return spec


def _dir_bytes(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                n += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return n


def compact_indexes(index_paths: list[str], out_root: str,
                    policy: TieredMergePolicy | None = None,
                    max_rounds: int = 10) -> list[str]:
    """ConcurrentMergeScheduler-in-the-small: run find_merges over the
    shard indexes' on-disk sizes and apply each selected merge with ONE
    :func:`merge_indexes` pass, repeating until the policy is satisfied
    (cascading merges, IndexWriter.MaybeMerge loop). Returns the
    surviving index paths — search them in place via
    search/multi_reader.MultiIndexReader."""
    from lucenenet_ray.index.merge_indexes import merge_indexes

    policy = policy or TieredMergePolicy()
    os.makedirs(out_root, exist_ok=True)
    paths = list(index_paths)
    gen = 0
    for _round in range(max_rounds):
        metas = [SegmentMeta(name=p, bytes=_dir_bytes(p), path=p)
                 for p in paths]
        spec = policy.find_merges(metas)
        spec = [m for m in spec if len(m) >= 2]
        if not spec:
            break
        for group in spec:
            out = os.path.join(out_root, f"merged_{gen:04d}")
            gen += 1
            merge_indexes([s.path for s in group], out)
            paths = [p for p in paths
                     if p not in {s.path for s in group}]
            paths.append(out)
    return paths


def force_merge(index_paths: list[str], out_root: str,
                max_segment_count: int = 1,
                policy: TieredMergePolicy | None = None,
                max_rounds: int = 10) -> list[str]:
    """IndexWriter.ForceMerge(maxNumSegments): iterate
    ``find_forced_merges`` + apply until the index is at
    ``max_segment_count`` segments (or the policy declines)."""
    from lucenenet_ray.index.merge_indexes import merge_indexes

    policy = policy or TieredMergePolicy()
    os.makedirs(out_root, exist_ok=True)
    paths = list(index_paths)
    gen = 0
    for _round in range(max_rounds):
        metas = [SegmentMeta(name=p, bytes=_dir_bytes(p), path=p)
                 for p in paths]
        spec = [m for m in policy.find_forced_merges(
                    metas, max_segment_count=max_segment_count)
                if len(m) >= 2]
        if not spec:
            break
        for group in spec:
            out = os.path.join(out_root, f"forced_{gen:04d}")
            gen += 1
            merge_indexes([s.path for s in group], out)
            paths = [p for p in paths
                     if p not in {s.path for s in group}]
            paths.append(out)
    return paths
