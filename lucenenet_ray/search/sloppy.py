"""SloppyPhraseScorer — faithful port of Lucene's greedy PQ algorithm.

Reference: ``src/Lucene.Net/Search/SloppyPhraseScorer.cs`` (PhraseFreq
:101-145, AdvancePP :149-160, AdvanceRpts :167-210, InitPhrasePositions
:255-268, AdvanceRepeatGroups :337-381) and ``PhraseQueue.cs`` (ordering:
position, then offset). Slop factor: ``BM25Similarity.SloppyFreq`` =
1/(distance+1) (``BM25Similarity.cs:74-77``), accumulated in float32.

Semantics notes (from the reference's own doc comment :83-99): the greedy
traversal always propagates the least PhrasePosition, so not every valid
position combination is scored — e.g. "a b c b a" scores "a b c"~4 and
"c b a"~4 differently. We reproduce that behavior exactly, not an
idealized all-combinations semantics.

Repeats: phrases with a term at several offsets use the repeat-group logic
(single-term postings only — the multi-term-postings case belongs to
MultiPhraseQuery). Groups are keyed by term identity, which equals the
reference's first-doc TpPos grouping for single-term postings (two distinct
terms never share a position in a standard index).
"""

from __future__ import annotations

import heapq

import numpy as np

_F1 = np.float32(1.0)


def repeat_groups(terms: tuple[tuple[str, int], ...]) -> list[list[int]]:
    """Indices of phrase positions sharing a term, each group offset-sorted
    (SortRptGroups :434-448; phrase terms are already in offset order)."""
    by_term: dict[str, list[int]] = {}
    for i, (t, _rel) in enumerate(terms):
        by_term.setdefault(t, []).append(i)
    return [g for g in by_term.values() if len(g) > 1]


def sloppy_phrase_freq(
    plists: list[np.ndarray],
    offsets: list[int],
    rpt_groups: list[list[int]],
    slop: int,
) -> np.float32:
    """Sloppy phrase frequency of ONE doc.

    plists[i]: ascending term-position (tp) array for phrase position i;
    offsets[i]: the phrase offset (pp.position = tp - offset). Returns the
    float32 sum of 1/(matchLength+1) over greedy matches with
    matchLength <= slop (0.0 = no match).
    """
    n = len(offsets)
    idx = [0] * n
    group_of = [-1] * n
    for gi, g in enumerate(rpt_groups):
        for i in g:
            group_of[i] = gi

    def position(i: int) -> int:
        return int(plists[i][idx[i]]) - offsets[i]

    def tp_pos(i: int) -> int:
        return int(plists[i][idx[i]])

    def advance(i: int) -> bool:
        idx[i] += 1
        return idx[i] < len(plists[i])

    # ---- InitPhrasePositions: place first positions; with repeats, advance
    # the j-th member of each (offset-sorted) group j times so all members
    # start at distinct tp positions (AdvanceRepeatGroups :365-378).
    for g in rpt_groups:
        for j in range(1, len(g)):
            for _ in range(j):
                if not advance(g[j]):
                    return np.float32(0.0)

    end = max(position(i) for i in range(n))

    def advance_pp(i: int) -> bool:
        nonlocal end
        if not advance(i):
            return False
        p = position(i)
        if p > end:
            end = p
        return True

    def collide(i: int) -> int:
        tp = tp_pos(i)
        for j in rpt_groups[group_of[i]]:
            if j != i and tp_pos(j) == tp:
                return j
        return -1

    def advance_rpts(i: int) -> tuple[bool, bool]:
        """Resolve repeater collisions after pp i advanced (:167-210).
        Returns (pps_available, any_inqueue_positions_changed)."""
        if group_of[i] < 0:
            return True, False
        cur = i
        changed = False
        while True:
            k = collide(cur)
            if k < 0:
                return True, changed
            # advance the Lesser of the two colliding pps (:214-221)
            lesser = (
                cur
                if (position(cur), offsets[cur]) < (position(k), offsets[k])
                else k
            )
            if not advance_pp(lesser):
                return False, changed
            changed = True
            cur = lesser

    # heap of in-queue pps keyed (position, offset) — PhraseQueue.LessThan
    heap = [(position(i), offsets[i], i) for i in range(n)]
    heapq.heapify(heap)

    freq = np.float32(0.0)
    p, _o, pp = heapq.heappop(heap)
    match_length = end - p
    next_pos = heap[0][0] if heap else p
    while advance_pp(pp):
        if rpt_groups:
            ok, changed = advance_rpts(pp)
            if not ok:
                break
            if changed:
                # reference re-queues only the advanced pps (:190-209); with a
                # strict total order a full rebuild of the in-queue set yields
                # the identical pop sequence
                heap = [(position(j), offsets[j], j) for j in range(n) if j != pp]
                heapq.heapify(heap)
        ppos = position(pp)
        if ppos > next_pos:  # done minimizing current match-length (:118)
            if match_length <= slop:
                freq = np.float32(freq + _F1 / np.float32(match_length + 1))
            heapq.heappush(heap, (ppos, offsets[pp], pp))
            p, _o, pp = heapq.heappop(heap)
            next_pos = heap[0][0]
            match_length = end - p
        else:
            ml2 = end - ppos
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq = np.float32(freq + _F1 / np.float32(match_length + 1))
    return freq
