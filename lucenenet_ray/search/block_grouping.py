"""BlockGroupingCollector analog — single-pass grouping over doc blocks.

Reference: ``Grouping/BlockGroupingCollector.cs``:
- groups compete by their BEST document under the group sort (relevance
  here): the collector tracks one comparator slot per pending group and
  only the top doc competes (``Collect``/``ProcessGroup``, ``:470-550``);
- top-N groups kept in a bounded queue; within each returned group the
  docs re-collect through a ``TopScoreDocCollector`` (score desc, doc asc
  — HitQueue tie-break) capped at ``maxDocsPerGroup``
  (``GetTopGroups`` ``:353-470``);
- ``totalGroupCount`` is filled without a separate AllGroupsCollector
  (``:40-44``) and ``totalGroupedHitCount`` sums the hit counts of the
  RETURNED groups (``:443``);
- the collector never verifies blocks (``:48-51``) — the caller promises
  docs of a group are contiguous; here the group resolver is a pluggable
  vectorized fn, and on a block-sorted index (index/sorter.py) it is a
  ``searchsorted`` over block-start docIDs, zero per-doc lookups.

Scale shape: the hit stream is the distributed postings scan the searcher
already does; the single pass is over the (query-sized, score-ordered)
hit list, and the per-group state is top-N-groups × maxDocsPerGroup —
TopDocs.Merge altitude, never corpus-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GroupDocsResult:
    group_rank: int          # 1-based, by (best score desc, best doc asc)
    group_count: int         # hits in this group (GroupDocs.TotalHits)
    docs: tuple[int, ...]    # within-group top docs
    scores: tuple[float, ...]


@dataclass(frozen=True)
class TopGroupsResult:
    groups: tuple[GroupDocsResult, ...]
    total_hit_count: int          # all hits seen
    total_group_count: int        # distinct groups among all hits
    total_grouped_hit_count: int  # hits inside RETURNED groups


def block_grouping_search(reader, q, group_keys_of, n_groups: int = 5,
                          max_docs_per_group: int = 2) -> TopGroupsResult:
    """Run ``q`` and group the full hit stream in one pass.

    ``group_keys_of(docs: np.ndarray) -> np.ndarray`` resolves each hit
    doc to its block key (order-preserving; on a block-sorted index use
    ``np.searchsorted(block_starts, docs, side='right')``)."""
    from lucenenet_ray.search.searcher import search

    td = search(reader, q, k=reader.num_docs)
    docs = np.asarray([int(d) for d in td.docs], dtype=np.int64)
    keys = np.asarray(group_keys_of(docs))
    # hits arrive already in (score desc, doc asc) order, so the first
    # hit of each distinct key IS the group's best doc and first-seen
    # order IS the group ranking.
    order: dict = {}
    counts: dict = {}
    members: dict = {}
    for i, k in enumerate(keys.tolist()):
        if k not in order:
            order[k] = len(order)
            counts[k] = 0
            members[k] = []
        counts[k] += 1
        if len(members[k]) < max_docs_per_group:
            members[k].append(i)
    ranked = sorted(order, key=order.get)[:n_groups]
    groups = tuple(
        GroupDocsResult(
            group_rank=r + 1, group_count=counts[k],
            docs=tuple(int(docs[i]) for i in members[k]),
            scores=tuple(float(td.scores[i]) for i in members[k]))
        for r, k in enumerate(ranked))
    return TopGroupsResult(
        groups=groups, total_hit_count=int(docs.size),
        total_group_count=len(order),
        total_grouped_hit_count=sum(counts[k] for k in ranked))
