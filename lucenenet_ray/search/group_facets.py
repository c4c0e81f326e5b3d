"""Grouped facets — facet counts where each GROUP counts once per value.

Re-expression of ``Lucene.Net.Grouping`` grouped faceting
(``AbstractGroupFacetCollector.cs``, ``Term/TermGroupFacetCollector.cs``):
for every facet value, the number of DISTINCT groups that contain at least
one matching doc carrying that value — e.g. "how many distinct sites
(group = source) mention 'spark' in each language (facet = lang)".

Contract matched (AbstractGroupFacetCollector.cs:60-125,130-148):

- an entry's count = distinct (group, facetValue) pairs among hits
  collapsed per facet value;
- ``totalCount`` = sum of all non-missing pair counts (``m_total``
  accumulation at :79);
- ``totalMissingCount`` = distinct groups whose matching docs carry NO
  facet value (the ``facetOrd == -1`` arm of TermGroupFacetCollector.SV);
- ``minCount`` drops entries below the threshold BEFORE top-``size``
  selection (GroupedFacetResult.AddFacetCount :175-179);
- order: count DESC then value ASC when ``order_by_count``
  (OrderByCountAndValueComparer :130-141), else value ASC
  (OrderByValueComparer :143-149).

DOCUMENTED DELTA vs the reference: TermGroupFacetCollector dedups
(group, facet) pairs per SEGMENT only (``segmentGroupedFacetHits`` is reset
each segment), so a group spanning segments is counted once per segment.
That makes results depend on physical segmentation — unacceptable for a
distributed engine whose bucket layout is a tuning knob.  This module
dedups GLOBALLY, i.e. the single-segment (force-merged) reference answer,
which is partition-invariant and what the SQL oracle
(ops/sql_oracle.group_facets_sql) re-derives.

Scale shape (100 TB): the corpus-wide stage is ONE stateless
``map_batches`` over a two/three-column projection of the docs table that
emits per-batch DISTINCT (group, facet) pairs — output cardinality is
bounded by |groups| x |facets| per batch, so the driver-side union is
pair-scale, never corpus-scale.  The hit set is broadcast once via
``ray.put`` (searchsorted membership per batch).  No shuffle: the global
dedup runs on the tiny pair stream.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class GroupedFacetResult:
    """GetTopEntries output (AbstractGroupFacetCollector.cs:60-83)."""

    entries: list[tuple[str, int]]  # (facet value, group count), ordered
    total_count: int
    total_missing_count: int

    def to_table(self) -> pa.Table:
        vals = [v for v, _ in self.entries]
        cnts = [c for _, c in self.entries]
        n = len(self.entries)
        return pa.table({
            "facet": pa.array(vals, type=pa.string()),
            "group_count": pa.array(cnts, type=pa.int64()),
            "total_count": pa.array([self.total_count] * n, type=pa.int64()),
            "missing_count": pa.array([self.total_missing_count] * n,
                                      type=pa.int64()),
        })


def group_facets(hit_doc_ids, docs_path: str, *, group_field: str = "source",
                 facet_field: str = "lang", size: int = 10,
                 min_count: int = 1, order_by_count: bool = True,
                 facet_prefix: str | None = None,
                 batch_size: int = 4096) -> GroupedFacetResult:
    """Grouped facet counts over ``hit_doc_ids`` (any iterable of doc ids).

    ``facet_prefix`` keeps only facet values starting with the prefix
    (TermGroupFacetCollector facetPrefix; prefix-excluded values do NOT
    feed missing — missing is strictly the no-value arm).
    """
    import ray
    import ray.data as rd

    hits = np.asarray(sorted(int(d) for d in hit_doc_ids), dtype=np.int64)
    hits_ref = ray.put(hits)

    cols = ["doc_id", group_field]
    if facet_field != group_field:
        cols.append(facet_field)
    ds = rd.read_parquet(docs_path, columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        import ray as _ray

        h = _ray.get(hits_ref)
        ids = t.column("doc_id").to_numpy()
        pos = np.searchsorted(h, ids)
        inh = pos < h.size
        inh[inh] = h[pos[inh]] == ids[inh]
        if not inh.any():
            return pa.table({"grp": pa.array([], type=pa.string()),
                             "facet": pa.array([], type=pa.string())})
        sub = t.filter(pa.array(inh)).select([group_field, facet_field]) \
            .rename_columns(["grp", "facet"])
        # per-batch distinct pairs: output is pair-cardinality, not rows
        return sub.group_by(["grp", "facet"]).aggregate([]).sort_by(
            [("grp", "ascending"), ("facet", "ascending")])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).take_all()
    pairs: set[tuple[str, str | None]] = set()
    for row in parts:
        pairs.add((row["grp"], row["facet"]))

    counts: dict[str, int] = {}
    missing_groups: set[str] = set()
    for grp, facet in pairs:
        if facet is None or facet == "":
            missing_groups.add(grp)
            continue
        if facet_prefix is not None and not facet.startswith(facet_prefix):
            continue
        counts[facet] = counts.get(facet, 0) + 1

    total = sum(counts.values())
    entries = [(v, c) for v, c in counts.items() if c >= min_count]
    if order_by_count:
        entries.sort(key=lambda e: (-e[1], e[0]))
    else:
        entries.sort(key=lambda e: e[0])
    return GroupedFacetResult(entries=entries[:size], total_count=total,
                              total_missing_count=len(missing_groups))
