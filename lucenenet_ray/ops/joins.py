"""Block join: child-hit → parent mapping with score modes.

The ``ToParentBlockJoinQuery`` analog (``src/Lucene.Net.Join/
ToParentBlockJoinQuery.cs``; score modes ``ScoreMode.cs`` None/Avg/Max/Total).
Lucene co-locates parent+children in one doc block and walks the block at
query time; the Ray-Data-first expression is a child-side filter, a
``groupby(parent_key)`` aggregate for the score mode, and a distributed
(score desc, key asc) top-k — the join moves only matched-child aggregates,
never the child table.

Partitioning assumption (documented per the custom-operator rule): children
of one parent need not be co-located — the groupby shuffle aligns them; at
scale pre-partitioning both tables by parent key turns it into a local join.
"""

from __future__ import annotations

import pyarrow as pa


def block_join_parent_scores(children, parent_key: str, score_col: str,
                             score_mode: str = "max"):
    """children (filtered child Dataset) → Dataset of (parent_key, score).

    score_mode: max | total | avg | none (none = child hit count,
    ToParentBlockJoinQuery ScoreMode.None counts matches)."""
    from ray.data.aggregate import Count, Max, Mean, Sum

    if score_mode == "max":
        agg = Max(score_col, alias_name="score")
    elif score_mode == "total":
        agg = Sum(score_col, alias_name="score")
    elif score_mode == "avg":
        agg = Mean(score_col, alias_name="score")
    elif score_mode == "none":
        agg = Count(alias_name="score")
    else:
        raise ValueError(f"unknown score_mode {score_mode}")
    return children.groupby(parent_key).aggregate(agg)


def top_parents(scores, parent_key: str, k: int) -> pa.Table:
    """Distributed (score desc, parent_key asc) top-k."""
    rows = (scores.sort(key=["score", parent_key], descending=[True, False])
            .limit(k).take_all())  # bounded-collect: k rows
    return pa.table({
        parent_key: pa.array([r[parent_key] for r in rows]),
        "score": pa.array([r["score"] for r in rows]),
    })


def to_parent_block_join_groups(children, parent_key: str, child_id: str,
                                score_col: str, score_mode: str = "max",
                                n_groups: int = 10,
                                docs_per_group: int = 3) -> pa.Table:
    """ToParentBlockJoinCollector analog (``Join/ToParentBlockJoinCollector.cs``
    GetTopGroups :247-329): the top ``n_groups`` parents by the score-mode
    aggregate, each carrying its per-group child hit count (GroupDocs.TotalHits)
    and its top ``docs_per_group`` children by (child score desc, child id asc)
    — the collector's withinGroupSort=relevance default with the docID
    tie-break.

    Output: one row per retained (parent, child), columns
    (parent_key, parent_score, group_hits, child_rank, child_id, child_score).

    Ray shape: ONE groupby computes parent scores AND group hit counts; the
    winning parent set (n_groups keys) is broadcast via ``ray.put`` and a
    stateless ``map_batches`` emits per-batch per-parent top-``docs_per_group``
    partials — candidate volume reaching the driver is bounded by
    batches x n_groups x docs_per_group, never child-table rows.  Same
    partitioning note as the module docstring: no child co-location needed."""
    import numpy as np
    import ray
    from ray.data.aggregate import Count, Max, Mean, Sum

    score_agg = {"max": Max, "total": Sum, "avg": Mean}.get(score_mode)
    if score_agg is None:
        raise ValueError(f"unknown score_mode {score_mode}")
    agg = children.groupby(parent_key).aggregate(
        score_agg(score_col, alias_name="parent_score"),
        Count(alias_name="group_hits"))
    top = (agg.sort(key=["parent_score", parent_key],
                    descending=[True, False]).limit(n_groups)
            .take_all())  # bounded-collect: n_groups rows
    keys = np.asarray([r[parent_key] for r in top], dtype=np.int64)
    pscore = {int(r[parent_key]): float(r["parent_score"]) for r in top}
    ghits = {int(r[parent_key]): int(r["group_hits"]) for r in top}
    kref = ray.put(np.sort(keys))

    def partial(t: pa.Table) -> pa.Table:
        kset = ray.get(kref)
        p = t.column(parent_key).to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(p, kset)
        if not m.any():
            return pa.table({parent_key: pa.array([], type=pa.int64()),
                             child_id: pa.array([], type=pa.int64()),
                             "child_score": pa.array([], type=pa.float64())})
        p = p[m]
        c = t.column(child_id).to_numpy(zero_copy_only=False).astype(
            np.int64)[m]
        s = t.column(score_col).to_numpy(zero_copy_only=False).astype(
            np.float64)[m]
        # (parent asc, score desc, child asc) → first docs_per_group per run
        order = np.lexsort((c, -s, p))
        ps = p[order]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        run_id = np.cumsum(np.r_[True, ps[1:] != ps[:-1]]) - 1
        within = np.arange(ps.size) - starts[run_id]
        keep = order[within < docs_per_group]
        return pa.table({parent_key: pa.array(p[keep], type=pa.int64()),
                         child_id: pa.array(c[keep], type=pa.int64()),
                         "child_score": pa.array(s[keep], type=pa.float64())})

    # bounded-collect: ≤ docs_per_group × |keys| candidate rows per batch
    cand = children.map_batches(partial, batch_format="pyarrow").take_all()
    per_parent: dict[int, list[tuple[float, int]]] = {int(k): [] for k in keys}
    for r in cand:
        per_parent[int(r[parent_key])].append(
            (float(r["child_score"]), int(r[child_id])))
    out = {parent_key: [], "parent_score": [], "group_hits": [],
           "child_rank": [], child_id: [], "child_score": []}
    for k in keys:  # already (score desc, key asc) ordered
        k = int(k)
        chosen = sorted(per_parent[k], key=lambda t: (-t[0], t[1]))
        for rank, (cs, cid) in enumerate(chosen[:docs_per_group], 1):
            out[parent_key].append(k)
            out["parent_score"].append(pscore[k])
            out["group_hits"].append(ghits[k])
            out["child_rank"].append(rank)
            out[child_id].append(cid)
            out["child_score"].append(cs)
    return pa.table({
        parent_key: pa.array(out[parent_key], type=pa.int64()),
        "parent_score": pa.array(out["parent_score"], type=pa.float64()),
        "group_hits": pa.array(out["group_hits"], type=pa.int64()),
        "child_rank": pa.array(out["child_rank"], type=pa.int64()),
        child_id: pa.array(out[child_id], type=pa.int64()),
        "child_score": pa.array(out["child_score"], type=pa.float64()),
    })


def child_block_join(children_ds, parent_keys, child_key: str):
    """ToChildBlockJoinQuery analog (``Join/ToChildBlockJoinQuery.cs``):
    a parent-side match propagates DOWN — every child whose parent key is
    in the matching set survives (each child inherits its parent's
    match/score; the reference walks the block from the parent bit set).

    Ray shape: the matching parents' keys are the broadcast small side
    (``ray.put`` once, one vectorized ``np.isin`` per batch) — the same
    no-shuffle semi-join contract as JoinUtil; at parent cardinalities
    that outgrow a broadcast, swap in the hash-partitioned join, same as
    semi_join's documented fallback."""
    import numpy as np
    import ray

    kref = ray.put(np.sort(np.asarray(parent_keys, dtype=np.int64)))

    def fil(batch: pa.Table) -> pa.Table:
        keys = ray.get(kref)
        vals = batch.column(child_key).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(np.isin(vals, keys)))

    return children_ds.map_batches(fil, batch_format="pyarrow")
