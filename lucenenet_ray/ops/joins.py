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
            .limit(k).take_all())
    return pa.table({
        parent_key: pa.array([r[parent_key] for r in rows]),
        "score": pa.array([r["score"] for r in rows]),
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
