"""Session co-occurrence (co-click) pair mining — the training-pair
extraction behind item2vec / session-based recommenders (Barkan &
Koenigstein 2016 item2vec treats a session's item set as a window; the
classic "customers also viewed" signal): two items co-occurring in the
same user session form one positive pair, counted once per session.

Semantics (mirrored by the SQL oracle): sessions are the 30-minute-gap
splits of ops/sessions.py (time order, event_id tie-break); an item is
the ``props`` JSON ``k`` field; within a session, each unordered pair of
DISTINCT items counts once (dup events of an item in one session do not
inflate the pair). Output: top-k pairs by (sessions desc, a asc, b asc).

Distributed shape: ONE ``groupby(user_id)`` (the sessionize shuffle —
user is the natural key and the pair explode is bounded by a session's
distinct-item count squared), batch-local integer pair combine inside
the group, ONE ``groupby(a, b)`` finalize over the item²-bounded pair
stream. Per-user event skew bounds as in ops/sessions.py.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.sessions import SESSION_GAP_US


def _pairs_for_user(t: pa.Table, gap_us: int) -> pa.Table:
    ts = t.column("ts").cast(pa.int64()).to_numpy()
    eid = t.column("event_id").to_numpy()
    items = np.asarray([int(json.loads(p or "{}").get("k", 0))
                        for p in t.column("props").to_pylist()],
                       dtype=np.int64)
    order = np.lexsort((eid, ts))
    ts, items = ts[order], items[order]
    gaps = np.diff(ts) > gap_us
    starts = np.concatenate(([0], np.flatnonzero(gaps) + 1))
    ends = np.concatenate((starts[1:], [len(ts)]))
    pair_counts: dict[tuple[int, int], int] = {}
    for s, e in zip(starts, ends):
        uniq = np.unique(items[s:e])
        if len(uniq) < 2:
            continue
        ii, jj = np.triu_indices(len(uniq), 1)
        for a, b in zip(uniq[ii].tolist(), uniq[jj].tolist()):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    ks = sorted(pair_counts)
    return pa.table({
        "a": pa.array([k[0] for k in ks], type=pa.int64()),
        "b": pa.array([k[1] for k in ks], type=pa.int64()),
        "cnt": pa.array([pair_counts[k] for k in ks], type=pa.int64()),
    })


def session_pairs_topk(ds, k: int = 25,
                       gap_us: int = SESSION_GAP_US) -> pa.Table:
    """(item_a, item_b, n_sessions) top-k by (n_sessions desc, a, b)."""
    import functools

    agg = (ds.groupby("user_id").map_groups(
        functools.partial(_pairs_for_user, gap_us=gap_us),
        batch_format="pyarrow")
        .groupby(["a", "b"]).sum("cnt").to_pandas())
    agg = agg.sort_values(["sum(cnt)", "a", "b"],
                          ascending=[False, True, True]).head(k)
    return pa.table({
        "item_a": pa.array(agg["a"].to_numpy(dtype=np.int64)),
        "item_b": pa.array(agg["b"].to_numpy(dtype=np.int64)),
        "n_sessions": pa.array(agg["sum(cnt)"].to_numpy(dtype=np.int64)),
    })


def butterfly_counts(ds) -> pa.Table:
    """Bipartite butterfly ((2,2)-biclique) counting over the user-item
    engagement graph (Sanei-Mehri, Sariyüce & Tirthapura, KDD'18: the
    bipartite clustering motif behind co-engagement spam/community
    signals): one row (n_edges, n_item_pairs, n_butterflies) with

        butterflies = Σ_pairs C(c_p, 2)

    where c_p = common users of an unordered item pair. Exact-integer
    wedge formulation: distinct (user, item) edges via ONE groupby, item
    pairs per user via ONE groupby(user) (explode bounded by a user's
    distinct-item degree squared), pair-support counts via ONE
    groupby(pair), then an integer fold — each stage pre-combined."""
    import json

    import ray

    def edge_rows(t: pa.Table) -> pa.Table:
        users = t.column("user_id").to_pylist()
        items = [int(json.loads(p or "{}").get("k", 0))
                 for p in t.column("props").to_pylist()]
        seen = sorted(set(zip(users, items)))
        return pa.table({
            "u": pa.array([a for a, _b in seen], type=pa.int64()),
            "it": pa.array([b for _a, b in seen], type=pa.int64()),
        })

    edges = (ds.map_batches(edge_rows, batch_format="pyarrow")
             .groupby(["u", "it"]).count().materialize())
    n_edges = edges.count()

    def wedge_rows(group: pa.Table) -> pa.Table:
        its = np.unique(group.column("it").to_numpy(zero_copy_only=False))
        if len(its) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        ii, jj = np.triu_indices(len(its), 1)
        return pa.table({"a": pa.array(its[ii], type=pa.int64()),
                         "b": pa.array(its[jj], type=pa.int64())})

    pair_counts = (edges.groupby("u")
                   .map_groups(wedge_rows, batch_format="pyarrow")
                   .groupby(["a", "b"]).count())
    n_pairs = 0
    n_bf = 0
    for ref in pair_counts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows and "count()" in t.schema.names:
            c = t.column("count()").to_numpy(zero_copy_only=False)
            n_pairs += len(c)
            n_bf += int((c * (c - 1) // 2).sum())
    return pa.table({
        "n_edges": pa.array([n_edges], type=pa.int64()),
        "n_item_pairs": pa.array([n_pairs], type=pa.int64()),
        "n_butterflies": pa.array([n_bf], type=pa.int64()),
    })
