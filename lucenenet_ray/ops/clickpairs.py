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
