"""Event sessionization: gap-based session assignment over an event log.

The classic training-data / clickstream primitive (no reference analog —
SURVEY §2.11 bonus family, like events_window): events keyed by user are
split into sessions wherever the inter-event gap exceeds a threshold, then
aggregated per session.

Ray shape: ONE hash shuffle (`groupby(user_id).map_groups`) — user_id is
the natural partitioning key and stays reusable downstream; inside each
group everything is vectorized numpy (argsort + diff + cumsum), no per-row
Python. Skew is bounded by the max events of a single user (a single
group must fit a worker's heap — at web scale, cap per-user events
upstream or sub-window by day first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def sessionize_group(t: pa.Table, gap_us: int = SESSION_GAP_US) -> pa.Table:
    """One user's events → per-session rows (session_id is the user-local
    0-based ordinal in time order; ties broken by event_id so the split
    is deterministic)."""
    uid = t.column("user_id")[0].as_py()
    ts = t.column("ts").cast(pa.int64()).to_numpy()
    eid = t.column("event_id").to_numpy()
    order = np.lexsort((eid, ts))
    ts = ts[order]
    gaps = np.diff(ts) > gap_us
    # per-session boundaries: first index of each session
    starts = np.concatenate(([0], np.flatnonzero(gaps) + 1))
    ends = np.concatenate((starts[1:], [len(ts)]))
    return pa.table({
        "user_id": pa.array(np.full(len(starts), uid, dtype=np.int64)),
        "session_id": pa.array(np.arange(len(starts), dtype=np.int64)),
        "start_us": pa.array(ts[starts], type=pa.int64()),
        "end_us": pa.array(ts[ends - 1], type=pa.int64()),
        "n_events": pa.array((ends - starts).astype(np.int64)),
    })


def sessionize(ds, gap_us: int = SESSION_GAP_US):
    """events Dataset (event_id, ts, user_id) → session table Dataset."""
    import functools

    return ds.groupby("user_id").map_groups(
        functools.partial(sessionize_group, gap_us=gap_us),
        batch_format="pyarrow")


def session_path_trigrams(ds, k: int = 10,
                          gap_us: int = SESSION_GAP_US) -> pa.Table:
    """Top-k event-type trigrams WITHIN sessions — the product-analytics
    "path analysis" report (the n-gram-over-clickstream formulation of
    sequential pattern mining; cf. Agrawal & Srikant ICDE'95 sequence
    mining, restricted to contiguous length-3 paths): events sorted by
    (ts, event_type) per user, split at the 30-min inactivity gap (the
    sessionize rule), adjacent triples counted.

    Shape: ONE groupby(user) map_groups (user history is the natural
    partition) emitting per-group partial trigram counts, ONE tiny
    trigram-type-bounded groupby, (count desc, trigram asc) top-k."""
    import functools

    import numpy as np

    def tri_group(t: pa.Table, gap_us=gap_us) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "ts": t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64),
            "ev": t.column("event_type").to_pylist(),
        }).sort_values(["ts", "ev"], kind="stable")
        ts = df["ts"].to_numpy()
        ev = df["ev"].to_list()
        sess = np.concatenate(
            ([0], np.cumsum(np.diff(ts) > gap_us))) if len(ts) else \
            np.asarray([], dtype=np.int64)
        cnt: dict[str, int] = {}
        for i in range(len(ev) - 2):
            if sess[i] == sess[i + 1] == sess[i + 2]:
                g = ev[i] + ">" + ev[i + 1] + ">" + ev[i + 2]
                cnt[g] = cnt.get(g, 0) + 1
        ks = sorted(cnt)
        return pa.table({
            "trigram": pa.array(ks, type=pa.string()),
            "n": pa.array([cnt[x] for x in ks], type=pa.int64()),
        })

    agg = (ds.groupby("user_id")
           .map_groups(functools.partial(tri_group),
                       batch_format="pyarrow")
           .groupby("trigram").sum("n").to_pandas())
    agg = agg.rename(columns={"sum(n)": "n"})
    agg = agg.sort_values(["n", "trigram"],
                          ascending=[False, True]).head(k)
    agg["n"] = agg["n"].astype("int64")
    agg = agg.reset_index(drop=True)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg, preserve_index=False)
