"""Cohort retention + exact distributed quantiles over the events table —
the product-analytics pair every event pipeline ships (cohort tables:
Kohavi et al., "Trustworthy Online Controlled Experiments" §21; exact
rank-select quantiles instead of approximate sketches when the value
domain is bounded).

Both ops are exact at any parallelism:

- :func:`cohort_retention` — cohort(u) = day index of u's first event;
  a (cohort_day, day_offset) cell counts DISTINCT users active
  day_offset days after their cohort day. Shape: one
  ``groupby(user_id).min(ts)`` (users ≪ events), broadcast the
  user→cohort map via ``ray.put``, then one distinct-pair groupby —
  the events stream is read once, never collected.

- :func:`value_quantiles` — exact discrete quantiles per event_type via
  the distinct-value histogram: ONE ``groupby(event_type, value).count``
  bounds driver state by |distinct values| (the corpus stream never
  lands on the driver), then the driver rank-selects the k-th smallest
  with k = floor((n-1) * q) + 1 — the same scale-safe exact-quantile
  shape as ops/lm_quality.lm_perplexity_buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EPOCH = np.datetime64("2024-01-01", "D")


def _day_idx(ts: np.ndarray) -> np.ndarray:
    """timestamp[us] array → int64 day index since the corpus epoch."""
    return (ts.astype("datetime64[D]") - _EPOCH).astype(np.int64)


def cohort_retention(ds) -> pa.Table:
    """(cohort_day, day_offset, n_users) — distinct users per cell,
    (cohort_day, day_offset)-sorted."""
    import ray

    first = (ds.map_batches(
        lambda t: pa.table({"user_id": t.column("user_id"),
                            "ts": t.column("ts")}),
        batch_format="pyarrow")
        .groupby("user_id").min("ts").to_pandas())
    cohort = dict(zip(
        first["user_id"].tolist(),
        _day_idx(first["min(ts)"].to_numpy()).tolist()))
    cref = ray.put(cohort)

    def cells(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        days = _day_idx(t.column("ts").to_numpy(zero_copy_only=False))
        coh = np.asarray([cm[int(u)] for u in users], dtype=np.int64)
        return pa.table({
            "cohort_day": pa.array(coh, type=pa.int64()),
            "day_offset": pa.array(days - coh, type=pa.int64()),
            "user_id": pa.array(users.astype(np.int64), type=pa.int64()),
        })

    agg = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby(["cohort_day", "day_offset", "user_id"]).count()
             .groupby(["cohort_day", "day_offset"]).count().to_pandas())
    agg = agg.sort_values(["cohort_day", "day_offset"])
    return pa.table({
        "cohort_day": pa.array(agg["cohort_day"].to_numpy(dtype=np.int64)),
        "day_offset": pa.array(agg["day_offset"].to_numpy(dtype=np.int64)),
        "n_users": pa.array(agg["count()"].to_numpy(dtype=np.int64)),
    })


QUANTILES = (50, 90, 99)


def value_quantiles(ds, qs: tuple[int, ...] = QUANTILES) -> pa.Table:
    """(event_type, q, value) exact discrete quantiles of `value` per
    event_type: the k-th smallest with k = floor((n-1) * q/100) + 1
    (1-based) — selected from the distinct-value histogram."""
    hist = (ds.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "value": t.column("value")}),
        batch_format="pyarrow")
        .groupby(["event_type", "value"]).count().to_pandas())
    out_t, out_q, out_v = [], [], []
    for et, grp in hist.groupby("event_type"):
        g = grp.sort_values("value")
        vals = g["value"].to_numpy()
        cnt = g["count()"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        for q in qs:
            k = (n - 1) * q // 100 + 1
            v = vals[int(np.searchsorted(cum, k))]
            out_t.append(et)
            out_q.append(q)
            out_v.append(float(v))
    order = sorted(range(len(out_t)), key=lambda i: (out_t[i], out_q[i]))
    return pa.table({
        "event_type": pa.array([out_t[i] for i in order], type=pa.string()),
        "q": pa.array([out_q[i] for i in order], type=pa.int64()),
        "value": pa.array([out_v[i] for i in order], type=pa.float64()),
    })


def props_extract_stats(ds) -> pa.Table:
    """Semi-structured (JSON) column extraction + rollup — the
    schema-on-read pass event pipelines run before any typed analytics:
    parse ``props`` JSON per row, bucket the numeric field (k // 10), and
    aggregate (event_type, k_bucket) cells with exact integer sums
    (value centi-scaled via round(value*100) — both engine and SQL
    compute it from the SAME stored double, so distribution order can't
    move a bit).

    Shape: stateless vectorized-ish parse inside ONE ``map_batches``
    emitting per-batch partial cells (the combiner: cells ≪ rows), one
    tiny groupby finalize. Returns (event_type, k_bucket, n_events,
    value_centi_sum) sorted."""
    import json

    def cells(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pylist()
        props = t.column("props").to_pylist()
        vals = t.column("value").to_numpy(zero_copy_only=False)
        centi = np.rint(vals * 100).astype(np.int64)
        agg: dict = {}
        for e, p, c in zip(et, props, centi.tolist()):
            k = int(json.loads(p or "{}").get("k", 0))
            key = (e, k // 10)
            n, s = agg.get(key, (0, 0))
            agg[key] = (n + 1, s + c)
        ks = sorted(agg)
        return pa.table({
            "event_type": pa.array([k[0] for k in ks], type=pa.string()),
            "k_bucket": pa.array([k[1] for k in ks], type=pa.int64()),
            "n_events": pa.array([agg[k][0] for k in ks], type=pa.int64()),
            "value_centi_sum": pa.array([agg[k][1] for k in ks],
                                        type=pa.int64()),
        })

    agg = (ds.map_batches(cells, batch_format="pyarrow")
           .groupby(["event_type", "k_bucket"])
           .sum(["n_events", "value_centi_sum"]).to_pandas())
    agg = agg.sort_values(["event_type", "k_bucket"])
    return pa.table({
        "event_type": pa.array(agg["event_type"].tolist(),
                               type=pa.string()),
        "k_bucket": pa.array(agg["k_bucket"].to_numpy(dtype=np.int64)),
        "n_events": pa.array(
            agg["sum(n_events)"].to_numpy(dtype=np.int64)),
        "value_centi_sum": pa.array(
            agg["sum(value_centi_sum)"].to_numpy(dtype=np.int64)),
    })


def rate_anomalies(ds, ts_col: str = "ts") -> pa.Table:
    """Hourly event-rate anomaly detection by the 3-sigma rule — EXACT
    in integers: hour h is anomalous iff (c_h·H - T)² > 9·(H·SS - T²)
    where H = #hours with events, T = Σc, SS = Σc² — the z² > 9
    inequality cross-multiplied by H² so no float mean/variance enters.
    ONE groupby(hour).count; the driver sees the |hours| aggregate.

    Returns (hour_ts, n_events, is_high) for anomalous hours,
    hour-sorted; is_high = 1 when above the mean (spike) else 0 (dip)."""
    import numpy as np

    def hour_partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        hour = (ts // 3_600_000_000) * 3_600_000_000
        uniq, cnt = np.unique(hour, return_counts=True)
        return pa.table({"hour": pa.array(uniq, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    hist = (ds.map_batches(hour_partial, batch_format="pyarrow")
            .groupby("hour").sum("n").to_pandas())
    c = hist["sum(n)"].to_numpy(dtype=np.int64)
    h = np.sort(hist["hour"].to_numpy(dtype=np.int64))
    order = np.argsort(hist["hour"].to_numpy(dtype=np.int64))
    c = c[order]
    H = len(c)
    T = int(c.sum())
    SS = int((c.astype(object) ** 2).sum())
    lhs = (c.astype(object) * H - T) ** 2
    rhs = 9 * (H * SS - T * T)
    mask = np.asarray([bool(a > rhs) for a in lhs])
    return pa.table({
        "hour_ts": pa.array(h[mask], type=pa.int64()).cast(
            pa.timestamp("us")),
        "n_events": pa.array(c[mask], type=pa.int64()),
        "is_high": pa.array(
            (c[mask].astype(object) * H > T).astype(np.int64)),
    })


def daily_distinct_users(ds, ts_col: str = "ts",
                         user_col: str = "user_id") -> pa.Table:
    """(day_ts, n_users) — exact distinct users per UTC day: per-batch
    distinct (day, user) combine, ONE groupby dedup, tiny per-day count
    fold (the exact form of the windowed-cardinality report; the HLL
    sibling `hll_distinct` is the sketch path)."""
    import numpy as np

    def pairs(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = (ts // 86_400_000_000) * 86_400_000_000
        u = t.column(user_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # batch-local exact combine on (day, user)
        import pandas as pd

        df = pd.DataFrame({"day": day, "user": u}).drop_duplicates()
        return pa.table({"day": pa.array(df["day"].to_numpy(np.int64)),
                         "user": pa.array(df["user"].to_numpy(np.int64))})

    def fold(t: pa.Table) -> pa.Table:
        import numpy as np

        d = t.column("day").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(uniq, type=pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(pairs, batch_format="pyarrow")
           .groupby(["day", "user"]).count()
           .map_batches(fold, batch_format="pyarrow")
           .groupby("day").sum("n").to_pandas())
    agg = agg.sort_values("day").reset_index(drop=True)
    return pa.table({
        "day_ts": pa.array(agg["day"].to_numpy(np.int64)).cast(
            pa.timestamp("us")),
        "n_users": pa.array(agg["sum(n)"].to_numpy(np.int64)),
    })
