"""OLAP-style relational ops over the TPC-H-ish tables — the warehouse
workloads a data platform runs NEXT TO the text pipelines (and the
reason the fixture ships ``lineitem``/``orders`` at all):

- ``pricing_summary``: the TPC-H Q1 shape (group lineitem by
  (returnflag, linestatus); quantity/price/discount/charge rollups).
  Money math follows the repo's exact-integer rule: doubles become
  cents via ``floor(x*100 + 0.5)`` (half-up — np.rint is half-EVEN and
  DuckDB round() is half-away; floor(+0.5) is identical in both), so
  discount/charge products and every sum are integers at fixed scales
  (cents, 10^-4 dollars, 10^-6 dollars) and distribution order cannot
  move a bit.

- ``table_profile``: schema-on-read column profiler (the data-quality
  pass before any pipeline touches a new drop): per column — declared
  type, row count, null count, and min/max for int64 columns (other
  types' extrema are format-ambiguous across engines and intentionally
  reported NULL; the declared-type string still pins the schema).

Scale shape: both are ONE map_batches pass of per-batch partials (the
combiner) + ONE tiny groupby/fold — the canonical pre-aggregate-then-
shuffle discipline; group cardinality is bounded (|flags|×|status|,
|columns|), never row-bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _cents(x: np.ndarray, scale: int = 100) -> np.ndarray:
    return np.floor(x * scale + 0.5).astype(np.int64)


def pricing_summary(ds) -> pa.Table:
    """(l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_e4, sum_charge_e6, count_order), key-sorted."""
    def partial(t: pa.Table) -> pa.Table:
        rf = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        ls = np.asarray(t.column("l_linestatus").to_pylist(), dtype=object)
        qty = _cents(t.column("l_quantity").to_numpy(
            zero_copy_only=False), 1)
        ep = _cents(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False))
        di = _cents(t.column("l_discount").to_numpy(zero_copy_only=False))
        tx = _cents(t.column("l_tax").to_numpy(zero_copy_only=False))
        disc = ep * (100 - di)          # 10^-4 dollars
        charge = disc * (100 + tx)      # 10^-6 dollars
        key = np.char.add(np.char.add(rf.astype(str), "\x1f"),
                          ls.astype(str))
        uniq, inv = np.unique(key, return_inverse=True)
        def fold(v):
            s = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(s, inv, v)
            return s
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, 1)
        sp = np.char.partition(uniq, "\x1f")
        return pa.table({
            "l_returnflag": pa.array(sp[:, 0], type=pa.string()),
            "l_linestatus": pa.array(sp[:, 2], type=pa.string()),
            "sum_qty": pa.array(fold(qty)),
            "sum_base_cents": pa.array(fold(ep)),
            "sum_disc_e4": pa.array(fold(disc)),
            "sum_charge_e6": pa.array(fold(charge)),
            "count_order": pa.array(cnt),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .sum(["sum_qty", "sum_base_cents", "sum_disc_e4",
                 "sum_charge_e6", "count_order"])
           .to_pandas())
    agg = agg.rename(columns={f"sum({c})": c for c in (
        "sum_qty", "sum_base_cents", "sum_disc_e4", "sum_charge_e6",
        "count_order")})
    agg = agg.sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)
    for c in ("sum_qty", "sum_base_cents", "sum_disc_e4",
              "sum_charge_e6", "count_order"):
        agg[c] = agg[c].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


def table_profile(ds, type_names: dict[str, str]) -> pa.Table:
    """(column, dtype, n_rows, n_nulls, min_int, max_int) per column,
    column-sorted; min/max populated only for int64 columns."""
    cols = sorted(type_names)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rows = {"column": [], "n_rows": [], "n_nulls": [],
                "min_int": [], "max_int": []}
        for c in cols:
            col = t.column(c)
            rows["column"].append(c)
            rows["n_rows"].append(len(col))
            rows["n_nulls"].append(col.null_count)
            if type_names[c] == "int64" and len(col) > col.null_count:
                mm = pc.min_max(col).as_py()
                rows["min_int"].append(mm["min"])
                rows["max_int"].append(mm["max"])
            else:
                rows["min_int"].append(None)
                rows["max_int"].append(None)
        return pa.table({
            "column": pa.array(rows["column"], type=pa.string()),
            "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
            "n_nulls": pa.array(rows["n_nulls"], type=pa.int64()),
            "min_int": pa.array(rows["min_int"], type=pa.int64()),
            "max_int": pa.array(rows["max_int"], type=pa.int64()),
        })

    df = (ds.map_batches(partial, batch_format="pyarrow").to_pandas())
    g = df.groupby("column").agg(
        n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum"),
        min_int=("min_int", "min"), max_int=("max_int", "max")
    ).reset_index().sort_values("column").reset_index(drop=True)
    g.insert(1, "dtype", g["column"].map(type_names))
    for c in ("n_rows", "n_nulls"):
        g[c] = g[c].astype(np.int64)
    for c in ("min_int", "max_int"):
        g[c] = g[c].astype("Int64")
    return pa.Table.from_pandas(g, preserve_index=False)
