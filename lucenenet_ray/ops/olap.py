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


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-15", k: int = 10) -> pa.Table:
    """TPC-H Q3 shape: revenue per urgent order — customer(segment) ⋈
    orders(o_orderdate < cutoff) ⋈ lineitem(l_shipdate > cutoff), top-k
    orders by (revenue desc, o_orderdate asc, l_orderkey asc).

    Star-join shape: the qualifying customer keys and the filtered
    orders map ride broadcast (dimension altitude; past ~10^8 keys the
    documented escalation is the revenue_by_nation big-big combiner
    join); lineitem — the fact table — streams through ONE combiner
    pass + ONE groupby(orderkey), never materialized."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    cut = np.datetime64(cutoff, "us")
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"]).to_arrow_refs()
    ckeys = set()
    for ref in cust:
        t = ray.get(ref)
        seg = np.asarray(t.column("c_mktsegment").to_pylist(), dtype=object)
        kk = t.column("c_custkey").to_numpy(zero_copy_only=False)
        ckeys.update(kk[seg == segment].tolist())

    omap: dict[int, int] = {}
    for ref in rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
            .to_arrow_refs():
        t = ray.get(ref)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        oc = t.column("o_custkey").to_numpy(zero_copy_only=False)
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        m = (od < cut) & np.isin(oc, np.fromiter(ckeys, dtype=np.int64))
        for a, b in zip(ok[m].tolist(), od[m].astype(np.int64).tolist()):
            omap[a] = b
    # workers need only MEMBERSHIP — ship the sorted key array once;
    # the orderkey→date dict never leaves the driver (date attach is a
    # k-scale post-aggregation join)
    kref = ray.put(np.sort(np.fromiter(omap.keys(), dtype=np.int64))
                   if omap else np.asarray([], dtype=np.int64))

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(kref)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        ep = _cents(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False))
        di = _cents(t.column("l_discount").to_numpy(zero_copy_only=False))
        m = (sd > cut) & np.isin(ok, keys)
        if not m.any():
            return pa.table({"l_orderkey": pa.array([], type=pa.int64()),
                             "rev": pa.array([], type=pa.int64())})
        rev = (ep * (100 - di))[m]
        uniq, inv = np.unique(ok[m], return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"l_orderkey": pa.array(uniq, type=pa.int64()),
                         "rev": pa.array(s)})

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("l_orderkey").sum("rev").to_pandas())
    agg = agg.rename(columns={"sum(rev)": "revenue_e4"})
    agg["o_orderdate"] = agg["l_orderkey"].map(omap)
    agg = agg.sort_values(["revenue_e4", "o_orderdate", "l_orderkey"],
                          ascending=[False, True, True]).head(k)
    out = pa.table({
        "l_orderkey": pa.array(agg["l_orderkey"].to_numpy(dtype=np.int64)),
        "revenue_e4": pa.array(agg["revenue_e4"].to_numpy(dtype=np.int64)),
        "o_orderdate": pa.array(agg["o_orderdate"].to_numpy(
            dtype=np.int64)).cast(pa.timestamp("us")),
    })
    return out


def region_supplier_volume(sf_dir: str, region: str = "ASIA",
                           year: int = 1997) -> pa.Table:
    """TPC-H Q5 shape: revenue per nation for orders placed in ``year``
    where customer and supplier share a nation inside ``region`` —
    (n_name, revenue_e4) by (revenue desc, n_name asc).

    All four dimension maps (region→nations, supplier→nation,
    customer→nation, qualifying orders→customer) broadcast once;
    lineitem streams through one combiner pass + ONE 25-row groupby."""
    import os

    import numpy as np
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq2

    reg = pq2.read_table(os.path.join(sf_dir, "region.parquet"))
    rkey = {r["r_regionkey"] for r in reg.to_pylist()
            if r["r_name"] == region}
    nat = pq2.read_table(os.path.join(sf_dir, "nation.parquet"))
    n_name = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
              if r["n_regionkey"] in rkey}
    sup = pq2.read_table(os.path.join(sf_dir, "supplier.parquet"))
    smap = {r["s_suppkey"]: r["s_nationkey"] for r in sup.to_pylist()}
    cmap: dict[int, int] = {}
    for ref in rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"]).to_arrow_refs():
        t = ray.get(ref)
        cmap.update(zip(t.column("c_custkey").to_pylist(),
                        t.column("c_nationkey").to_pylist()))
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")
    omap: dict[int, int] = {}
    for ref in rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
            .to_arrow_refs():
        t = ray.get(ref)
        ok = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        oc = t.column("o_custkey").to_numpy(zero_copy_only=False)
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        m = (od >= lo) & (od < hi)
        for a, b in zip(ok[m].tolist(), oc[m].tolist()):
            omap[a] = b
    # aligned sorted-key arrays: the fact-table partial is pure
    # searchsorted/compare kernels — no per-row Python on the hot path
    def _aligned(d: dict) -> tuple[np.ndarray, np.ndarray]:
        ks = np.asarray(sorted(d), dtype=np.int64)
        return ks, np.asarray([d[int(x)] for x in ks], dtype=np.int64)

    okeys, ocust = _aligned(omap)
    ckeys, cnat = _aligned(cmap)
    skeys, snat = _aligned(smap)
    region_nats = np.asarray(sorted(n_name), dtype=np.int64)
    name_of = dict(n_name)
    bref = ray.put((okeys, ocust, ckeys, cnat, skeys, snat, region_nats))

    def _lookup(keys: np.ndarray, vals: np.ndarray,
                q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        i = np.searchsorted(keys, q)
        i[i >= keys.size] = 0 if keys.size else 0
        ok = keys.size > 0
        valid = (keys[i] == q) if ok else np.zeros(q.size, dtype=bool)
        return (vals[i] if ok else np.zeros(q.size, dtype=np.int64)), valid

    def partial(t: pa.Table) -> pa.Table:
        okeys, ocust, ckeys, cnat, skeys, snat, rn = ray.get(bref)
        ok = t.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ep = _cents(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False))
        di = _cents(t.column("l_discount").to_numpy(zero_copy_only=False))
        rev = ep * (100 - di)
        cu, vo = _lookup(okeys, ocust, ok)
        cn, vc = _lookup(ckeys, cnat, cu)
        sn, vs = _lookup(skeys, snat, sk)
        m = vo & vc & vs & (cn == sn) & np.isin(cn, rn)
        if not m.any():
            return pa.table({"nat": pa.array([], type=pa.int64()),
                             "rev": pa.array([], type=pa.int64())})
        uniq, inv = np.unique(cn[m], return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, rev[m])
        return pa.table({"nat": pa.array(uniq, type=pa.int64()),
                         "rev": pa.array(sums)})

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("nat").sum("rev").to_pandas())
    agg = agg.rename(columns={"sum(rev)": "revenue_e4"})
    agg["n_name"] = agg["nat"].map(name_of)
    agg = agg[["n_name", "revenue_e4"]]
    agg = agg.sort_values(["revenue_e4", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    agg["revenue_e4"] = agg["revenue_e4"].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


def segment_order_stats(sf_dir: str) -> pa.Table:
    """(c_mktsegment, n_orders, median_cents, p90_cents) per market
    segment — EXACT order statistics via the distinct-value-histogram
    rank-select shape (the lm_buckets / events_quantiles pattern: the
    driver sees one row per DISTINCT price, never per order).  median =
    smallest value whose cumulative count*2 >= n; p90 = smallest value
    whose cumulative count*10 >= 9*n (cross-multiplied integer rank
    rules — no float quantile definition ambiguity)."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    cmap: dict[int, str] = {}
    for ref in rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"]).to_arrow_refs():
        t = ray.get(ref)
        cmap.update(zip(t.column("c_custkey").to_pylist(),
                        t.column("c_mktsegment").to_pylist()))
    cref = ray.put(cmap)

    def partial(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        ck = t.column("o_custkey").to_pylist()
        price = _cents(t.column("o_totalprice").to_numpy(
            zero_copy_only=False))
        # inner-join semantics: orders with no customer match are DROPPED
        # (matching the oracle's JOIN — ADVICE r3: the previous ''-segment
        # bucket diverged if referential integrity ever broke)
        seg_list = [cm.get(c) for c in ck]
        matched = np.asarray([s is not None for s in seg_list], dtype=bool)
        if not matched.all():
            price = price[matched]
            seg_list = [s for s in seg_list if s is not None]
        segs = np.asarray(seg_list, dtype=object)
        if segs.size == 0:
            return pa.table({"seg": pa.array([], type=pa.string()),
                             "cents": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        key = np.char.add(np.char.add(segs.astype(str), "\x1f"),
                          np.char.mod("%012d", price))
        uniq, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(uniq, "\x1f")
        return pa.table({
            "seg": pa.array(sp[:, 0], type=pa.string()),
            "cents": pa.array([int(x) for x in sp[:, 2]],
                              type=pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    hist = (rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["seg", "cents"]).sum("cnt").to_pandas())
    hist = hist.rename(columns={"sum(cnt)": "cnt"})

    import pandas as pd

    rows = []
    for seg, g in hist.groupby("seg"):
        g = g.sort_values("cents")
        c = g["cnt"].to_numpy(dtype=np.int64)
        v = g["cents"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        med = int(v[np.searchsorted(cum * 2, n, side="left")])
        p90 = int(v[np.searchsorted(cum * 10, 9 * n, side="left")])
        rows.append((seg, n, med, p90))
    rows.sort()
    df = pd.DataFrame(rows, columns=["c_mktsegment", "n_orders",
                                     "median_cents", "p90_cents"])
    for c in ("n_orders", "median_cents", "p90_cents"):
        df[c] = df[c].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def cold_parts(sf_dir: str, k: int = 20) -> pa.Table:
    """(p_partkey, p_brand, n_refs) — the k LEAST-referenced parts
    (n_refs asc, partkey asc): the slow-mover/dead-stock report.  ONE
    distinct-partkey count groupby over the fact table; the per-part
    count map broadcasts at dimension altitude (bounded by |part|) and
    the part table stream-joins against it with per-batch partial
    bottom-k."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    seen = (rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                            columns=["l_partkey"])
            .groupby("l_partkey").count().to_pandas())
    cmap = dict(zip(seen["l_partkey"].astype(np.int64),
                    seen["count()"].astype(np.int64)))
    cref = ray.put(cmap)

    def score(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        refs = np.asarray([cm.get(int(x), 0) for x in pk],
                          dtype=np.int64)
        tt = t.append_column("n_refs", pa.array(refs))
        if tt.num_rows <= k:
            return tt
        order = np.lexsort((pk, refs))[:k]
        return tt.take(order)

    out = (rd.read_parquet(os.path.join(sf_dir, "part.parquet"),
                           columns=["p_partkey", "p_brand"])
           .map_batches(score, batch_format="pyarrow")
           .to_pandas())
    out = out.sort_values(["n_refs", "p_partkey"]).head(k) \
        .reset_index(drop=True)
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["n_refs"] = out["n_refs"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def order_count_distribution(sf_dir: str) -> pa.Table:
    """TPC-H Q13 shape: (n_orders, n_customers) — how many customers
    placed exactly N orders, INCLUDING the zero-order customers (the
    LEFT-JOIN subtlety Q13 exists to test).  One groupby(custkey) count
    over orders, a tiny count-of-counts histogram groupby, and the
    zero bucket derived from |customer| minus the customers seen —
    no join materializes customers against orders at all."""
    import os

    import numpy as np
    import pyarrow.parquet as pq2
    import ray.data as rd

    per_cust = (rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                columns=["o_custkey"])
                .groupby("o_custkey").count())

    def hist_partial(t: pa.Table) -> pa.Table:
        c = t.column("count()").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.table({"n_orders": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    hist = (per_cust.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("n_orders").sum("n").to_pandas())
    hist = hist.rename(columns={"sum(n)": "n_customers"})
    n_cust = pq2.read_metadata(
        os.path.join(sf_dir, "customer.parquet")).num_rows
    n_with = int(hist["n_customers"].sum())

    import pandas as pd

    if n_cust > n_with:
        hist = pd.concat([pd.DataFrame(
            [{"n_orders": 0, "n_customers": n_cust - n_with}]), hist])
    hist = hist.sort_values("n_orders").reset_index(drop=True)
    for c in ("n_orders", "n_customers"):
        hist[c] = hist[c].astype(np.int64)
    return pa.Table.from_pandas(hist, preserve_index=False)


def top_priority_per_segment(sf_dir: str) -> pa.Table:
    """(c_mktsegment, o_orderpriority, n_orders) — the modal order
    priority per market segment (per-group argmax, ties → priority
    asc): broadcast custkey→segment map, per-batch partial
    (segment, priority) counts, ONE tiny groupby, driver argmax over
    the |segments|×|priorities| aggregate."""
    import os

    import numpy as np
    import ray
    import ray.data as rd

    cmap: dict[int, str] = {}
    for ref in rd.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"]).to_arrow_refs():
        t = ray.get(ref)
        cmap.update(zip(t.column("c_custkey").to_pylist(),
                        t.column("c_mktsegment").to_pylist()))
    cref = ray.put(cmap)

    def partial(t: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        ck = t.column("o_custkey").to_pylist()
        pr = t.column("o_orderpriority").to_pylist()
        cnt: dict[tuple, int] = {}
        for c, p in zip(ck, pr):
            seg = cm.get(c)
            if seg is not None:
                cnt[(seg, p)] = cnt.get((seg, p), 0) + 1
        ks = sorted(cnt)
        return pa.table({
            "seg": pa.array([a for a, _ in ks], type=pa.string()),
            "prio": pa.array([b for _, b in ks], type=pa.string()),
            "n": pa.array([cnt[k] for k in ks], type=pa.int64()),
        })

    agg = (rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["seg", "prio"]).sum("n").to_pandas())
    agg = agg.rename(columns={"sum(n)": "n_orders"})
    agg = agg.sort_values(["seg", "n_orders", "prio"],
                          ascending=[True, False, True])
    top = agg.groupby("seg").head(1).reset_index(drop=True)
    top = top.rename(columns={"seg": "c_mktsegment",
                              "prio": "o_orderpriority"})
    top["n_orders"] = top["n_orders"].astype(np.int64)
    return pa.Table.from_pandas(
        top.sort_values("c_mktsegment").reset_index(drop=True),
        preserve_index=False)


def rollup_cube(sf_dir: str) -> pa.Table:
    """GROUPING SETS rollup over (lang, source) — the OLAP cube shape
    (Gray et al., Data Mining & Knowledge Discovery 1997 "Data Cube"):
    doc counts and n_chars sums at ALL four aggregation levels —
    (lang, source), (lang), (source), and the grand total — computed in
    ONE corpus pass: per-batch partials emit all four kind-tagged row
    groups (the multi-level combiner), ONE groupby over the tiny
    (level, lang, source) key space reduces them.  Absent dimensions
    use the '*' sentinel (kind-tagged long format — the documented
    one-schema rule for multi-kind partials).

    Returns (level, lang, source, n_docs, sum_chars), key-sorted."""
    import os

    import numpy as np
    import ray.data as rd

    def partials(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_pylist()
        src = t.column("source").to_pylist()
        nc = t.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt: dict[tuple, list] = {}
        for lg, sc, c in zip(lang, src, nc.tolist()):
            for key in ((2, lg, sc), (1, lg, "*"), (1, "*", sc),
                        (0, "*", "*")):
                # level = number of grouped dimensions; (1, lg, '*') and
                # (1, '*', sc) are the two one-dim sets
                row = cnt.setdefault(key, [0, 0])
                row[0] += 1
                row[1] += c
        ks = sorted(cnt)
        return pa.table({
            "level": pa.array([k[0] for k in ks], type=pa.int64()),
            "lang": pa.array([k[1] for k in ks], type=pa.string()),
            "source": pa.array([k[2] for k in ks], type=pa.string()),
            "n_docs": pa.array([cnt[k][0] for k in ks], type=pa.int64()),
            "sum_chars": pa.array([cnt[k][1] for k in ks],
                                  type=pa.int64()),
        })

    agg = (rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["lang", "source", "n_chars"])
           .map_batches(partials, batch_format="pyarrow")
           .groupby(["level", "lang", "source"])
           .sum(["n_docs", "sum_chars"]).to_pandas())
    agg = agg.rename(columns={"sum(n_docs)": "n_docs",
                              "sum(sum_chars)": "sum_chars"})
    agg = agg.sort_values(["level", "lang", "source"]) \
        .reset_index(drop=True)
    for c in ("level", "n_docs", "sum_chars"):
        agg[c] = agg[c].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)
