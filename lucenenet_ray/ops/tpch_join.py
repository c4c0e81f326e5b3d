"""Multi-table join rollup over the TPC-H-style tables — the canonical
warehouse query shape (revenue per nation: lineitem ⋈ orders ⋈ customer ⋈
nation) built with the TWO join strategies a 100 TB engine must pick
between, each used where it belongs:

- **big × big (lineitem ⋈ orders)**: hash co-location — lineitem batches
  pre-aggregate revenue per orderkey LOCALLY (the combiner: |batch
  distinct orderkeys| rows ship, not line items), union with the tagged
  orders key stream, ONE ``groupby(orderkey)`` joins them. Neither side
  is ever broadcast or materialized.
- **big × small (→ customer → nation)**: broadcast — the customer→nation
  map is |customers| ints (ships once via ``ray.put``); nation names are
  25 rows on the driver. The documented threshold: broadcast while the
  map fits a worker heap (~10^8 entries), else the same groupby
  co-location as stage 1.

Money is exact: rev_centi = floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
per ROW in float64 (half-away-from-zero, DuckDB round parity) (both engine and SQL compute it from the same
stored doubles, then all sums are int64) — summation order can never
move a bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def revenue_by_nation(lineitem_ds, orders_ds, customer_tbl: pa.Table,
                      nation_tbl: pa.Table) -> pa.Table:
    """(n_name, rev_centi) revenue per nation, n_name-sorted."""
    import ray

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        # half-away-from-zero like DuckDB round() (np.rint is half-even)
        centi = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, centi)
        return pa.table({
            "k": pa.array(uniq.astype(np.int64), type=pa.int64()),
            "rev": pa.array(sums, type=pa.int64()),
            "cust": pa.array(np.full(len(uniq), -1, dtype=np.int64)),
        })

    def ord_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": t.column("o_orderkey").cast(pa.int64()),
            "rev": pa.array(
                np.zeros(t.num_rows, dtype=np.int64), type=pa.int64()),
            "cust": t.column("o_custkey").cast(pa.int64()),
        })

    cust_nation = dict(zip(
        customer_tbl.column("c_custkey").to_pylist(),
        customer_tbl.column("c_nationkey").to_pylist()))
    cn_ref = ray.put(cust_nation)

    def join_group(group: pa.Table) -> pa.Table:
        cust = group.column("cust").to_numpy(zero_copy_only=False)
        rev = group.column("rev").to_numpy(zero_copy_only=False)
        owners = cust[cust >= 0]
        total = int(rev.sum())
        if len(owners) == 0 or total == 0:
            return pa.table({"nat": pa.array([], type=pa.int64()),
                             "rev": pa.array([], type=pa.int64())})
        cn = ray.get(cn_ref)
        nat = cn[int(owners[0])]
        return pa.table({"nat": pa.array([nat], type=pa.int64()),
                         "rev": pa.array([total], type=pa.int64())})

    agg = (lineitem_ds.map_batches(li_partial, batch_format="pyarrow")
           .union(orders_ds.map_batches(ord_rows, batch_format="pyarrow"))
           .groupby("k").map_groups(join_group, batch_format="pyarrow")
           .groupby("nat").sum("rev").to_pandas())
    names = dict(zip(nation_tbl.column("n_nationkey").to_pylist(),
                     nation_tbl.column("n_name").to_pylist()))
    rows = sorted((names[int(n)], int(r))
                  for n, r in zip(agg["nat"], agg["sum(rev)"]))
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], type=pa.string()),
        "rev_centi": pa.array([r[1] for r in rows], type=pa.int64()),
    })
