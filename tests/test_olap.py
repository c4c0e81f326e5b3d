"""TPC-H Q1-shape pricing summary + column profiler (ops/olap.py)."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.olap import pricing_summary, table_profile


def _li_table():
    rng = np.random.RandomState(5)
    n = 300
    return pa.table({
        "l_returnflag": pa.array(
            [("A", "N", "R")[i % 3] for i in range(n)]),
        "l_linestatus": pa.array([("O", "F")[i % 2] for i in range(n)]),
        "l_quantity": pa.array(rng.randint(1, 50, n).astype(float)),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(10, 9999, n), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2)),
    })


def test_pricing_summary_matches_bruteforce(ray_session):
    import ray.data as rd

    t = _li_table()
    exp: dict[tuple, list] = {}
    for i in range(t.num_rows):
        rf = t.column("l_returnflag")[i].as_py()
        ls = t.column("l_linestatus")[i].as_py()
        qty = int(np.floor(t.column("l_quantity")[i].as_py() + 0.5))
        ep = int(np.floor(t.column("l_extendedprice")[i].as_py() * 100 + 0.5))
        di = int(np.floor(t.column("l_discount")[i].as_py() * 100 + 0.5))
        tx = int(np.floor(t.column("l_tax")[i].as_py() * 100 + 0.5))
        row = exp.setdefault((rf, ls), [0, 0, 0, 0, 0])
        row[0] += qty
        row[1] += ep
        row[2] += ep * (100 - di)
        row[3] += ep * (100 - di) * (100 + tx)
        row[4] += 1
    out = pricing_summary(rd.from_arrow(t).repartition(5))
    got = {(r["l_returnflag"], r["l_linestatus"]):
           [r["sum_qty"], r["sum_base_cents"], r["sum_disc_e4"],
            r["sum_charge_e6"], r["count_order"]]
           for r in out.to_pylist()}
    assert got == exp
    keys = [(r["l_returnflag"], r["l_linestatus"])
            for r in out.to_pylist()]
    assert keys == sorted(keys)


def test_table_profile(ray_session):
    import ray.data as rd

    t = pa.table({
        "a": pa.array([1, 2, None, 9], type=pa.int64()),
        "b": pa.array(["x", None, "y", "z"]),
        "c": pa.array([1.5, 2.5, 3.5, None]),
    })
    out = table_profile(rd.from_arrow(t).repartition(3),
                        {"a": "int64", "b": "string", "c": "double"})
    rows = {r["column"]: r for r in out.to_pylist()}
    assert rows["a"]["n_rows"] == 4 and rows["a"]["n_nulls"] == 1
    assert rows["a"]["min_int"] == 1 and rows["a"]["max_int"] == 9
    assert rows["b"]["n_nulls"] == 1 and rows["b"]["min_int"] is None
    assert rows["c"]["dtype"] == "double"
    assert list(rows) == ["a", "b", "c"]


def test_shipping_priority_vs_duckdb(ray_session):
    import duckdb

    from lucenenet_ray.ops.olap import shipping_priority
    from lucenenet_ray.ops.sql_oracle import shipping_priority_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf}/{name}.parquet')")
    exp = con.execute(shipping_priority_sql()).arrow()
    got = shipping_priority(sf)
    assert got.column("l_orderkey").to_pylist() == \
        exp.column("l_orderkey").to_pylist()
    assert got.column("revenue_e4").to_pylist() == \
        exp.column("revenue_e4").to_pylist()


def test_region_volume_vs_duckdb(ray_session):
    import duckdb

    from lucenenet_ray.ops.olap import region_supplier_volume
    from lucenenet_ray.ops.sql_oracle import region_supplier_volume_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in ("customer", "orders", "lineitem", "supplier",
                 "nation", "region"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf}/{name}.parquet')")
    exp = con.execute(region_supplier_volume_sql()).arrow()
    got = region_supplier_volume(sf)
    assert got.column("n_name").to_pylist() == \
        exp.column("n_name").to_pylist()
    assert got.column("revenue_e4").to_pylist() == \
        exp.column("revenue_e4").to_pylist()


def test_segment_stats_vs_duckdb(ray_session):
    import duckdb

    from lucenenet_ray.ops.olap import segment_order_stats
    from lucenenet_ray.ops.sql_oracle import segment_order_stats_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in ("customer", "orders"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf}/{name}.parquet')")
    exp = con.execute(segment_order_stats_sql()).arrow()
    got = segment_order_stats(sf)
    assert got.to_pylist() == exp.to_pylist()


def test_cold_parts_vs_duckdb(ray_session):
    import duckdb

    from lucenenet_ray.ops.olap import cold_parts
    from lucenenet_ray.ops.sql_oracle import cold_parts_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in ("part", "lineitem"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf}/{name}.parquet')")
    exp = con.execute(cold_parts_sql(20)).arrow()
    got = cold_parts(sf, k=20)
    assert got.to_pylist() == exp.to_pylist()


def test_order_count_distribution_vs_duckdb(ray_session):
    import duckdb

    from lucenenet_ray.ops.olap import order_count_distribution
    from lucenenet_ray.ops.sql_oracle import order_count_distribution_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in ("customer", "orders"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf}/{name}.parquet')")
    exp = con.execute(order_count_distribution_sql()).arrow()
    got = order_count_distribution(sf)
    assert got.to_pylist() == exp.to_pylist()
    # histogram covers every customer exactly once
    import pyarrow.parquet as pq2
    assert sum(r["n_customers"] for r in got.to_pylist()) == \
        pq2.read_metadata(f"{sf}/customer.parquet").num_rows


def test_top_priority_per_segment_vs_duckdb(ray_session):
    import duckdb

    from lucenenet_ray.ops.olap import top_priority_per_segment
    from lucenenet_ray.ops.sql_oracle import top_priority_per_segment_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in ("customer", "orders"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf}/{name}.parquet')")
    exp = con.execute(top_priority_per_segment_sql()).arrow()
    got = top_priority_per_segment(sf)
    assert got.to_pylist() == exp.to_pylist()


def test_rollup_cube_vs_duckdb(ray_session):
    import duckdb

    from lucenenet_ray.ops.olap import rollup_cube
    from lucenenet_ray.ops.sql_oracle import rollup_cube_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    exp = con.execute(rollup_cube_sql()).arrow()
    got = rollup_cube(sf)
    assert got.to_pylist() == exp.to_pylist()
    rows = got.to_pylist()
    total = [r for r in rows if r["level"] == 0]
    assert len(total) == 1
    # cube consistency: level-1 lang rows sum to the grand total
    assert sum(r["n_docs"] for r in rows
               if r["level"] == 1 and r["source"] == "*") \
        == total[0]["n_docs"]


def test_segment_stats_broken_referential_integrity(ray_session, tmp_path):
    """VERDICT r4 #4: orders with a dangling o_custkey must be DROPPED
    (the oracle's inner join), not bucketed into a '' segment — green on
    the healthy fixtures only by accident. This fixture breaks
    referential integrity on purpose so the divergent behavior fails."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucenenet_ray.ops.olap import segment_order_stats
    from lucenenet_ray.ops.sql_oracle import segment_order_stats_sql

    rng = np.random.default_rng(3)
    n_cust, n_ord = 40, 400
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), type=pa.int64()),
        "c_mktsegment": pa.array(
            [["AUTOMOBILE", "BUILDING", "MACHINERY"][i % 3]
             for i in range(n_cust)], type=pa.string()),
    }), str(tmp_path / "customer.parquet"))
    # every 7th order references a customer that does NOT exist
    ck = rng.integers(0, n_cust, size=n_ord)
    ck[::7] = n_cust + rng.integers(0, 50, size=len(ck[::7]))
    pq.write_table(pa.table({
        "o_custkey": pa.array(ck, type=pa.int64()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(10, 9000, size=n_ord), 2),
            type=pa.float64()),
    }), str(tmp_path / "orders.parquet"))

    con = duckdb.connect()
    for name in ("customer", "orders"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{name}.parquet')")
    exp = con.execute(segment_order_stats_sql()).arrow()
    got = segment_order_stats(str(tmp_path))
    assert got.to_pylist() == exp.to_pylist()
    assert "" not in got.column(0).to_pylist()
