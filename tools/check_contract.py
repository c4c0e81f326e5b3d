"""Local simulation of the driver's correctness gate.

Runs every __ray_entry__.queries() entry at the given sf and compares
against oracle_sql() via DuckDB: row count, column names, and
order-insensitive value equality (sorted by all columns).

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(x):
    import pyarrow as pa

    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    if hasattr(x, "to_pandas"):
        return x.to_pandas()
    raise TypeError(type(x))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem events "
                 "documents embeddings").split():
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    qs = e.queries()
    oracles = e.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows)")
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} != {list(want.columns)}")
        if not problems:
            for c in got.columns:
                # driver hash normalizes integer widths but NOT kinds (a
                # DuckDB DECIMAL sum arrives as object dtype and hash-fails)
                if got[c].dtype.kind != want[c].dtype.kind:
                    problems.append(
                        f"dtype kind differs in column {c}: "
                        f"{got[c].dtype} vs {want[c].dtype}"
                    )
            for c in got.columns:
                a, b = got[c].to_numpy(), want[c].to_numpy()
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = np.array_equal(a.astype(np.float64), b.astype(np.float64))
                else:
                    eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
                if not eq:
                    problems.append(f"values differ in column {c}")
                    mism = np.flatnonzero(
                        ~(a == b) if a.dtype == b.dtype else np.ones(len(a), bool)
                    )[:3]
                    for i in mism:
                        problems.append(f"  row {i}: {a[i]!r} vs {b[i]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:6]))
            fails.append(name)
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print("=" * 40)
    print("FAILURES:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
