"""Driver-gate rehearsal: run every queries() entry against its oracle_sql()
like the driver does (rows, schema, sorted-column value hash incl. types).

Usage: python tools/gate_check.py [sf_dir]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(t):
    import pandas as pd
    import pyarrow as pa

    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    if hasattr(t, "to_arrow_refs"):  # ray Dataset
        import ray

        t = pa.concat_tables(ray.get(t.to_arrow_refs()))
    return t.select(sorted(t.column_names))


def value_hash(t):
    """Legacy per-value repr hash — kept as the fallback comparator for
    column types Arrow compute can't compare (nested lists etc.)."""
    h = hashlib.sha256()
    for name in t.column_names:
        col = t.column(name)
        h.update(name.encode())
        h.update(str(col.type).encode())
        for v in col.to_pylist():
            h.update(repr(v).encode())
    return h.hexdigest()[:16]


def _col_equal(a, b):
    """Vectorized column equality matching the repr-hash semantics:
    position-wise, null==null, NaN==NaN (repr('nan') compared equal in the
    legacy hash). Falls back to the per-value repr path only for types the
    Arrow kernels reject."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if len(a) != len(b):
        return False
    if len(a) == 0:
        return True
    try:
        eq = pc.equal(a, b)
        if pa.types.is_floating(a.type):
            eq = pc.or_(eq, pc.and_(pc.is_nan(a), pc.is_nan(b)))
            # the driver hashes repr(v): repr(-0.0) != repr(0.0) while
            # pc.equal(-0.0, 0.0) is TRUE — also require matching sign
            # bits so this predictor is never weaker than the driver
            # comparator (ADVICE r4)
            import numpy as np

            av = a.to_numpy(zero_copy_only=False)
            bv = b.to_numpy(zero_copy_only=False)
            sign_a = np.signbit(np.nan_to_num(av, nan=0.0))
            sign_b = np.signbit(np.nan_to_num(bv, nan=0.0))
            eq = pc.and_(eq, pa.array(sign_a == sign_b))
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        ok = pc.all(pc.or_(pc.fill_null(eq, False), both_null)).as_py()
        return True if ok is None else bool(ok)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid, pa.ArrowTypeError):
        ha = hashlib.sha256()
        hb = hashlib.sha256()
        for v in a.to_pylist():
            ha.update(repr(v).encode())
        for v in b.to_pylist():
            hb.update(repr(v).encode())
        return ha.digest() == hb.digest()


def values_equal(t, o):
    """Fast predictor of the driver's sorted-column value-hash match:
    column names+types already compared by the schema check; values
    compared vectorized per column (C++ kernels, not a Python loop —
    VERDICT r3 finding #6)."""
    if t.column_names != o.column_names:
        return False
    for name in t.column_names:
        ca, cb = t.column(name), o.column(name)
        if str(ca.type) != str(cb.type):
            return False
        if not _col_equal(ca.combine_chunks(), cb.combine_chunks()):
            return False
    return True


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import duckdb

    import __ray_entry__ as E

    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        p = os.path.join(sf, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    qs = E.queries()
    if len(sys.argv) > 2:  # optional comma-separated query-name filter
        only = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in only}
    osql = E.oracle_sql()
    bad = []
    results = {}
    for name, fn in qs.items():
        try:
            t = canon(fn(sf))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ENGINE-ERROR {type(e).__name__}: {e}")
            bad.append(name)
            results[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            continue
        if name not in osql:
            print(f"{name:24s} rows={t.num_rows} (no oracle)")
            results[name] = {"rows": t.num_rows, "no_oracle": True}
            continue
        try:
            o = canon(con.execute(osql[name]).arrow())
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} ORACLE-ERROR {type(e).__name__}: {e}")
            bad.append(name)
            results[name] = {"err": f"oracle {type(e).__name__}: {e}"[:300]}
            continue
        rows_ok = t.num_rows == o.num_rows
        schema_ok = [str(f) for f in t.schema] == [str(f) for f in o.schema]
        hash_ok = values_equal(t, o)
        results[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                         "hash_match": hash_ok, "rows": t.num_rows,
                         "oracle_rows": o.num_rows}
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            bad.append(name)
            print(f"{name:24s} {status} rows={rows_ok}({t.num_rows}/{o.num_rows}) "
                  f"schema={schema_ok} hash={hash_ok}")
            if not schema_ok:
                print(f"  engine schema: {t.schema}")
                print(f"  oracle schema: {o.schema}")
        else:
            print(f"{name:24s} OK ({t.num_rows} rows)")
    print(f"\n{'ALL GREEN' if not bad else 'FAILURES: ' + ', '.join(bad)}")
    out_path = os.environ.get("GATE_REPLAY_OUT")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf, "n_queries": len(results),
                       "n_failures": len(bad), "failures": bad,
                       "results": results}, f, indent=1, sort_keys=True)
        print(f"replay written to {out_path}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
