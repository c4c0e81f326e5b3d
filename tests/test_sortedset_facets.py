"""SortedSetDocValuesFacetCounts analog (_q_facet_sortedset) — label-set
dedup semantics + end-to-end parity vs the DuckDB oracle at sf0.001."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_label_set_dedup_semantics():
    """SORTED_SET semantics: a doc whose two 'tag' hashes collide carries the
    label ONCE (one (doc, dim, label) row), never twice."""
    import hashlib

    from __ray_entry__ import _sortedset_labels

    # find ids with colliding and non-colliding tag hashes
    collide = next(
        d for d in range(100000)
        if int(hashlib.md5(f"ss-a-{d}".encode()).hexdigest()[:15], 16) % 8
        == int(hashlib.md5(f"ss-b-{d}".encode()).hexdigest()[:15], 16) % 8)
    differ = next(
        d for d in range(100000)
        if int(hashlib.md5(f"ss-a-{d}".encode()).hexdigest()[:15], 16) % 8
        != int(hashlib.md5(f"ss-b-{d}".encode()).hexdigest()[:15], 16) % 8)
    docs, dims, labs = _sortedset_labels(np.array([collide], dtype=np.int64))
    assert dims.count("tag") == 1 and dims.count("grp") == 1
    docs, dims, labs = _sortedset_labels(np.array([differ], dtype=np.int64))
    assert dims.count("tag") == 2 and dims.count("grp") == 1
    assert len({(a, b, c) for a, b, c in zip(docs, dims, labs)}) == len(docs)


@pytest.mark.skipif(not os.path.exists(SF), reason="testdata absent")
def test_facet_sortedset_matches_oracle(ray_session):
    from __ray_entry__ import _q_facet_sortedset
    from lucenenet_ray.ops.sql_oracle import sortedset_facets_sql

    got = _q_facet_sortedset(SF)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{os.path.join(SF, 'documents.parquet')}')")
    want = con.execute(sortedset_facets_sql("spark")).arrow()
    assert got.num_rows == want.num_rows
    got = got.select(sorted(got.column_names))
    want = want.select(sorted(want.column_names))
    assert [str(f) for f in got.schema] == [str(f) for f in want.schema]
    assert got.equals(want.cast(got.schema))
    # top-3 per dim, ordered (count desc, label asc) within dim
    per_dim = {}
    for row in got.to_pylist():
        per_dim.setdefault(row["dim"], []).append(row)
    for dim, rows in per_dim.items():
        assert len(rows) <= 3
        keys = [(-r["n_docs"], r["label"]) for r in rows]
        assert keys == sorted(keys)
