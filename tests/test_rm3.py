"""RM3 pseudo-relevance feedback (ops/rm3.py) — interpolation and fold
semantics against a plain-Python model."""

import pyarrow as pa
import ray.data as rd


def _mk(tmp_path, rows):
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), type=pa.int64()),
        "text": pa.array(rows, type=pa.string()),
    })
    return rd.from_arrow(t)


def test_rm3_query_terms_lead_and_expand(ray_session, tmp_path):
    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.ops.rm3 import rm3_expand
    from lucenenet_ray.search.query import (BooleanClause, BooleanQuery,
                                            Occur, TermQuery)
    from lucenenet_ray.search.reader import IndexReader

    rows = ["spark window shuffle", "spark window stream",
            "spark window shuffle stream", "unrelated words here",
            "spark table", "window pane glass"]
    ds = _mk(tmp_path, rows)
    idx = str(tmp_path / "idx")
    build_index(ds, IndexConfig(index_path=idx, id_min=0,
                                id_max=len(rows) - 1, n_buckets=1))
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="window")),
    ))
    out = rm3_expand(ds, IndexReader(idx), q, ["spark", "window"],
                     fb_docs=3, fb_terms=6)
    terms = out.column("term").to_pylist()
    # λ=0.5 original-model mass puts the query terms on top
    assert set(terms[:2]) == {"spark", "window"}
    # co-occurring feedback terms expand in
    assert "shuffle" in terms and "stream" in terms
    # terms absent from the feedback docs never appear
    assert "unrelated" not in terms and "glass" not in terms


def test_rm3_block_invariance(ray_session, tmp_path):
    """Identical output at any partitioning (the partial pass is a pure
    per-row collection; all float folds happen driver-side in fixed
    order)."""
    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.ops.rm3 import rm3_expand
    from lucenenet_ray.search.query import TermQuery
    from lucenenet_ray.search.reader import IndexReader

    rows = [f"alpha beta gamma{i % 3} delta" for i in range(24)]
    ds = _mk(tmp_path, rows)
    idx = str(tmp_path / "idx2")
    build_index(ds, IndexConfig(index_path=idx, id_min=0, id_max=23,
                                n_buckets=2))
    r = IndexReader(idx)
    a = rm3_expand(ds, r, TermQuery(term="alpha"), ["alpha"], 5, 8)
    b = rm3_expand(ds.repartition(7), r, TermQuery(term="alpha"),
                   ["alpha"], 5, 8)
    assert a.equals(b)


def test_rm3_zero_mass_query_term_keeps_origin_weight(ray_session,
                                                      tmp_path):
    """ADVICE r4: a query term with ZERO feedback mass must still carry
    its λ/|Q| origin weight (candidate set = feedback terms ∪ query
    terms), and the SQL oracle must agree on the same corpus."""
    import duckdb

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.ops.rm3 import rm3_expand
    from lucenenet_ray.ops.sql_oracle import rm3_expand_sql
    from lucenenet_ray.search.query import (BooleanClause, BooleanQuery,
                                            Occur, TermQuery)
    from lucenenet_ray.search.reader import IndexReader

    # 'phantom' appears ONLY in doc 3, which never reaches the top-2
    # feedback set for the query — zero feedback mass, yet λ/|Q| = 0.25
    # beats every expansion weight, so it must rank in the top 2.
    rows = ["spark window shuffle", "spark window stream",
            "spark window shuffle stream", "phantom words here",
            "other table"]
    ds = _mk(tmp_path, rows)
    idx = str(tmp_path / "idx3")
    build_index(ds, IndexConfig(index_path=idx, id_min=0,
                                id_max=len(rows) - 1, n_buckets=1))
    q = BooleanQuery(clauses=(
        BooleanClause(Occur.SHOULD, TermQuery(term="spark")),
        BooleanClause(Occur.SHOULD, TermQuery(term="phantom")),
    ))
    out = rm3_expand(ds, IndexReader(idx), q, ["spark", "phantom"],
                     fb_docs=2, fb_terms=6)
    terms = out.column("term").to_pylist()
    assert "phantom" in terms[:2], terms

    import pyarrow as pa
    con = duckdb.connect()
    con.register("documents", pa.table({
        "doc_id": pa.array(range(len(rows)), type=pa.int64()),
        "text": pa.array(rows, type=pa.string()),
    }))
    osql = rm3_expand_sql(["spark", "phantom"], fb_docs=2, fb_terms=6)
    oterms = [r[1] for r in con.execute(osql).fetchall()]
    assert oterms == terms
