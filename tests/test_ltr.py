"""LTR feature extraction (ops/ltr.py) consistency checks."""

import pyarrow as pa


def test_ltr_features_consistency(ray_session, tmp_path):
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.ops.ltr import ltr_features
    from lucenenet_ray.search.reader import IndexReader

    n = 40
    texts = [f"spark window data f{i % 5} spark" if i % 2 == 0
             else f"data merge tail f{i % 3}" for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": texts,
    }))
    idx = str(tmp_path / "idx")
    build_index(ds, IndexConfig(index_path=idx, id_min=0, id_max=n - 1,
                                n_buckets=2))
    out = ltr_features(
        IndexReader(idx),
        [("qa", ["spark", "window"]), ("qb", ["data", "merge"])],
        rd.from_arrow(pa.table({
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": texts,
        })).repartition(3),
        k=5)
    rows = out.to_pylist()
    assert len(rows) == 10
    assert [r["query_id"] for r in rows[:5]] == ["qa"] * 5
    for r in rows:
        if r["query_id"] == "qa":
            # even docs contain 'spark' twice, 'window' once
            assert r["doc_id"] % 2 == 0
            assert r["tf_0"] == 2 and r["tf_1"] == 1
            assert r["df_0"] == n // 2
            assert r["doc_len"] == 5
        # features consistent: doc matched, so tf_0 + tf_1 >= 1
        assert r["tf_0"] + r["tf_1"] >= 1
        assert r["score"] > 0
    # ranks are per-query 1..5 and scores descend within a query
    for q in ("qa", "qb"):
        qs = [r for r in rows if r["query_id"] == q]
        assert [r["rank"] for r in qs] == [1, 2, 3, 4, 5]
        assert all(a["score"] >= b["score"] for a, b in zip(qs, qs[1:]))
