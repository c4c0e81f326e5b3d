

def test_mmr_partial_embedding_coverage(ray_session, tmp_path):
    """Docs without embeddings are filtered from the candidate list,
    not crashed on (the sf0.1 shape: |embeddings| < |documents|)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.ops.mmr import mmr_rerank
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader

    n = 30
    texts = [f"spark window filler{i % 7} tail" for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": texts,
    }))
    idx = str(tmp_path / "idx")
    build_index(ds, IndexConfig(index_path=idx, id_min=0, id_max=n - 1,
                                n_buckets=2))
    rng = np.random.RandomState(2)
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(0, n, 3), type=pa.int64()),  # 1/3 cover
        "embedding": pa.array([rng.randn(8).tolist()
                               for _ in range(0, n, 3)]),
    }))
    out = mmr_rerank(IndexReader(idx), parse_query("spark window"),
                     emb, n_cand=20, rounds=10)
    sel = out.column("doc_id").to_pylist()
    assert sel and all(d % 3 == 0 for d in sel)  # only embedded docs
    assert len(sel) == len(set(sel))
