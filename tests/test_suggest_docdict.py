"""DocumentDictionary (Suggest/DocumentDictionary.cs analog)."""

import pyarrow as pa


def test_document_dictionary(ray_session, tmp_path):
    import ray.data as rd

    from lucenenet_ray.ops.suggest import (document_dictionary,
                                           suggest_weighted)

    t = pa.table({
        "title": pa.array(["alpha one", "alpha two", None, "beta"],
                          type=pa.string()),
        "score": pa.array([5, 9, 3, None], type=pa.int64()),
        "doc_id": pa.array(range(4), type=pa.int64()),
    })
    path = str(tmp_path / "dd.parquet")
    document_dictionary(rd.from_arrow(t), path, term_col="title",
                        weight_col="score", payload_col="doc_id")
    out = suggest_weighted(path, "alpha", k=5)
    assert out.column("key").to_pylist() == ["alpha two", "alpha one"]
    assert out.column("weight").to_pylist() == [9, 5]
    # null key skipped; null weight -> 0 (reference :118-124)
    full = suggest_weighted(path, "", k=10)
    assert full.num_rows == 3
    assert dict(zip(full.column("key").to_pylist(),
                    full.column("weight").to_pylist()))["beta"] == 0
