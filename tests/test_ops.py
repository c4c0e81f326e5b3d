"""Training-data ops: MinHash-LSH recall, SimHash locality, KNN exactness,
LSH-KNN recall, fingerprints determinism."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])


def test_minhash_finds_planted_duplicates(ray_session):
    """Plant exact and near duplicates; LSH candidates must surface them."""
    import ray.data as rd

    from lucenenet_ray.ops.neardup import minhash_candidates

    base = ("spark data window merge join filter sort table scan key " * 6).split()
    rows = []
    rows.append({"doc_id": 1, "text": " ".join(base)})
    rows.append({"doc_id": 2, "text": " ".join(base)})  # exact dup
    near = list(base)
    near[5] = "changed"
    rows.append({"doc_id": 3, "text": " ".join(near)})  # near dup
    rows.append({"doc_id": 4, "text": "totally different words entirely unrelated content here now"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = minhash_candidates(ds).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs


def test_simhash_locality():
    from lucenenet_ray.ops.neardup import simhash63

    a = ("spark data window merge join filter sort table " * 8).split()
    b = list(a)
    b[3] = "tweaked"
    c = "completely different unrelated vocabulary in this document".split()
    ha, hb, hc = simhash63(a), simhash63(b), simhash63(c)
    ham_ab = bin(ha ^ hb).count("1")
    ham_ac = bin(ha ^ hc).count("1")
    assert ham_ab < ham_ac
    assert simhash63([]) == 0


def test_knn_exact_matches_numpy(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucenenet_ray.ops.knn import knn_bruteforce

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = mat[:2]
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = knn_bruteforce(ds, q, k=5).to_pandas()
    # naive oracle
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mn @ qn.T
    for qi in range(2):
        order = np.lexsort((ids, -sims[:, qi]))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == ids[order].tolist()


def test_knn_lsh_recall(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucenenet_ray.ops.knn import knn_bruteforce, knn_lsh

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = mat[:3]
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = knn_bruteforce(ds, q, k=10).to_pandas()
    approx = knn_lsh(ds, q, k=10, n_bits=5, multiprobe=2).to_pandas()
    # recall@10 must be reasonable (hyperplane LSH, 5 bits + 2-bit multiprobe
    # probes 16/32 buckets; random embeddings are the worst case for LSH)
    recalls = []
    for qi in range(3):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls
    # the query vector itself must always be found (same bucket trivially)
    for qi in range(3):
        a = approx[approx["query_id"] == qi]
        assert a.iloc[0]["vec_id"] == t.column("vec_id")[qi].as_py()


def test_fingerprints_deterministic_and_shared(docs_ds):
    from lucenenet_ray.ops.textstats import fingerprints_of

    toks = "spark data window merge join filter sort table scan key".split()
    f1 = fingerprints_of(toks)
    f2 = fingerprints_of(toks)
    assert f1 == f2 and len(f1) > 0
    # identical docs share all fingerprints; disjoint docs share none
    other = "alpha beta gamma delta epsilon zeta eta theta".split()
    assert set(fingerprints_of(other)).isdisjoint(f1)


def test_lang_id_rule():
    from lucenenet_ray.ops.textstats import lang_id_of

    assert lang_id_of("the cat and the dog".split()) == "en"
    assert lang_id_of("der hund und die katze".split()) == "de"
    assert lang_id_of("xyz qrs".split()) == "und"
    assert lang_id_of([]) == "und"


def test_suggest_weighted_prefix_pruning(ray_session, tmp_path):
    """AnalyzingSuggester analog: weight-ordered completions, and the
    key-sorted dictionary's row-group stats must prune the prefix scan
    (the FST arc-walk analog)."""
    import ray.data as rd

    from lucenenet_ray.ops.suggest import (
        _suggest_scan,
        build_suggester,
        suggest_weighted,
    )

    rows = [
        {"text": "spark window spark window spark merge"},
        {"text": "spark window spark merge alpha beta"},
        {"text": "zulu yankee xray whiskey victor uniform"},
    ]
    path = str(tmp_path / "sug.parquet")
    build_suggester(rd.from_items(rows), path, row_group_size=4)
    out = suggest_weighted(path, "spark ", k=5)
    keys = out.column("key").to_pylist()
    weights = out.column("weight").to_pylist()
    assert keys[0] == "spark window" and weights[0] == 3
    assert keys[1] == "spark merge" and weights[1] == 2
    # weights descending, key asc on ties
    assert weights == sorted(weights, reverse=True)
    # pruning: the 'z...' row group is never read
    _t, n_read, n_total = _suggest_scan(path, "spark ")
    assert n_total > 1 and n_read < n_total
    # empty prefix range
    empty = suggest_weighted(path, "qqq", k=5)
    assert empty.num_rows == 0


def test_connected_components():
    import pyarrow as pa

    from lucenenet_ray.ops.neardup import connected_components

    # two chains + one isolate pair: {1,2,3,4}, {10,11}, {20,21}
    edges = pa.table({"doc_a": [2, 3, 1, 10, 20],
                      "doc_b": [3, 4, 2, 11, 21]})
    t = connected_components(edges)
    m = dict(zip(t.column("doc_id").to_pylist(),
                 t.column("root").to_pylist()))
    assert m == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_simhash_pairs_blocking(ray_session):
    """The 4-block pigeonhole finds every Hamming<=3 pair the brute force
    finds (exactness of the blocking, not just recall)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.ops.neardup import (_popcount64, simhash63,
                                           simhash_pairs)

    docs = ["spark window merge sort", "spark window merge sorts",
            "totally different content here", "spark window merge sort",
            "spark window merge sort extra"]
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    got = simhash_pairs(rd.from_arrow(t)).to_pandas()
    got = set(zip(got["doc_a"], got["doc_b"]))
    sigs = np.array([simhash63(d.split()) for d in docs], dtype=np.int64)
    want = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if _popcount64(np.array([sigs[i] ^ sigs[j]]))[0] <= 3:
                want.add((i, j))
    assert got == want and (0, 3) in want


def test_connected_components_empty():
    import pyarrow as pa

    from lucenenet_ray.ops.neardup import connected_components

    t = connected_components(pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64())}))
    assert t.num_rows == 0 and t.column_names == ["doc_id", "root"]
