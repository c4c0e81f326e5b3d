"""Index sorting + early termination (index/sorter.py): sorted-index top-k
must equal the brute-force oracle, and a selective query must prune
trailing buckets."""

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_index(ray_session, tmp_path_factory):
    from lucenenet_ray.index.sorter import build_sorted_index

    path = str(tmp_path_factory.mktemp("sidx") / "sorted")
    build_sorted_index(f"{SF_DIR}/documents.parquet", path,
                       sort_col="n_chars", descending=True, n_buckets=4)
    from lucenenet_ray.search.reader import IndexReader

    return IndexReader(path)


def _oracle(term: str, k: int):
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    rows = [(d, n) for d, x, n in zip(t.column("doc_id").to_pylist(),
                                      t.column("text").to_pylist(),
                                      t.column("n_chars").to_pylist())
            if term in x.split()]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_early_terminated_topk_matches_oracle(sorted_index):
    from lucenenet_ray.index.sorter import early_terminating_search
    from lucenenet_ray.search.query import parse_query

    out, stats = early_terminating_search(sorted_index,
                                          parse_query("spark"), k=10)
    got = list(zip(out.column("doc_id").to_pylist(),
                   out.column("n_chars").to_pylist()))
    assert got == _oracle("spark", 10)
    assert stats["collected"] == 10


def test_head_term_prunes_buckets(sorted_index):
    """A frequent term fills k inside the first rank bucket — trailing
    buckets are never opened (the partition-pruning form of
    EarlyTerminatingSortingCollector)."""
    from lucenenet_ray.index.sorter import early_terminating_search
    from lucenenet_ray.search.query import parse_query

    _out, stats = early_terminating_search(sorted_index,
                                           parse_query("data"), k=5)
    assert stats["buckets_visited"] < stats["n_buckets"]


def test_boolean_and_rare(sorted_index):
    from lucenenet_ray.index.sorter import early_terminating_search
    from lucenenet_ray.search.query import parse_query

    out, _stats = early_terminating_search(
        sorted_index, parse_query("vector AND dup"), k=10)
    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    rows = [(d, n) for d, x, n in zip(t.column("doc_id").to_pylist(),
                                      t.column("text").to_pylist(),
                                      t.column("n_chars").to_pylist())
            if "vector" in x.split() and "dup" in x.split()]
    rows.sort(key=lambda r: (-r[1], r[0]))
    got = list(zip(out.column("doc_id").to_pylist(),
                   out.column("n_chars").to_pylist()))
    assert got == rows[:10]


def test_no_match_returns_empty(sorted_index):
    from lucenenet_ray.index.sorter import early_terminating_search
    from lucenenet_ray.search.query import parse_query

    out, stats = early_terminating_search(sorted_index,
                                          parse_query("zzzznotaterm"), k=10)
    assert out.num_rows == 0
    assert stats["collected"] == 0
    assert stats["buckets_visited"] == stats["n_buckets"]
