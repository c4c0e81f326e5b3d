"""Decontamination + duplicated-n-gram ops (ops/decontaminate.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus_parquet(tmp_path_factory):
    """Tiny deterministic corpus with a planted benchmark overlap."""
    bench = "alpha beta gamma delta epsilon zeta eta theta"
    rows = {
        0: bench + " filler one",                        # benchmark (0 % 3)
        1: "totally unrelated words here nothing shared at all",
        2: "prefix " + bench + " suffix",                 # contaminated
        3: "alpha beta gamma nope delta epsilon zeta",    # no full 5-gram? see below
        4: "shared shingle one two three four five six",
        5: "shared shingle one two three four five six",  # dup of 4
    }
    t = pa.table({
        "doc_id": pa.array(sorted(rows), type=pa.int64()),
        "text": pa.array([rows[k] for k in sorted(rows)], type=pa.string()),
    })
    p = tmp_path_factory.mktemp("decon") / "documents.parquet"
    pq.write_table(t, str(p))
    return str(p)


def test_benchmark_hashes_small_side(corpus_parquet):
    from lucenenet_ray.ops.decontaminate import benchmark_hashes

    h = benchmark_hashes(corpus_parquet, modulo=3, k=5)
    assert h.size > 0
    assert np.all(np.diff(h) > 0)  # sorted distinct


def test_decontaminate_flags_planted_overlap(ray_session, corpus_parquet):
    from lucenenet_ray.ops.decontaminate import decontaminate
    from lucenenet_ray.util.tables import dataset_to_table

    t = dataset_to_table(
        decontaminate(corpus_parquet, modulo=3, k=5, concurrency=1))
    got = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("n_hits").to_pylist()))
    assert 2 in got  # carries the full planted benchmark 8-token run
    # benchmark docs (0 and 3) never flagged; doc 1 shares nothing
    assert 0 not in got and 3 not in got and 1 not in got
    # doc 2 contains all 4 5-grams of the 8-token benchmark run
    assert got[2] == 4


def test_dup_ngram_counts_pairwise(ray_session, corpus_parquet):
    from lucenenet_ray.ops.decontaminate import dup_ngram_counts
    from lucenenet_ray.util.tables import dataset_to_table

    t = dataset_to_table(dup_ngram_counts(corpus_parquet, k=5))
    got = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("n_dup").to_pylist()))
    # docs 4 and 5 are identical → every distinct 5-gram shared (8 tokens
    # → 4 grams); doc 0 and 2 share the benchmark run's grams
    assert got[4] == got[5] == 4
    assert got[0] == got[2] == 4
    assert 1 not in got


def test_short_docs_contribute_nothing(ray_session, tmp_path):
    from lucenenet_ray.ops.decontaminate import decontaminate, dup_ngram_counts

    t = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["too short", "also tiny"], type=pa.string()),
    })
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p)
    assert decontaminate(p, modulo=2, k=5, concurrency=1).count() == 0
    assert dup_ngram_counts(p, k=5).count() == 0
