"""PII scrub + repetition removal (ops/scrub.py) vs the DuckDB oracles."""

import duckdb
import pyarrow as pa
import pytest

from lucenenet_ray.ops.scrub import (
    PiiScrub,
    RepetitionRemover,
    dedup_chunks,
    pii_augmented_text,
)

DOCS = pa.table({
    "doc_id": pa.array(list(range(40)), type=pa.int64()),
    "text": pa.array(
        ["the fast key order sort" if i % 3 else
         "dup dup dup dup dup dup dup dup dup"
         for i in range(40)], type=pa.string()),
})


def _oracle(sql: str, docs: pa.Table):
    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(sql).fetch_arrow_table()


def test_dedup_chunks_basic():
    kept, removed = dedup_chunks("a b c a b c d e".split(), k=3)
    # chunks: [a b c] [a b c] [d e] -> second dropped
    assert kept == ["a", "b", "c", "d", "e"]
    assert removed == 1


def test_dedup_chunks_tail_and_empty():
    assert dedup_chunks([], 3) == ([], 0)
    kept, removed = dedup_chunks(["x"], 3)
    assert kept == ["x"] and removed == 0


def test_pii_scrub_matches_oracle():
    from lucenenet_ray.ops.sql_oracle import pii_scrub_sql

    def augment(t):
        aug = [pii_augmented_text(i, x) for i, x in
               zip(t.column("doc_id").to_pylist(),
                   t.column("text").to_pylist())]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(aug, type=pa.string())})

    got = PiiScrub()(augment(DOCS))
    want = _oracle(pii_scrub_sql(), DOCS)
    assert got.equals(want)
    # the synthesizer actually produced spans of every class
    assert pa.compute.sum(got.column("n_emails")).as_py() > 0
    assert pa.compute.sum(got.column("n_phones")).as_py() > 0
    assert pa.compute.sum(got.column("n_ips")).as_py() > 0


def test_repetition_removal_matches_oracle():
    from lucenenet_ray.ops.sql_oracle import repetition_removal_sql

    got = RepetitionRemover(k=3)(DOCS)
    want = _oracle(repetition_removal_sql(3), DOCS)
    assert got.equals(want)
    # the dup docs really lost chunks
    dup_rows = got.filter(
        pa.compute.greater(got.column("chunks_removed"), 0))
    assert dup_rows.num_rows > 0


@pytest.mark.parametrize("text,n_e,n_p,n_i", [
    ("mail me at a.b+c@ex-1.org now", 1, 0, 0),
    ("+1-555-0000 and +1-555-999", 0, 1, 0),   # second too short
    ("ip 256.1.2.3 still counts textually 1.2.3.4", 0, 0, 2),
])
def test_pattern_edges(text, n_e, n_p, n_i):
    got = PiiScrub()(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([text], type=pa.string()),
    }))
    assert got.column("n_emails")[0].as_py() == n_e
    assert got.column("n_phones")[0].as_py() == n_p
    assert got.column("n_ips")[0].as_py() == n_i
