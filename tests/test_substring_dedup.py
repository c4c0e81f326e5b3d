"""Duplicated-window substring dedup (ops/neardup.duplicated_window_spans)
— semantics on hand-built corpora + exact parity vs the DuckDB oracle."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from lucenenet_ray.ops.neardup import DUPWIN_K, duplicated_window_spans
from lucenenet_ray.ops.sql_oracle import substring_dedup_sql
from lucenenet_ray.util.tables import dataset_to_table

SPAN_SCHEMA = pa.schema([("doc_id", pa.int64()),
                         ("n_dup_windows", pa.int64()),
                         ("n_covered", pa.int64())])


def _spans(docs: pa.Table, k: int) -> pd.DataFrame:
    import ray.data as rd

    ds = rd.from_arrow(docs)
    out = dataset_to_table(duplicated_window_spans(ds, k=k),
                           schema=SPAN_SCHEMA).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _docs(texts: list[str]) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


@pytest.mark.usefixtures("ray_session")
def test_cross_doc_duplicate_marked():
    # docs 0 and 1 share one 3-window ("a b c"); doc 2 is clean
    docs = _docs(["a b c x y", "q a b c r", "u v w z t"])
    out = _spans(docs, k=3)
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_dup_windows"].tolist() == [1, 1]
    assert out["n_covered"].tolist() == [3, 3]


@pytest.mark.usefixtures("ray_session")
def test_within_doc_repeat_counts():
    # "a b c" occurs twice INSIDE one doc -> both windows marked
    docs = _docs(["a b c d a b c", "m n o p q r s"])
    out = _spans(docs, k=3)
    assert out["doc_id"].tolist() == [0]
    assert out["n_dup_windows"].tolist() == [2]
    # positions 1-3 and 5-7 -> 6 covered tokens
    assert out["n_covered"].tolist() == [6]


@pytest.mark.usefixtures("ray_session")
def test_overlapping_windows_union_coverage():
    # the 4-token run "a b c d" duplicated -> two overlapping 3-windows
    # each, coverage is the UNION (4 tokens), not 6
    docs = _docs(["a b c d x", "y a b c d"])
    out = _spans(docs, k=3)
    assert out["n_dup_windows"].tolist() == [2, 2]
    assert out["n_covered"].tolist() == [4, 4]


@pytest.mark.usefixtures("ray_session")
def test_short_docs_emit_nothing():
    docs = _docs(["a b", "a b"])  # shorter than k -> no windows at all
    assert _spans(docs, k=3).empty


@pytest.mark.usefixtures("ray_session")
def test_matches_oracle_on_dup_heavy_corpus():
    texts = []
    for i in range(30):
        base = f"u{i} v{i} w{i} x{i} y{i} z{i} q{i}"
        if i % 3 == 0:  # a shared sentence spliced into every third doc
            base += " the same five token run here"
        texts.append(base)
    docs = _docs(texts)
    got = _spans(docs, k=DUPWIN_K)

    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(substring_dedup_sql(DUPWIN_K)).fetchdf()
    want = want[want["n_dup_windows"] > 0].reset_index(drop=True)
    merged = want[["doc_id", "n_dup_windows", "n_covered"]]
    assert got.equals(merged.astype("int64"))
