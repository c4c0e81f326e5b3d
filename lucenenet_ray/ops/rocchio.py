"""Rocchio pseudo-relevance feedback — the classic query-expansion step
(Rocchio 1971; Manning/Raghavan/Schütze IIR §9.1.1; Lucene's MLT is the
per-document cousin, this is the FEEDBACK-SET form every PRF pipeline
runs): take the BM25 top-k as pseudo-relevant, score every term in those
docs by

    w(t) = idf(t) * Σ_{d in topk} tf(t, d),      idf = ln(N/(df+1)) + 1

exclude the original query terms, expand with the top-m.

Exactness: Σ tf is an INTEGER sum (order-free at any parallelism); the
single f64 multiply by idf matches SQL bit-for-bit, so the ranking is
deterministic without emitting floats (rank-only gate, plus the integer
sum_tf / df columns as evidence).

Distributed shape: the top-k doc ids are k-scale (driver); ONE filtered
streaming pass over the corpus (pushdown id filter) yields candidate tf
partials; df comes from the corpus term groupby (at engine runtime the
index's termstats parquet serves the same numbers — this op uses the
stream form so its oracle and engine share one token definition)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS


def _kept(text: str) -> list[str]:
    return [t for t in (text or "").split(" ")
            if t and t not in ENGLISH_STOP_WORDS]


def rocchio_expand(docs_ds, reader, query, query_terms: list[str],
                   k: int = 10, m: int = 10) -> pa.Table:
    """(term, sum_tf, df) top-m expansion terms by (w desc, term asc)."""
    import ray

    from lucenenet_ray.search.searcher import search

    td = search(reader, query, k=k)
    top_ids = {int(d) for d, _s in td.to_list()}
    idref = ray.put(top_ids)

    def partials(t: pa.Table) -> pa.Table:
        ids = ray.get(idref)
        tf: dict[str, int] = {}
        df: dict[str, int] = {}
        for did, txt in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
            toks = _kept(txt)
            for tok in set(toks):
                df[tok] = df.get(tok, 0) + 1
            if int(did) in ids:
                for tok in toks:
                    tf[tok] = tf.get(tok, 0) + 1
        terms = sorted(set(df) | set(tf))
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            "tf": pa.array([tf.get(x, 0) for x in terms], type=pa.int64()),
            "df": pa.array([df.get(x, 0) for x in terms], type=pa.int64()),
        })

    agg = (docs_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("term").sum(["tf", "df"]).to_pandas())
    n_docs = docs_ds.count()
    qset = set(query_terms)
    rows = []
    for term, stf, sdf in zip(agg["term"], agg["sum(tf)"], agg["sum(df)"]):
        if term in qset or int(stf) == 0:
            continue
        idf = math.log(n_docs / (int(sdf) + 1)) + 1.0
        rows.append((idf * int(stf), term, int(stf), int(sdf)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    rows = rows[:m]
    return pa.table({
        "term": pa.array([r[1] for r in rows], type=pa.string()),
        "sum_tf": pa.array([r[2] for r in rows], type=pa.int64()),
        "df": pa.array([r[3] for r in rows], type=pa.int64()),
    })
