"""Learning-to-rank feature extraction — the feature-dump step that
feeds gradient-boosted rankers (LambdaMART et al.; the per-query-doc
feature-vector table format is the LETOR benchmark convention, Qin &
Liu 2013): for each training query, the engine's OWN ranking (the
float32-exact BM25 serving path) is joined with the classic per-pair
features — term frequencies, global document frequencies, document
length — producing the (query, doc) feature rows a ranker trains on.

Shape: ranking and global stats come from the INDEX (query-serving
actors, termstats); raw tf / doc_len for the <= Q·k hit docs come from
ONE corpus pass with the broadcast hit-doc set (k-scale) and batch-local
counting — the corpus stream is never materialized and nothing
quadratic exists anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def ltr_features(reader, queries: list[tuple[str, list[str]]], docs_ds,
                 k: int = 10) -> pa.Table:
    """(query_id, rank, doc_id, score, tf_0, tf_1, df_0, df_1, doc_len)
    for the BM25 top-k of each 2-term OR query, (query_id, rank)-sorted.

    ``queries`` is [(query_id, [term0, term1]), ...] — exactly two terms
    per query so the fixed feature schema stays wide (the LETOR layout).
    """
    import ray

    from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS
    from lucenenet_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )
    from lucenenet_ray.search.searcher import search

    rankings = {}
    all_terms: set[str] = set()
    hit_docs: set[int] = set()
    for qid, terms in queries:
        assert len(terms) == 2
        q = BooleanQuery(clauses=tuple(
            BooleanClause(Occur.SHOULD, TermQuery(term=t))
            for t in terms))
        td = search(reader, q, k=k)
        rankings[qid] = (terms, td.to_list())
        all_terms.update(terms)
        hit_docs.update(int(d) for d, _ in td.to_list())
    stats = reader.term_stats(sorted(all_terms))
    df_of = {t: stats.get(t, (0, 0))[0] for t in all_terms}

    ids_ref = ray.put(frozenset(hit_docs))
    terms_ref = ray.put(frozenset(all_terms))

    def doc_stats(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        terms = ray.get(terms_ref)
        rows = {"doc_id": [], "term": [], "tf": [], "doc_len": []}
        for did, x in zip(t.column("doc_id").to_pylist(),
                          t.column("text").to_pylist()):
            if did not in ids:
                continue
            kept = [w for w in (x or "").split(" ")
                    if w and w not in ENGLISH_STOP_WORDS]
            for tm in terms:
                rows["doc_id"].append(did)
                rows["term"].append(tm)
                rows["tf"].append(kept.count(tm))
                rows["doc_len"].append(len(kept))
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "term": pa.array(rows["term"], type=pa.string()),
            "tf": pa.array(rows["tf"], type=pa.int64()),
            "doc_len": pa.array(rows["doc_len"], type=pa.int64()),
        })

    from lucenenet_ray.util.tables import dataset_to_table

    st = dataset_to_table(
        docs_ds.map_batches(doc_stats, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                          ("tf", pa.int64()), ("doc_len", pa.int64())]))
    tf_of: dict[tuple, int] = {}
    len_of: dict[int, int] = {}
    for did, tm, tf, dl in zip(st.column("doc_id").to_pylist(),
                               st.column("term").to_pylist(),
                               st.column("tf").to_pylist(),
                               st.column("doc_len").to_pylist()):
        tf_of[(did, tm)] = tf
        len_of[did] = dl

    out = {c: [] for c in ("query_id", "rank", "doc_id", "score",
                           "tf_0", "tf_1", "df_0", "df_1", "doc_len")}
    for qid, _terms in sorted(queries):  # (query_id, rank) row order
        terms, hits = rankings[qid]
        for r, (did, score) in enumerate(hits, 1):
            did = int(did)
            out["query_id"].append(qid)
            out["rank"].append(r)
            out["doc_id"].append(did)
            out["score"].append(float(score))
            out["tf_0"].append(tf_of.get((did, terms[0]), 0))
            out["tf_1"].append(tf_of.get((did, terms[1]), 0))
            out["df_0"].append(df_of[terms[0]])
            out["df_1"].append(df_of[terms[1]])
            out["doc_len"].append(len_of.get(did, 0))
    return pa.table({
        "query_id": pa.array(out["query_id"], type=pa.string()),
        "rank": pa.array(out["rank"], type=pa.int64()),
        "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        "score": pa.array(out["score"], type=pa.float64()),
        "tf_0": pa.array(out["tf_0"], type=pa.int64()),
        "tf_1": pa.array(out["tf_1"], type=pa.int64()),
        "df_0": pa.array(out["df_0"], type=pa.int64()),
        "df_1": pa.array(out["df_1"], type=pa.int64()),
        "doc_len": pa.array(out["doc_len"], type=pa.int64()),
    })
