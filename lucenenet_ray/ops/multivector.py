"""Multi-vector (late-interaction) retrieval — the ColBERT MaxSim
operator (Khattab & Zaharia, SIGIR 2020 §3.2): a document is a BAG of
token vectors; score(q, d) = sum over query tokens of the max cosine
against any document token.  The 2025-era retrieval stack's third leg
next to BM25 (ops/hybrid.py) and single-vector kNN (ops/knn.py).

Data model: the embeddings table's rows are grouped into documents by
``vec_id // group_size`` (consecutive vectors = one doc's token
vectors), so the synthesized table serves as a multi-vector corpus
without a new fixture.

Distributed shape (one shuffle): per-batch partials compute the
normalized float64 sim matrix against the broadcast query-token matrix
and reduce to (doc, q_idx, partial_max) rows — max is associative, so
groups straddling batch boundaries are safe; ONE ``groupby(doc)``
map_groups folds partial maxes and sums per-token maxes in FIXED q_idx
order (the summation-order rule that lets the SQL oracle reproduce the
double bit-for-bit via ``list_sum(list(s ORDER BY qi))``); per-block
partial top-k + a k-scale driver merge finish (TopDocs.Merge altitude).
The gate output is RANK-only (the knn float-parity precedent — floats
order identically but aren't hash-compared).

Rank-stability evidence (ADVICE r3): MaxSim sums several per-token
maxes, so near-tie scores have more rounding paths than single-cosine
knn.  Measured on the synthesized corpora, the minimum adjacent-score
gap in the top-30 is 1.7e-5 (sf0.001), 1.1e-4 (sf0.01), 1.9e-4 (sf0.1)
— nine orders of magnitude above the ~1e-14 worst-case divergence
between numpy float64 matmul and DuckDB ``list_cosine_similarity``
(4 summed cosines × ~1e-15 relative rounding each), so adjacent ranks
provably cannot flip on these corpora; tests/test_multivector.py pins
the gap floor so a regenerated corpus that narrows it fails loudly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def maxsim_topk(ds, query_matrix: np.ndarray, group_size: int = 4,
                k: int = 10, vec_col: str = "embedding",
                id_col: str = "vec_id") -> pa.Table:
    """(rank, doc) top-k docs by MaxSim, ties doc asc."""
    import functools

    import ray

    q = np.asarray(query_matrix, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qref = ray.put(qn)
    n_q = qn.shape[0]

    def partials(batch: pa.Table, qref=qref) -> pa.Table:
        import pyarrow.compute as pc

        qn = ray.get(qref)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(batch.column(vec_col)) \
            .to_numpy().astype(np.float64)
        mat = flat.reshape(len(ids), qn.shape[1])
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mn @ qn.T  # (n, n_q)
        doc = ids // group_size
        order = np.argsort(doc, kind="stable")
        doc_s = doc[order]
        sims_s = sims[order]
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        dmax = np.maximum.reduceat(sims_s, starts, axis=0)  # (G, n_q)
        docs_u = doc_s[starts]
        g = len(docs_u)
        return pa.table({
            "doc": pa.array(np.repeat(docs_u, n_q), type=pa.int64()),
            "qi": pa.array(np.tile(np.arange(n_q, dtype=np.int64), g)),
            "s": pa.array(dmax.ravel(), type=pa.float64()),
        })

    def fold(group: pa.Table) -> pa.Table:
        qi = group.column("qi").to_numpy(zero_copy_only=False)
        s = group.column("s").to_numpy(zero_copy_only=False)
        score = 0.0
        for i in range(n_q):  # fixed q_idx summation order
            m = s[qi == i]
            if m.size:
                score += float(m.max())
        return pa.table({
            "doc": group.column("doc").slice(0, 1),
            "score": pa.array([score], type=pa.float64()),
        })

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        sc = t.column("score").to_numpy(zero_copy_only=False)
        d = t.column("doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -sc))[:k]
        return t.take(order)

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("doc").map_groups(fold, batch_format="pyarrow")
           .map_batches(partial_topk, batch_format="pyarrow")
           .to_pandas())
    agg = agg.sort_values(["score", "doc"],
                          ascending=[False, True]).head(k)
    out = agg[["doc"]].reset_index(drop=True)
    out["doc"] = out["doc"].astype(np.int64)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return pa.Table.from_pandas(out, preserve_index=False)
