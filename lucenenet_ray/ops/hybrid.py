"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and vector
(cosine kNN) top-k lists (Cormack, Clarke & Büttcher, SIGIR 2009 — the
standard score-free fusion every hybrid-search stack uses; no reference
analog: Lucene 4.8 predates vector search, this is an LLM-ops extension).

RRF(d) = Σ_lists 1 / (K + rank_list(d)), rank 1-based, K = 60 by default.

Ray-Data-first shape: the two retrieval LEGS are the distributed engines —
the BM25 leg runs on the partitioned inverted index (search/serve.py actor
pool at scale) and the vector leg is ops/knn.py's broadcast-query
partial-top-k — so fusion's input is two k-length ranked lists, k-scale
data by construction. The fuse itself is therefore a driver-side O(k·lists)
merge, the same altitude as TopDocs.Merge (SURVEY §2.8 partial+final
pattern): fusing on the driver is not a scale compromise, it IS the final
reduce. Contributions are float64, summed in list order (lexical first),
so the SQL oracle's COALESCE(lex,0)+COALESCE(vec,0) is bit-identical.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa


def rrf_fuse(rank_lists: Sequence[Sequence[int]], k: int = 10,
             K: int = 60) -> pa.Table:
    """Fuse ranked id lists → top-k pa.Table (doc_id, rrf_score).

    Each input list is ordered best-first (rank = 1-based position).
    Output ordered by (rrf_score desc, doc_id asc) — HitQueue tie-break.
    """
    scores: dict[int, float] = {}
    for lst in rank_lists:
        for r, d in enumerate(lst, 1):
            d = int(d)
            scores[d] = scores.get(d, 0.0) + 1.0 / (K + r)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "doc_id": pa.array([d for d, _ in top], type=pa.int64()),
        "rrf_score": pa.array([s for _, s in top], type=pa.float64()),
    })


def borda_fuse(rank_lists, k: int = 10, leg_k: int = 20):
    """Borda-count metasearch fusion (Aslam & Montague, SIGIR 2001
    "Models for Metasearch" §3: each system awards leg_k - rank + 1
    points to its ranked docs, unranked docs score 0) — the pure-integer
    voting-theory sibling of :func:`rrf_fuse`, so the fused order is
    exact at any parallelism with no float division at all. Ties break
    doc_id-ascending. Returns (doc_id, borda) top-k."""
    import pyarrow as pa

    pts: dict[int, int] = {}
    for lst in rank_lists:
        for r, d in enumerate(lst, start=1):
            pts[int(d)] = pts.get(int(d), 0) + (leg_k - r + 1)
    rows = sorted(pts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({
        "doc_id": pa.array([d for d, _p in rows], type=pa.int64()),
        "borda": pa.array([p for _d, p in rows], type=pa.int64()),
    })
