"""IndexSearcher.Explain analog (``Search/IndexSearcher.cs`` Explain →
``Weight.Explain`` / ``BM25Similarity.Explain``, BM25Similarity.cs:
ExplainScore): a structured per-document score breakdown whose root
value is BIT-IDENTICAL to the float32 score ``search()`` returns for
that document.

Shape mirrors Lucene's ``Explanation`` tree — ``{value, description,
details: [...]}`` with a ``match`` flag at the root — for Term and
Boolean-of-term queries (the shapes Explain is used on in practice;
other nodes raise NotImplementedError like an unsupported Weight).
"""

from __future__ import annotations

import numpy as np

from lucenenet_ray.search.query import (BooleanQuery, Occur, Query,
                                        TermQuery)


def _find_bucket(reader, doc_id: int):
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        ids = bucket.norms()[0]
        if ids.size and ids[0] <= doc_id <= ids[-1]:
            pos = np.searchsorted(ids, doc_id)
            if pos < ids.size and ids[pos] == doc_id:
                return bucket, int(pos)
    return None, -1


def _term_explanation(plan, bucket, row: int, term: str,
                      boost: float) -> dict | None:
    w = plan.weights.get((term, float(boost)))
    if w is None:
        return None
    chunks = bucket.chunks_for_terms([term])
    ch = chunks.get(term)
    if ch is None:
        return None
    lidx = ch.local_ids(bucket)
    hit = np.flatnonzero(lidx == row)
    if hit.size == 0:
        return None
    freq = int(np.asarray(ch.freqs())[hit[0]])
    nb = int(bucket.norms()[2][row])
    cache = plan.cache_for(term)[nb]
    f = np.float32(freq)
    tf_norm = np.float32(np.float32(w.weight_value * f)
                         / np.float32(f + cache))
    return {
        "value": float(tf_norm),
        "description": f"weight({term} in {row}) [BM25], product of:",
        "details": [
            {"value": float(w.idf),
             "description": f"idf(docFreq={w.df}, maxDocs={plan.num_docs})",
             "details": []},
            {"value": float(np.float32(tf_norm / w.weight_value))
             if w.weight_value else 0.0,
             "description": f"tfNorm(freq={freq}, k1=1.2, b=0.75, "
                            f"fieldLength~byte {nb})",
             "details": []},
        ],
    }


def explain(reader, query: Query, doc_id: int) -> dict:
    """Explanation tree for ``doc_id`` under ``query``; root ``value``
    equals the float32 score search() gives this doc (0.0, match=False
    when the doc doesn't match)."""
    from lucenenet_ray.search.searcher import plan_query

    plan = plan_query(reader, query)
    bucket, row = _find_bucket(reader, doc_id)
    no_match = {"match": False, "value": 0.0,
                "description": "no matching term", "details": []}
    if bucket is None:
        return no_match
    if isinstance(query, TermQuery):
        e = _term_explanation(plan, bucket, row, query.term, query.boost)
        if e is None:
            return no_match
        return {"match": True, **e}
    if isinstance(query, BooleanQuery):
        details = []
        score = np.float32(0.0)
        must_missing = False
        for cl in query.clauses:
            if not isinstance(cl.query, TermQuery):
                raise NotImplementedError(
                    "explain supports Term/Boolean-of-term queries")
            e = _term_explanation(plan, bucket, row, cl.query.term,
                                  cl.query.boost)
            if cl.occur is Occur.MUST_NOT:
                if e is not None:
                    return no_match
                continue
            if e is None:
                if cl.occur is Occur.MUST:
                    must_missing = True
                continue
            details.append(e)
            score = np.float32(score + np.float32(e["value"]))
        need = max(query.min_should_match,
                   0 if any(c.occur is Occur.MUST for c in query.clauses)
                   else 1)
        matched_should = sum(
            1 for cl in query.clauses if cl.occur is Occur.SHOULD
            and _term_explanation(plan, bucket, row, cl.query.term,
                                  cl.query.boost) is not None)
        if must_missing or matched_should < need or not details:
            return no_match
        return {"match": True, "value": float(score),
                "description": "sum of:", "details": details}
    raise NotImplementedError(
        "explain supports Term/Boolean-of-term queries")
