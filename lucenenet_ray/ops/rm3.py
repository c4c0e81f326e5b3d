"""RM3 pseudo-relevance feedback (Lavrenko & Croft 2001 relevance
models; Abdul-Jaleel et al. 2004 RM3 interpolation) — the
language-model sibling of ops/rocchio.py's vector-space expansion:

    P_RM1(t) ∝ Σ_{d ∈ top-k}  P(t|d) · Π_{qi} P(qi|d)
    RM3(t)   =  λ·P_orig(t) + (1-λ)·P_RM1(t)/Σ P_RM1

with P(t|d) = tf(t,d)/|d| over the stop-filtered token stream (the
oracle's `kept` CTE definition), pseudo-relevant set = the engine's
BM25 top-k, P_orig = uniform over the query terms.

Float discipline (the mmr/maxsim precedent — BIT-IDENTICAL, not
tolerance-compared): every float64 operation has a fixed order mirrored
in the SQL oracle — the query-likelihood product folds left in query
order, each term's weight folds left in doc_id order
(``list_sum(list(x ORDER BY doc_id))``), the normalizer folds left in
term order, and the final interpolation parenthesizes as
``orig + ((1-λ) · (w / W))``. Identical bits → identical ranking, so
the gate is rank-only with no tolerance.

Distributed shape: top-k ids broadcast (k-scale); ONE streaming pass
with a vectorized np.isin mask collects the k docs' term stats
(k·vocab-per-doc rows); everything after is k-scale driver math.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS


def _kept(text: str) -> list[str]:
    return [t for t in (text or "").split(" ")
            if t and t not in ENGLISH_STOP_WORDS]


def rm3_expand(docs_ds, reader, query, query_terms: list[str],
               fb_docs: int = 10, fb_terms: int = 10,
               lam: float = 0.5) -> pa.Table:
    """(rank, term) — the top fb_terms of the RM3 distribution."""
    import ray

    from lucenenet_ray.search.searcher import search

    td = search(reader, query, k=fb_docs)
    top_ids = np.asarray(sorted(int(d) for d, _s in td.to_list()),
                         dtype=np.int64)
    idref = ray.put(top_ids)

    def partials(t: pa.Table) -> pa.Table:
        want = ray.get(idref)
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        mask = np.isin(ids, want)
        out_d, out_t, out_tf, out_len = [], [], [], []
        if mask.any():
            sub = t.filter(pa.array(mask))
            for did, txt in zip(sub.column("doc_id").to_pylist(),
                                sub.column("text").to_pylist()):
                toks = _kept(txt)
                c = Counter(toks)
                for term in sorted(c):
                    out_d.append(int(did))
                    out_t.append(term)
                    out_tf.append(c[term])
                    out_len.append(len(toks))
        return pa.table({
            "doc_id": pa.array(out_d, type=pa.int64()),
            "term": pa.array(out_t, type=pa.string()),
            "tf": pa.array(out_tf, type=pa.int64()),
            "len": pa.array(out_len, type=pa.int64()),
        })

    from lucenenet_ray.util.tables import dataset_to_table

    stats = dataset_to_table(
        docs_ds.map_batches(partials, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64()), ("term", pa.string()),
                          ("tf", pa.int64()), ("len", pa.int64())]))

    # k-scale driver math, fixed fold orders (see module docstring)
    by_doc: dict[int, tuple[int, dict[str, int]]] = {}
    for did, term, tf, ln in zip(stats.column("doc_id").to_pylist(),
                                 stats.column("term").to_pylist(),
                                 stats.column("tf").to_pylist(),
                                 stats.column("len").to_pylist()):
        by_doc.setdefault(did, (ln, {}))[1][term] = tf

    # seed every query term at 0.0 so a term with zero feedback mass
    # still carries its λ/|Q| origin weight into the final distribution
    # (the module docstring's interpolation formula; ADVICE r4 — the
    # candidate set is feedback-doc terms ∪ query terms)
    w: dict[str, float] = {qi: 0.0 for qi in query_terms}
    for did in sorted(by_doc):                      # doc_id-asc fold
        ln, tfs = by_doc[did]
        if ln == 0:
            continue
        p = 1.0
        for qi in query_terms:                      # query-order fold
            p = p * (float(tfs.get(qi, 0)) / ln)
        for term in sorted(tfs):
            w[term] = w.get(term, 0.0) + (float(tfs[term]) / ln) * p

    total = 0.0
    for term in sorted(w):                          # term-asc fold
        total = total + w[term]

    orig = lam / len(query_terms)
    qset = set(query_terms)
    rows = []
    for term in sorted(w):
        s = orig if term in qset else 0.0
        if total != 0.0:
            s = s + ((1.0 - lam) * (w[term] / total))
        rows.append((s, term))
    rows.sort(key=lambda r: (-r[0], r[1]))
    rows = rows[:fb_terms]
    return pa.table({
        "rank": pa.array(range(1, len(rows) + 1), type=pa.int64()),
        "term": pa.array([r[1] for r in rows], type=pa.string()),
    })
