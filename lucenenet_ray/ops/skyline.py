"""Skyline (Pareto-front) query over per-doc statistics — the classic
OLAP multi-criteria operator (Börzsönyi, Kossmann & Stocker, ICDE 2001):
return the docs no other doc dominates.  Dimensions here: token count
(MINIMIZE) vs distinct-token count (MAXIMIZE) — the "densest
vocabulary per length" front a curation pipeline uses to pick compact,
information-rich exemplars.

Dominance: a dominates b iff n_tokens(a) <= n_tokens(b) AND
n_distinct(a) >= n_distinct(b), strict in at least one.  Ties on BOTH
dimensions: every tied doc is on the front (standard skyline
semantics — no doc strictly beats it).

Distributed shape (the skyline is DISTRIBUTIVE: the global front is a
subset of the union of block-local fronts): one map_batches pass emits
each block's local skyline (sort by (x asc, y desc) then running-max
prune — vectorized), the driver reduces the candidate union (front-scale,
not corpus-scale) with the same kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _local_skyline(doc: np.ndarray, x: np.ndarray,
                   y: np.ndarray) -> tuple[np.ndarray, ...]:
    """Skyline of (minimize x, maximize y) triples, vectorized."""
    order = np.lexsort((doc, -y, x))  # x asc, y desc, doc asc
    xs, ys, ds = x[order], y[order], doc[order]
    # scan in sorted order: an item survives iff its y strictly beats
    # every earlier (smaller-or-equal x) item's y, or ties the running
    # best on BOTH dims (standard skyline tie semantics)
    keep = np.zeros(len(xs), dtype=bool)
    cur_best_y = np.iinfo(np.int64).min
    cur_best_x = None
    for i in range(len(xs)):
        if ys[i] > cur_best_y:
            keep[i] = True
            cur_best_y = ys[i]
            cur_best_x = xs[i]
        elif ys[i] == cur_best_y and xs[i] == cur_best_x:
            keep[i] = True  # tied on both dims with the current best
    return ds[keep], xs[keep], ys[keep]


def skyline_docs(ds, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, n_distinct) skyline rows, doc-sorted."""
    def partial(t: pa.Table) -> pa.Table:
        ids, xs, ys = [], [], []
        for did, x in zip(t.column(id_col).to_pylist(),
                          t.column(text_col).to_pylist()):
            toks = [w for w in (x or "").split(" ") if w]
            if not toks:
                continue
            ids.append(did)
            xs.append(len(toks))
            ys.append(len(set(toks)))
        if not ids:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_tokens": pa.array([], type=pa.int64()),
                             "n_distinct": pa.array([], type=pa.int64())})
        d, xx, yy = _local_skyline(np.asarray(ids, dtype=np.int64),
                                   np.asarray(xs, dtype=np.int64),
                                   np.asarray(ys, dtype=np.int64))
        return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                         "n_tokens": pa.array(xx, type=pa.int64()),
                         "n_distinct": pa.array(yy, type=pa.int64())})

    from lucenenet_ray.util.tables import dataset_to_table

    cand = dataset_to_table(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64()),
                          ("n_tokens", pa.int64()),
                          ("n_distinct", pa.int64())]))
    d, x, y = _local_skyline(
        cand.column("doc_id").to_numpy(zero_copy_only=False),
        cand.column("n_tokens").to_numpy(zero_copy_only=False),
        cand.column("n_distinct").to_numpy(zero_copy_only=False))
    order = np.argsort(d)
    return pa.table({"doc_id": pa.array(d[order], type=pa.int64()),
                     "n_tokens": pa.array(x[order], type=pa.int64()),
                     "n_distinct": pa.array(y[order], type=pa.int64())})
