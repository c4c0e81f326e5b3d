"""Skip-gram co-occurrence counting — the corpus-wide (center, context)
pair statistics that seed word2vec/GloVe embedding training (Mikolov et
al. 2013; Pennington et al. 2014 §3 builds exactly this matrix).

Pair definition (mirrored bit-for-bit by the SQL oracle): tokens are the
raw ``text.split(' ')`` stream with their RAW split positions; an ordered
pair (center, context) is counted for every token pair in the same doc
with 0 < |pos_c - pos_x| <= window; pairs touching an empty token (double
spaces) are dropped. No stopword removal — embedding corpora keep
function words (they carry syntax), unlike the index analyzer chain.

Distributed shape: one ``map_batches`` pass emits per-batch PARTIAL
(center, context, cnt) rows (batch-local combine via np.unique over
paired vocab codes — integer counts, order-free), ONE
``groupby(center, context)``
reduces them, and top-k ranking runs as per-block partial top-k over the
aggregated pairs (each pair appears exactly once post-groupby, so
block-local top-k + a k·blocks driver merge is exact). At 100 TB the
pair cardinality is vocab-bounded (≪ corpus bytes); the groupby is the
only shuffle and moves pre-combined partials, not token pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa



def _batch_pairs(t: pa.Table, window: int,
                 text_col: str = "text") -> pa.Table:
    """Per-batch combined (center, context, cnt) partial counts."""
    texts = t.column(text_col).to_pylist()
    toks_parts, doc_parts = [], []
    for di, txt in enumerate(texts):
        ts = (txt or "").split(" ")
        toks_parts.append(np.asarray(ts, dtype=object))
        doc_parts.append(np.full(len(ts), di, dtype=np.int64))
    if not toks_parts:
        return pa.table({"center": pa.array([], type=pa.string()),
                         "context": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    toks = np.concatenate(toks_parts)
    docs = np.concatenate(doc_parts)
    centers, contexts = [], []
    for d in range(1, window + 1):
        if len(toks) <= d:
            break
        a, b = toks[:-d], toks[d:]
        valid = (docs[:-d] == docs[d:]) & (a != "") & (b != "")
        centers.append(a[valid])
        contexts.append(b[valid])
        centers.append(b[valid])
        contexts.append(a[valid])
    if not centers:
        return pa.table({"center": pa.array([], type=pa.string()),
                         "context": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    c = np.concatenate(centers)
    x = np.concatenate(contexts)
    # integer code pairing (NUL is numpy's unicode pad char, so string
    # concat keys are unsafe): vocab codes per side, combined into int64
    vc, cc = np.unique(c, return_inverse=True)
    vx, cx = np.unique(x, return_inverse=True)
    combo = cc.astype(np.int64) * len(vx) + cx
    uniq, cnt = np.unique(combo, return_counts=True)
    return pa.table({
        "center": pa.array(vc[uniq // len(vx)].tolist(), type=pa.string()),
        "context": pa.array(vx[uniq % len(vx)].tolist(), type=pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def cooccur_topk(ds, window: int = 2, k: int = 30,
                 text_col: str = "text") -> pa.Table:
    """Top-k (center, context, cnt) by (cnt desc, center asc, context asc).

    Exact at any partitioning: partials are integer counts, the groupby
    finalizes each pair exactly once, and the per-block top-k partials
    are merged with the full tie-break on the driver."""
    import ray

    agg = ds.map_batches(
        lambda t: _batch_pairs(t, window, text_col),
        batch_format="pyarrow",
    ).groupby(["center", "context"]).sum("cnt")

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "center" not in t.schema.names:
            return pa.table({"center": pa.array([], type=pa.string()),
                             "context": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        cnt = t.column("sum(cnt)").to_numpy(zero_copy_only=False)
        c = np.asarray(t.column("center").to_pylist(), dtype=object)
        x = np.asarray(t.column("context").to_pylist(), dtype=object)
        order = np.lexsort((x, c, -cnt))[:min(len(cnt), k)]
        return pa.table({
            "center": pa.array(c[order].tolist(), type=pa.string()),
            "context": pa.array(x[order].tolist(), type=pa.string()),
            "cnt": pa.array(cnt[order].astype(np.int64), type=pa.int64()),
        })

    parts = []
    for ref in agg.map_batches(
            block_topk, batch_format="pyarrow").to_arrow_refs():
        tab = ray.get(ref)
        if tab.num_rows and "center" in tab.schema.names:
            parts.append(tab)
    if not parts:
        return pa.table({"center": pa.array([], type=pa.string()),
                         "context": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    t = pa.concat_tables(parts)
    cnt = t.column("cnt").to_numpy(zero_copy_only=False)
    c = np.asarray(t.column("center").to_pylist(), dtype=object)
    x = np.asarray(t.column("context").to_pylist(), dtype=object)
    order = np.lexsort((x, c, -cnt))[:k]
    return pa.table({
        "center": pa.array(c[order].tolist(), type=pa.string()),
        "context": pa.array(x[order].tolist(), type=pa.string()),
        "cnt": pa.array(cnt[order].astype(np.int64), type=pa.int64()),
    })
