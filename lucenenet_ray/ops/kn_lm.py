"""Interpolated Kneser-Ney bigram language model — the smoothing used by
every classic n-gram LM toolkit (Kneser & Ney 1995; Chen & Goodman 1998
§2.7 give the interpolated form) and the LM behind perplexity-based
corpus filtering (CCNet trains exactly this family).

Exact-rational formulation (discount D fixed at 3/4, so probabilities are
integer ratios and summation order can never move a bit):

    p_KN(w | u) = max(c(uw) - D, 0) / c(u)
                  + (D * N1+(u.) / c(u)) * N1+(.w) / N1+(..)

with c(u) = sum_w c(uw) (context totals over the bigram table), N1+(u.) =
distinct continuations of u, N1+(.w) = distinct left contexts of w,
N1+(..) = distinct bigram types. Multiplying through by the common
denominator 4 * c(u) * N1+(..) gives the integer score

    p_num(w | u) = (4*c(uw) - 3) * N1pp + 3 * N1u * N1w      (c(uw) >= 1)
    p_den(u)     = 4 * c(u) * N1pp

so ranking continuations of a FIXED context u is an exact BIGINT sort.
The gate query picks u0 = the context with the highest c(u) (ties: term
asc) — data-driven but deterministic, so the SQL oracle re-derives it.

Token/bigram definition (mirrored by the oracle): tokens are the raw
``text.split(' ')`` stream; a bigram is a raw-ADJACENT pair with both
sides non-empty; no stop removal (LMs keep function words).

Distributed shape: one ``map_batches`` pass emits per-batch PARTIAL
(u, w, cnt) rows (batch-local combine via paired vocab codes, the
ops/cooccur.py kernel), ONE ``groupby(u, w)`` finalizes the bigram
table — every downstream statistic (context totals, continuation counts,
N1pp, the argmax context, the top-k scores) is computed from that
vocab-bounded aggregate, which is orders of magnitude smaller than the
corpus; at gate scale it is collected to the driver, and above ~10^9
bigram types each reduction is itself one more small groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KN_D_NUM = 3  # D = 3/4: all scores scale by 4*c(u)*N1pp exactly
KN_D_DEN = 4


def _batch_bigrams(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch combined (u, w, cnt) partial bigram counts."""
    texts = t.column(text_col).to_pylist()
    toks_parts, doc_parts = [], []
    for di, txt in enumerate(texts):
        ts = (txt or "").split(" ")
        toks_parts.append(np.asarray(ts, dtype=object))
        doc_parts.append(np.full(len(ts), di, dtype=np.int64))
    empty = pa.table({"u": pa.array([], type=pa.string()),
                      "w": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    if not toks_parts:
        return empty
    toks = np.concatenate(toks_parts)
    docs = np.concatenate(doc_parts)
    if len(toks) < 2:
        return empty
    a, b = toks[:-1], toks[1:]
    valid = (docs[:-1] == docs[1:]) & (a != "") & (b != "")
    a, b = a[valid], b[valid]
    if len(a) == 0:
        return empty
    # integer code pairing (NUL-pad makes string concat keys unsafe)
    vu, cu = np.unique(a, return_inverse=True)
    vw, cw = np.unique(b, return_inverse=True)
    combo = cu.astype(np.int64) * len(vw) + cw
    uniq, cnt = np.unique(combo, return_counts=True)
    return pa.table({
        "u": pa.array(vu[uniq // len(vw)].tolist(), type=pa.string()),
        "w": pa.array(vw[uniq % len(vw)].tolist(), type=pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def bigram_table(ds, text_col: str = "text") -> pa.Table:
    """The finalized corpus (u, w, cnt) bigram table (one groupby)."""
    import ray

    from lucenenet_ray.util.tables import dataset_to_table

    agg = ds.map_batches(
        lambda t: _batch_bigrams(t, text_col),
        batch_format="pyarrow").groupby(["u", "w"]).sum("cnt")
    t = dataset_to_table(
        agg, schema=pa.schema([("u", pa.string()), ("w", pa.string()),
                               ("sum(cnt)", pa.int64())]))
    return t.rename_columns(["u", "w", "cnt"])


def kneser_ney_topk(ds, k: int = 20, text_col: str = "text") -> pa.Table:
    """Top-k continuations of the highest-count context u0 by exact
    interpolated-KN score: (w, c_bigram, n1w, p_num, p_den), ordered
    (p_num desc, w asc). p_den is the row-constant common denominator."""
    bt = bigram_table(ds, text_col)
    u = np.asarray(bt.column("u").to_pylist(), dtype=object)
    w = np.asarray(bt.column("w").to_pylist(), dtype=object)
    c = bt.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    n1pp = len(c)
    # context totals + continuation fan-outs from the bigram TYPES
    uu, uinv = np.unique(u, return_inverse=True)
    cu = np.zeros(len(uu), dtype=np.int64)
    np.add.at(cu, uinv, c)
    n1u = np.bincount(uinv, minlength=len(uu)).astype(np.int64)
    ww, winv = np.unique(w, return_inverse=True)
    n1w = np.bincount(winv, minlength=len(ww)).astype(np.int64)
    # u0 = argmax c(u), term-asc tie-break (uu is sorted, argmax is first)
    u0i = int(np.argmax(cu))
    u0 = uu[u0i]
    sel = uinv == u0i
    wsel = w[sel]
    csel = c[sel]
    n1wsel = n1w[winv[sel]]
    p_num = ((KN_D_DEN * csel - KN_D_NUM) * n1pp
             + KN_D_NUM * int(n1u[u0i]) * n1wsel)
    p_den = KN_D_DEN * int(cu[u0i]) * n1pp
    order = np.lexsort((wsel.astype(str), -p_num))[:k]
    return pa.table({
        "w": pa.array(wsel[order].tolist(), type=pa.string()),
        "c_bigram": pa.array(csel[order], type=pa.int64()),
        "n1w": pa.array(n1wsel[order], type=pa.int64()),
        "p_num": pa.array(p_num[order], type=pa.int64()),
        "p_den": pa.array(np.full(len(order), p_den, dtype=np.int64),
                          type=pa.int64()),
    })
