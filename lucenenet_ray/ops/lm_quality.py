"""Language-model quality filtering (CCNet / Wenzek et al. 2020 practice).

The CCNet pipeline scores every document with a fixed reference language
model (KenLM 5-gram trained on Wikipedia) and keeps/filters by per-token
perplexity bucket.  This module re-expresses that op Ray-Data-first with
the repo's stupid-backoff bigram LM (ops/freetext.py — the same model
family the reference ships as FreeTextSuggester,
``Suggest/Analyzing/FreeTextSuggester.cs:102,670,777``):

* the REFERENCE MODEL is built once from a deterministic corpus subset
  (``doc_id % 10 == 0`` in the gate — standing in for "Wikipedia"),
  exactly the fixed-size-model shape CCNet uses: the model does NOT grow
  with the corpus being scored, so at 100 TB it is built from a sampled
  slice, written once, and loaded once per scoring actor;
* scoring is a zero-shuffle actor-pool ``map_batches``: every transition
  w1→w2 of a doc gets the stupid-backoff weight, summed per doc.

Documented delta vs CCNet: KenLM log10-probabilities are floats whose
sum order is not oracle-stable, so the GATE-GRADED score uses the exact
rational form of the same backoff (integers end to end):

    w(w1→w2) = (SCALE * c(w1 w2)) // c(w1)          if the bigram is in
                                                     the model
             = (SCALE * 4 * c(w2)) // (10 * totTokens)   backoff (0.4
                                                     stupid-backoff
                                                     discount, exact)
             = 0                                     OOV

    lm_score(doc) = sum of w over transitions;  avg_w = lm_score //
    n_transitions is the per-token fluency (the perplexity-bucket
    analog: CCNet's head/middle/tail split thresholds avg_w instead of
    log-perplexity — same ordering semantics, no float drift).

Bound note: SCALE * c(bigram) must fit int64, i.e. per-bigram model
counts < 9.2e12 with SCALE = 1e6.  A reference model is count-pruned far
below that in practice (CCNet's KenLM is likewise pruned); assert at
load time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALE = 10 ** 6
ALPHA_NUM, ALPHA_DEN = 4, 10  # stupid-backoff discount 0.4, exact


def build_reference_model(ds, out_path: str, text_col: str = "text") -> str:
    """Count 1/2-grams of the reference slice into a key-sorted parquet
    dictionary (one map_batches + one groupby — ops/freetext.py)."""
    from lucenenet_ray.ops.freetext import build_freetext_model

    return build_freetext_model(ds, out_path, text_col=text_col, grams=2)


class _Model:
    __slots__ = ("uni", "big", "tot")

    def __init__(self, path: str):
        t = pq.read_table(path)
        grams = t.column("gram").to_pylist()
        orders = t.column("ord").to_numpy()
        counts = t.column("count").to_numpy()
        self.uni = {g: int(c) for g, o, c in zip(grams, orders, counts)
                    if o == 1}
        self.big = {g: int(c) for g, o, c in zip(grams, orders, counts)
                    if o == 2}
        self.tot = sum(self.uni.values())
        if counts.size and int(counts.max()) * SCALE >= (1 << 63):
            raise ValueError("model counts overflow int64 at SCALE=1e6; "
                             "prune the reference model")


class LMDocScorer:
    """Actor-pool stage: per-doc exact-rational stupid-backoff fluency.

    Output rows only for docs with >= 1 transition (2+ tokens), matching
    the SQL oracle's GROUP BY over the pairs relation:
    (doc_id, lm_score, n_trans, avg_w).
    """

    def __init__(self, model_path: str):
        self.m = _Model(model_path)  # once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        # tokenisation mirrors the oracle: split on ' ' and drop empties
        toks = [[w for w in (x or "").split(" ") if w] for x in texts]
        lens = np.fromiter((len(tk) for tk in toks), dtype=np.int64,
                           count=len(toks))
        n = int(lens.sum())
        if n == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "lm_score": pa.array([], type=pa.int64()),
                             "n_trans": pa.array([], type=pa.int64()),
                             "avg_w": pa.array([], type=pa.int64())})
        flat = np.empty(n, dtype=object)
        pos = 0
        for tk in toks:
            flat[pos:pos + len(tk)] = tk
            pos += len(tk)
        doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        # transition i→i+1 is valid only within one doc
        valid = doc_of[:-1] == doc_of[1:]
        w1 = flat[:-1][valid]
        w2 = flat[1:][valid]
        tdoc = doc_of[:-1][valid]
        # C-speed dict lookups via pandas map (no per-row Python loop)
        s1 = pd.Series(w1, dtype=object)
        s2 = pd.Series(w2, dtype=object)
        b = (s1 + " " + s2).map(self.m.big).fillna(0).astype(np.int64) \
            .to_numpy()
        u1 = s1.map(self.m.uni).fillna(0).astype(np.int64).to_numpy()
        u2 = s2.map(self.m.uni).fillna(0).astype(np.int64).to_numpy()
        tot = max(self.m.tot, 1)
        w = np.where(
            b > 0,
            (SCALE * b) // np.maximum(u1, 1),  # u1 >= b > 0 in-model
            np.where(u2 > 0,
                     (SCALE * ALPHA_NUM * u2) // (ALPHA_DEN * tot),
                     np.int64(0)))
        score = np.zeros(len(toks), dtype=np.int64)
        ntr = np.zeros(len(toks), dtype=np.int64)
        np.add.at(score, tdoc, w)
        np.add.at(ntr, tdoc, 1)
        keep = ntr > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "lm_score": pa.array(score[keep], type=pa.int64()),
            "n_trans": pa.array(ntr[keep], type=pa.int64()),
            "avg_w": pa.array(score[keep] // ntr[keep], type=pa.int64()),
        })


def lm_score_dataset(ds, model_path: str, concurrency: int = 4):
    """Score a documents Dataset; returns a Dataset of
    (doc_id, lm_score, n_trans, avg_w).  Zero shuffles: the model is
    loaded once per actor, batches stream through.  The pool is capped at
    cluster CPUs - 2 so upstream read tasks keep a slot."""
    import ray

    cap = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
    return ds.map_batches(LMDocScorer, fn_constructor_args=(model_path,),
                          batch_format="pyarrow",
                          concurrency=min(concurrency, cap))


def lm_bucket_cutoffs(scored_ref) -> tuple[int, int]:
    """CCNet tercile thresholds, computed ONCE on the reference slice
    (Wenzek et al. 2020 §4.3 computes head/middle/tail perplexity
    thresholds on a sample, then buckets the whole corpus against them).

    Rank-select WITHOUT materializing the slice's rows on the driver: the
    cutoff value at (desc) rank i is fully determined by the avg_w
    HISTOGRAM, so one ``groupby(avg_w).count()`` (driver sees only the
    distinct fluency values) + a cumulative scan gives the exact
    boundaries.  Ranks are 1-based over (avg_w desc): i1 = ceil(n/3),
    i2 = ceil(2n/3) in exact integer form.
    """
    hist = scored_ref.groupby("avg_w").count().to_pandas()
    hist = hist.sort_values("avg_w", ascending=False)
    vals = hist["avg_w"].to_numpy()
    cum = np.cumsum(hist["count()"].to_numpy())
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        raise ValueError("empty reference slice — no cutoffs")
    i1 = (n + 2) // 3
    i2 = (2 * n + 2) // 3
    c1 = int(vals[int(np.searchsorted(cum, i1))])
    c2 = int(vals[int(np.searchsorted(cum, i2))])
    return c1, c2


def lm_perplexity_buckets(ds_all, ds_ref, model_path: str,
                          concurrency: int = 4) -> "pa.Table":
    """CCNet head/middle/tail split: score the reference slice, derive the
    tercile cutoffs (c1, c2), then bucket EVERY doc of the corpus —
    head: avg_w >= c1 (most fluent), middle: avg_w >= c2, tail: the rest.
    Docs with < 2 tokens are unscored and excluded (CCNet drops empties).

    Two streaming passes by construction (the cutoffs must exist before
    bucketing, same as CCNet): pass 1 over the SLICE only, pass 2 over the
    corpus with (c1, c2) broadcast as plain ints in the batch closure.
    Returns the per-bucket aggregate (bucket, n_docs, sum_avg_w)."""
    c1, c2 = lm_bucket_cutoffs(
        lm_score_dataset(ds_ref, model_path, concurrency=concurrency))
    scored = lm_score_dataset(ds_all, model_path, concurrency=concurrency)

    def add_bucket(t: pa.Table) -> pa.Table:
        w = t.column("avg_w").to_numpy(zero_copy_only=False)
        bucket = np.where(w >= c1, "head",
                          np.where(w >= c2, "middle", "tail"))
        return pa.table({"bucket": pa.array(bucket, type=pa.string()),
                         "avg_w": pa.array(w, type=pa.int64())})

    from ray.data.aggregate import Count, Sum

    agg = (scored.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Count(), Sum("avg_w"))
           .to_pandas())
    agg = agg.rename(columns={"count()": "n_docs",
                              "sum(avg_w)": "sum_avg_w"})
    agg = agg.sort_values("bucket").reset_index(drop=True)
    return pa.table({
        "bucket": pa.array(agg["bucket"], type=pa.string()),
        "n_docs": pa.array(agg["n_docs"].astype("int64"), type=pa.int64()),
        "sum_avg_w": pa.array(agg["sum_avg_w"].astype("int64"),
                              type=pa.int64()),
    })


def lm_quality_filter(ds, model_path: str, min_avg_w: int,
                      concurrency: int = 4):
    """CCNet-style keep filter: docs whose per-token fluency avg_w is >=
    ``min_avg_w`` (docs with < 2 tokens are dropped, as CCNet drops
    empty docs).  Returns the (doc_id, lm_score, n_trans, avg_w) rows of
    the kept docs; join back to content by doc_id downstream."""
    scored = lm_score_dataset(ds, model_path, concurrency=concurrency)
    return scored.filter(
        expr=f"avg_w >= {int(min_avg_w)}")
