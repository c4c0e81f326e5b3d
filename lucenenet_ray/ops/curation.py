"""End-to-end web-corpus curation funnel (RefinedWeb / FineWeb practice:
C4 line cleaning -> Gopher quality rules -> LM fluency filter, with
per-stage retention counts).

The point of this module is COMPOSITION: every stage already exists as
its own graded operator (ops/webclean.C4Clean, ops/webclean.GopherQuality,
ops/lm_quality.LMDocScorer); the funnel fuses all three per-doc decisions
into ONE streaming ``map_batches`` pass that emits per-batch PARTIAL
retention counters — zero shuffles, and the driver sees only a handful of
count rows regardless of corpus size.  At 100 TB this is the shape you
want: a curation report costs one read of the corpus.

Stage semantics (each stage filters the survivors of the previous one):

  0 total    — every doc
  1 c4_page  — C4 page filter keeps it (>=5 sentences after line
               cleaning, no lorem ipsum, no curly brace)
  2 gopher   — Gopher Appendix-A quality rules keep it
  3 fluent   — has >= 2 tokens AND per-token fluency avg_w >= the tail
               cutoff c2 (ops/lm_quality.lm_bucket_cutoffs over the
               reference slice scored in the SAME text form as the
               corpus — i.e. the doc is NOT in the perplexity tail)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class CurationFunnel:
    """Actor-pool stage: all three per-doc keep decisions in one pass,
    emitting one partial-counter row per batch.  Model + compiled rules
    load once per actor in ``__init__``."""

    def __init__(self, model_path: str, c2: int):
        from lucenenet_ray.ops.lm_quality import LMDocScorer
        from lucenenet_ray.ops.webclean import C4Clean, GopherQuality

        self.gopher = GopherQuality()
        self.c4 = C4Clean()
        self.lm = LMDocScorer(model_path)
        self.c2 = int(c2)

    def __call__(self, t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        c4_keep = self.c4(t).column("page_keep").to_numpy() == 1
        g_keep = self.gopher(t).column("keep").to_numpy() == 1
        lm = self.lm(t)
        aw = pd.Series(ids).map(
            dict(zip(lm.column("doc_id").to_pylist(),
                     lm.column("avg_w").to_pylist()))).fillna(-1) \
            .astype(np.int64).to_numpy()
        s1 = c4_keep
        s2 = s1 & g_keep
        s3 = s2 & (aw >= self.c2)
        return pa.table({
            "n_total": pa.array([len(ids)], type=pa.int64()),
            "n_c4": pa.array([int(s1.sum())], type=pa.int64()),
            "n_gopher": pa.array([int(s2.sum())], type=pa.int64()),
            "n_fluent": pa.array([int(s3.sum())], type=pa.int64()),
        })


def curation_funnel(ds_all, ds_ref, model_path: str,
                    concurrency: int = 4) -> pa.Table:
    """Run the funnel; returns the per-stage retention table
    (stage, name, n_docs).  Pass 1 scores the reference slice for the
    fluency cutoff; pass 2 streams the corpus through the fused
    three-filter counter."""
    import ray

    from lucenenet_ray.ops.lm_quality import (lm_bucket_cutoffs,
                                              lm_score_dataset)

    _c1, c2 = lm_bucket_cutoffs(
        lm_score_dataset(ds_ref, model_path, concurrency=concurrency))
    cap = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
    parts = ds_all.map_batches(
        CurationFunnel, fn_constructor_args=(model_path, c2),
        batch_format="pyarrow",
        concurrency=min(concurrency, cap)).to_pandas()
    tot = parts.sum()
    return pa.table({
        "stage": pa.array([0, 1, 2, 3], type=pa.int64()),
        "name": pa.array(["total", "c4_page", "gopher", "fluent"],
                         type=pa.string()),
        "n_docs": pa.array([int(tot["n_total"]), int(tot["n_c4"]),
                            int(tot["n_gopher"]), int(tot["n_fluent"])],
                           type=pa.int64()),
    })
