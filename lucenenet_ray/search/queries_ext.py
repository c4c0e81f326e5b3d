"""Queries-module scoring wrappers (Lucene.Net.Queries analogs).

Reference semantics re-expressed (NOT ported):

- :func:`boosting_search` — ``Queries/BoostingQuery.cs``: rewrites to
  ``BooleanQuery(match MUST, context SHOULD)`` whose BooleanWeight
  overrides ``Coord`` (:71-83): a doc matching only the match query keeps
  its score (coord 1.0); a doc also matching the context query has the
  summed clause score multiplied by ``boost`` — the "demote if it ALSO
  matches this" query (boost < 1 pushes context matches down without
  excluding them).  Clause scores are the engine's BM25 float32 values,
  summed match-then-context and multiplied in float32, the repo's pinned
  Boolean accumulation contract.

- :func:`custom_score_search` — ``Queries/CustomScoreQuery.cs`` +
  ``CustomScoreProvider.CustomScore`` (:~100): ``score = subQueryScore *
  valSrcScore`` in float32, where the value source is a numeric
  doc-values field read through the index's per-bucket docvalues columns
  (``Function/ValueSources/Int32FieldSource`` → (float)value).

Both evaluate the sub-queries once over the whole match set (prune=False
exact scores) and re-rank; at scale the rewrite stays one Boolean/term
plan over the serving pool — these wrappers only reorder its output.
"""

from __future__ import annotations

import numpy as np

from lucenenet_ray.search.query import Query


def _all_hits(reader, q: Query) -> list[tuple[int, float]]:
    from lucenenet_ray.search.searcher import search

    return search(reader, q, k=reader.num_docs, prune=False).to_list()


def boosting_search(reader, match: Query, context: Query, boost: float,
                    k: int = 10) -> list[tuple[int, np.float32]]:
    """Top-k (score desc, doc asc) under BoostingQuery semantics."""
    bf = np.float32(boost)
    ctx = dict(_all_hits(reader, context))
    rows: list[tuple[int, np.float32]] = []
    for d, s in _all_hits(reader, match):
        cs = ctx.get(d)
        if cs is None:  # overlap 1 -> coord 1.0f (exact no-op)
            sc = np.float32(s)
        else:  # overlap 2 -> multiply the clause sum by boost
            sc = np.float32(np.float32(np.float32(s) + np.float32(cs)) * bf)
        rows.append((d, sc))
    rows.sort(key=lambda r: (-float(r[1]), r[0]))
    return rows[:k]


def custom_score_search(reader, sub: Query, dv_field: str, k: int = 10
                        ) -> list[tuple[int, np.float32]]:
    """Top-k with score = f32(subQueryScore * (float)docvalue)."""
    dv: dict[int, np.float32] = {}
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        ids = bucket.norms()[0]
        vals = bucket.docvalues(dv_field)
        for i, v in zip(ids.tolist(), vals.tolist()):
            dv[i] = np.float32(v)
    rows = [(d, np.float32(np.float32(s) * dv.get(d, np.float32(0.0))))
            for d, s in _all_hits(reader, sub)]
    rows.sort(key=lambda r: (-float(r[1]), r[0]))
    return rows[:k]
