"""nDCG@k for the quality-benchmark family (Järvelin & Kekäläinen,
TOIS 2002) — the graded-ranking companion to the P@k/MRR/AvP metrics of
the Benchmark Quality analog (``__ray_entry__._q_quality_eval``,
reference ``Quality/QualityStats.cs``; the reference package itself
stops at P@k/MRR/AvP, so this row is beyond-reference).

Exact-integer discipline: the 1/log2(rank+1) discounts are quantized
ONCE here as ``floor(10^9 / log2(i+1))`` and this module is the single
source for BOTH the engine and the SQL-oracle generator (the literals
are embedded into the SQL), so no libm/DuckDB log divergence can enter —
the same shared-constant move as the AvP lcm scaling.  DCG sums integer
discounts; nDCG is the integer fixed point (dcg * 10^9) // idcg.
"""

from __future__ import annotations

import math

SCALE = 1_000_000_000
NDCG_K = 10

# discount at rank i (1-based): floor(SCALE / log2(i + 1))
DISCOUNTS: tuple[int, ...] = tuple(
    int(SCALE / math.log2(i + 1)) for i in range(1, NDCG_K + 1)
)


def dcg_scaled(rel_flags: list[bool]) -> int:
    """Integer DCG over the top-k binary relevance flags (rank order)."""
    return sum(DISCOUNTS[i] for i, r in enumerate(rel_flags[:NDCG_K]) if r)


def idcg_scaled(num_rel: int) -> int:
    """Ideal DCG: all relevant docs packed at the top ranks."""
    return sum(DISCOUNTS[: min(num_rel, NDCG_K)])
