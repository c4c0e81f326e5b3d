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


# -- graded variant (Burges et al. 2005 exponential gains) -----------------
# grade g in {0..3} from an md5 judgment; gain = 2^g - 1 in {0,1,3,7} —
# integers, so graded DCG stays exact under the quantized discount table.

GRADE_MOD = 11


def grade_of(h31: int) -> int:
    """md5-int31 → grade: 0 → 3 (perfect), 1-2 → 2, 3-5 → 1, else 0."""
    m = h31 % GRADE_MOD
    if m == 0:
        return 3
    if m <= 2:
        return 2
    if m <= 5:
        return 1
    return 0


def gain_of(grade: int) -> int:
    return (1 << grade) - 1


def graded_dcg_scaled(gains: list[int]) -> int:
    """Integer graded DCG over rank-ordered gains (top-k)."""
    return sum(g * DISCOUNTS[i] for i, g in enumerate(gains[:NDCG_K]))


def graded_idcg_scaled(n3: int, n2: int, n1: int) -> int:
    """Ideal graded DCG from corpus-wide grade counts: grade-3 docs fill
    the top ranks, then grade-2, then grade-1."""
    out = 0
    for i in range(NDCG_K):
        if i < n3:
            g = 7
        elif i < n3 + n2:
            g = 3
        elif i < n3 + n2 + n1:
            g = 1
        else:
            break
        out += g * DISCOUNTS[i]
    return out
