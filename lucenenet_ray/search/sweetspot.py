"""SweetSpotSimilarity (``Misc/SweetSpotSimilarity.cs``) — a
DefaultSimilarity override with tunable tf and length-norm curves.

Reference formulas re-expressed float32-exactly (NOT ported):

- ``ComputeLengthNorm(L)`` (:142-149): a plateau of 1.0 between
  ``ln_min``..``ln_max`` falling off hyperbolically outside it::

      (float)(1.0 / sqrt( steep*( |L-min| + |L-max| - (max-min) ) + 1f ))

  (inner products/sums in float32, sqrt in double, final cast to float32);
  ``LengthNorm`` (:108-121) multiplies by the field boost (1 here) and the
  result is SmallFloat byte315-encoded like every norm
  (DefaultSimilarity.EncodeNormValue) — quantization included.

- ``BaselineTf(freq)`` (:172-180)::

      0            if freq <= 0
      tf_base      if freq <= tf_min
      (float)sqrt(freq + tf_base² - tf_min)   otherwise

- ``HyperbolicTf(freq)`` (:196-211)::

      min + (float)((max-min)/2 * (tanh-shaped((freq-xoffset)) + 1))

  computed with ``Math.Pow`` in double like the reference.

Everything else (idf, queryNorm, coord, raw = tf·value, score =
raw·decodedNorm) is inherited from DefaultSimilarity — identical to the
engine's classic plan (search/searcher.py _plan_classic /
bm25.classic_score_freqs), so :func:`sweetspot_search` mirrors that code
path with the two overridden pieces swapped in.  Because a custom
similarity changes what norms are WRITTEN at index time, the norm byte is
recomputed from the stored per-doc field length (norms()[1]) — exactly the
byte a SweetSpot-configured writer would have stored.
"""

from __future__ import annotations

import math

import numpy as np

from lucenenet_ray.search.query import (BooleanQuery, Occur, Query,
                                        TermQuery)


class SweetSpotSimilarity:
    """Tunable tf / length-norm factors (SetBaselineTfFactors,
    SetLengthNormFactors, SetHyperbolicTfFactors defaults :45-53)."""

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 ln_steep: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0, hyper_min: float = 0.0,
                 hyper_max: float = 2.0, hyper_base: float = 1.3,
                 hyper_xoffset: float = 10.0):
        self.ln_min, self.ln_max = ln_min, ln_max
        self.ln_steep = np.float32(ln_steep)
        self.tf_base, self.tf_min = np.float32(tf_base), np.float32(tf_min)
        self.hyper_min = np.float32(hyper_min)
        self.hyper_max = np.float32(hyper_max)
        self.hyper_base = float(hyper_base)
        self.hyper_xoffset = np.float32(hyper_xoffset)

    def compute_length_norm(self, num_terms: np.ndarray) -> np.ndarray:
        l, h = self.ln_min, self.ln_max
        t = np.asarray(num_terms, dtype=np.int64)
        inner = (np.abs(t - l) + np.abs(t - h) - (h - l)).astype(np.float32)
        v = self.ln_steep * inner + np.float32(1.0)
        return (1.0 / np.sqrt(v.astype(np.float64))).astype(np.float32)

    def baseline_tf(self, freq: np.ndarray) -> np.ndarray:
        f = np.asarray(freq, dtype=np.float32)
        big = np.sqrt(((f + np.float32(self.tf_base * self.tf_base))
                       - self.tf_min).astype(np.float64)).astype(np.float32)
        out = np.where(f <= self.tf_min,
                       np.float32(self.tf_base), big).astype(np.float32)
        return np.where(f <= 0.0, np.float32(0.0), out).astype(np.float32)

    def hyperbolic_tf(self, freq: np.ndarray) -> np.ndarray:
        f = np.asarray(freq, dtype=np.float32)
        mn, mx = self.hyper_min, self.hyper_max
        out = np.empty(f.shape, dtype=np.float32)
        for i, fv in np.ndenumerate(f):
            if fv <= 0.0:
                out[i] = 0.0
                continue
            x = np.float32(fv - self.hyper_xoffset)
            # np.power: overflow -> inf like Math.Pow (math.pow raises)
            with np.errstate(over="ignore", invalid="ignore"):
                pb = float(np.power(np.float64(self.hyper_base),
                                    np.float64(x)))
                nb = float(np.power(np.float64(self.hyper_base),
                                    np.float64(-x)))
                r = mn + np.float32(
                    float(np.float32(mx - mn)) / 2.0 * ((pb - nb) / (pb + nb)
                                                        + 1.0))
            out[i] = mx if math.isnan(r) else np.float32(r)
        return out


def sweetspot_search(reader, query: Query, k: int = 10,
                     sim: SweetSpotSimilarity | None = None):
    """Top-k (score desc, doc asc) for a Term/Boolean-of-terms query with
    SweetSpot tf + length norm — the classic plan (_plan_classic) with the
    two overrides swapped in.  Returns [(doc_id, float32 score)]."""
    from lucenenet_ray.search.bm25 import classic_idf, classic_query_norm
    from lucenenet_ray.util.smallfloat import (CLASSIC_NORM_TABLE,
                                               float_to_byte315)

    sim = sim or SweetSpotSimilarity()
    leaves: list[tuple[str, float]] = []

    def walk(q: Query) -> None:
        if isinstance(q, TermQuery):
            leaves.append((q.term, float(q.boost)))
        elif isinstance(q, BooleanQuery):
            for c in q.clauses:
                if c.occur != Occur.MUST_NOT:
                    walk(c.query)
        else:
            raise NotImplementedError(
                "SweetSpot scoring supports Term/Boolean queries")

    walk(query)
    stats = reader.term_stats([t for t, _ in leaves])
    idfs = {t: classic_idf(stats[t][0], reader.num_docs)
            for t, _ in leaves if t in stats}
    sum_sq = np.float32(0.0)
    for t, bo in leaves:
        if t in idfs:
            qw = np.float32(idfs[t] * np.float32(bo))
            sum_sq = np.float32(sum_sq + np.float32(qw * qw))
    qnorm = classic_query_norm(sum_sq) if sum_sq > 0 else np.float32(1.0)
    values = {}
    for t, bo in leaves:
        if t in idfs:
            qw = np.float32(idfs[t] * np.float32(bo))
            values[t] = np.float32(np.float32(qw * qnorm) * idfs[t])
    maxov = len(leaves)
    rows: list[tuple[int, np.float32]] = []
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        doc_ids, doc_len, _nb = bucket.norms()
        if doc_ids.size == 0:
            continue
        # SweetSpot norms: encode(lengthNorm(L)) per doc, then classic decode
        nb_ss = float_to_byte315(sim.compute_length_norm(doc_len))
        dec = CLASSIC_NORM_TABLE[nb_ss.astype(np.int64)]
        chunks = bucket.chunks_for_terms(sorted(values))
        acc = np.zeros(doc_ids.size, dtype=np.float32)
        overlap = np.zeros(doc_ids.size, dtype=np.int64)
        for t, _bo in leaves:  # clause order float32 adds
            ch = chunks.get(t)
            if ch is None or t not in values:
                continue
            lidx = ch.local_ids(bucket)
            tf = sim.baseline_tf(ch.freqs())
            s = ((tf * values[t]) * dec[lidx]).astype(np.float32)
            acc[lidx] = (acc[lidx] + s).astype(np.float32)
            overlap[lidx] += 1
        hit = np.flatnonzero(overlap > 0)
        coord = (overlap[hit].astype(np.float32)
                 / np.float32(maxov)).astype(np.float32)
        final = (acc[hit] * coord).astype(np.float32)
        rows.extend(zip(doc_ids[hit].tolist(), final.tolist()))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]
