"""SimilarityBase scoring family — DFR, IB, LM Dirichlet, LM Jelinek-Mercer.

Float32-bit-identical re-expression of the reference's pluggable
information-model similarities (``src/Lucene.Net/Search/Similarities/``):

- ``SimilarityBase.cs`` — norm encode/decode shared with BM25
  (EncodeNormValue = SingleToByte315(boost/sqrt(len)), :225-232; the
  256-entry docLen table NORM_TABLE[b] = 1f/(f*f), :195-204 — identical to
  BM25Similarity's table, so the EXISTING index norm bytes serve every
  similarity in this module unchanged), ``Log2(x) = Math.Log(x)/Math.Log(2)``
  (:236-240), per-term ``Score(stats, freq, docLen)`` summed across clauses
  by MultiSimilarity.MultiSimScorer (float32 running sum, MultiSimilarity.cs
  Score loop) / BooleanScorer.
- ``BasicStats.cs`` / ``SimilarityBase.FillBasicStats`` (:94-148):
  numberOfDocuments = maxDoc, numberOfFieldTokens = sumTotalTermFreq,
  avgFieldLength = (float)numberOfFieldTokens / numberOfDocuments — a
  FLOAT32 division of float32-converted longs (unlike BM25's double
  division, BM25Similarity.cs:91-102).
- ``DFRSimilarity.cs:79-83`` — score = totalBoost * basicModel(tfn) *
  afterEffect(tfn), left-assoc float32 multiplies; components
  ``BasicModel{G,In,Ine,IF,BE,D,P}.cs``, ``AfterEffect{B,L}.cs``,
  ``Normalization{H1,H2,H3,Z}.cs``.
- ``IBSimilarity.cs:103-106`` — score = totalBoost *
  distribution(tfn, lambda); ``Distribution{LL,SPL}.cs``,
  ``Lambda{DF,TTF}.cs``.
- ``LMDirichletSimilarity.cs:73-77`` — boost * (float)(log(1 +
  freq/(mu*cp)) + log(mu/(docLen+mu))), clamped at 0;
  ``LMJelinekMercerSimilarity.cs:65-68``; collection probability
  cp = (ttf+1f)/(numberOfFieldTokens+1f)
  (LMSimilarity.DefaultCollectionModel.ComputeProbability).

C# float/double promotion rules are reproduced operation-by-operation:
float⊕float stays float32; a long (or int) operand meeting a float is
CONVERTED TO FLOAT first; Math.Log/Math.Pow widen their argument to double;
an explicit ``(float)`` cast rounds once.  numpy float32 scalars/arrays
follow the same IEEE-754 binary32 round-to-nearest, so each staged op below
is bit-equal to the C# evaluation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_F32 = np.float32
_F64 = np.float64
_LOG2 = np.log(_F64(2.0))  # SimilarityBase.LOG_2 (double)


@dataclass(frozen=True)
class SimBaseSpec:
    """Picklable similarity choice shipped inside a QueryPlan.

    kind: 'dfr' | 'ib' | 'lm_dirichlet' | 'lm_jm'
    dfr:  basic_model in {G,In,Ine,IF,BE,D,P}, after_effect in {B,L,none},
          normalization in {H1,H2,H3,Z,none}
    ib:   distribution in {LL,SPL}, lambda_kind in {DF,TTF}, normalization
    c:    NormalizationH1/H2 c, H3 mu, Z z (reference defaults 1, 800, 0.30)
    mu:   LMDirichlet mu (default 2000, LMDirichletSimilarity.cs:61)
    lam:  LMJelinekMercer lambda
    """

    kind: str
    basic_model: str = ""
    after_effect: str = ""
    normalization: str = "H2"
    distribution: str = ""
    lambda_kind: str = "DF"
    c: float = 1.0
    mu: float = 2000.0
    lam: float = 0.1


def avg_field_length(nft: int, n_docs: int) -> np.float32:
    """FillBasicStats: (float)numberOfFieldTokens / numberOfDocuments —
    both longs converted to float32, float32 division
    (SimilarityBase.cs:138)."""
    if nft <= 0:
        return _F32(1.0)
    return _F32(_F32(nft) / _F32(n_docs))


# --------------------------------------------------------------------------
# Normalizations (Normalization*.cs Tfn) — freq/dl are float32 arrays


def _tfn(spec: SimBaseSpec, avg: np.float32, freq: np.ndarray,
         dl: np.ndarray) -> np.ndarray:
    cf = _F32(spec.c)
    if spec.normalization == "H1":
        # tf * avg / len — left-assoc float32 (NormalizationH1.cs:49)
        return ((freq * avg) / dl).astype(_F32)
    if spec.normalization == "H2":
        # (float)(tf * Log2(1 + c*avg/len)) (NormalizationH2.cs:50)
        inner = (_F32(1.0) + ((cf * avg) / dl).astype(_F32)).astype(_F32)
        return (freq.astype(_F64) * (np.log(inner.astype(_F64)) / _LOG2)
                ).astype(_F32)
    if spec.normalization == "H3":
        # (tf + mu*cp) / (len + mu) * mu — all float32 (NormalizationH3.cs)
        # cp here is the H3 collection prior (ttf+1f)/(nft+1f) — but H3's
        # Tfn uses per-TERM stats; handled by caller passing it via `avg`
        raise NotImplementedError("H3 needs per-term cp — use _tfn_h3")
    if spec.normalization == "Z":
        # (float)(tf * Math.Pow(avg/len, z)) (NormalizationZ.cs:54)
        r = (avg / dl).astype(_F32)
        return (freq.astype(_F64)
                * np.power(r.astype(_F64), _F64(_F32(spec.c)))).astype(_F32)
    if spec.normalization in ("", "none"):
        return freq.astype(_F32)
    raise ValueError(f"unknown normalization {spec.normalization}")


def _tfn_h3(mu: np.float32, cp: np.float32, freq: np.ndarray,
            dl: np.ndarray) -> np.ndarray:
    """NormalizationH3.cs:55: (tf + mu*((ttf+1f)/(nft+1f))) / (len+mu) * mu,
    every op float32."""
    a = (freq + _F32(mu * cp)).astype(_F32)
    b = (dl + mu).astype(_F32)
    return ((a / b).astype(_F32) * mu).astype(_F32)


# --------------------------------------------------------------------------
# DFR basic models (BasicModel*.cs Score) — tfn float32 array → float32 array


def _basic_model(spec: SimBaseSpec, N: int, df: int, ttf: int,
                 tfn: np.ndarray) -> np.ndarray:
    t64 = tfn.astype(_F64)
    if spec.basic_model == "G":
        # BasicModelG.cs: double F=ttf+1, lambda=F/(N+F);
        # (float)(Log2(lambda+1) + tfn*Log2((1+lambda)/lambda))
        F = _F64(ttf + 1)
        lam = F / (_F64(N) + F)
        return (np.log(lam + 1.0) / _LOG2
                + t64 * (np.log((1.0 + lam) / lam) / _LOG2)).astype(_F32)
    if spec.basic_model == "In":
        # BasicModelIn.cs: tfn * (float)Log2((N+1)/(n+0.5))
        v = _F32(np.log(_F64(N + 1) / (_F64(df) + 0.5)) / _LOG2)
        return (tfn * v).astype(_F32)
    if spec.basic_model == "Ine":
        # BasicModelIne.cs: ne = N*(1-((N-1)/N)^F); tfn*(float)Log2((N+1)/(ne+0.5))
        ne = _F64(N) * (1.0 - np.power(_F64(N - 1) / _F64(N), _F64(ttf)))
        v = _F32(np.log(_F64(N + 1) / (ne + 0.5)) / _LOG2)
        return (tfn * v).astype(_F32)
    if spec.basic_model == "IF":
        # BasicModelIF.cs: tfn * (float)Log2(1 + (N+1)/(F+0.5))
        v = _F32(np.log(1.0 + _F64(N + 1) / (_F64(ttf) + 0.5)) / _LOG2)
        return (tfn * v).astype(_F32)
    if spec.basic_model == "BE":
        # BasicModelBE.cs: double F = ttf + 1 + tfn — C# evaluates
        # (long)(ttf+1) + (float)tfn as a FLOAT32 add (long→float), THEN
        # widens to double; N = F + numberOfDocuments (double+long=double)
        F = (_F32(ttf + 1) + tfn).astype(_F32).astype(_F64)
        Nd = F + _F64(N)

        def f(n, m):
            return (m + 0.5) * (np.log(n / m) / _LOG2) + (n - m) * (np.log(n) / _LOG2)

        return (-(np.log((Nd - 1.0) * np.e) / _LOG2)
                + f(Nd + F - 1.0, Nd + F - t64 - 2.0)
                - f(F, F - t64)).astype(_F32)
    if spec.basic_model == "D":
        # BasicModelD.cs — same float-add-then-widen for F
        F = (_F32(ttf + 1) + tfn).astype(_F32).astype(_F64)
        phi = t64 / F
        nphi = 1.0 - phi
        p = 1.0 / _F64(N + 1)
        D = phi * (np.log(phi / p) / _LOG2) + nphi * (np.log(nphi / (1.0 - p)) / _LOG2)
        return (D * F
                + 0.5 * (np.log(1.0 + 2.0 * np.pi * t64 * nphi) / _LOG2)
                ).astype(_F32)
    if spec.basic_model == "P":
        # BasicModelP.cs: float lambda = (float)(ttf+1)/(N+1) — float32 div
        lam = _F64(_F32(_F32(ttf + 1) / _F32(N + 1)))
        log2e = np.log(np.e) / _LOG2
        return (t64 * (np.log(t64 / lam) / _LOG2)
                + (lam + 1.0 / (12.0 * t64) - t64) * log2e
                + 0.5 * (np.log(2.0 * np.pi * t64) / _LOG2)).astype(_F32)
    raise ValueError(f"unknown basic model {spec.basic_model}")


def _after_effect(spec: SimBaseSpec, df: int, ttf: int,
                  tfn: np.ndarray) -> np.ndarray:
    if spec.after_effect == "B":
        # AfterEffectB.cs: (F+1)/(n*(tfn+1)) — long→float conversions,
        # float32 multiply/divide; F = ttf+1, n = df+1 (longs)
        num = _F32(ttf + 1 + 1)  # (F + 1) converted long→float
        den = (_F32(df + 1) * (tfn + _F32(1.0)).astype(_F32)).astype(_F32)
        return (num / den).astype(_F32)
    if spec.after_effect == "L":
        # AfterEffectL.cs: 1/(tfn+1) float32
        return (_F32(1.0) / (tfn + _F32(1.0)).astype(_F32)).astype(_F32)
    if spec.after_effect in ("", "none"):
        return np.ones_like(tfn, dtype=_F32)
    raise ValueError(f"unknown after effect {spec.after_effect}")


# --------------------------------------------------------------------------
# IB components


def _ib_lambda(spec: SimBaseSpec, N: int, df: int, ttf: int) -> np.float32:
    if spec.lambda_kind == "DF":
        # LambdaDF.cs: (df+1f)/(N+1f) — float32 throughout
        return _F32(_F32(_F32(df) + _F32(1.0)) / _F32(_F32(N) + _F32(1.0)))
    if spec.lambda_kind == "TTF":
        return _F32(_F32(_F32(ttf) + _F32(1.0)) / _F32(_F32(N) + _F32(1.0)))
    raise ValueError(f"unknown lambda {spec.lambda_kind}")


def _distribution(spec: SimBaseSpec, lam: np.float32,
                  tfn: np.ndarray) -> np.ndarray:
    if spec.distribution == "LL":
        # DistributionLL.cs: (float)-Math.Log(lambda/(tfn+lambda))
        x = (lam / (tfn + lam).astype(_F32)).astype(_F32)
        return (-np.log(x.astype(_F64))).astype(_F32)
    if spec.distribution == "SPL":
        # DistributionSPL.cs: lambda==1f → 0.99f;
        # (float)-Math.Log((pow(lambda, tfn/(tfn+1)) - lambda)/(1 - lambda))
        if lam == _F32(1.0):
            lam = _F32(0.99)
        e = (tfn / (tfn + _F32(1.0)).astype(_F32)).astype(_F32)
        num = np.power(_F64(lam), e.astype(_F64)) - _F64(lam)
        den = _F64(_F32(_F32(1.0) - lam))  # (1 - lambda) is a float32 op
        return (-np.log(num / den)).astype(_F32)
    raise ValueError(f"unknown distribution {spec.distribution}")


# --------------------------------------------------------------------------
# public scorer


def collection_probability(ttf: int, nft: int) -> np.float32:
    """LMSimilarity.DefaultCollectionModel.ComputeProbability:
    (ttf + 1F)/(nft + 1F) — long→float conversions, float32 ops."""
    return _F32(_F32(_F32(ttf) + _F32(1.0)) / _F32(_F32(nft) + _F32(1.0)))


def score_freqs(spec: SimBaseSpec, N: int, nft: int, avg: np.float32,
                df: int, ttf: int, boost: float,
                freqs: np.ndarray, doclens: np.ndarray) -> np.ndarray:
    """Vectorized SimilarityBase.Score over one posting chunk.

    freqs: per-doc term frequencies; doclens: NORM_TABLE[norm_byte] —
    the SimilarityBase decoded docLen (identical table to BM25's).
    Returns float32 scores (per-term; clause sums happen in the caller
    like every other similarity)."""
    freq = np.asarray(freqs, dtype=_F32)
    dl = np.asarray(doclens, dtype=_F32)
    bf = _F32(boost)  # BasicStats.TotalBoost (queryBoost, topLevel=1)
    if spec.kind == "lm_dirichlet":
        cp = collection_probability(ttf, nft)
        mu = _F32(spec.mu)
        a1 = (_F32(1.0) + (freq / _F32(mu * cp)).astype(_F32)).astype(_F32)
        a2 = (mu / (dl + mu).astype(_F32)).astype(_F32)
        s = (np.log(a1.astype(_F64)) + np.log(a2.astype(_F64))).astype(_F32)
        s = (bf * s).astype(_F32)
        return np.where(s > _F32(0.0), s, _F32(0.0)).astype(_F32)
    if spec.kind == "lm_jm":
        cp = collection_probability(ttf, nft)
        lam = _F32(spec.lam)
        one_minus = _F32(_F32(1.0) - lam)
        inner = ((one_minus * freq).astype(_F32) / dl).astype(_F32)
        x = (_F32(1.0) + (inner / _F32(lam * cp)).astype(_F32)).astype(_F32)
        return (bf * np.log(x.astype(_F64)).astype(_F32)).astype(_F32)
    if spec.kind == "dfr":
        if spec.normalization == "H3":
            cp = collection_probability(ttf, nft)
            tfn = _tfn_h3(_F32(spec.c), cp, freq, dl)
        else:
            tfn = _tfn(spec, avg, freq, dl)
        basic = _basic_model(spec, N, df, ttf, tfn)
        after = _after_effect(spec, df, ttf, tfn)
        return ((bf * basic).astype(_F32) * after).astype(_F32)
    if spec.kind == "ib":
        if spec.normalization == "H3":
            cp = collection_probability(ttf, nft)
            tfn = _tfn_h3(_F32(spec.c), cp, freq, dl)
        else:
            tfn = _tfn(spec, avg, freq, dl)
        lam = _ib_lambda(spec, N, df, ttf)
        return (bf * _distribution(spec, lam, tfn)).astype(_F32)
    raise ValueError(f"unknown similarity kind {spec.kind}")
