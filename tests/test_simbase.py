"""SimilarityBase family (search/simbase.py) — scalar-model parity +
search integration.

The scalar model below re-implements each reference formula
(BasicModel*.cs / AfterEffect*.cs / Normalization*.cs / Distribution*.cs /
LM*Similarity.cs) with per-value np.float32 scalar ops, independently of the
vectorized kernels, so a vectorization bug (wrong dtype promotion, missing
cast) cannot hide."""

import numpy as np
import pytest

from lucenenet_ray.search.simbase import (
    SimBaseSpec,
    avg_field_length,
    collection_probability,
    score_freqs,
)
from lucenenet_ray.util.smallfloat import NORM_TABLE

F = np.float32
D = np.float64
LOG2 = np.log(D(2.0))

N, NFT = 500, 23761
DF, TTF = 37, 61
FREQS = np.array([1, 2, 3, 5, 17], dtype=np.float32)
NORM_BYTES = np.array([120, 124, 118, 127, 110], dtype=np.int64)
DOCLENS = NORM_TABLE[NORM_BYTES]


def log2(x):
    return np.log(D(x)) / LOG2


def scalar_score(spec, freq, dl):
    freq, dl = F(freq), F(dl)
    avg = avg_field_length(NFT, N)
    boost = F(1.0)
    if spec.kind == "lm_dirichlet":
        cp = collection_probability(TTF, NFT)
        mu = F(spec.mu)
        a1 = F(F(1.0) + F(freq / F(mu * cp)))
        a2 = F(mu / F(dl + mu))
        s = F(boost * F(np.log(D(a1)) + np.log(D(a2))))
        return s if s > 0 else F(0.0)
    if spec.kind == "lm_jm":
        cp = collection_probability(TTF, NFT)
        lam = F(spec.lam)
        x = F(F(1.0) + F(F(F(F(F(1.0) - lam) * freq) / dl) / F(lam * cp)))
        return F(boost * F(np.log(D(x))))
    # tfn
    c = F(spec.c)
    if spec.normalization == "H1":
        tfn = F(F(freq * avg) / dl)
    elif spec.normalization == "H2":
        tfn = F(D(freq) * log2(F(F(1.0) + F(F(c * avg) / dl))))
    elif spec.normalization == "H3":
        cp = collection_probability(TTF, NFT)
        tfn = F(F(F(freq + F(c * cp)) / F(dl + c)) * c)
    elif spec.normalization == "Z":
        tfn = F(D(freq) * np.power(D(F(avg / dl)), D(c)))
    else:
        tfn = freq
    if spec.kind == "ib":
        src = DF if spec.lambda_kind == "DF" else TTF
        lam = F(F(F(src) + F(1.0)) / F(F(N) + F(1.0)))
        if spec.distribution == "LL":
            dist = F(-np.log(D(F(lam / F(tfn + lam)))))
        else:
            if lam == F(1.0):
                lam = F(0.99)
            e = F(tfn / F(tfn + F(1.0)))
            dist = F(-np.log((np.power(D(lam), D(e)) - D(lam))
                             / D(F(F(1.0) - lam))))
        return F(boost * dist)
    # dfr basic models
    bm = spec.basic_model
    if bm == "G":
        Fd = D(TTF + 1)
        lam = Fd / (D(N) + Fd)
        basic = F(log2(lam + 1.0) + D(tfn) * log2((1.0 + lam) / lam))
    elif bm == "In":
        basic = F(tfn * F(log2(D(N + 1) / (D(DF) + 0.5))))
    elif bm == "Ine":
        ne = D(N) * (1.0 - np.power(D(N - 1) / D(N), D(TTF)))
        basic = F(tfn * F(log2(D(N + 1) / (ne + 0.5))))
    elif bm == "IF":
        basic = F(tfn * F(log2(1.0 + D(N + 1) / (D(TTF) + 0.5))))
    elif bm == "BE":
        Fd = D(F(F(TTF + 1) + tfn))
        Nd = Fd + D(N)

        def fnm(n, m):
            return (m + 0.5) * log2(n / m) + (n - m) * log2(n)

        basic = F(-log2((Nd - 1.0) * np.e)
                  + fnm(Nd + Fd - 1.0, Nd + Fd - D(tfn) - 2.0)
                  - fnm(Fd, Fd - D(tfn)))
    elif bm == "D":
        Fd = D(F(F(TTF + 1) + tfn))
        phi = D(tfn) / Fd
        nphi = 1.0 - phi
        p = 1.0 / D(N + 1)
        Dv = phi * log2(phi / p) + nphi * log2(nphi / (1.0 - p))
        basic = F(Dv * Fd + 0.5 * log2(1.0 + 2.0 * np.pi * D(tfn) * nphi))
    elif bm == "P":
        lam = D(F(F(TTF + 1) / F(N + 1)))
        log2e = np.log(np.e) / LOG2
        basic = F(D(tfn) * log2(D(tfn) / lam)
                  + (lam + 1.0 / (12.0 * D(tfn)) - D(tfn)) * log2e
                  + 0.5 * log2(2.0 * np.pi * D(tfn)))
    else:
        raise AssertionError(bm)
    if spec.after_effect == "B":
        after = F(F(TTF + 2) / F(F(DF + 1) * F(tfn + F(1.0))))
    elif spec.after_effect == "L":
        after = F(F(1.0) / F(tfn + F(1.0)))
    else:
        after = F(1.0)
    return F(F(boost * basic) * after)


ALL_SPECS = [
    SimBaseSpec(kind="lm_dirichlet", mu=2000.0),
    SimBaseSpec(kind="lm_dirichlet", mu=700.0),
    SimBaseSpec(kind="lm_jm", lam=0.1),
    SimBaseSpec(kind="lm_jm", lam=0.7),
    SimBaseSpec(kind="ib", distribution="LL", lambda_kind="DF",
                normalization="H1"),
    SimBaseSpec(kind="ib", distribution="LL", lambda_kind="TTF",
                normalization="H3", c=800.0),
    SimBaseSpec(kind="ib", distribution="SPL", lambda_kind="DF",
                normalization="H2"),
    SimBaseSpec(kind="ib", distribution="SPL", lambda_kind="TTF",
                normalization="Z", c=0.30),
] + [
    SimBaseSpec(kind="dfr", basic_model=bm, after_effect=ae,
                normalization=nz, c=c)
    for bm in ("G", "In", "Ine", "IF", "BE", "D", "P")
    for ae, nz, c in (("B", "H1", 1.0), ("L", "H2", 1.0),
                      ("none", "H3", 800.0), ("B", "Z", 0.30))
]


@pytest.mark.parametrize("spec", ALL_SPECS,
                         ids=lambda s: f"{s.kind}-{s.basic_model}{s.after_effect}"
                                       f"{s.distribution}{s.lambda_kind}-{s.normalization}")
def test_vectorized_matches_scalar_model(spec):
    avg = avg_field_length(NFT, N)
    got = score_freqs(spec, N, NFT, avg, DF, TTF, 1.0, FREQS, DOCLENS)
    want = np.array([scalar_score(spec, f, dl)
                     for f, dl in zip(FREQS, DOCLENS)], dtype=np.float32)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_avg_field_length_is_float32_division():
    # (float)nft / (float)N — differs from BM25's double division for
    # values where the f32 conversions round
    assert avg_field_length(NFT, N) == F(F(NFT) / F(N))
    assert avg_field_length(0, 10) == F(1.0)


def test_dirichlet_clamps_negatives_to_zero():
    # a freq-1 posting in a very long doc goes negative pre-clamp
    spec = SimBaseSpec(kind="lm_dirichlet", mu=2000.0)
    long_dl = NORM_TABLE[np.array([20], dtype=np.int64)]  # tiny byte → long doc
    s = score_freqs(spec, N, NFT, avg_field_length(NFT, N), DF, TTF, 1.0,
                    np.array([1.0], dtype=np.float32), long_dl)
    assert s[0] == F(0.0)


def test_boost_multiplies_float32():
    # DFR score = ((boost * basic) * after) — left-assoc float32 multiplies
    # (DFRSimilarity.cs:79-83); verify the exact association for boost=3
    spec = SimBaseSpec(kind="dfr", basic_model="In", after_effect="L",
                       normalization="H2")
    avg = avg_field_length(NFT, N)
    s3 = score_freqs(spec, N, NFT, avg, DF, TTF, 3.0, FREQS, DOCLENS)
    want = np.array(
        [F(F(F(3.0) * _basic_in(f, dl)) * _after_l(f, dl))
         for f, dl in zip(FREQS, DOCLENS)], dtype=np.float32)
    np.testing.assert_array_equal(s3, want)


def _tfn_h2(f, dl):
    avg = avg_field_length(NFT, N)
    return F(D(F(f)) * log2(F(F(1.0) + F(F(F(1.0) * avg) / F(dl)))))


def _basic_in(f, dl):
    tfn = _tfn_h2(f, dl)
    return F(tfn * F(log2(D(N + 1) / (D(DF) + 0.5))))


def _after_l(f, dl):
    tfn = _tfn_h2(f, dl)
    return F(F(1.0) / F(tfn + F(1.0)))


def test_search_integration_matches_bruteforce(documents_index, corpus):
    """End-to-end: search(similarity=spec) equals per-doc brute force from
    the oracle token map for a 2-term SHOULD query (clause-order f32 sum)."""
    from lucenenet_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search
    from lucenenet_ray.util.smallfloat import float_to_byte315

    path, _ = documents_index
    reader = IndexReader(path)
    docs, texts, toks = corpus
    terms = ["data", "merge"]
    n = reader.num_docs
    nft = reader.sum_total_term_freq
    df = {t: sum(1 for d in docs if t in toks[d]) for t in terms}
    ttf = {t: sum(toks[d].count(t) for d in docs) for t in terms}
    spec = SimBaseSpec(kind="ib", distribution="LL", lambda_kind="TTF",
                       normalization="H1")
    avg = avg_field_length(nft, n)
    expected = {}
    for d in docs:
        L = len(toks[d])
        if L == 0:
            continue
        nb = int(float_to_byte315(
            np.array([F(F(1.0) / F(np.sqrt(D(L))))], dtype=np.float32))[0])
        dl = NORM_TABLE[nb]
        s = F(0.0)
        hit = False
        for t in terms:
            f = toks[d].count(t)
            if f == 0:
                continue
            hit = True
            sc = score_freqs(spec, n, nft, avg, df[t], ttf[t], 1.0,
                             np.array([f], dtype=np.float32),
                             np.array([dl], dtype=np.float32))[0]
            s = F(s + sc)
        if hit:
            expected[d] = s
    td = search(reader, BooleanQuery(clauses=tuple(
        BooleanClause(Occur.SHOULD, TermQuery(term=t)) for t in terms)),
        k=10, similarity=spec)
    want = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(int(d), np.float32(s)) for d, s in zip(td.docs, td.scores)]
    assert got == [(d, s) for d, s in want]
    assert td.total_hits == len(expected)
