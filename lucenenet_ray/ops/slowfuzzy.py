"""SlowFuzzyQuery (``Lucene.Net.Sandbox/Queries/SlowFuzzyQuery.cs`` +
``SlowFuzzyTermsEnum.cs``) — the brute-force fuzzy term enum with
similarity-scaled boosts, re-expressed as a vectorized scan of the term
dictionary.

Reference semantics matched (NOT ported):

- ``SlowFuzzyTermsEnum.cs:276`` — similarity = 1f - edits / (float)
  (realPrefixLength + min(n, m)) where n/m are the candidate/target
  lengths beyond the shared prefix; float32 division and subtraction.
- ``SlowFuzzyTermsEnum.cs:144-146`` — a term is accepted when
  similarity > minimumSimilarity (strict), and its rewrite boost is
  (similarity - minSimilarity) * scaleFactor with
  scaleFactor = 1 / (1 - minSimilarity) (FuzzyTermsEnum's boost ramp:
  minSim → 0, exact match → 1).
- The true Levenshtein DP (``SlowFuzzyTermsEnum.cs:176-242``, no
  transpositions) — here one numpy DP over ALL candidate terms at once:
  the row loop runs over the probe's length, the column loop over the
  padded term length; every cell op is an n-term vector op.

Scale shape: the term dictionary is the index's `termstats` sidecar
(term-sorted parquet). The scan is a stateless ``map_batches`` over it
with the probe shipped in the closure — embarrassingly parallel, no
shuffle; the accepted set is vocabulary-sized, not corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def levenshtein_batch(terms: list[str], probe: str) -> np.ndarray:
    """Edit distances from every term to the probe — full DP, vectorized
    across terms (int32[n])."""
    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    grid = np.zeros((n, L), dtype=np.uint32)
    for i, t in enumerate(terms):  # one fill per term; DP below is vector
        if t:
            grid[i, : len(t)] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32)
    p = np.frombuffer(probe.encode("utf-32-le"), dtype=np.uint32)
    m = len(p)
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int32),
                           (n, L + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        pc = p[i - 1]
        for j in range(1, L + 1):
            cost = (grid[:, j - 1] != pc).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost)
        prev = cur
    return prev[np.arange(n), lens].astype(np.int32)


def slow_fuzzy_terms(termstats_path: str, probe: str,
                     min_similarity: float = 0.5) -> pa.Table:
    """All dictionary terms with fuzzy similarity > min_similarity to the
    probe (prefixLength=0), with df and the float32 rewrite boost.
    Output: (term, df, boost) ordered by term — the full accepted set (the
    reference's TopTermsScoringBooleanQueryRewrite then keeps the
    highest-boost 50; callers slice if they want the cap)."""
    import ray.data as rd

    scale = np.float32(1.0) / (np.float32(1.0) - np.float32(min_similarity))
    plen = len(probe)

    def scan(batch: pa.Table) -> pa.Table:
        from lucenenet_ray.search.query import FIELD_SEP

        # default-field terms only (multi-field terms carry "field\x1fterm")
        mask = pa.compute.invert(
            pa.compute.match_substring(batch.column("term"), FIELD_SEP))
        batch = batch.filter(mask)
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_numpy()
        lev = levenshtein_batch(terms, probe)
        lens = np.fromiter((len(t) for t in terms), dtype=np.int64,
                           count=len(terms))
        denom = np.minimum(lens, plen).astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.float32(1.0) - lev.astype(np.float32) / denom
        keep = sim > np.float32(min_similarity)
        boost = ((sim - np.float32(min_similarity)) * scale)[keep]
        return pa.table({
            "term": pa.array([t for t, k in zip(terms, keep) if k],
                             type=pa.string()),
            "df": pa.array(dfs[keep], type=pa.int64()),
            "boost": pa.array(boost.astype(np.float64), type=pa.float64()),
        })

    out = (rd.read_parquet(termstats_path, columns=["term", "df"])
           .map_batches(scan, batch_format="pyarrow", batch_size=8192)
           .sort("term")
           .take_all())  # bounded-collect: fuzzy-matched term-dict rows
    return pa.table({
        "term": pa.array([r["term"] for r in out], type=pa.string()),
        "df": pa.array([r["df"] for r in out], type=pa.int64()),
        "boost": pa.array([r["boost"] for r in out], type=pa.float64()),
    })


def fuzzy_like_this(termstats_path: str, query_tokens: list[str],
                    num_docs: int, min_similarity: float = 0.2,
                    max_num_terms: int = 10) -> pa.Table:
    """FuzzyLikeThisQuery.AddTerms (Sandbox/Queries/FuzzyLikeThisQuery.cs:
    191-262): per analyzed source token, enumerate fuzzy variants (the
    similarity-ramp boost of the slow enum), share ONE idf across a
    token's variants — the source term's df, or the integer-mean df of the
    variants when the source is absent (:245) — and rescore each variant
    f32((boost * boost) * idf) with ClassicSimilarity idf
    f32(ln(numDocs/(df+1)) + 1.0). The global queue keeps the top
    ``max_num_terms`` by (score desc, term asc, source asc).

    Scale shape: one distributed term-dict scan per source token (tokens
    are query-sized); everything after is vocabulary-cardinality math.
    """
    import math

    rows: list[tuple[str, str, float]] = []
    for tok in query_tokens:
        t = slow_fuzzy_terms(termstats_path, tok, min_similarity)
        terms = t.column("term").to_pylist()
        dfs = t.column("df").to_numpy()
        boosts = t.column("boost").to_numpy().astype(np.float32)
        if not terms:
            continue
        if tok in terms:
            df_src = int(dfs[terms.index(tok)])
        else:
            df_src = int(dfs.sum()) // len(terms)  # avgDf, int division
        idf = np.float32(math.log(num_docs / float(df_src + 1)) + 1.0)
        scores = (boosts * boosts) * idf
        rows.extend((tok, term, float(np.float32(s)))
                    for term, s in zip(terms, scores))
    rows.sort(key=lambda r: (-r[2], r[1], r[0]))
    rows = rows[:max_num_terms]
    return pa.table({
        "source": pa.array([r[0] for r in rows], type=pa.string()),
        "term": pa.array([r[1] for r in rows], type=pa.string()),
        "score": pa.array([r[2] for r in rows], type=pa.float64()),
    })
