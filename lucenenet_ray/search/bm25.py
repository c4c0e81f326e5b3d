"""BM25 scoring — float32-identical to Lucene's BM25Similarity.

Every quantization below is copied from
``src/Lucene.Net/Search/Similarities/BM25Similarity.cs`` (cites per line):

- idf(df, N) = (float)log(1 + (N - df + 0.5)/(df + 0.5))         — :67-70
- avgdl = (float)(sumTotalTermFreq / (double)maxDoc)             — :91-102
- cache[b] = k1 * ((1-b) + b * NORM_TABLE[b] / avgdl)  (float32) — :233-237
- weightValue = idf * boost * (k1+1)                   (float32) — :260
- score(freq, normByte) = weightValue * freq / (freq + cache[normByte]) — :265-270

All array math uses numpy float32 so results are bit-identical to C# float
arithmetic (both are IEEE-754 binary32 with round-to-nearest).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucenenet_ray.util.smallfloat import NORM_TABLE

K1_DEFAULT = 1.2  # BM25Similarity.cs:61
B_DEFAULT = 0.75  # BM25Similarity.cs:62


def idf(df: int, num_docs: int) -> np.float32:
    """BM25Similarity.Idf — double math, result cast to float32 (:67-70)."""
    return np.float32(math.log(1 + (num_docs - df + 0.5) / (df + 0.5)))


def avg_field_length(sum_total_term_freq: int, max_doc: int) -> np.float32:
    """BM25Similarity.AvgFieldLength (:91-102)."""
    if sum_total_term_freq <= 0:
        return np.float32(1.0)
    return np.float32(sum_total_term_freq / float(max_doc))


def norm_cache(avgdl: np.float32, k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> np.ndarray:
    """The 256-entry freq-independent cache (ComputeWeight, :233-237).

    cache[i] = k1 * ((1 - b) + b * NORM_TABLE[i] / avgdl), all float32 ops.
    """
    k1f = np.float32(k1)
    bf = np.float32(b)
    one = np.float32(1.0)
    return (k1f * ((one - bf) + bf * NORM_TABLE / np.float32(avgdl))).astype(np.float32)


@dataclass
class TermWeight:
    """Per-query-term precomputed state (the BM25Stats/BM25DocScorer analog)."""

    term: str
    df: int
    ttf: int
    idf: np.float32
    weight_value: np.float32  # idf * boost * (k1+1)  (:260)

    @staticmethod
    def build(term: str, df: int, ttf: int, num_docs: int,
              boost: float = 1.0, k1: float = K1_DEFAULT) -> "TermWeight":
        i = idf(df, num_docs)
        w = np.float32(np.float32(i * np.float32(boost)) * np.float32(np.float32(k1) + np.float32(1.0)))
        return TermWeight(term=term, df=df, ttf=ttf, idf=i, weight_value=w)


def score_freqs(
    freqs: np.ndarray, norm_bytes: np.ndarray, weight_value: np.float32, cache: np.ndarray
) -> np.ndarray:
    """Vectorized BM25DocScorer.Score (:265-270): float32 throughout."""
    f = np.asarray(freqs).astype(np.float32)
    norm = cache[np.asarray(norm_bytes, dtype=np.int64)]
    return ((weight_value * f) / (f + norm)).astype(np.float32)


# ---------------------------------------------------------------------------
# ClassicSimilarity (TFIDF) — the Similarity-override surface
# (``Search/Similarities/TFIDFSimilarity.cs`` / ``DefaultSimilarity.cs``)


def classic_idf(df: int, num_docs: int) -> np.float32:
    """DefaultSimilarity.Idf: (float)(log(numDocs/(double)(df+1)) + 1.0)."""
    return np.float32(math.log(num_docs / (df + 1.0)) + 1.0)


def classic_query_norm(sum_sq: np.float32) -> np.float32:
    """DefaultSimilarity.QueryNorm: (float)(1.0 / sqrt(sumOfSquaredWeights))."""
    return np.float32(1.0 / math.sqrt(float(sum_sq)))


def classic_coord(overlap: np.ndarray, max_overlap: int) -> np.ndarray:
    """DefaultSimilarity.Coord: overlap / (float)maxOverlap, float32 div."""
    return (np.asarray(overlap, dtype=np.float32)
            / np.float32(max_overlap)).astype(np.float32)


def classic_score_freqs(freqs: np.ndarray, norm_bytes: np.ndarray,
                        weight_value: np.float32,
                        classic_table: np.ndarray) -> np.ndarray:
    """TFIDFSimilarity ExactDocScorer.Score: tf = (float)sqrt(freq) (double
    sqrt then cast); raw = tf * value; score = raw * decodedNorm — float32
    at each step."""
    tf = np.sqrt(np.asarray(freqs, dtype=np.float64)).astype(np.float32)
    dec = classic_table[np.asarray(norm_bytes, dtype=np.int64)]
    return ((tf * weight_value) * dec).astype(np.float32)


def upper_bound(max_freq: int, max_norm_byte: int, weight_value: np.float32,
                cache: np.ndarray) -> np.float32:
    """Lossless per-block / per-chunk score upper bound for block-max pruning.

    score(f, n) is increasing in f and in the norm byte (higher byte = shorter
    doc = smaller cache value = higher score), so evaluating at (max_freq,
    max_norm_byte) dominates every true posting score in the range. This is
    our WAND metadata — Lucene 4.8 has skip lists but no WAND (SURVEY §7.4);
    pruning with this bound can only skip postings that cannot enter the
    top-k, never change it.
    """
    f = np.float32(max_freq)
    return np.float32((weight_value * f) / (f + cache[max_norm_byte]))
