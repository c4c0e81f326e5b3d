"""Independent naive BM25 oracle for rank/score-identity tests.

Deliberately implemented WITHOUT the engine's scoring code paths (the
TestBoolean2 cross-implementation pattern, SURVEY §5.3): direct formula over
token dicts, float32 ops in clause order, byte-quantized norms.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from lucenenet_ray.util.smallfloat import NORM_TABLE, encode_norm


class NaiveBM25:
    def __init__(self, toks: dict[int, list[str]], k1: float = 1.2, b: float = 0.75):
        self.toks = toks
        self.N = len(toks)
        self.sum_ttf = sum(len(v) for v in toks.values())
        avgdl = np.float32(self.sum_ttf / float(self.N))
        k1f, bf = np.float32(k1), np.float32(b)
        self.cache = (k1f * ((np.float32(1) - bf) + bf * NORM_TABLE / avgdl)).astype(
            np.float32
        )
        self.k1p1 = np.float32(k1f + np.float32(1.0))
        self.norm_b = {
            d: int(encode_norm(np.array([len(v)]))[0]) for d, v in toks.items()
        }
        self.tf = {d: Counter(v) for d, v in toks.items()}
        self.df: Counter = Counter()
        for c in self.tf.values():
            for t in c:
                self.df[t] += 1
        self.positions = {
            d: {t: [i for i, x in enumerate(v) if x == t] for t in set(v)}
            for d, v in toks.items()
        }

    def idf(self, term: str) -> np.float32:
        df = self.df.get(term, 0)
        return np.float32(math.log(1 + (self.N - df + 0.5) / (df + 0.5)))

    def wv(self, term: str) -> np.float32:
        return np.float32(np.float32(self.idf(term) * np.float32(1.0)) * self.k1p1)

    def _score_one(self, wv: np.float32, f: int, d: int) -> np.float32:
        ff = np.float32(f)
        return np.float32((wv * ff) / (ff + self.cache[self.norm_b[d]]))

    def search_terms(self, terms: list[str], k: int = 10, mode: str = "or"):
        wvs = [self.wv(t) for t in terms]
        out = []
        for d in self.toks:
            s = np.float32(0.0)
            nmatch = 0
            for t, wv in zip(terms, wvs):
                f = self.tf[d].get(t, 0)
                if f:
                    nmatch += 1
                    s = np.float32(s + self._score_one(wv, f, d))
            if nmatch == 0:
                continue
            if mode == "and" and nmatch < len(set(terms)):
                continue
            out.append((d, s))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def search_phrase(self, terms_positions: list[tuple[str, int]], k: int = 10):
        idf_sum = np.float32(0.0)
        for t, _ in terms_positions:
            if self.df.get(t, 0) > 0:
                idf_sum = np.float32(idf_sum + self.idf(t))
        wv = np.float32(np.float32(idf_sum * np.float32(1.0)) * self.k1p1)
        t0, r0 = terms_positions[0]
        out = []
        for d in self.toks:
            pos = self.positions[d]
            if any(t not in pos for t, _ in terms_positions):
                continue
            bases = [p - r0 for p in pos[t0]]
            f = 0
            for base in bases:
                if all(base + r in pos[t] for t, r in terms_positions[1:]):
                    f += 1
            if f:
                out.append((d, self._score_one(wv, f, d)))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]
