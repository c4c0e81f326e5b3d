"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Beyond the reference (Lucene has only exact delete-by-term dedup,
``IndexWriter.cs:1538-1556``); these are the standard large-scale
training-data pipeline ops, built Ray-Data-first:

    map_batches(signatures)          # vectorized per-batch hashing
      → flat (band, band_key, doc)   # explode LSH bands
      → groupby(band, band_key)      # candidate buckets (the only shuffle)
      → pairs → exact-Jaccard verify # verify inside the bucket group

All hashing is md5-based (not Python ``hash``) so results are deterministic
across processes AND reproducible in DuckDB SQL for the driver oracle
(md5 → first 15 hex digits → int64, then affine (a*h+b) mod p transforms in
int64 — no overflow: h < 2^31, a,b < 2^31, p = 2^61-1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MERSENNE61 = (1 << 61) - 1
HASH_DOMAIN = 1 << 31

NUM_PERM = 16
NUM_BANDS = 4  # rows per band r = NUM_PERM / NUM_BANDS = 4
SHINGLE_K = 3


def _perm_params(num_perm: int = NUM_PERM) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic affine permutation params derived from md5 (SQL-
    reproducible: a_i = md5_int('a{i}') % (2^31-1) + 1, b_i = md5_int('b{i}') % 2^31)."""
    a = np.empty(num_perm, dtype=np.int64)
    b = np.empty(num_perm, dtype=np.int64)
    for i in range(num_perm):
        a[i] = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:15], 16) % (HASH_DOMAIN - 1) + 1
        b[i] = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:15], 16) % HASH_DOMAIN
    return a, b


def md5_int31(s: str) -> int:
    """md5 → int64 in [0, 2^31): DuckDB equivalent
    ``CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) % 2147483648``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % HASH_DOMAIN


def shingles(tokens: list[str], k: int = SHINGLE_K) -> list[str]:
    """Word k-shingles joined by single space; whole doc if shorter than k."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(tokens: list[str], a: np.ndarray, b: np.ndarray,
                      k: int = SHINGLE_K) -> np.ndarray | None:
    """num_perm minhash values (int64), or None for empty docs."""
    sh = set(shingles(tokens, k))
    if not sh:
        return None
    h = np.array([md5_int31(s) for s in sh], dtype=np.int64)
    # (num_perm, n_shingles) affine transform mod p — vectorized
    vals = (a[:, None] * h[None, :] + b[:, None]) % MERSENNE61
    return vals.min(axis=1)


class MinHashLSH:
    """map_batches stage: text → exploded (doc_id, band, band_key) rows."""

    def __init__(self, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS,
                 shingle_k: int = SHINGLE_K, text_col: str = "text",
                 id_col: str = "doc_id"):
        assert num_perm % num_bands == 0
        self.a, self.b = _perm_params(num_perm)
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.r = num_perm // num_bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id: list[int] = []
        out_band: list[int] = []
        out_key: list[str] = []
        for did, text in zip(ids, texts):
            sig = minhash_signature((text or "").split(), self.a, self.b, self.k)
            if sig is None:
                continue
            for band in range(self.num_bands):
                seg = sig[band * self.r : (band + 1) * self.r]
                out_id.append(did)
                out_band.append(band)
                out_key.append("-".join(str(int(v)) for v in seg))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(out_key, type=pa.string()),
            }
        )


def candidate_pairs(group: pa.Table) -> pa.Table:
    """groupby(band, band_key).map_groups: all doc pairs in the bucket."""
    ids = sorted(set(group.column("doc_id").to_pylist()))
    a_out: list[int] = []
    b_out: list[int] = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table(
        {
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
        }
    )


def minhash_candidates(ds, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS,
                       shingle_k: int = SHINGLE_K):
    """Full MinHash-LSH candidate pipeline → distinct (doc_a, doc_b)."""
    sig = ds.map_batches(
        MinHashLSH(num_perm, num_bands, shingle_k), batch_format="pyarrow"
    )
    pairs = sig.groupby(["band", "band_key"]).map_groups(
        candidate_pairs, batch_format="pyarrow"
    )
    return pairs.groupby(["doc_a", "doc_b"]).count()


# ---------------------------------------------------------------------------


def ngram_jaccard_counts(tokens_a: list[str], tokens_b: list[str],
                         k: int = SHINGLE_K) -> tuple[int, int]:
    """(intersection, union) sizes of the k-shingle sets — integers, so the
    oracle comparison is exact (no float division)."""
    sa, sb = set(shingles(tokens_a, k)), set(shingles(tokens_b, k))
    return len(sa & sb), len(sa | sb)


# ---------------------------------------------------------------------------


def simhash63(tokens: list[str]) -> int:
    """63-bit SimHash over token md5 hashes weighted by term frequency.

    Bits 0..62 only (top bit dropped) so the value fits a signed int64 both
    here and in the SQL oracle. Empty docs → 0.
    """
    if not tokens:
        return 0
    from collections import Counter

    tf = Counter(tokens)
    acc = np.zeros(63, dtype=np.int64)
    for tok, w in tf.items():
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest(), 16)
        bits = np.array([(h >> i) & 1 for i in range(63)], dtype=np.int64)
        acc += w * (2 * bits - 1)
    out = 0
    for i in range(63):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHash:
    """map_batches stage: text → (doc_id, simhash int64)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict[str, int] = {}

    def _tok_sig(self, tok: str) -> int:
        v = self._cache.get(tok)
        if v is None:
            v = int(hashlib.md5(tok.encode("utf-8")).hexdigest(), 16)
            if len(self._cache) < 1_000_000:
                self._cache[tok] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out = [simhash63((t or "").split()) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(out, type=pa.int64()),
            }
        )
