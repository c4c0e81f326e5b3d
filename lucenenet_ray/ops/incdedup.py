"""Incremental (cross-snapshot) exact dedup: drop new-crawl docs whose text
already exists in a reference corpus.

The LLM-pipeline shape: each Common-Crawl snapshot re-crawls most of the
web, so before a new snapshot joins the training corpus it is deduplicated
against everything already ingested ("old"). No single-snapshot dedup
(pipelines/flagship.py dedup_latest_pages, ops/neardup.py) covers this —
the old side may be 100× the new side and must never be re-shuffled.

Shape (exact result, bloom-bounded driver state):

1. **Bloom build over old** — one streaming pass; each block folds its
   texts' md5-double-hashes into a fixed-size bitmap, partials OR-combine
   in Ray Data's tree aggregation (``AggregateFnV2``). Driver holds ONE
   bitmap (2^``bits_log2`` bits; 2^30 ≈ 128 MB covers ~10^8 docs at <1% FP
   with k=7 — size it to the OLD corpus, it is the only non-streaming
   state).
2. **Candidate pass over new** — broadcast the bitmap (``ray.put`` once),
   flag rows whose digest hits all k bits. Bloom-negative rows are
   DEFINITELY absent from old and pass through untouched; only candidates
   (true dups + false positives, ~dup_rate + FP_rate of new) go further.
3. **Confirm pass over old** — broadcast the candidates' md5 digest set
   (bounded by step 2's candidate count, NOT corpus size) and emit the
   digests old actually contains. False positives die here, which is what
   makes the result EXACT, not approximate.
4. **Final filter over new** — broadcast the confirmed set; keep rows
   whose digest is not confirmed.

Scale notes: two passes over old and two over new, all streaming; the
driver-held sets are (bitmap, candidate digests, confirmed digests) — the
latter two are O(duplicates + FP), so size the bloom until FP volume is
negligible. If candidates ever approach driver memory (adversarial
dup-heavy snapshots), replace steps 3-4 with one md5-keyed hash-shuffle
semi-join — same fallback rule as flagship exact dedup
(pipelines/flagship.py:98).

No reference analog (Lucene.NET has no corpus-level dedup); this is an
LLM-data-pipeline op in the round brief's dedup family.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BITS_LOG2 = 22
DEFAULT_K = 7


def _digests(texts: list[str]) -> list[bytes]:
    return [hashlib.md5(t.encode("utf-8")).digest() for t in texts]


def _bit_positions(digests: list[bytes], bits_log2: int, k: int) -> np.ndarray:
    """k double-hashed bit indices per digest: (n, k) int64 in [0, 2^bits)."""
    if not digests:
        return np.empty((0, k), dtype=np.int64)
    raw = np.frombuffer(b"".join(digests), dtype=np.uint64).reshape(-1, 2)
    h1 = raw[:, 0]
    h2 = raw[:, 1] | np.uint64(1)  # odd stride → full-period probing
    i = np.arange(k, dtype=np.uint64)
    mask = np.uint64((1 << bits_log2) - 1)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & mask).astype(np.int64)


def _fold(bitmap: np.ndarray, pos: np.ndarray) -> None:
    """Set bits in-place; bitmap is uint64 words."""
    flat = pos.reshape(-1)
    np.bitwise_or.at(bitmap, flat >> 6, np.uint64(1) << (flat & 63).astype(np.uint64))


def _test(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Row is a candidate iff ALL k bits are set: bool[n]."""
    if pos.shape[0] == 0:
        return np.empty(0, dtype=bool)
    flat = pos.reshape(-1)
    hit = (bitmap[flat >> 6] >> (flat & 63).astype(np.uint64)) & np.uint64(1)
    return hit.reshape(pos.shape).all(axis=1)


def build_text_bloom(ds, text_col: str = "text",
                     bits_log2: int = DEFAULT_BITS_LOG2,
                     k: int = DEFAULT_K) -> np.ndarray:
    """One streaming pass over ``ds``: the OR of every block's partial
    bitmap (tree-combined by Ray Data's aggregate). Returns uint64 words."""
    from ray.data.aggregate import AggregateFnV2

    n_words = (1 << bits_log2) >> 6

    class BloomAgg(AggregateFnV2):
        def __init__(self):
            super().__init__("bloom",
                             zero_factory=lambda: np.zeros(n_words,
                                                           dtype=np.uint64),
                             on=None, ignore_nulls=True)

        def aggregate_block(self, block) -> np.ndarray:
            bm = np.zeros(n_words, dtype=np.uint64)
            texts = block.column(text_col).to_pylist()
            _fold(bm, _bit_positions(_digests(texts), bits_log2, k))
            return bm

        def combine(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
            return a | b

    return ds.select_columns([text_col]).aggregate(BloomAgg())["bloom"]


class _FlagCandidates:
    """Actor-pool stage: bloom bitmap deserialized once per actor."""

    def __init__(self, bloom_ref, text_col: str, bits_log2: int, k: int):
        import ray

        self.bloom = ray.get(bloom_ref)
        self.text_col, self.bits_log2, self.k = text_col, bits_log2, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = _digests(batch.column(self.text_col).to_pylist())
        cand = _test(self.bloom, _bit_positions(d, self.bits_log2, self.k))
        return batch.append_column(
            "__md5", pa.array(d, type=pa.binary())
        ).append_column("__cand", pa.array(cand))


def dedup_against(new_ds, old_ds, text_col: str = "text",
                  bits_log2: int = DEFAULT_BITS_LOG2, k: int = DEFAULT_K):
    """EXACT cross-snapshot dedup: rows of ``new_ds`` whose ``text_col``
    does not occur in ``old_ds``. Returns (kept Dataset, n_dup_texts) —
    the count of distinct new-side texts confirmed present in old."""
    import ray

    bloom_ref = ray.put(build_text_bloom(old_ds, text_col, bits_log2, k))
    flagged = new_ds.map_batches(
        _FlagCandidates, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_args=(bloom_ref, text_col, bits_log2, k))
    # candidate digests: bounded by dup + FP volume, never corpus size
    cand_md5: set[bytes] = set()
    for b in (flagged.select_columns(["__md5", "__cand"])
              .iter_batches(batch_format="pyarrow")):
        cand_md5.update(b.filter(b.column("__cand")).column("__md5").to_pylist())

    confirmed: set[bytes] = set()
    if cand_md5:
        cand_ref = ray.put(cand_md5)

        def confirm(batch: pa.Table) -> pa.Table:
            wanted = ray.get(cand_ref)
            d = _digests(batch.column(text_col).to_pylist())
            hits = [x for x in d if x in wanted]
            return pa.table({"__md5": pa.array(hits, type=pa.binary())})

        for b in (old_ds.select_columns([text_col])
                  .map_batches(confirm, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            confirmed.update(b.column("__md5").to_pylist())

    conf_ref = ray.put(confirmed)

    def keep(batch: pa.Table) -> pa.Table:
        conf = ray.get(conf_ref)
        m = [x not in conf for x in batch.column("__md5").to_pylist()]
        return batch.filter(pa.array(m)).drop_columns(["__md5", "__cand"])

    kept = flagged.map_batches(keep, batch_format="pyarrow")
    return kept, len(confirmed)
