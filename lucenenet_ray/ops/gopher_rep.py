"""Gopher repetition-removal signals (Rae et al. 2021, Table A1) — the
duplicate-text quality rules every LLM curation pipeline runs alongside
the length/stopword gates in ``webclean.GopherQuality``.

Per doc, all integer-exact (so the SQL oracle hash-matches bit-for-bit):
- ``top{n}_chars`` (n = 2, 3, 4): occurrences of the doc's most frequent
  word n-gram × the n-gram's character length (joining spaces included);
  ties broken toward the lexicographically smallest n-gram string. The
  paper's "fraction of characters in the most frequent n-gram" numerator
  — callers divide by n_chars to apply a threshold.
- ``dup5_cover_words``: count of distinct word POSITIONS covered by any
  5-gram occurring >= 2 times in the doc (occurrences overlap-uncounted
  via interval cover, the paper's "fraction of characters in duplicated
  n-grams" in word-position space).

Tokens are the raw ``text.split(' ')`` stream (empty tokens would count;
the corpus is single-spaced). Line/paragraph duplicate rules are n/a for
this corpus (no newlines) and omitted.

Distributed shape: ONE stateless ``map_batches`` pass, no shuffle — each
doc's rules are local. Per-doc n-gram counting uses combined vocab codes
(per-doc vocab V <= n_words, V^4 << 2^63) with np.unique; only the modal
candidates are materialized as strings for the tie-break, which matches
joined-string order because ' ' sorts below every token character.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NGRAM_NS = (2, 3, 4)
DUP_N = 5


def _doc_stats(tokens: list[str]) -> tuple[int, int, int, int]:
    """(top2_chars, top3_chars, top4_chars, dup5_cover_words)."""
    toks = np.asarray(tokens, dtype=object)
    nw = len(toks)
    vocab, codes = np.unique(toks, return_inverse=True)
    v = np.int64(len(vocab))
    tops = []
    for n in NGRAM_NS:
        if nw < n:
            tops.append(0)
            continue
        combo = codes[:nw - n + 1].astype(np.int64)
        for j in range(1, n):
            combo = combo * v + codes[j:nw - n + 1 + j]
        uniq, cnt = np.unique(combo, return_counts=True)
        mx = int(cnt.max())
        # decode modal candidates; pick min joined string
        cands = uniq[cnt == mx]
        best = None
        for code in cands.tolist():
            parts = []
            for _ in range(n):
                parts.append(vocab[code % v])
                code //= v
            s = " ".join(reversed(parts))
            if best is None or s < best:
                best = s
        tops.append(mx * len(best))
    if nw < DUP_N:
        return tops[0], tops[1], tops[2], 0
    combo = codes[:nw - DUP_N + 1].astype(np.int64)
    for j in range(1, DUP_N):
        combo = combo * v + codes[j:nw - DUP_N + 1 + j]
    uniq, cnt = np.unique(combo, return_counts=True)
    dup = uniq[cnt >= 2]
    starts = np.flatnonzero(np.isin(combo, dup))
    if len(starts) == 0:
        return tops[0], tops[1], tops[2], 0
    diff = np.zeros(nw + 1, dtype=np.int64)
    np.add.at(diff, starts, 1)
    np.add.at(diff, starts + DUP_N, -1)
    covered = int(np.count_nonzero(np.cumsum(diff[:-1]) > 0))
    return tops[0], tops[1], tops[2], covered


class GopherRepetition:
    """Actor-pool stage: per-doc repetition stats (stateless math, the
    class form keeps the stage shape uniform with the other quality
    scorers)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        out = np.empty((len(texts), 4), dtype=np.int64)
        for i, txt in enumerate(texts):
            out[i] = _doc_stats((txt or "").split(" "))
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), type=pa.int64()),
            "top2_chars": pa.array(out[:, 0], type=pa.int64()),
            "top3_chars": pa.array(out[:, 1], type=pa.int64()),
            "top4_chars": pa.array(out[:, 2], type=pa.int64()),
            "dup5_cover_words": pa.array(out[:, 3], type=pa.int64()),
        })


def gopher_repetition_stats(ds, concurrency: int = 2) -> pa.Table:
    """All docs' repetition stats, doc_id-ordered."""
    from lucenenet_ray.util.tables import dataset_to_table

    t = dataset_to_table(
        ds.map_batches(GopherRepetition, batch_format="pyarrow",
                       concurrency=concurrency),
        schema=pa.schema([
            ("doc_id", pa.int64()), ("top2_chars", pa.int64()),
            ("top3_chars", pa.int64()), ("top4_chars", pa.int64()),
            ("dup5_cover_words", pa.int64())]))
    idx = pa.compute.sort_indices(t.column("doc_id"))
    return t.take(idx)
