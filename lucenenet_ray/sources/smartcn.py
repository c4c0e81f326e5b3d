"""Deterministic SmartCn test corpus (no external data).

The sandbox has no Chinese text and the reference's trained dictionaries
(``Hhmm/coredict.mem``, ``bigramdict.mem``) are binary data we must not
copy, so the SmartCn driver query synthesizes BOTH the training data and
the raw text from md5 formulas (same scheme as ``sources/cjk.py``):

* A vocabulary of ``V`` "words". Word ``i`` starts with one START-class
  ideograph ``chr(S_BASE + i % S_RANGE)`` followed by ``L-1``
  CONTINUATION-class ideographs (disjoint code-point ranges), where
  ``L = 1 + (i % S_RANGE) % 3``. All words sharing a first char share a
  length, so the vocabulary is prefix-free and — because words can only
  begin at START-class chars — any unsegmented concatenation of vocabulary
  words has exactly ONE dictionary-consistent segmentation. That makes the
  true token stream re-derivable in pure SQL (``smartcn_term_stats_sql``)
  while the ENGINE has to find it the reference's way: seg-graph +
  bigram-smoothed Viterbi shortest path (``Hhmm/HHMMSegmenter.cs``,
  ``Hhmm/BiSegGraph.cs:52-118``).

* TRAIN docs (``doc_id < N_TRAIN``) are space-segmented (the "annotated
  corpus" standing in for coredict/bigramdict): positions ``j < 8`` cycle
  ``(doc_id*8 + j) % V`` so every vocabulary word is covered
  deterministically; later positions are md5 draws for frequency spread.

* RAW docs (``N_TRAIN <= doc_id < N_DOCS``) are the same word process
  concatenated WITHOUT separators — the segmenter's input.
"""

from __future__ import annotations

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOCS = 200
N_TRAIN = 30
V = 60
S_BASE, S_RANGE = 0x4E00, 40   # word-initial ideographs
C_BASE, C_RANGE = 0x5100, 32   # word-continuation ideographs (disjoint)


def vocab_word(i: int) -> str:
    """Deterministic vocabulary word i (prefix-free S C* construction)."""
    s_idx = i % S_RANGE
    length = 1 + s_idx % 3
    return chr(S_BASE + s_idx) + "".join(
        chr(C_BASE + md5_int31(f"scn-w-{i}-{k}") % C_RANGE)
        for k in range(1, length)
    )


def train_word_indices(doc_id: int) -> list[int]:
    """Word indices of a TRAIN doc: 8 coverage-cycled + 0..7 md5 draws."""
    idxs = [(doc_id * 8 + j) % V for j in range(8)]
    extra = md5_int31(f"scn-tn-{doc_id}") % 8
    idxs += [md5_int31(f"scn-t-{doc_id}-{j}") % V for j in range(extra)]
    return idxs


def raw_word_indices(doc_id: int) -> list[int]:
    """Word indices of a RAW doc: 6 + md5%10 md5 draws."""
    n = 6 + md5_int31(f"scn-n-{doc_id}") % 10
    return [md5_int31(f"scn-d-{doc_id}-{j}") % V for j in range(n)]


def smartcn_corpus_table(sf_dir: str, n_docs: int = N_DOCS) -> pa.Table:
    """(doc_id, split, text): train docs space-segmented, raw docs joined."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t.filter(pc.less(t.column("doc_id"), n_docs)).column("doc_id")
    ids = sorted(ids.to_pylist())
    splits, texts = [], []
    for d in ids:
        if d < N_TRAIN:
            splits.append("train")
            texts.append(" ".join(vocab_word(i) for i in train_word_indices(d)))
        else:
            splits.append("raw")
            texts.append("".join(vocab_word(i) for i in raw_word_indices(d)))
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "split": pa.array(splits, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    })
