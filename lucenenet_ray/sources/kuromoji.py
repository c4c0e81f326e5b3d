"""Deterministic Kuromoji test corpus + synthetic mecab-style dictionary.

Same scheme as ``sources/smartcn.py``: the reference's compiled mecab
dictionaries are data packs we must not copy, so the driver query
synthesizes a dictionary AND a corpus from md5 formulas. The vocabulary
is prefix-free (word-initial vs continuation katakana ranges are
disjoint, words sharing a first char share a length), so every raw doc —
a separator-free concatenation of vocabulary words — has exactly one
dictionary-consistent segmentation, re-derivable in SQL. The ENGINE must
recover it the reference's way: lattice Viterbi over (position, rightID)
states with connection costs (``JapaneseTokenizer.cs:312-339``). Word
costs, context ids and the connection matrix are md5-drawn; unknown
single-char cost (30000) dominates any true-word edge (≤ 5000 word cost
+ ≤ 499 connection), so the true path is always optimal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOCS = 150
V = 50
N_IDS = 8                        # context-id space; id 0 = BOS/EOS/unknown
S_BASE, S_RANGE = 0x30A2, 30     # word-initial katakana
C_BASE, C_RANGE = 0x30C2, 30     # continuation katakana (disjoint)


def vocab_word(i: int) -> str:
    s_idx = i % S_RANGE
    length = 1 + s_idx % 3
    return chr(S_BASE + s_idx) + "".join(
        chr(C_BASE + md5_int31(f"kj-w-{i}-{k}") % C_RANGE)
        for k in range(1, length)
    )


def dict_entry(i: int) -> tuple[int, int, int]:
    """(word_cost, left_id, right_id) for vocab word i."""
    return (1000 + md5_int31(f"kj-wc-{i}") % 4000,
            1 + md5_int31(f"kj-li-{i}") % (N_IDS - 1),
            1 + md5_int31(f"kj-ri-{i}") % (N_IDS - 1))


def connection_matrix() -> np.ndarray:
    conn = np.zeros((N_IDS, N_IDS), dtype=np.int64)
    for r in range(N_IDS):
        for l in range(N_IDS):
            conn[r, l] = md5_int31(f"kj-c-{r}-{l}") % 500
    return conn


def build_dict():
    """Synthesized MecabDict. md5 word-string collisions merge to one
    entry (last index wins); truth and oracle count word STRINGS, so
    which entry wins never changes the result."""
    from lucenenet_ray.analysis.kuromoji import MecabDict

    entries = {vocab_word(i): dict_entry(i) for i in range(V)}
    return MecabDict(entries, connection_matrix())


def raw_word_indices(doc_id: int) -> list[int]:
    n = 6 + md5_int31(f"kj-n-{doc_id}") % 10
    return [md5_int31(f"kj-d-{doc_id}-{j}") % V for j in range(n)]


def kuromoji_corpus_table(sf_dir: str, n_docs: int = N_DOCS) -> pa.Table:
    """(doc_id, text): separator-free concatenations of vocabulary words."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t.filter(pc.less(t.column("doc_id"), n_docs)).column("doc_id")
    ids = sorted(ids.to_pylist())
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(
            ["".join(vocab_word(i) for i in raw_word_indices(d))
             for d in ids], type=pa.string()),
    })
