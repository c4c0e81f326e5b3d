"""Deterministic POS-tagged corpus for the HMM tagger (no external data).

Five tags own disjoint word-initial char ranges ('a'-'c' NN, 'd'-'f' VB,
'g'-'i' JJ, 'j'-'l' RB, 'm'-'o' DT); continuation chars are 'p'..'z'.
Every word's true tag is therefore a pure function of its first char —
SQL-derivable — while the ENGINE has to learn emissions/transitions from
the annotated split and Viterbi-decode the raw split. Every raw word
appears in training (vocab is cycled through the train docs), and each
word maps to exactly one tag, so MLE emissions make Viterbi recover the
truth regardless of transition weights.
"""

from __future__ import annotations

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOCS = 200
N_TRAIN = 40
V = 60
TAGS = ("NN", "VB", "JJ", "RB", "DT")
S_RANGE = 15  # 'a'..'o': 3 initials per tag


def word_str(i: int) -> str:
    s_idx = i % S_RANGE
    length = 2 + s_idx % 3
    return chr(97 + s_idx) + "".join(
        chr(112 + md5_int31(f"pos-w-{i}-{k}") % 11)
        for k in range(1, length)
    )


def tag_of(i: int) -> str:
    return TAGS[(i % S_RANGE) // 3]


def train_word_ids(doc_id: int) -> list[int]:
    ids = [(doc_id * 4 + j) % V for j in range(4)]
    extra = md5_int31(f"pos-tn-{doc_id}") % 8
    ids += [md5_int31(f"pos-t-{doc_id}-{j}") % V for j in range(extra)]
    return ids


def raw_word_ids(doc_id: int) -> list[int]:
    n = 6 + md5_int31(f"pos-n-{doc_id}") % 10
    return [md5_int31(f"pos-d-{doc_id}-{j}") % V for j in range(n)]


def pos_corpus_table(sf_dir: str, n_docs: int = N_DOCS) -> pa.Table:
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
            texts.append(" ".join(
                f"{word_str(i)}/{tag_of(i)}" for i in train_word_ids(d)))
        else:
            splits.append("raw")
            texts.append(" ".join(word_str(i) for i in raw_word_ids(d)))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "split": pa.array(splits, pa.string()),
        "text": pa.array(texts, pa.string()),
    })
