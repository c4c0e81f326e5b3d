"""Deterministic Stempel training lexicon + corpus (no external data).

The reference ships a compiled Polish stemmer table (data pack, out of
copy scope); the Egothor ALGORITHM is language-agnostic, so the driver
query trains it on a synthetic inflection lexicon derived from md5
formulas and stems a corpus drawn from the same lexicon:

* 40 stems of 3-5 chars from 'a'..'m'; 8 suffixes of 0-3 chars from
  'n'..'z' (disjoint char classes: the stem/suffix boundary of any
  word is recoverable, so distinct (stem, suffix) pairs can only
  collide on the full word string when the stem is the same — a
  harmless duplicate training pair).
* Training pairs: every (stem+suffix, stem).
* Corpus docs: 8 + md5%8 words per doc, each word = (stem i, suffix j)
  with i, j md5-drawn. Every corpus word is a training key, so the
  trained Trie resolves it exactly and the oracle can re-derive each
  word's stem straight from the formulas.
"""

from __future__ import annotations

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOCS = 150
N_STEMS = 40
N_SUFF = 8


def stem_str(i: int) -> str:
    length = 3 + md5_int31(f"st-l-{i}") % 3
    return "".join(chr(97 + md5_int31(f"st-s-{i}-{k}") % 13)
                   for k in range(length))


def suffix_str(j: int) -> str:
    return "".join(chr(110 + md5_int31(f"st-x-{j}-{k}") % 13)
                   for k in range(j % 4))


def stempel_pairs_table() -> pa.Table:
    words, stems = [], []
    for i in range(N_STEMS):
        s = stem_str(i)
        for j in range(N_SUFF):
            words.append(s + suffix_str(j))
            stems.append(s)
    return pa.table({"word": pa.array(words, pa.string()),
                     "stem": pa.array(stems, pa.string())})


def doc_word_ij(doc_id: int) -> list[tuple[int, int]]:
    n = 8 + md5_int31(f"st-n-{doc_id}") % 8
    return [(md5_int31(f"st-i-{doc_id}-{p}") % N_STEMS,
             md5_int31(f"st-j-{doc_id}-{p}") % N_SUFF)
            for p in range(n)]


def stempel_corpus_table(sf_dir: str, n_docs: int = N_DOCS) -> pa.Table:
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t.filter(pc.less(t.column("doc_id"), n_docs)).column("doc_id")
    ids = sorted(ids.to_pylist())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(
            [" ".join(stem_str(i) + suffix_str(j)
                      for i, j in doc_word_ij(d)) for d in ids],
            pa.string()),
    })
