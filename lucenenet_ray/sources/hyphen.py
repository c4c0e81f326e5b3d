"""Deterministic compound-word corpus for the hyphenation filter.

Same md5 scheme as sources/smartcn.py. Dictionary words use disjoint
char classes — first char from 'a'..'t' (word-initial), rest from
'u'..'z' — and words sharing a first char share a length, so the
vocabulary is prefix-free and a concatenated compound has its true
constituent boundaries exactly at the word-initial letters. The Liang
pattern set is one "1s" pattern per word-initial letter, so the
hyphenation points of any compound ARE the true boundaries, and every
emitted subword (dictionary-checked parts between points) is exactly a
constituent — all re-derivable in SQL.
"""

from __future__ import annotations

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOCS = 150
N_WORDS = 30
S_RANGE = 20  # 'a'..'t'
C_RANGE = 6   # 'u'..'z'


def dict_word(i: int) -> str:
    s_idx = i % S_RANGE
    length = 2 + s_idx % 3
    return chr(97 + s_idx) + "".join(
        chr(117 + md5_int31(f"hy-w-{i}-{k}") % C_RANGE)
        for k in range(1, length)
    )


def patterns() -> list[str]:
    """One '1s' Liang pattern per word-initial letter + letter classes
    for the continuation chars (zero-valued single-letter patterns)."""
    pats = [f"1{chr(97 + s)}" for s in range(S_RANGE)]
    pats += [chr(117 + c) for c in range(C_RANGE)]
    return pats


def doc_compounds(doc_id: int) -> list[list[int]]:
    """Per doc: 4 + md5%5 compounds, each of 2-3 dictionary word ids."""
    m = 4 + md5_int31(f"hy-m-{doc_id}") % 5
    out = []
    for c in range(m):
        k = 2 + md5_int31(f"hy-k-{doc_id}-{c}") % 2
        out.append([md5_int31(f"hy-d-{doc_id}-{c}-{j}") % N_WORDS
                    for j in range(k)])
    return out


def hyphen_corpus_table(sf_dir: str, n_docs: int = N_DOCS) -> pa.Table:
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t.filter(pc.less(t.column("doc_id"), n_docs)).column("doc_id")
    ids = sorted(ids.to_pylist())
    texts = []
    for d in ids:
        comps = ["".join(dict_word(i) for i in comp)
                 for comp in doc_compounds(d)]
        texts.append(" ".join(comps))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
