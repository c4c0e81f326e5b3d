"""Deterministic Beider-Morse rule pack + corpus (no external data).

Same md5 scheme as the other synthesized sources: 20 "units" with
word-initial chars 'a'..'j' and continuation chars 'k'..'t' (prefix-free:
units sharing a first char share a length), each with two md5-drawn
2-char phonemes over 'u'..'z'. The rule pack has, per distinct unit (in
index order, first definition wins on string collisions):

  1. pattern=unit, rcontext='^abcde' -> ph1   (next char class rule)
  2. pattern=unit                    -> ph2   (fallback)

plus a final-rules pass of single-char rewrites over 'u'..'z'. Corpus
words are unit concatenations, so the engine's greedy scan consumes
exactly unit-by-unit and the TRUE encoding is SQL-derivable: per unit,
ph1 iff the NEXT unit starts in 'a'..'e' (LEAD window), else ph2; then a
translate() for the final pass.
"""

from __future__ import annotations

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOCS = 150
N_UNITS = 20
RCTX_SET = "abcde"
FINAL_SRC = "uvwxyz"


def unit_str(i: int) -> str:
    s_idx = i % 10
    length = 1 + s_idx % 2
    return chr(97 + s_idx) + "".join(
        chr(107 + md5_int31(f"bm-u-{i}-{k}") % 10)
        for k in range(1, length)
    )


def phoneme(i: int, variant: int) -> str:
    return "".join(chr(117 + md5_int31(f"bm-p{variant}-{i}-{k}") % 6)
                   for k in range(2))


def final_map() -> str:
    """Target chars for translate('uvwxyz', ...)."""
    return "".join(chr(117 + md5_int31(f"bm-f-{c}") % 6)
                   for c in FINAL_SRC)


def build_rules():
    """(rules, final_rules) for analysis.beidermorse.PhoneticEngine."""
    from lucenenet_ray.analysis.beidermorse import Rule

    rules = []
    seen: set[str] = set()
    for i in range(N_UNITS):
        u = unit_str(i)
        if u in seen:
            continue
        seen.add(u)
        rules.append(Rule(u, "", "^" + RCTX_SET, phoneme(i, 1)))
        rules.append(Rule(u, "", "", phoneme(i, 2)))
    fm = final_map()
    finals = [Rule(src, "", "", dst) for src, dst in zip(FINAL_SRC, fm)]
    return rules, finals


def doc_words(doc_id: int) -> list[list[int]]:
    n = 6 + md5_int31(f"bm-n-{doc_id}") % 8
    out = []
    for w in range(n):
        k = 2 + md5_int31(f"bm-k-{doc_id}-{w}") % 3
        out.append([md5_int31(f"bm-d-{doc_id}-{w}-{j}") % N_UNITS
                    for j in range(k)])
    return out


def bm_corpus_table(sf_dir: str, n_docs: int = N_DOCS) -> pa.Table:
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t.filter(pc.less(t.column("doc_id"), n_docs)).column("doc_id")
    ids = sorted(ids.to_pylist())
    texts = []
    for d in ids:
        texts.append(" ".join("".join(unit_str(i) for i in word)
                              for word in doc_words(d)))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
