"""Deterministic CJK test corpus (no external data).

The sandbox testdata has no CJK text, so the CJK driver query synthesizes a
corpus derivable from md5 alone: for each ``doc_id < N_DOCS`` (ids taken from
the documents table so the oracle can join on it), 6 space-separated segments
whose script, length and code points all come from ``md5_int31`` formulas.
``ops/sql_oracle.term_stats_cjk_sql`` re-derives the EXPECTED token stream
from the same formulas in DuckDB (md5 + chr), so the driver compare validates
that the real tokenizer implements Lucene's CJK token classes
(``StandardTokenizer.cs:85-104``): one token per Han ideograph
(<IDEOGRAPHIC>) and per Hiragana syllable (<HIRAGANA>), one token per
Katakana run (<KATAKANA>) and per Hangul run (<HANGUL>), latin words through
the normal ALetter path.
"""

from __future__ import annotations

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOCS = 200
N_SEGS = 6

# (codepoint base, range) per script selector 0..3; selector 4 = latin word
HAN = (0x4E00, 64)
HIRAGANA = (0x3042, 16)
KATAKANA = (0x30A2, 16)
HANGUL = (0xAC00, 64)
SCRIPTS = (HAN, HIRAGANA, KATAKANA, HANGUL)

# lowercase, non-stopword — survive the StandardAnalyzer chain unchanged
LATIN_WORDS = ("quick", "zebra", "mango", "pixel",
               "royal", "sonic", "tiger", "vivid")


def cjk_text(doc_id: int) -> str:
    """Deterministic per-doc text: 6 single-script segments, space-joined."""
    segs: list[str] = []
    for j in range(N_SEGS):
        script = md5_int31(f"cjk-s-{doc_id}-{j}") % 5
        if script == 4:
            r = md5_int31(f"cjk-c-{doc_id}-{j}-0")
            segs.append(LATIN_WORDS[r % len(LATIN_WORDS)])
            continue
        base, rng = SCRIPTS[script]
        seglen = 1 + md5_int31(f"cjk-l-{doc_id}-{j}") % 3
        segs.append("".join(
            chr(base + md5_int31(f"cjk-c-{doc_id}-{j}-{k}") % rng)
            for k in range(seglen)
        ))
    return " ".join(segs)


def cjk_corpus_table(sf_dir: str, n_docs: int = N_DOCS) -> pa.Table:
    """(doc_id, text) for doc_ids < n_docs present in the documents table."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = t.filter(pc.less(t.column("doc_id"), n_docs)).column("doc_id")
    ids = sorted(ids.to_pylist())
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([cjk_text(d) for d in ids], type=pa.string()),
    })
