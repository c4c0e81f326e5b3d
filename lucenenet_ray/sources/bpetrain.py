"""Deterministic BPE-trainer gate corpus (no external data).

Why this construction: the BPE merge LOOP is iterative (each merge changes
the next round's pair counts), which a SQL oracle cannot simulate.  This
corpus is engineered so the full merge sequence has a CLOSED FORM the
oracle can emit with ``generate_series`` while the engine still has to run
the real distributed algorithm (count → argmax → apply → recount):

* Four pairwise-disjoint single-char classes:
  A1 = 'a'..'h', B1 = 'i'..'p', A2 = 'q'..'t', B2 = 'u'..'x'.
* 64 two-char words  ``x·y``  (x∈A1, y∈B1), word i occurring exactly
  ``300 + i`` times corpus-wide.  Merging (x,y) collapses the word to one
  token — no new pairs ever appear, so these 64 merges are independent.
* 16 four-char words ``z·w·z·w`` (z∈A2, w∈B2), word j occurring exactly
  ``100 + 2j`` times.  Pair counts at any round:
  (z,w) = 2·occ = 200+4j, inner (w,z) = occ = 100+2j, and — only AFTER
  (z,w) is merged — (zw,zw) = occ = 100+2j.
* Count ranges are disjoint ([300,364) > [200,264) > [100,132)) and all
  values within a range distinct, so the global (count desc, left asc,
  right asc) selection order is exactly: all 64 (x,y) by i desc, then all
  16 (z,w) by j desc, then all 16 (zw,zw) by j desc.  The inner (w,z)
  pair is NEVER selected: while it exists its own (z,w) holds twice its
  count, and merging (z,w) destroys it — the closed form needs no
  simulation.

Word occurrences are round-robined over N_DOCS docs (occurrence k of
global word v lands in doc ``(v*31 + k) % N_DOCS``) so the engine's
distributed counting is exercised across blocks; corpus-level counts are
placement-invariant.
"""

from __future__ import annotations

import pyarrow as pa

N_DOCS = 200
N_L1 = 64      # two-char words, counts 300+i
N_L2 = 16      # z w z w words, counts 100+2j
NUM_MERGES = N_L1 + 2 * N_L2   # the full derivable sequence (96)


def _l1_word(i: int) -> str:
    return chr(97 + i // 8) + chr(105 + i % 8)


def _l2_word(j: int) -> str:
    return (chr(113 + j // 4) + chr(117 + j % 4)) * 2


def _word_plan() -> list[tuple[str, int]]:
    """(word, corpus-wide occurrence count) for every distinct word."""
    plan = [(_l1_word(i), 300 + i) for i in range(N_L1)]
    plan += [(_l2_word(j), 100 + 2 * j) for j in range(N_L2)]
    return plan


def bpe_corpus_table(sf_dir: str) -> pa.Table:
    """(doc_id, text) for the first N_DOCS doc_ids of documents.parquet,
    text = space-joined words placed by the round-robin formula."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id"])
    ids = sorted(t.filter(
        pc.less(t.column("doc_id"), N_DOCS)).column("doc_id").to_pylist())
    per_doc: dict[int, list[str]] = {d: [] for d in ids}
    for v, (word, cnt) in enumerate(_word_plan()):
        for k in range(cnt):
            d = (v * 31 + k) % N_DOCS
            if d in per_doc:
                per_doc[d].append(word)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([" ".join(per_doc[d]) for d in ids],
                         type=pa.string()),
    })


def expected_merges() -> pa.Table:
    """The closed-form merge sequence (mirrors bpe_learn_merges_sql)."""
    ranks, lefts, rights, cnts = [], [], [], []
    for i in range(N_L1 - 1, -1, -1):
        ranks.append(N_L1 - i)
        lefts.append(chr(97 + i // 8))
        rights.append(chr(105 + i % 8))
        cnts.append(300 + i)
    for j in range(N_L2 - 1, -1, -1):
        ranks.append(N_L1 + N_L2 - j)
        lefts.append(chr(113 + j // 4))
        rights.append(chr(117 + j % 4))
        cnts.append(200 + 4 * j)
    for j in range(N_L2 - 1, -1, -1):
        ranks.append(N_L1 + 2 * N_L2 - j)
        tok = chr(113 + j // 4) + chr(117 + j % 4)
        lefts.append(tok)
        rights.append(tok)
        cnts.append(100 + 2 * j)
    return pa.table({
        "merge_rank": pa.array(ranks, type=pa.int64()),
        "left_tok": pa.array(lefts, type=pa.string()),
        "right_tok": pa.array(rights, type=pa.string()),
        "cnt": pa.array(cnts, type=pa.int64()),
    })
