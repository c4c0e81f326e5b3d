"""BPE corpus ENCODING with a SHIPPED merge table — the production-shape
counterpart of ops/bpe_train.py (which LEARNS merges): real pipelines
tokenize trillions of documents with a FIXED tokenizer (GPT-2's
merges.txt et al.), so the merge list here is module DATA, broadcast
once, applied leftmost-first per word exactly like the trainer's
``_merge_word`` (Sennrich et al. 2016 §3).

Ray shape: zero shuffles — ONE streaming ``map_batches`` with a
per-batch word→pieces cache; output is a per-doc row (token counts + an
md5 of the full encoded stream), write_parquet-able at corpus scale.

Oracle strategy (the r3 continuity note's "delimiter-exact replace
chains in SQL" item): each merge (l, r) is a string replacement
``' l r ' → ' lr '`` over the space-interspersed symbol string. A
single scan-left replace MISSES alternating occurrences inside runs
(the scanner consumes the shared boundary space), so the oracle applies
each merge ``_REPLACE_PASSES`` times; :func:`encode_word_replace`
mirrors that exact chain in Python, and the gate wrapper HARD-ASSERTS
it equals the true leftmost merge for every corpus word — a corpus that
ever needed more passes fails loudly instead of silently diverging."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from lucenenet_ray.ops.bpe_train import _merge_word

# Shipped merge list (rank order). Chosen to fire on English web text:
# char pairs first, then second-level merges built from earlier outputs.
SHIPPED_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("i", "n"), ("o", "r"), ("a", "t"), ("a", "n"),
    ("s", "t"), ("o", "n"), ("l", "e"), ("r", "y"), ("o", "w"),
    ("at", "a"), ("d", "ata"), ("in", "d"), ("ind", "ow"),
    ("q", "u"), ("qu", "e"), ("u", "p"), ("m", "er"), ("mer", "g"),
)

_REPLACE_PASSES = 3


def encode_word(word: str) -> list[str]:
    """True leftmost-first BPE encode under SHIPPED_MERGES."""
    sym = list(word)
    for left, right in SHIPPED_MERGES:
        sym = _merge_word(sym, left, right, left + right)
    return sym


def encode_word_replace(word: str) -> list[str]:
    """The ORACLE's replace-chain semantics, mirrored exactly: symbols
    space-joined with sentinel boundaries; each merge applied as
    ``_REPLACE_PASSES`` non-overlapping str.replace passes."""
    s = " " + " ".join(word) + " "
    for left, right in SHIPPED_MERGES:
        pat = f" {left} {right} "
        rep = f" {left}{right} "
        for _ in range(_REPLACE_PASSES):
            s = s.replace(pat, rep)
    return s.split()


def bpe_encode_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                     check_replace_parity: bool = False):
    """Per-doc encoding report → doc_id-sorted Dataset of (doc_id,
    n_words, n_bpe_tokens, enc_md5) where enc_md5 hashes the full piece
    stream ('|'-joined pieces per word, space-joined words).

    ``check_replace_parity`` asserts encode_word == encode_word_replace
    for every distinct word seen (the oracle-equivalence guard)."""

    def stats(t: pa.Table) -> pa.Table:
        cache: dict[str, list[str]] = {}
        out = {"doc_id": [], "n_words": [], "n_bpe_tokens": [],
               "enc_md5": []}
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            words = (txt or "").split()
            enc_parts = []
            n_tok = 0
            for w in words:
                pieces = cache.get(w)
                if pieces is None:
                    pieces = encode_word(w)
                    if check_replace_parity:
                        assert pieces == encode_word_replace(w), w
                    cache[w] = pieces
                enc_parts.append("|".join(pieces))
                n_tok += len(pieces)
            out["doc_id"].append(did)
            out["n_words"].append(len(words))
            out["n_bpe_tokens"].append(n_tok)
            out["enc_md5"].append(
                hashlib.md5(" ".join(enc_parts).encode("utf-8"))
                .hexdigest())
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "n_words": pa.array(out["n_words"], type=pa.int64()),
            "n_bpe_tokens": pa.array(out["n_bpe_tokens"], type=pa.int64()),
            "enc_md5": pa.array(out["enc_md5"], type=pa.string()),
        })

    return ds.map_batches(stats, batch_format="pyarrow",
                          batch_size=512).sort("doc_id")
