"""BPE corpus encoding with shipped merges (ops/bpe_encode.py): true
leftmost merge vs the oracle's replace-chain simulation, run-heavy
adjacency cases, and the per-doc stats op."""

import pyarrow as pa
import ray.data as rd

from lucenenet_ray.ops.bpe_encode import (SHIPPED_MERGES, bpe_encode_stats,
                                          encode_word, encode_word_replace)


def test_encode_examples():
    assert encode_word("data") == ["data"]          # at→ata→data
    assert encode_word("window") == ["w", "indow"]  # in→ind→indow
    assert encode_word("merge") == ["merg", "e"]    # er→mer→merg
    # rank order matters: ("e","r") fires before ("q","u")/("qu","e"),
    # so the e is consumed into "er" and "que" can never form
    assert encode_word("query") == ["qu", "er", "y"]
    assert encode_word("xyz") == ["x", "y", "z"]    # nothing fires


def test_replace_chain_parity_on_corpus_vocab():
    """The oracle-equivalence guard: replace-chain == leftmost merge for
    every word in the real corpus."""
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    vocab = set()
    for txt in t.column("text").to_pylist():
        vocab.update((txt or "").split())
    for w in vocab:
        assert encode_word(w) == encode_word_replace(w), w


def test_replace_chain_parity_adjacent_runs():
    """Pathological repeated-pair runs: the multi-pass replace must agree
    with leftmost-first merging (the reason _REPLACE_PASSES > 1)."""
    for w in ("erererer", "ananan", "atatatat", "inininin",
              "aaaa", "erer", "stst"):
        assert encode_word(w) == encode_word_replace(w), w


def test_stats_op(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["data window", "merge", ""], type=pa.string()),
    })
    out = bpe_encode_stats(rd.from_arrow(t),
                           check_replace_parity=True).take_all()
    by = {r["doc_id"]: r for r in out}
    assert by[0]["n_words"] == 2
    assert by[0]["n_bpe_tokens"] == 1 + 2   # data | w indow
    assert by[1]["n_bpe_tokens"] == 2       # merg e
    assert by[2]["n_words"] == 0 and by[2]["n_bpe_tokens"] == 0


def test_merges_all_constructible():
    """Every merge's inputs exist when it runs (chars or earlier
    outputs) — a merge whose left/right can never exist is dead data."""
    avail = {chr(c) for c in range(ord("a"), ord("z") + 1)}
    for left, right in SHIPPED_MERGES:
        assert left in avail and right in avail, (left, right)
        avail.add(left + right)
