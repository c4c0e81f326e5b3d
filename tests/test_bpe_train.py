"""BPE merge learning (ops/bpe_train.py, sources/bpetrain.py)."""

import random

import pyarrow as pa
import pytest

import ray.data as rd

from lucenenet_ray.ops.bpe_train import (
    _merge_word,
    learn_bpe,
    learn_bpe_reference,
    word_counts,
)
from lucenenet_ray.sources.bpetrain import (
    NUM_MERGES,
    bpe_corpus_table,
    expected_merges,
)

SF = "/root/testdata/sf0.001"


def _counts_ds(words: dict[str, int], blocks: int = 3) -> "rd.Dataset":
    t = pa.table({"word": list(words), "n": list(words.values())})
    return rd.from_arrow(t).repartition(blocks)


def _as_tuples(t: pa.Table) -> list[tuple[str, str, int]]:
    return list(zip(t.column("left_tok").to_pylist(),
                    t.column("right_tok").to_pylist(),
                    t.column("cnt").to_pylist()))


def test_merge_word_leftmost_first():
    assert _merge_word(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _merge_word(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    assert _merge_word(list("abab"), "a", "b", "ab") == ["ab", "ab"]
    assert _merge_word(list("xay"), "a", "b", "ab") == ["x", "a", "y"]


def test_sennrich_style_example():
    # classic example: ties broken (count desc, left asc, right asc)
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    out = _as_tuples(learn_bpe(_counts_ds(words), 4, num_shards=2))
    # (e,s)=9 ties (s,t)=9 -> 'e' < 's'; then (es,t)=9; then (l,o)=7
    # ties (o,w)=7 -> 'l' < 'o'
    assert out == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7),
                   ("lo", "w", 7)]


def test_overlapping_pairs_and_recreated_levels():
    words = {"aaaa": 3}
    out = _as_tuples(learn_bpe(_counts_ds(words, blocks=1), 3))
    assert out == [("a", "a", 9), ("aa", "aa", 3)]  # loop drains, stops


def test_shard_count_invariance():
    rng = random.Random(7)
    alphabet = "abcdef"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6))):
        rng.randint(1, 40)
        for _ in range(60)
    }
    one = learn_bpe(_counts_ds(words, blocks=1), 15, num_shards=1)
    many = learn_bpe(_counts_ds(words, blocks=5), 15, num_shards=5)
    assert one.equals(many)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_delta_engine_matches_brute_recount(seed):
    rng = random.Random(seed)
    alphabet = "abcdxy"
    words = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7))):
        rng.randint(1, 25)
        for _ in range(40)
    }
    got = _as_tuples(learn_bpe(_counts_ds(words), 12, num_shards=3))
    want = learn_bpe_reference(words, 12)
    assert got == want


def test_word_counts_min_count():
    ds = rd.from_items([{"text": "a a a b b c"}, {"text": "a b"}])
    rows = {r["word"]: r["n"]
            for r in word_counts(ds, min_count=3).take_all()}
    assert rows == {"a": 4, "b": 3}


def test_gate_corpus_matches_closed_form():
    ds = rd.from_arrow(bpe_corpus_table(SF)).repartition(6)
    out = learn_bpe(word_counts(ds, "text"), NUM_MERGES, num_shards=3)
    assert out.equals(expected_merges())
