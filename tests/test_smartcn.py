"""SmartCn analog: HHMM seg-graph + bigram Viterbi segmentation.

Semantics under test (cited in analysis/smartcn.py): seg graph of
single-char fallbacks + dictionary matches (HHMMSegmenter.CreateSegGraph),
edge weight -log(0.1*(1+f1)/MAX + 0.9*((1-tiny)*f12/(1+f1) + tiny))
(BiSegGraph.cs:107-113), Viterbi shortest path (BiSegGraph.cs:185-240).
"""

import itertools

import pytest

from lucenenet_ray.analysis.smartcn import (
    END, SEG_CHAR, START, HhmmSegmenter, edge_weight,
)
from lucenenet_ray.sources.smartcn import (
    N_DOCS, N_TRAIN, V, raw_word_indices, train_word_indices, vocab_word,
)


def brute_force(sent, word_freq, bigram_freq):
    """Enumerate every tokenization (dict words or single chars), score it
    with the exact edge-weight chain START..END, return the cheapest."""
    def splits(s):
        if not s:
            yield []
            return
        for l in range(1, len(s) + 1):
            tok = s[:l]
            if l == 1 or tok in word_freq:
                for rest in splits(s[l:]):
                    yield [tok] + rest

    def cost(toks):
        path = [START] + toks + [END]
        return sum(
            edge_weight(word_freq.get(a, 0),
                        bigram_freq.get(a + SEG_CHAR + b, 0))
            for a, b in zip(path, path[1:])
        )

    return min(splits(sent), key=cost)


def corpus_dicts():
    from collections import Counter

    wc, bc = Counter(), Counter()
    for d in range(N_TRAIN):
        words = [START] + [vocab_word(i) for i in train_word_indices(d)] + [END]
        wc.update(words)
        for a, b in zip(words, words[1:]):
            bc[a + SEG_CHAR + b] += 1
    return dict(wc), dict(bc)


def test_recovers_true_segmentation_whole_corpus():
    wf, bf = corpus_dicts()
    seg = HhmmSegmenter(wf, bf)
    for d in range(N_TRAIN, N_DOCS):
        truth = [vocab_word(i) for i in raw_word_indices(d)]
        assert seg.segment("".join(truth)) == truth


def test_training_covers_vocabulary():
    wf, _ = corpus_dicts()
    assert {vocab_word(i) for i in range(V)} <= set(wf)


def test_frequency_resolves_ambiguity():
    # "abc": [ab,c] vs [a,bc] vs chars — a heavily-seen "ab" must win
    wf = {"ab": 50, "bc": 1, "a": 1, "b": 1, "c": 1}
    seg = HhmmSegmenter(wf, {})
    got = seg.segment("abc")
    assert got == brute_force("abc", wf, {})
    assert got == ["ab", "c"]


def test_bigram_outvotes_unigram():
    # unigram freqs tie the two-word paths; a strong observed bigram
    # START@a + a@bc tips Viterbi to [a, bc]
    wf = {"ab": 5, "bc": 5, "a": 5, "c": 5}
    bf = {START + SEG_CHAR + "a": 40, "a" + SEG_CHAR + "bc": 40}
    seg = HhmmSegmenter(wf, bf)
    got = seg.segment("abc")
    assert got == brute_force("abc", wf, bf)
    assert got == ["a", "bc"]


def test_oov_falls_back_to_single_chars():
    wf = {"ab": 3}
    seg = HhmmSegmenter(wf, {})
    assert seg.segment("xaby") == ["x", "ab", "y"]


def test_empty_and_single():
    seg = HhmmSegmenter({"a": 1}, {})
    assert seg.segment("") == []
    assert seg.segment("a") == ["a"]
    assert seg.segment("z") == ["z"]


def test_segment_matches_brute_force_randomized():
    # 40 md5-deterministic small lattices vs exhaustive enumeration
    from lucenenet_ray.ops.neardup import md5_int31

    alpha = "abcd"
    for trial in range(40):
        wf = {}
        for w in ("ab", "bc", "cd", "abc", "bcd", "a", "d"):
            f = md5_int31(f"bfw-{trial}-{w}") % 20
            if f:
                wf[w] = f
        bf = {}
        for a, b in itertools.product(list(wf) + [START], list(wf)):
            f = md5_int31(f"bfb-{trial}-{a}-{b}") % 6
            if f > 3:
                bf[a + SEG_CHAR + b] = f
        sent = "".join(alpha[md5_int31(f"bfs-{trial}-{k}") % 4]
                       for k in range(6))
        seg = HhmmSegmenter(wf, bf)
        got = seg.segment(sent)
        best = brute_force(sent, wf, bf)
        # tie-safe compare: equal cost is acceptable, path must be optimal
        def cost(toks):
            path = [START] + toks + [END]
            return sum(edge_weight(wf.get(a, 0),
                                   bf.get(a + SEG_CHAR + b, 0))
                       for a, b in zip(path, path[1:]))
        assert "".join(got) == sent
        assert cost(got) == pytest.approx(cost(best), rel=1e-12)


def test_learn_dicts_matches_hand_counts(ray_session):
    import ray.data as rd

    from lucenenet_ray.analysis.smartcn import learn_dicts

    ds = rd.from_items([{"text": "x y x"}, {"text": "y x"}])
    wf, bf = learn_dicts(ds)
    assert wf["x"] == 3 and wf["y"] == 2
    assert wf[START] == 2 and wf[END] == 2
    assert bf["x" + SEG_CHAR + "y"] == 1
    assert bf["y" + SEG_CHAR + "x"] == 2
    assert bf[START + SEG_CHAR + "x"] == 1
