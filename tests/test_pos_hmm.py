"""HMM POS tagger (analysis/pos_hmm.py) — OpenNLP-module stand-in."""

from lucenenet_ray.analysis.pos_hmm import HmmTagger


def counts(sentences):
    """sentences: list of [(word, tag), ...] -> (trans, emit, tag_counts)."""
    tr, em, tc = {}, {}, {}
    for s in sentences:
        prev = "<s>"
        tc["<s>"] = tc.get("<s>", 0) + 1
        for w, t in s:
            tc[t] = tc.get(t, 0) + 1
            tr[(prev, t)] = tr.get((prev, t), 0) + 1
            em[(t, w)] = em.get((t, w), 0) + 1
            prev = t
    return tr, em, tc


def test_unambiguous_emissions_force_tags():
    tagger = HmmTagger(*counts([
        [("dog", "NN"), ("runs", "VB")],
        [("cat", "NN"), ("sleeps", "VB")],
    ]))
    assert tagger.tag(["cat", "runs"]) == ["NN", "VB"]
    assert tagger.tag(["dog"]) == ["NN"]


def test_transitions_decide_ambiguous_word():
    # "flies" seen as both NN and VB; after NN, VB follows 3x in
    # training while NN->NN never — transitions must pick VB
    tagger = HmmTagger(*counts([
        [("time", "NN"), ("flies", "VB")],
        [("bird", "NN"), ("sings", "VB")],
        [("fish", "NN"), ("swims", "VB")],
        [("flies", "NN"), ("bite", "VB")],
    ]))
    assert tagger.tag(["time", "flies"]) == ["NN", "VB"]
    # sentence-initial "flies": P(NN|<s>) dominates (4 starts, all NN)
    assert tagger.tag(["flies", "bite"]) == ["NN", "VB"]


def test_unknown_word_uniform_emission():
    tagger = HmmTagger(*counts([
        [("dog", "NN"), ("runs", "VB")],
        [("cat", "NN"), ("eats", "VB")],
    ]))
    # unknown second word: transitions (NN->VB only) decide
    assert tagger.tag(["dog", "zzz"]) == ["NN", "VB"]


def test_empty():
    tagger = HmmTagger(*counts([[("a", "NN")]]))
    assert tagger.tag([]) == []


def test_corpus_truth_recovery(ray_session):
    import ray.data as rd

    from lucenenet_ray.analysis.pos_hmm import learn_hmm
    from lucenenet_ray.sources.pos import (
        N_DOCS, N_TRAIN, pos_corpus_table, raw_word_ids, tag_of, word_str,
    )

    # learn from the generator directly (no sf dir dependency)
    import pyarrow as pa

    train = pa.table({
        "text": pa.array(
            [" ".join(f"{word_str(i)}/{tag_of(i)}"
                      for i in __import__(
                          "lucenenet_ray.sources.pos",
                          fromlist=["train_word_ids"]).train_word_ids(d))
             for d in range(N_TRAIN)], pa.string()),
    })
    tagger = learn_hmm(rd.from_arrow(train))
    for d in range(N_TRAIN, min(N_DOCS, N_TRAIN + 40)):
        ids = raw_word_ids(d)
        assert tagger.tag([word_str(i) for i in ids]) \
            == [tag_of(i) for i in ids]
