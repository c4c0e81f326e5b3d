"""HMM POS tagger: the algorithmic stand-in for the OpenNLP module.

``Lucene.Net.Analysis.OpenNLP`` wraps externally-trained opennlp
models (sentence detector, tokenizer, POS tagger, chunker, lemmatizer
— all data packs out of scope); the Lucene-side contract is
``OpenNLPPOSFilter.cs:29-100``: tag every token of a sentence and
expose the tag as the token TYPE. This module supplies the tagging
algorithm itself — a bigram hidden-Markov model decoded with Viterbi —
TRAINED from a tagged split, the same learn/broadcast/apply shape as
``analysis/smartcn.py``:

* ``learn_hmm``: Ray pipeline over "word/TAG" annotated docs —
  per-batch transition/emission/tag counts -> one vocabulary-sized
  ``groupby(key).sum`` -> driver dicts.
* ``HmmTagger.tag``: Viterbi over log probs with add-one smoothing on
  transitions; emissions are MLE over the seen vocabulary, unknown
  words emit uniformly (transitions decide) — deterministic,
  first-minimal tie-break on the tag list order.
"""

from __future__ import annotations

import math

import pyarrow as pa

START = "<s>"


class HmmTagger:
    def __init__(self, trans: dict[tuple[str, str], int],
                 emit: dict[tuple[str, str], int],
                 tag_counts: dict[str, int]):
        self.tags = sorted(t for t in tag_counts if t != START)
        self.trans = trans
        self.emit = emit
        self.tag_counts = tag_counts
        n_tags = len(self.tags)
        # log P(t2|t1), add-one smoothed
        self.ltrans = {
            (t1, t2): math.log(
                (trans.get((t1, t2), 0) + 1.0)
                / (tag_counts.get(t1, 0) + n_tags))
            for t1 in list(self.tags) + [START] for t2 in self.tags
        }

    def _lemit(self, word: str, tag: str) -> float:
        c = self.emit.get((tag, word), 0)
        if c == 0:
            return 0.0 if not self._known(word) else -math.inf
        return math.log(c / self.tag_counts[tag])

    def _known(self, word: str) -> bool:
        if not hasattr(self, "_vocab"):
            self._vocab = {w for (_t, w) in self.emit}
        return word in self._vocab

    def tag(self, words: list[str]) -> list[str]:
        if not words:
            return []
        best = {t: self.ltrans[(START, t)] + self._lemit(words[0], t)
                for t in self.tags}
        back: list[dict[str, str]] = []
        for w in words[1:]:
            nxt: dict[str, float] = {}
            bp: dict[str, str] = {}
            for t2 in self.tags:
                e = self._lemit(w, t2)
                cand_cost, cand_tag = -math.inf, self.tags[0]
                for t1 in self.tags:
                    c = best[t1] + self.ltrans[(t1, t2)]
                    if c > cand_cost:
                        cand_cost, cand_tag = c, t1
                nxt[t2] = cand_cost + e
                bp[t2] = cand_tag
            best = nxt
            back.append(bp)
        last = max(self.tags, key=lambda t: (best[t], ))
        # deterministic argmax: first tag (sorted order) wins ties
        for t in self.tags:
            if best[t] == best[last]:
                last = t
                break
        path = [last]
        for bp in reversed(back):
            path.append(bp[path[-1]])
        path.reverse()
        return path


def learn_hmm(train_ds) -> HmmTagger:
    """Docs of "word/TAG ..." text -> counts via one small groupby."""

    def partials(b: pa.Table) -> pa.Table:
        tc: dict[str, int] = {}
        tr: dict[str, int] = {}
        em: dict[str, int] = {}
        for text in b.column("text").to_pylist():
            prev = START
            tc[START] = tc.get(START, 0) + 1
            for wt in text.split():
                w, t = wt.rsplit("/", 1)
                tc[t] = tc.get(t, 0) + 1
                tr[prev + "\x01" + t] = tr.get(prev + "\x01" + t, 0) + 1
                em[t + "\x01" + w] = em.get(t + "\x01" + w, 0) + 1
                prev = t
        keys = (["c:" + k for k in tc] + ["t:" + k for k in tr]
                + ["e:" + k for k in em])
        ns = list(tc.values()) + list(tr.values()) + list(em.values())
        return pa.table({"key": pa.array(keys, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    agg = (train_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("key").sum("n"))
    tc: dict[str, int] = {}
    tr: dict[tuple[str, str], int] = {}
    em: dict[tuple[str, str], int] = {}
    for row in agg.take_all():
        key, n = row["key"], int(row["sum(n)"])
        kind, body = key[:2], key[2:]
        if kind == "c:":
            tc[body] = n
        elif kind == "t:":
            a, b = body.split("\x01")
            tr[(a, b)] = n
        else:
            t, w = body.split("\x01")
            em[(t, w)] = n
    return HmmTagger(tr, em, tc)
