"""SmartCn analog: dictionary-driven HHMM word segmentation for Han text.

Re-expresses ``Lucene.Net.Analysis.SmartCn`` Ray-Data-first:

* ``Hhmm/HHMMSegmenter.cs`` — seg graph: at every offset, the single char
  (dictionary frequency, 0 when unknown) PLUS every dictionary word
  matching at that offset (``CreateSegGraph``; single char first, then
  increasing match length), then virtual SENTENCE_BEGIN
  (start=-1, ``Utility.cs:32`` "始##始") and SENTENCE_END tokens
  (``HHMMSegmenter.cs:206-217``).
* ``Hhmm/BiSegGraph.cs:52-118`` — edge ``t1 -> t2`` for every t2 starting
  where t1 ends (advancing past empty offsets), weighted
  ``-log(smooth*(1+f1)/MAX_FREQUENCE
       + (1-smooth)*((1-tiny)*f12/(1+f1) + tiny))``
  with ``smooth=0.1``, ``MAX_FREQUENCE=2079997+80000`` (``Utility.cs:49``),
  ``tiny=1/MAX_FREQUENCE``, ``f1`` = word frequency of t1, ``f12`` = bigram
  frequency of "t1@t2" (``BigramDictionary.cs:39`` WORD_SEGMENT_CHAR='@').
* ``BiSegGraph.GetShortPath`` (``:185-240``) — Viterbi over token indices,
  strictly-less minimum so the earliest minimal predecessor wins.

The reference ships trained binary dictionaries (coredict/bigramdict.mem);
here both are LEARNED from an annotated (space-segmented) corpus split by a
Ray Data pipeline: per-batch Counter partials -> one small
``groupby(key).sum`` -> driver-held dicts broadcast via ``ray.put``. The
dictionaries are vocabulary-sized, never corpus-sized, so the broadcast is
the scale-safe shape; segmentation itself is a per-doc DP inside an
actor-pool ``map_batches`` (state = the two dicts, loaded once per actor).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

SMOOTH = 0.1
MAX_FREQUENCE = 2079997 + 80000          # Utility.cs:49
TINY = 1.0 / MAX_FREQUENCE               # BiSegGraph.cs:55
SEG_CHAR = "@"                           # BigramDictionary.cs:39
START = "始##始"                          # Utility.cs:32
END = "末##末"                            # Utility.cs:34


def edge_weight(f1: float, f12: float) -> float:
    """BiSegGraph.cs:107-113 smoothing formula."""
    return -math.log(
        SMOOTH * (1.0 + f1) / MAX_FREQUENCE
        + (1.0 - SMOOTH) * ((1.0 - TINY) * f12 / (1.0 + f1) + TINY)
    )


class HhmmSegmenter:
    """Seg-graph + bigram Viterbi segmenter (HHMMSegmenter/BiSegGraph)."""

    def __init__(self, word_freq: dict[str, int], bigram_freq: dict[str, int]):
        self.word_freq = word_freq
        self.bigram_freq = bigram_freq
        self.max_len = max((len(w) for w in word_freq), default=1)

    def seg_graph(self, sent: str) -> list[tuple[int, int, str, int]]:
        """Tokens (start, end, word, freq): per offset the single char then
        dictionary matches of increasing length (CreateSegGraph order),
        plus SENTENCE_BEGIN/END markers."""
        n = len(sent)
        tokens: list[tuple[int, int, str, int]] = [
            (-1, 0, START, self.word_freq.get(START, 0))]
        for i in range(n):
            ch = sent[i]
            tokens.append((i, i + 1, ch, self.word_freq.get(ch, 0)))
            for l in range(2, min(self.max_len, n - i) + 1):
                w = sent[i:i + l]
                f = self.word_freq.get(w)
                if f is not None:
                    tokens.append((i, i + l, w, f))
        tokens.append((n, n + 1, END, self.word_freq.get(END, 0)))
        return tokens

    def segment(self, sent: str) -> list[str]:
        """Viterbi shortest path (BiSegGraph.GetShortPath), markers dropped."""
        if not sent:
            return []
        tokens = self.seg_graph(sent)
        # token indices are already in (start asc, insertion) order
        by_start: dict[int, list[int]] = {}
        for idx, t in enumerate(tokens):
            by_start.setdefault(t[0], []).append(idx)
        n_tok = len(tokens)
        max_start = tokens[-1][0]
        best = np.full(n_tok, np.inf)
        pre = np.full(n_tok, -1, dtype=np.int64)
        best[0] = 0.0
        for cur in range(1, n_tok):
            start = tokens[cur][0]
            # edges into cur: every token ending at `start` (BiSegGraph
            # builds from-side: each t1 links to tokens at the next
            # occupied offset >= t1.end; with single-char fallbacks every
            # offset is occupied, so from.end == cur.start exactly)
            for frm in range(cur):
                if tokens[frm][1] != start:
                    continue
                w = edge_weight(
                    tokens[frm][3],
                    self.bigram_freq.get(tokens[frm][2] + SEG_CHAR + tokens[cur][2], 0),
                )
                if best[frm] + w < best[cur]:
                    best[cur] = best[frm] + w
                    pre[cur] = frm
        # walk back from END (the unique token starting at max_start)
        cur = by_start[max_start][0]
        path: list[str] = []
        while cur > 0:
            path.append(tokens[cur][2])
            cur = int(pre[cur])
        path.reverse()
        return path[:-1] if path and path[-1] == END else path


def learn_dicts(train_ds) -> tuple[dict[str, int], dict[str, int]]:
    """Learn (word_freq, bigram_freq) from a Dataset of space-segmented
    ``text`` rows. Per-batch Counter partials -> groupby(key).sum ->
    driver dicts (vocabulary-sized, not corpus-sized)."""
    import ray.data  # noqa: F401  (Dataset methods)

    def partials(batch: pa.Table) -> pa.Table:
        wc: dict[str, int] = {}
        bc: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            words = [START] + text.split() + [END]
            for w in words:
                wc[w] = wc.get(w, 0) + 1
            for a, b in zip(words, words[1:]):
                k = a + SEG_CHAR + b
                bc[k] = bc.get(k, 0) + 1
        keys = ["w:" + k for k in wc] + ["b:" + k for k in bc]
        ns = list(wc.values()) + list(bc.values())
        return pa.table({"key": pa.array(keys, type=pa.string()),
                         "n": pa.array(ns, type=pa.int64())})

    agg = (train_ds.map_batches(partials, batch_format="pyarrow")
           .groupby("key").sum("n"))
    word_freq: dict[str, int] = {}
    bigram_freq: dict[str, int] = {}
    for row in agg.take_all():          # vocabulary-sized result
        key, n = row["key"], int(row["sum(n)"])
        if key.startswith("w:"):
            word_freq[key[2:]] = n
        else:
            bigram_freq[key[2:]] = n
    return word_freq, bigram_freq


class SegmentTokens:
    """Actor-pool map_batches stage: (doc_id, text) -> (doc_id, term) per
    segmented token. Dictionaries are ray.put broadcast refs resolved once
    per actor in __init__ (SURVEY §2.3 stateful-stage shape)."""

    def __init__(self, word_ref, bigram_ref):
        import ray

        wf = ray.get(word_ref) if not isinstance(word_ref, dict) else word_ref
        bf = (ray.get(bigram_ref)
              if not isinstance(bigram_ref, dict) else bigram_ref)
        self.seg = HhmmSegmenter(wf, bf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        terms: list[str] = []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            for tok in self.seg.segment(text):
                ids.append(d)
                terms.append(tok)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "term": pa.array(terms, type=pa.string())})
