"""Distributed BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909).

The one tokenizer-side op the engine lacked: LEARNING the merge table from
a corpus (applying a fixed merge list is ``bpe_token_count``).  Shape:

1. ``word_counts``: streaming ``map_batches`` (Arrow-vectorized whitespace
   split + value_counts partials) → ONE ``groupby(word).sum`` — the only
   corpus-scale pass.  Everything after runs on the (word, count)
   AGGREGATE, which is orders of magnitude smaller than the corpus
   (bounded further by ``min_count``).
2. ``learn_bpe``: the merge loop is inherently iterative — every round's
   argmax depends on the previous round's apply — so it runs on raw Ray
   actors (the documented Dataset-API escape hatch): the word table is
   hash-repartitioned into K shard actors, each holding its words as
   symbol lists plus a pair→word inverted index.  Per round the driver
   holds only the GLOBAL pair-count dict (bounded by the distinct-pair
   vocabulary, not the corpus), picks the deterministic argmax
   (count desc, left asc, right asc — integer sums, shard-count
   invariant), broadcasts the merge, and folds in the per-shard DELTA
   dicts (only pairs touched by affected words travel).

Scale notes (100 TB): the corpus pass is the groupby; the loop's per-round
traffic is K delta dicts whose size is bounded by (affected words ×
word length), independent of corpus bytes.  Driver memory = one
pair-count dict + a lazy heap; raise ``min_count`` to bound the word
table on web-scale vocabularies (standard practice).

No reference analog (LLM-ops item); semantics follow the public Sennrich
reference implementation: symbols start as characters, merged token =
left+right string concat, leftmost-first within-word replacement.
"""

from __future__ import annotations

import heapq
from collections import Counter
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray


def word_counts(ds: "ray.data.Dataset", text_col: str = "text",
                min_count: int = 1) -> "ray.data.Dataset":
    """Corpus → (word, n) aggregate: vectorized split partials + ONE groupby."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = pc.cast(t.column(text_col), pa.string())
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            pc.fill_null(col, "")))
        if len(toks) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        vc = toks.combine_chunks().value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("word").aggregate(Sum("n", alias_name="n")))
    if min_count > 1:
        out = out.filter(expr=f"n >= {min_count}")
    return out


def _merge_word(sym: list[str], left: str, right: str,
                new: str) -> list[str]:
    """Leftmost-first (left,right) → new replacement within one word."""
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == left and sym[i + 1] == right:
            out.append(new)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


@ray.remote
class _BpeShard:
    """One shard of the word table: symbol lists + pair inverted index."""

    def __init__(self, block_refs: list, word_col: str, count_col: str):
        self.words: list[list[str]] = []
        self.wcount: list[int] = []
        for ref in block_refs:
            t = ray.get(ref)
            # empty blocks from repartition carry a ZERO-COLUMN schema
            if t.num_rows == 0 or word_col not in t.schema.names:
                continue
            for w, c in zip(t.column(word_col).to_pylist(),
                            t.column(count_col).to_pylist()):
                if w:
                    self.words.append(list(w))
                    self.wcount.append(int(c))
        self.pair2words: dict[tuple[str, str], set[int]] = {}
        counts: Counter = Counter()
        for wi, sym in enumerate(self.words):
            c = self.wcount[wi]
            for p in zip(sym, sym[1:]):
                counts[p] += c
                self.pair2words.setdefault(p, set()).add(wi)
        self._init_counts = dict(counts)

    def pair_counts(self) -> dict:
        return self._init_counts

    def apply(self, left: str, right: str) -> dict:
        """Merge (left,right) in every affected word; return pair-count deltas."""
        new = left + right
        affected = self.pair2words.pop((left, right), set())
        delta: Counter = Counter()
        for wi in affected:
            sym = self.words[wi]
            c = self.wcount[wi]
            old_pairs = list(zip(sym, sym[1:]))
            new_sym = _merge_word(sym, left, right, new)
            new_pairs = list(zip(new_sym, new_sym[1:]))
            self.words[wi] = new_sym
            for p in old_pairs:
                delta[p] -= c
                s = self.pair2words.get(p)
                if s is not None:
                    s.discard(wi)
            for p in new_pairs:
                delta[p] += c
                self.pair2words.setdefault(p, set()).add(wi)
        delta.pop((left, right), None)
        return {p: d for p, d in delta.items() if d != 0}


def learn_bpe(word_ds: "ray.data.Dataset", num_merges: int,
              num_shards: int = 8, word_col: str = "word",
              count_col: str = "n", min_pair_count: int = 1) -> pa.Table:
    """Learn ``num_merges`` BPE merges from a (word, count) Dataset.

    Returns (merge_rank, left_tok, right_tok, cnt) — cnt is the pair's
    corpus count AT MERGE TIME, ranks 1-based in merge order."""
    refs = word_ds.repartition(num_shards).to_arrow_refs()
    groups: list[list] = [[] for _ in range(num_shards)]
    for i, r in enumerate(refs):
        groups[i % num_shards].append(r)
    shards = [_BpeShard.remote(g, word_col, count_col)
              for g in groups if g]

    global_counts: Counter = Counter()
    for d in ray.get([s.pair_counts.remote() for s in shards]):
        global_counts.update(d)
    # Lazy max-heap: stale entries are re-validated against global_counts
    # on pop, so per-round cost is O(log P) amortized, not a dict scan.
    heap: list[tuple[int, str, str]] = [
        (-c, l, r) for (l, r), c in global_counts.items() if c > 0]
    heapq.heapify(heap)

    ranks: list[int] = []
    lefts: list[str] = []
    rights: list[str] = []
    cnts: list[int] = []
    while len(ranks) < num_merges and heap:
        negc, left, right = heapq.heappop(heap)
        cur = global_counts.get((left, right), 0)
        if cur != -negc:
            if cur >= min_pair_count:
                heapq.heappush(heap, (-cur, left, right))
            continue
        if cur < min_pair_count:
            break
        ranks.append(len(ranks) + 1)
        lefts.append(left)
        rights.append(right)
        cnts.append(cur)
        del global_counts[(left, right)]
        for d in ray.get([s.apply.remote(left, right) for s in shards]):
            for p, dv in d.items():
                nc = global_counts.get(p, 0) + dv
                if nc > 0:
                    if nc > global_counts.get(p, 0):
                        heapq.heappush(heap, (-nc, p[0], p[1]))
                    global_counts[p] = nc
                else:
                    global_counts.pop(p, None)
    return pa.table({
        "merge_rank": pa.array(ranks, type=pa.int64()),
        "left_tok": pa.array(lefts, type=pa.string()),
        "right_tok": pa.array(rights, type=pa.string()),
        "cnt": pa.array(cnts, type=pa.int64()),
    })


def learn_bpe_reference(words: dict[str, int], num_merges: int,
                        min_pair_count: int = 1) -> list[tuple[str, str, int]]:
    """Single-process brute-force reference (full recount per round) —
    the fuzz-test model for the delta/heap/shard machinery above."""
    sym = {w: list(w) for w in words}
    out: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, s in sym.items():
            c = words[w]
            for p in zip(s, s[1:]):
                counts[p] += c
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_pair_count:
            break
        out.append((left, right, cnt))
        for w in sym:
            sym[w] = _merge_word(sym[w], left, right, left + right)
    return out
