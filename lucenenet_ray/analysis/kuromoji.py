"""Kuromoji analog: mecab-style lattice Viterbi for Japanese text.

Re-expresses ``Lucene.Net.Analysis.Kuromoji.JapaneseTokenizer`` — the
lattice search, not the shipped compiled dictionaries (those are data
packs; see SURVEY scope note). Semantics mirrored:

* Path cost accumulation (``JapaneseTokenizer.cs:312-339``):
  ``cost = prevCost + connection(prevRightID, leftID(word))`` minimized
  over arriving states, then ``+= wordCost`` — i.e. Viterbi over states
  ``(position, rightID)`` with a bigram connection-cost matrix
  (``Dict/ConnectionCosts.cs``) and per-word costs + left/right context
  ids (``Dict/IDictionary.cs``).
* Search-mode decomposition penalty (``JapaneseTokenizer.cs:71-77,
  ComputePenalty:285-307``): all-kanji words longer than 2 pay
  ``(len-2)*3000``, other words longer than 7 pay ``(len-7)*1700`` —
  added to the word cost so long compounds split in search mode.
* Unknown characters fall back to single-char UNKNOWN entries with a
  fixed high cost (the reference groups same-class runs via
  ``Dict/CharacterDefinition.cs``; the single-char simplification is
  documented — runs re-form downstream because each char is OOV).
* BOS/EOS: lattice starts in state rightID=0 cost 0 and ends by adding
  ``connection(rightID, 0)`` at the end position
  (``JapaneseTokenizer.cs`` Backtrace from the EOS position).

Dictionaries here are plain Python/numpy structures supplied by the
caller (tests/driver synthesize one deterministically from md5 formulas);
the tokenizer itself is dictionary-agnostic. The per-doc DP runs inside
an actor-pool ``map_batches`` with the dictionary broadcast once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEARCH_MODE_KANJI_LENGTH = 2      # JapaneseTokenizer.cs:71
SEARCH_MODE_OTHER_LENGTH = 7      # :73
SEARCH_MODE_KANJI_PENALTY = 3000  # :75
SEARCH_MODE_OTHER_PENALTY = 1700  # :77

UNKNOWN_WORD_COST = 30000
UNKNOWN_ID = 0                    # left/right context id for unknown chars


class MecabDict:
    """word -> (word_cost, left_id, right_id) + connection matrix
    conn[right_id_prev, left_id_next] (Dict/ConnectionCosts.cs shape)."""

    def __init__(self, entries: dict[str, tuple[int, int, int]],
                 conn: np.ndarray,
                 kanji_pred=None):
        self.entries = entries
        self.conn = np.asarray(conn, dtype=np.int64)
        self.max_len = max((len(w) for w in entries), default=1)
        # is-kanji predicate for the search-mode penalty
        # (CharacterDefinition.IsKanji analog; default: CJK unified block)
        self.kanji_pred = kanji_pred or (
            lambda ch: 0x4E00 <= ord(ch) <= 0x9FFF)


def _penalty(word: str, kanji_pred, search_mode: bool) -> int:
    """ComputePenalty (JapaneseTokenizer.cs:285-307)."""
    if not search_mode:
        return 0
    n = len(word)
    if n > SEARCH_MODE_KANJI_LENGTH and all(kanji_pred(c) for c in word):
        return (n - SEARCH_MODE_KANJI_LENGTH) * SEARCH_MODE_KANJI_PENALTY
    if n > SEARCH_MODE_OTHER_LENGTH:
        return (n - SEARCH_MODE_OTHER_LENGTH) * SEARCH_MODE_OTHER_PENALTY
    return 0


class JapaneseLatticeTokenizer:
    """Viterbi over (position, rightID) states with connection costs."""

    def __init__(self, dic: MecabDict, search_mode: bool = False):
        self.dic = dic
        self.search_mode = search_mode

    def tokenize(self, sent: str) -> list[str]:
        if not sent:
            return []
        dic = self.dic
        n = len(sent)
        # states[pos] = {right_id: (cost, back_pos, back_rid, word)}
        states: list[dict[int, tuple[int, int, int, str | None]]] = [
            {} for _ in range(n + 1)]
        states[0][0] = (0, -1, -1, None)  # BOS: rightID 0, cost 0
        for pos in range(n):
            if not states[pos]:
                continue
            # candidate words at pos: dictionary matches + unknown char
            cands: list[tuple[str, int, int, int]] = []
            for l in range(1, min(dic.max_len, n - pos) + 1):
                w = sent[pos:pos + l]
                e = dic.entries.get(w)
                if e is not None:
                    cands.append((w, *e))
            if not any(c[0] == sent[pos] for c in cands):
                cands.append((sent[pos], UNKNOWN_WORD_COST,
                              UNKNOWN_ID, UNKNOWN_ID))
            for w, wcost, left, right in cands:
                add = wcost + _penalty(w, dic.kanji_pred, self.search_mode)
                # least arriving cost over fromPosData states (:318-339)
                least, least_rid = None, -1
                for rid, (c, _bp, _br, _w) in states[pos].items():
                    cost = c + int(dic.conn[rid, left])
                    if least is None or cost < least:
                        least, least_rid = cost, rid
                total = least + add
                end = pos + len(w)
                cur = states[end].get(right)
                if cur is None or total < cur[0]:
                    states[end][right] = (total, pos, least_rid, w)
        # EOS: connect every end state to leftID 0 (Backtrace from EOS)
        best, best_rid = None, -1
        for rid, (c, _bp, _br, _w) in states[n].items():
            cost = c + int(dic.conn[rid, 0])
            if best is None or cost < best:
                best, best_rid = cost, rid
        toks: list[str] = []
        pos, rid = n, best_rid
        while pos > 0:
            c, bp, brid, w = states[pos][rid]
            toks.append(w)
            pos, rid = bp, brid
        toks.reverse()
        return toks


class KuromojiTokens:
    """Actor-pool map_batches stage: (doc_id, text) -> (doc_id, term).
    Dictionary is a ray.put broadcast ref resolved once per actor."""

    def __init__(self, dict_ref, search_mode: bool = False):
        import ray

        dic = (ray.get(dict_ref)
               if not isinstance(dict_ref, MecabDict) else dict_ref)
        self.tok = JapaneseLatticeTokenizer(dic, search_mode=search_mode)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        terms: list[str] = []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            for tok in self.tok.tokenize(text):
                ids.append(d)
                terms.append(tok)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "term": pa.array(terms, type=pa.string())})
