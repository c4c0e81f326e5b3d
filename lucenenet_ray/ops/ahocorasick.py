"""Aho-Corasick multi-pattern scanning (Aho & Corasick 1975) — the
blocklist/keyword-surveillance pass of a web-text pipeline: one automaton
scan of each document against the WHOLE pattern list (10k+ patterns at
production scale), instead of P regex passes.

Semantics (mirrored by the SQL oracle): raw SUBSTRING matching over the
unanalyzed text — every (position, pattern) occurrence counts, including
occurrences overlapping each other or other patterns (the automaton's
suffix/output links exist exactly to emit those); per pattern the op
reports how many docs contain it and the total occurrence count.

Distributed shape: the automaton is built ONCE PER ACTOR in ``__init__``
(goto/fail/output tables — the state a per-batch function must never
rebuild) and each batch emits per-batch PARTIAL (pattern, docs, occs)
rows combined by one tiny ``groupby(pattern)``; the corpus stream is
scanned exactly once regardless of pattern count. The per-char automaton
step is scalar Python — bounded at one transition per input char (the
algorithm's whole point); swap-in for a C automaton is a one-liner."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# overlap-heavy defaults: suffix patterns of each other + multi-word
DEFAULT_PATTERNS = ("spark", "park", "ark", "merge", "window",
                    "the", "he", "data", "at", "stream")


class AhoCorasick:
    """Classic goto/fail/output automaton over unicode codepoints."""

    def __init__(self, patterns: tuple[str, ...]):
        self.patterns = list(patterns)
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for pi, p in enumerate(self.patterns):
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(pi)
        # BFS fail links; output sets merge along them
        from collections import deque

        self.fail = [0] * len(self.goto)
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0)
                if self.fail[s] == s:
                    self.fail[s] = 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]

    def count(self, text: str, counts: np.ndarray) -> bool:
        """Add this text's per-pattern occurrence counts into ``counts``;
        returns True if anything matched."""
        s = 0
        hit = False
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                hit = True
                for pi in out[s]:
                    counts[pi] += 1
        return hit


class BlocklistScan:
    """Actor-pool stage: automaton in __init__, partials per batch."""

    def __init__(self, patterns: tuple[str, ...] = DEFAULT_PATTERNS,
                 text_col: str = "text"):
        self.ac = AhoCorasick(patterns)
        self.text_col = text_col
        self.n = len(patterns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        occ = np.zeros(self.n, dtype=np.int64)
        docs = np.zeros(self.n, dtype=np.int64)
        per_doc = np.zeros(self.n, dtype=np.int64)
        for txt in batch.column(self.text_col).to_pylist():
            per_doc[:] = 0
            if self.ac.count(txt or "", per_doc):
                occ += per_doc
                docs += per_doc > 0
        return pa.table({
            "pattern": pa.array(list(self.ac.patterns), type=pa.string()),
            "docs": pa.array(docs, type=pa.int64()),
            "occs": pa.array(occ, type=pa.int64()),
        })


def blocklist_scan(ds, patterns: tuple[str, ...] = DEFAULT_PATTERNS,
                   text_col: str = "text") -> pa.Table:
    """(pattern, n_docs, n_occurrences) per pattern, pattern-sorted —
    zero-count patterns included."""
    agg = (ds.map_batches(
        BlocklistScan, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"patterns": patterns, "text_col": text_col})
        .groupby("pattern").sum(["docs", "occs"]).to_pandas())
    agg = agg.sort_values("pattern")
    return pa.table({
        "pattern": pa.array(agg["pattern"].tolist(), type=pa.string()),
        "n_docs": pa.array(agg["sum(docs)"].to_numpy(dtype=np.int64)),
        "n_occurrences": pa.array(agg["sum(occs)"].to_numpy(dtype=np.int64)),
    })
