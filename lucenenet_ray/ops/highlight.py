"""Highlighter + spell-suggest — the Highlighter / Suggest module analogs.

Highlighter (``src/Lucene.Net.Highlighter``, inventoried SURVEY §0): find the
best token window of a document for a set of query terms (the
QueryScorer/SimpleFragmenter behavior in spirit: fragment score = number of
query-term hits in the window) and render it with <b> markers.

Suggest (``src/Lucene.Net.Suggest`` / SpellChecker): candidate corrections for
a term from the index's term dictionary ranked by (edit distance asc, df
desc, term asc) — DirectSpellChecker-style.
"""

from __future__ import annotations

import numpy as np

from lucenenet_ray.analysis.standard import StandardAnalyzer
from lucenenet_ray.search.query import _levenshtein_within


def best_fragment(text: str, query_terms: set[str], window: int = 16,
                  analyzer: StandardAnalyzer | None = None) -> tuple[str, int]:
    """Best `window`-token fragment of `text` for `query_terms` →
    (highlighted fragment, hit count). Hits are wrapped in <b></b>.
    Deterministic: earliest window among ties."""
    analyzer = analyzer or StandardAnalyzer()
    raw_tokens = text.split()  # fragment rendering keeps the raw tokens
    terms, _pos = analyzer(text)
    # map analyzed terms back to raw-token slots by re-analyzing per slot
    hit = np.zeros(len(raw_tokens), dtype=np.int32)
    for i, rt in enumerate(raw_tokens):
        t, _p = analyzer(rt)
        if any(x in query_terms for x in t):
            hit[i] = 1
    if len(raw_tokens) == 0:
        return "", 0
    w = min(window, len(raw_tokens))
    sums = np.convolve(hit, np.ones(w, dtype=np.int32), mode="valid")
    best = int(np.argmax(sums))  # argmax returns FIRST maximum → earliest
    frag = []
    for i in range(best, best + w):
        frag.append(f"<b>{raw_tokens[i]}</b>" if hit[i] else raw_tokens[i])
    return " ".join(frag), int(sums[best])


def suggest_terms(reader, term: str, max_edits: int = 2, k: int = 5
                  ) -> list[tuple[str, int, int]]:
    """Spell suggestions from the term dictionary → [(term, distance, df)]
    ranked by (distance asc, df desc, term asc); the input term itself is
    excluded (DirectSpellChecker behavior)."""
    import pyarrow.parquet as pq
    import os

    t = pq.read_table(os.path.join(reader.index_path, "termstats"))
    out = []
    for i in range(t.num_rows):
        cand = t.column("term")[i].as_py()
        if cand == term:
            continue
        for d in range(1, max_edits + 1):
            if _levenshtein_within(cand, term, d):
                out.append((cand, d, int(t.column("df")[i].as_py())))
                break
    out.sort(key=lambda x: (x[1], -x[2], x[0]))
    return out[:k]
