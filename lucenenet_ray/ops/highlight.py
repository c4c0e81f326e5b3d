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
    # map query terms to raw-token slots by analyzing each distinct slot
    hit = np.zeros(len(raw_tokens), dtype=np.int32)
    seen: dict[str, bool] = {}  # analyze each distinct raw token once
    for i, rt in enumerate(raw_tokens):
        v = seen.get(rt)
        if v is None:
            t, _p = analyzer(rt)
            v = any(x in query_terms for x in t)
            seen[rt] = v
        hit[i] = v
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
    excluded (DirectSpellChecker behavior).

    Scale path: candidates are prefiltered by a pushed-down utf8_length band
    (|len−len(term)| ≤ max_edits — a Levenshtein necessary condition), so the
    Python distance loop only sees the band, never the full vocabulary
    (DirectSpellChecker walks a Levenshtein automaton for the same reason)."""
    import pyarrow.compute as pc

    lo, hi = max(0, len(term) - max_edits), len(term) + max_edits
    expr = (pc.utf8_length(pc.field("term")) >= lo) & (
        pc.utf8_length(pc.field("term")) <= hi
    )
    from lucenenet_ray.search.query import FIELD_SEP

    t = reader._termstats().to_table(columns=["term", "df"], filter=expr)
    m = pc.invert(pc.match_substring(t.column("term"), FIELD_SEP))
    t = t.filter(m)  # spell-check over the default (body) field only
    cands = t.column("term").to_pylist()
    dfs = t.column("df").to_pylist()
    out = []
    for cand, df in zip(cands, dfs):
        if cand == term:
            continue
        for d in range(1, max_edits + 1):
            if _levenshtein_within(cand, term, d):
                out.append((cand, d, int(df)))
                break
    out.sort(key=lambda x: (x[1], -x[2], x[0]))
    return out[:k]
