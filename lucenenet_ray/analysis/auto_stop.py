"""QueryAutoStopWordAnalyzer analog — index-df-derived query stop words.

Reference: ``Analysis/Query/QueryAutoStopWordAnalyzer.cs``:
- stop set per field = indexed terms whose ``DocFreq > maxDocFreq``
  (``:119-145``, the ctor TermsEnum walk);
- the percentage ctor computes ``maxDocFreq = (int)(NumDocs *
  maxPercentDocs)`` (``:104-107``; default 0.4f ``:42``) — a single-float
  product truncated toward zero, reproduced here in float32;
- ``WrapComponents`` appends a case-sensitive StopFilter holding the
  derived set over the delegate's stream (``:152-161``), so dropped
  tokens leave position holes exactly like the builtin stop set.

Scale shape: the derivation never touches postings — it is a pushed-down
columnar scan of the index's ``termstats`` parquet (``df`` filter +
``term``/``df`` column pruning), i.e. O(vocabulary) bytes read once at
analyzer construction, then a broadcast-sized set held per worker. At
10^12 docs the termstats table is vocabulary-sized (millions of rows,
not corpus-sized), so this stays a sub-second driver-side scan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.dataset as pads

from lucenenet_ray.search.query import DEFAULT_FIELD, FIELD_SEP


def derived_max_doc_freq(num_docs: int, max_percent_docs: float) -> int:
    """The reference's ``(int)(NumDocs * maxPercentDocs)`` — float32
    product, truncation toward zero (QueryAutoStopWordAnalyzer.cs:104)."""
    return int(np.float32(num_docs) * np.float32(max_percent_docs))


def auto_stop_words(index_path: str, field: str = DEFAULT_FIELD,
                    max_doc_freq: int | None = None,
                    max_percent_docs: float | None = None,
                    num_docs: int | None = None) -> dict[str, int]:
    """Derive the stop set for one field: ``{term: df}`` for every indexed
    term with ``df > maxDocFreq`` (strict, QueryAutoStopWordAnalyzer.cs:136).

    Exactly one of ``max_doc_freq`` / ``max_percent_docs`` must be given;
    the percent form needs ``num_docs`` (the reference uses
    ``IndexReader.NumDocs``)."""
    if (max_doc_freq is None) == (max_percent_docs is None):
        raise ValueError("pass exactly one of max_doc_freq / max_percent_docs")
    if max_percent_docs is not None:
        if num_docs is None:
            raise ValueError("the percent form needs num_docs")
        max_doc_freq = derived_max_doc_freq(num_docs, max_percent_docs)
    dset = pads.dataset(os.path.join(index_path, "termstats"))
    t = dset.to_table(columns=["term", "df"],
                      filter=pads.field("df") > max_doc_freq)
    terms = t.column("term").to_pylist()
    dfs = t.column("df").to_pylist()
    out: dict[str, int] = {}
    prefix = "" if field == DEFAULT_FIELD else field + FIELD_SEP
    for term, df in zip(terms, dfs):
        if field == DEFAULT_FIELD:
            if FIELD_SEP in term:
                continue
            out[term] = int(df)
        elif term.startswith(prefix):
            out[term[len(prefix):]] = int(df)
    return out


class QueryAutoStopWordAnalyzer:
    """Wrap a delegate analyzer with per-field index-derived stop sets.

    The delegate is any ``text -> (terms, positions)`` callable (the repo's
    analyzer convention: absolute positions, holes already applied), so
    dropping a stop word here preserves the survivors' absolute positions —
    identical to appending a StopFilter with posIncr accumulation."""

    def __init__(self, delegate, index_path: str,
                 fields: tuple[str, ...] = (DEFAULT_FIELD,),
                 max_doc_freq: int | None = None,
                 max_percent_docs: float | None = None,
                 num_docs: int | None = None):
        self.delegate = delegate
        self._stop: dict[str, frozenset[str]] = {
            f: frozenset(auto_stop_words(
                index_path, f, max_doc_freq=max_doc_freq,
                max_percent_docs=max_percent_docs, num_docs=num_docs))
            for f in fields
        }

    def stop_words(self, field: str = DEFAULT_FIELD) -> list[str]:
        """GetStopWords(fieldName) — sorted for determinism."""
        return sorted(self._stop.get(field, frozenset()))

    def __call__(self, text: str, field: str = DEFAULT_FIELD
                 ) -> tuple[list[str], list[int]]:
        terms, positions = self.delegate(text)
        stop = self._stop.get(field)
        if not stop:
            return terms, positions
        kept = [(t, p) for t, p in zip(terms, positions) if t not in stop]
        return [t for t, _ in kept], [p for _, p in kept]
