"""SortedSetSortField (``Lucene.Net.Sandbox/Queries/SortedSetSortField.cs``)
— sort documents by a selected member of their multi-valued term set.

Reference semantics (NOT ported): per doc, ``Selector.MIN`` picks the
smallest ordinal of the doc's SortedSetDocValues and ``Selector.MAX`` the
largest (SortedSetSortField.cs:181-197); docs compare by the selected
value, ascending unless reversed. Here the multi-valued set is the doc's
analyzed default-field term set and the ordinal order IS the term
dictionary's sorted string order, so selecting by ordinal equals selecting
the lexicographic min/max term — computed straight from the inverted
index: one ascending walk over each bucket's term-sorted postings assigns
first-seen (min) and last-seen (max) terms per doc, O(total postings),
no stored-field access. Docs with an empty kept-term set carry no value
and are omitted (the sort's valued universe).

Scale shape: per-bucket work is independent (serving actors each walk
their own postings once and cache nothing new); the driver merge is
top-k-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sorted_set_min_max(reader, bucket_id: int) -> tuple[np.ndarray, list[str], np.ndarray, np.ndarray]:
    """(doc_ids, sorted_terms, min_ord, max_ord) for one bucket; ord -1 =
    no value."""
    from lucenenet_ray.search.query import FIELD_SEP

    bucket = reader.bucket(bucket_id)
    loaded = bucket.load_full()
    terms = sorted(t for t in loaded if FIELD_SEP not in t)
    doc_ids = bucket.norms()[0]
    n = doc_ids.size
    min_ord = np.full(n, -1, dtype=np.int64)
    max_ord = np.full(n, -1, dtype=np.int64)
    for ordinal, t in enumerate(terms):  # ascending dictionary walk
        locs = loaded[t].local_ids(bucket)
        unset = min_ord[locs] == -1
        if unset.any():
            min_ord[locs[unset]] = ordinal
        max_ord[locs] = ordinal  # later (larger) ordinal overwrites
    return doc_ids, terms, min_ord, max_ord


def sorted_set_sort(reader, k: int = 20, selector: str = "min",
                    reverse: bool = False) -> pa.Table:
    """Top-k docs by the selected term of their term set. Output
    (doc_id, min_term, max_term) ordered by the selector's value
    (asc unless reverse), doc_id tie-break."""
    ids_all: list[np.ndarray] = []
    mins: list[str] = []
    maxs: list[str] = []
    for b in reader.bucket_ids:
        doc_ids, terms, mn, mx = sorted_set_min_max(reader, b)
        valued = mn >= 0
        ids_all.append(doc_ids[valued])
        mins.extend(terms[i] for i in mn[valued])
        maxs.extend(terms[i] for i in mx[valued])
    docs = np.concatenate(ids_all) if ids_all else np.empty(0, np.int64)
    key = np.asarray(mins if selector == "min" else maxs)
    if reverse:
        # value desc, doc asc within equal values: sort on negated ranks
        _, inv = np.unique(key, return_inverse=True)
        order = np.lexsort((docs, -inv))
    else:
        order = np.lexsort((docs, key))
    top = order[:k]
    return pa.table({
        "doc_id": pa.array(docs[top], type=pa.int64()),
        "min_term": pa.array([mins[i] for i in top], type=pa.string()),
        "max_term": pa.array([maxs[i] for i in top], type=pa.string()),
    })
