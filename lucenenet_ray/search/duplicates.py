"""DuplicateFilter (``Lucene.Net.Sandbox/Queries/DuplicateFilter.cs``)
re-expressed over the engine's bucketed postings.

Reference semantics (NOT a port — the reference walks a TermsEnum per
segment filling a FixedBitSet; here each (term, bucket) chunk's decoded doc
array yields its per-bucket min/max in one vectorized step and a tiny
per-term reduce picks the global keeper):

- ``keep_mode`` — KeepMode.KM_USE_FIRST_OCCURRENCE keeps the LOWEST doc id
  per key-field value, KM_USE_LAST_OCCURRENCE the HIGHEST
  (``DuplicateFilter.cs:33-47``).
- ``process_mode`` — ProcessingMode.PM_FULL_VALIDATION starts from an empty
  set and admits ONLY the kept occurrence of each key value, so docs
  WITHOUT the key field are excluded (``DuplicateFilter.cs:95-123``
  CorrectBits); PM_FAST_INVALIDATION starts from all live docs and clears
  the non-kept duplicates, so field-less docs remain
  (``DuplicateFilter.cs:125-158`` FastBits).

The result is a sorted global doc-id array, meant to ride a scoring query
as ``DocIdSetQuery`` (the FilteredQuery composition, boost=0.0 → score
identity). Per-term state is O(#distinct key values) — the same memory
shape as the reference's per-segment bitset, and at cluster scale the
per-bucket scan is embarrassingly parallel (bucket = doc partition).
"""

from __future__ import annotations

import numpy as np

from lucenenet_ray.search.query import FIELD_SEP

KM_USE_FIRST_OCCURRENCE = "first"
KM_USE_LAST_OCCURRENCE = "last"
PM_FULL_VALIDATION = "full"
PM_FAST_INVALIDATION = "fast"


def duplicate_filter(reader, field: str,
                     keep_mode: str = KM_USE_LAST_OCCURRENCE,
                     process_mode: str = PM_FULL_VALIDATION) -> np.ndarray:
    """Sorted global doc ids surviving the duplicate filter on ``field``."""
    if keep_mode not in (KM_USE_FIRST_OCCURRENCE, KM_USE_LAST_OCCURRENCE):
        raise ValueError(f"unknown keep_mode {keep_mode!r}")
    if process_mode not in (PM_FULL_VALIDATION, PM_FAST_INVALIDATION):
        raise ValueError(f"unknown process_mode {process_mode!r}")
    # field terms via the sorted term dictionary's range pushdown (the
    # BlockTree prefix-seek path) — never a full vocabulary scan
    from lucenenet_ray.search.reader import _prefix_successor

    prefix = field + FIELD_SEP
    terms = reader.terms_in_range(prefix, _prefix_successor(prefix),
                                  include_lower=True, include_upper=False)
    last = keep_mode == KM_USE_LAST_OCCURRENCE
    # per-key running keeper (global doc id) + docs carrying the field
    keeper: dict[str, int] = {}
    field_docs: list[np.ndarray] = []
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        for term, chunk in bucket.chunks_for_terms(terms).items():
            docs = chunk.docs()
            if docs.size == 0:
                continue
            field_docs.append(docs)
            cand = int(docs[-1] if last else docs[0])
            cur = keeper.get(term)
            if cur is None or (cand > cur if last else cand < cur):
                keeper[term] = cand
    kept = np.array(sorted(keeper.values()), dtype=np.int64)
    if process_mode == PM_FULL_VALIDATION:
        return kept
    # FastBits: all docs minus (field docs − kept)
    all_ids = np.concatenate(
        [reader.bucket(b).norms()[0] for b in reader.bucket_ids]
    ) if reader.bucket_ids else np.empty(0, np.int64)
    having_field = (np.unique(np.concatenate(field_docs))
                    if field_docs else np.empty(0, np.int64))
    losers = np.setdiff1d(having_field, kept, assume_unique=True)
    return np.setdiff1d(np.sort(all_ids), losers)
