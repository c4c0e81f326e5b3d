"""Filter algebra (``Queries/ChainedFilter.cs`` / ``BooleanFilter.cs``).

Reference semantics re-expressed (NOT ported):

- :func:`chained_filter` — ChainedFilter: a left-fold over a filter
  chain with a per-step logic op (OR=0 default, AND=1, ANDNOT=2, XOR=3,
  :42-49): ``result = ((f0 op1 f1) op2 f2) ...`` starting from the first
  filter's doc set.  Filters here are the engine's restricted query
  nodes (term/boolean via the sorter's postings matcher, numeric
  doc-values ranges via the pinned column) evaluated to per-bucket doc
  sets and combined with numpy set ops — the DocIdSet/FixedBitSet
  algebra without materializing corpus-scale bitsets on the driver.

- :func:`boolean_filter` — BooleanFilter: MUST / SHOULD / MUST_NOT over
  a filter list (the Occur-tagged form the reference module also ships).
"""

from __future__ import annotations

import numpy as np

from lucenenet_ray.search.query import (NumericDocValuesRangeQuery, Occur,
                                        Query)

OR, AND, ANDNOT, XOR = 0, 1, 2, 3


def _filter_docs(bucket, f: Query) -> np.ndarray:
    if isinstance(f, NumericDocValuesRangeQuery):
        ids = bucket.norms()[0]
        v = bucket.docvalues(f.field)
        m = np.ones(ids.size, dtype=bool)
        if f.lower is not None:
            m &= (v >= f.lower) if f.include_lower else (v > f.lower)
        if f.upper is not None:
            m &= (v <= f.upper) if f.include_upper else (v < f.upper)
        return ids[m]
    from lucenenet_ray.index.sorter import _bucket_matches

    return _bucket_matches(bucket, f)


def chained_filter(reader, chain: list[Query],
                   logic: list[int] | None = None) -> np.ndarray:
    """Sorted doc ids matching the chain; ``logic[i]`` combines the fold
    result with ``chain[i]`` (logic[0] ignored like the reference's first
    step; default OR everywhere)."""
    if logic is None:
        logic = [OR] * len(chain)
    out: list[np.ndarray] = []
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        acc = _filter_docs(bucket, chain[0])
        for f, op in zip(chain[1:], logic[1:]):
            cur = _filter_docs(bucket, f)
            if op == AND:
                acc = np.intersect1d(acc, cur)
            elif op == ANDNOT:
                acc = np.setdiff1d(acc, cur)
            elif op == XOR:
                acc = np.setxor1d(acc, cur)
            else:  # OR
                acc = np.union1d(acc, cur)
        out.append(acc)
    return np.concatenate(out) if out else np.empty(0, np.int64)


def boolean_filter(reader, clauses: list[tuple[Occur, Query]]) -> np.ndarray:
    """BooleanFilter.cs: MUST intersect, SHOULD union (required when no
    MUST), MUST_NOT subtract."""
    out: list[np.ndarray] = []
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        must: np.ndarray | None = None
        should: list[np.ndarray] = []
        nots: list[np.ndarray] = []
        for occur, f in clauses:
            docs = _filter_docs(bucket, f)
            if occur is Occur.MUST:
                must = docs if must is None else np.intersect1d(must, docs)
            elif occur is Occur.MUST_NOT:
                nots.append(docs)
            else:
                should.append(docs)
        if must is None:
            acc = (np.unique(np.concatenate(should)) if should
                   else np.empty(0, np.int64))
        else:
            acc = must
        for nd in nots:
            acc = np.setdiff1d(acc, nd)
        out.append(acc)
    return np.concatenate(out) if out else np.empty(0, np.int64)


def terms_filter(reader, terms: list[str]) -> np.ndarray:
    """TermsFilter (``Queries/TermsFilter.cs``): docs containing ANY of a
    fixed term list — the classic PK-batch / ACL filter. Like the
    reference ctor (:104-141), the list is sorted and deduplicated once;
    per bucket the doc sets come straight off the postings matcher and
    fold into one union (the reference's single DocIdSet per segment,
    :188-228). Terms may span fields (field-prefixed term space)."""
    from lucenenet_ray.index.sorter import _bucket_matches
    from lucenenet_ray.search.query import TermQuery

    uniq = sorted(set(terms))
    out: list[np.ndarray] = []
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        sets = [_bucket_matches(bucket, TermQuery(term=t)) for t in uniq]
        nonempty = [s for s in sets if s.size]
        if nonempty:
            out.append(np.unique(np.concatenate(nonempty)))
    return np.concatenate(out) if out else np.empty(0, np.int64)
