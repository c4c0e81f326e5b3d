"""MemoryIndex + percolation (Lucene.Net.Memory analogs).

Reference semantics re-expressed (NOT ported):

- :class:`MemoryIndex` — ``Lucene.Net.Memory/MemoryIndex.cs``: a single
  transient document indexed in memory (``AddField(name, text, analyzer)``
  :234 builds the term → positions map) and searched with the normal query
  tree (``Search(query)`` :531 runs an IndexSearcher over the one-doc
  reader).  The stated purpose (MemoryIndex.cs:40-46) is *prospective*
  search: "large numbers of queries over comparatively small transient
  realtime data" — i.e. percolation.  ``search()`` reproduces the BM25
  score the reference would compute over the 1-doc collection statistics:
  ``N = 1``, ``df = 1`` for every present term (absent terms score 0 — a
  null scorer, not df=0 math), ``avgdl = dl/1``, and the same SmallFloat
  norm-byte quantization as the main engine (util/smallfloat.py).

- :func:`percolate` — the Ray-Data-first inversion of that loop: the
  *query set* is the small broadcast side (``ray.put`` once, read in every
  actor's ``__init__``), the *document stream* is the Dataset.  Each batch
  is tokenized once, inverted into a per-batch term → row-set map, and
  every query is evaluated with numpy set algebra over row ids; only
  positional queries (phrase / multi-phrase) touch per-doc position arrays,
  and only on the candidate rows that survived the set intersection.  This
  is the standard percolator shape at scale: O(batch) tokenize + O(query
  terms) set ops, never queries × docs × tokens.

Match semantics per node mirror the engine's searcher (search/query.py /
search/searcher.py): MUST/SHOULD/MUST_NOT with ``min_should_match``
(BooleanQuery.cs MinimumNumberShouldMatch; a pure-SHOULD boolean needs at
least one match), exact/sloppy phrases (SloppyPhraseScorer via
search/sloppy.py), multi-term expansion against the batch vocabulary
(Prefix/Wildcard/Regexp/Fuzzy/TermRange), DisMax as a union, numeric
doc-values ranges evaluated against a same-named batch column (the
FieldCache analog for a raw stream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.search.query import (
    BooleanQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    NumericDocValuesRangeQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)

# ---------------------------------------------------------------------------
# single-doc positional matcher (shared by MemoryIndex and the batch verify)


def _phrase_match_count(plists: list[np.ndarray], offsets: list[int],
                        slop: int) -> float:
    """Number of phrase matches in one doc (0.0 = no match).

    Exact (slop=0): count alignment bases present in every slot
    (ExactPhraseScorer's conjunction). Sloppy: SloppyPhraseScorer's greedy
    weighted freq via search/sloppy.py.
    """
    if any(p.size == 0 for p in plists):
        return 0.0
    if slop == 0:
        base = plists[0].astype(np.int64) - offsets[0]
        for p, off in zip(plists[1:], offsets[1:]):
            base = base[np.isin(base, p.astype(np.int64) - off)]
            if base.size == 0:
                return 0.0
        return float(base.size)
    from lucenenet_ray.search.sloppy import repeat_groups, sloppy_phrase_freq

    terms = tuple((str(i), off) for i, off in enumerate(offsets))
    return float(sloppy_phrase_freq(plists, list(offsets),
                                    repeat_groups(terms), slop))


def _matches_positions(q: Query, pos_of, vocab, numeric=None) -> bool:
    """Evaluate one query against one doc.

    ``pos_of(term) -> np.ndarray`` (ascending positions, empty if absent),
    ``vocab`` an iterable of the doc's distinct terms, ``numeric`` an
    optional ``field -> value`` mapping for doc-values range nodes.
    """
    if isinstance(q, TermQuery):
        return pos_of(q.term).size > 0
    if isinstance(q, PhraseQuery):
        return _phrase_match_count([pos_of(t) for t, _ in q.terms],
                                   [p for _, p in q.terms], q.slop) > 0.0
    if isinstance(q, MultiPhraseQuery):
        plists = []
        for terms, _ in q.slots:
            merged = np.unique(np.concatenate(
                [pos_of(t) for t in terms])) if terms else np.empty(0, np.int64)
            plists.append(merged)
        return _phrase_match_count(plists, [p for _, p in q.slots],
                                   q.slop) > 0.0
    if isinstance(q, BooleanQuery):
        n_should = 0
        has_must = False
        for cl in q.clauses:
            ok = _matches_positions(cl.query, pos_of, vocab, numeric)
            if cl.occur is Occur.MUST:
                has_must = True
                if not ok:
                    return False
            elif cl.occur is Occur.MUST_NOT:
                if ok:
                    return False
            elif ok:
                n_should += 1
        need = max(q.min_should_match, 0 if has_must else 1)
        if any(cl.occur is Occur.SHOULD for cl in q.clauses):
            return n_should >= need
        # no SHOULD clauses: MUST-only matched above; MUST_NOT-only (or
        # empty) booleans match nothing, like the reference
        return has_must
    if isinstance(q, MultiTermQuery):
        return any(q.matches_term(t) for t in vocab)
    if isinstance(q, DisjunctionMaxQuery):
        return any(_matches_positions(d, pos_of, vocab, numeric)
                   for d in q.disjuncts)
    if isinstance(q, MatchAllDocsQuery):
        return True
    if isinstance(q, NumericDocValuesRangeQuery):
        if numeric is None or q.field not in numeric:
            return False
        v = numeric[q.field]
        lo_ok = q.lower is None or (v >= q.lower if q.include_lower
                                    else v > q.lower)
        hi_ok = q.upper is None or (v <= q.upper if q.include_upper
                                    else v < q.upper)
        return bool(lo_ok and hi_ok)
    raise TypeError(f"percolate: unsupported query node {type(q).__name__}")


class MemoryIndex:
    """One transient document, indexed and searchable (MemoryIndex.cs).

    >>> mi = MemoryIndex("spark window merge")
    >>> mi.matches(parse_query("spark AND merge"))
    True
    """

    def __init__(self, text: str | None = None, analyzer=None):
        from lucenenet_ray.analysis.standard import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        self.positions: dict[str, np.ndarray] = {}
        self.length = 0
        if text is not None:
            self.add_field(text)

    def add_field(self, text: str) -> None:
        """AddField(fieldName, text, analyzer) (:234) — tokenize and append
        to the term → positions map; field length accumulates."""
        toks, pos = self.analyzer(text)
        acc: dict[str, list[int]] = {}
        for t, p in zip(toks, pos):
            acc.setdefault(t, []).append(p + self.length)
        for t, ps in acc.items():
            old = self.positions.get(t)
            arr = np.asarray(ps, dtype=np.int64)
            self.positions[t] = arr if old is None else np.concatenate(
                [old, arr])
        self.length += len(toks)

    def _pos_of(self, term: str) -> np.ndarray:
        return self.positions.get(term, np.empty(0, dtype=np.int64))

    def matches(self, q: Query) -> bool:
        return _matches_positions(q, self._pos_of, self.positions.keys())

    def search(self, q: Query) -> np.float32:
        """Search(query) (:531): the float32 BM25 score over the one-doc
        collection (N=1, df=1 per present term, avgdl=dl) — 0.0 when the
        query does not match, like the reference's collector."""
        from lucenenet_ray.search.bm25 import (TermWeight, avg_field_length,
                                               norm_cache)
        from lucenenet_ray.util.smallfloat import encode_norm

        if not self.matches(q):
            return np.float32(0.0)
        nb = int(encode_norm(np.asarray([self.length], dtype=np.int64))[0])
        cache = norm_cache(avg_field_length(self.length, 1))[nb]
        clauses: list[tuple[Query, float]] = []
        if isinstance(q, BooleanQuery):
            clauses = [(cl.query, cl.query.boost) for cl in q.clauses
                       if cl.occur is not Occur.MUST_NOT]
        else:
            clauses = [(q, q.boost)]
        score = np.float32(0.0)
        for sub, boost in clauses:
            if not isinstance(sub, TermQuery):
                raise TypeError(
                    "MemoryIndex.search scores term/boolean-of-term queries; "
                    f"got {type(sub).__name__}")
            tf = self._pos_of(sub.term).size
            if tf == 0:
                continue
            w = TermWeight.build(sub.term, 1, tf, 1, boost=boost)
            tff = np.float32(tf)
            # BM25DocScorer.Score op order: (weight*f)/(f+cache), float32
            score = np.float32(score + np.float32(
                np.float32(w.weight_value * tff) / np.float32(tff + cache)))
        return score


# ---------------------------------------------------------------------------
# Ray-Data-first percolation


def required_any_terms(q: Query) -> frozenset[str] | None:
    """A term set such that any matching doc MUST contain at least one —
    the presearcher key (Lucene Monitor's term-filtered percolation: at
    10^5+ registered queries, only queries whose required terms appear in
    the batch are evaluated at all).  ``None`` = no such set exists
    (MatchAll, multi-term wildcards, numeric ranges, pure-MUST_NOT) —
    those queries are always evaluated."""
    if isinstance(q, TermQuery):
        return frozenset((q.term,))
    if isinstance(q, PhraseQuery):
        return frozenset(t for t, _ in q.terms) or None
    if isinstance(q, MultiPhraseQuery):
        first = q.slots[0][0] if q.slots else ()
        return frozenset(first) or None
    if isinstance(q, BooleanQuery):
        musts = [required_any_terms(cl.query) for cl in q.clauses
                 if cl.occur is Occur.MUST]
        for m in musts:
            if m is not None:
                return m  # any MUST clause's set works
        if musts:
            # MUST clauses exist but none yields a term set; SHOULD
            # clauses are then optional, so no set is safe
            return None
        shoulds = [required_any_terms(cl.query) for cl in q.clauses
                   if cl.occur is Occur.SHOULD]
        if shoulds and all(s is not None for s in shoulds):
            return frozenset().union(*shoulds)
        return None
    if isinstance(q, DisjunctionMaxQuery):
        parts = [required_any_terms(d) for d in q.disjuncts]
        if parts and all(p is not None for p in parts):
            return frozenset().union(*parts)
        return None
    return None


class Percolator:
    """Actor-pool stage: queries parsed/broadcast once (``__init__``), each
    batch tokenized once and inverted, then numpy set algebra per query —
    but only for queries whose presearcher terms appear in the batch
    (required_any_terms); the rest are skipped without any evaluation."""

    def __init__(self, plans_ref, text_col: str = "text",
                 id_col: str = "doc_id", numeric_cols: tuple[str, ...] = ()):
        import ray

        from lucenenet_ray.analysis.standard import StandardAnalyzer

        plans = ray.get(plans_ref) if not isinstance(plans_ref, list) \
            else plans_ref
        self.plans: list[tuple[str, Query]] = plans
        self.required = [required_any_terms(p) for _qid, p in plans]
        self.evaluated = 0  # presearcher effectiveness counter (tests)
        self.text_col, self.id_col = text_col, id_col
        self.numeric_cols = numeric_cols
        self.analyzer = StandardAnalyzer()

    # -- per-batch row-set evaluation ------------------------------------

    def _rows(self, q: Query, inv: dict[str, list[int]], n: int,
              docs: list[tuple[list[str], list[int]]],
              numeric: dict[str, np.ndarray]) -> np.ndarray:
        def term_rows(t: str) -> np.ndarray:
            return np.asarray(inv.get(t, ()), dtype=np.int64)

        if isinstance(q, TermQuery):
            return term_rows(q.term)
        if isinstance(q, (PhraseQuery, MultiPhraseQuery)):
            if isinstance(q, PhraseQuery):
                slot_rows = [term_rows(t) for t, _ in q.terms]
            else:
                slot_rows = [
                    np.unique(np.concatenate([term_rows(t) for t in terms]))
                    if terms else np.empty(0, np.int64)
                    for terms, _ in q.slots]
            cand = slot_rows[0]
            for r in slot_rows[1:]:
                cand = np.intersect1d(cand, r, assume_unique=False)
                if cand.size == 0:
                    return cand
            keep = [row for row in cand.tolist()
                    if self._verify_row(q, docs[row])]
            return np.asarray(keep, dtype=np.int64)
        if isinstance(q, BooleanQuery):
            all_rows = np.arange(n, dtype=np.int64)
            must: np.ndarray | None = None
            has_must = False
            should_sets = []
            for cl in q.clauses:
                r = self._rows(cl.query, inv, n, docs, numeric)
                if cl.occur is Occur.MUST:
                    has_must = True
                    must = r if must is None else np.intersect1d(must, r)
                elif cl.occur is Occur.MUST_NOT:
                    all_rows = np.setdiff1d(all_rows, r)
                else:
                    should_sets.append(np.unique(r))
            base = all_rows if must is None else np.intersect1d(must, all_rows)
            need = max(q.min_should_match, 0 if has_must else 1)
            if need > 0:
                if len(should_sets) < need:  # incl. MUST_NOT-only booleans
                    return np.empty(0, np.int64)
                counts = np.bincount(np.concatenate(should_sets),
                                     minlength=n)
                base = base[counts[base] >= need]
            return base
        if isinstance(q, MultiTermQuery):
            hit = [t for t in inv if q.matches_term(t)]
            if not hit:
                return np.empty(0, np.int64)
            return np.unique(np.concatenate([term_rows(t) for t in hit]))
        if isinstance(q, DisjunctionMaxQuery):
            parts = [self._rows(d, inv, n, docs, numeric)
                     for d in q.disjuncts]
            return np.unique(np.concatenate(parts)) if parts else \
                np.empty(0, np.int64)
        if isinstance(q, MatchAllDocsQuery):
            return np.arange(n, dtype=np.int64)
        if isinstance(q, NumericDocValuesRangeQuery):
            if q.field not in numeric:
                return np.empty(0, np.int64)
            v = numeric[q.field]
            m = np.ones(n, dtype=bool)
            if q.lower is not None:
                m &= (v >= q.lower) if q.include_lower else (v > q.lower)
            if q.upper is not None:
                m &= (v <= q.upper) if q.include_upper else (v < q.upper)
            return np.flatnonzero(m).astype(np.int64)
        raise TypeError(f"percolate: unsupported query node {type(q).__name__}")

    @staticmethod
    def _verify_row(q: Query, doc: tuple[list[str], list[int]]) -> bool:
        toks, pos = doc
        pmap: dict[str, list[int]] = {}
        for t, p in zip(toks, pos):
            pmap.setdefault(t, []).append(p)

        def pos_of(t: str) -> np.ndarray:
            return np.asarray(pmap.get(t, ()), dtype=np.int64)

        return _matches_positions(q, pos_of, pmap.keys())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        docs = [self.analyzer(t) for t in texts]
        inv: dict[str, list[int]] = {}
        for row, (toks, _pos) in enumerate(docs):
            for t in set(toks):
                inv.setdefault(t, []).append(row)
        numeric = {c: batch.column(c).to_numpy()
                   for c in self.numeric_cols if c in batch.column_names}
        out_doc, out_q = [], []
        for (qid, plan), req in zip(self.plans, self.required):
            if req is not None and not any(t in inv for t in req):
                continue  # presearcher: no required term in this batch
            self.evaluated += 1
            rows = self._rows(plan, inv, len(docs), docs, numeric)
            out_doc.extend(ids[rows].tolist())
            out_q.extend([qid] * rows.size)
        return pa.table({
            self.id_col: pa.array(out_doc, type=pa.int64()),
            "query_id": pa.array(out_q, type=pa.string()),
        })


def percolate(docs_ds, plans: list[tuple[str, Query]],
              text_col: str = "text", id_col: str = "doc_id",
              numeric_cols: tuple[str, ...] = (), concurrency: int = 4):
    """Match a document stream against a registered query set.

    The query side is broadcast once (``ray.put``); the pool is capped at
    cluster CPUs − 2 so upstream reads keep a slot.  Returns a Dataset of
    (id_col, query_id) match pairs.
    """
    import ray

    ref = ray.put(plans)
    cap = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
    return docs_ds.map_batches(
        Percolator,
        fn_constructor_args=(ref, text_col, id_col, numeric_cols),
        batch_format="pyarrow",
        concurrency=min(concurrency, cap),
    )
