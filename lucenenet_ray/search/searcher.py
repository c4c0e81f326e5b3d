"""Top-k BM25 search over the merged index: per-bucket scorers + global merge.

Execution model mirrors ``IndexSearcher.Search`` (SURVEY §3.2): the driver
captures GLOBAL collection/term statistics once (idf from whole-index df — the
thing that makes scores comparable across buckets, ``IndexSearcher.cs:982-1007``),
builds a QueryPlan (the CreateNormalizedWeight analog), then each doc-range
bucket is scored independently (the per-segment Scorer analog) and the
per-bucket top-k are merged with ``TopDocs.Merge`` semantics: score desc,
then docID asc (``HitQueue.cs:77-87``; bucket order == docID-range order, so
(score desc, docID asc) reproduces (score, shardIndex, hit-order) exactly —
``TopDocs.cs:255-340``).

Float32 discipline: per-clause scores are float32; a document's Boolean score
is the float32 sum of its clause scores **in clause order** (BooleanScorer
accumulates score += in subscorer order over 2048-doc windows,
``BooleanScorer.cs:60-144``). Coord is 1 for BM25
(``Similarity.cs:117-121``).

Block-max pruning (``prune=True``): a lossless MaxScore/block-max variant —
clauses are evaluated in descending upper-bound order; once the top-k lower
bound exceeds the sum of remaining clause upper bounds, remaining clauses are
evaluated ONLY on current candidates, decoding just the 128-postings blocks
that contain candidates (via the skip/block-max metadata, SURVEY §2.5). The
final accumulation replays contributions in clause order, so pruned results
are bit-identical to the exhaustive path (tested).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from lucenenet_ray.index.codec import (
    BLOCK_SIZE,
    decode_doc_block,
    read_vints,
)
from lucenenet_ray.search.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    TermWeight,
    avg_field_length,
    norm_cache,
    score_freqs,
    upper_bound,
)
from lucenenet_ray.search.query import (
    BooleanClause,
    BooleanQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiTermQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)
from lucenenet_ray.search.reader import BucketData, IndexReader, PostingsChunk


@dataclass
class QueryPlan:
    """Driver-side precomputed query state, shipped to bucket scorers."""

    query: Query
    k1: float
    b: float
    num_docs: int
    avgdl: np.float32
    cache: np.ndarray  # float32[256]
    weights: dict[str, TermWeight]
    phrase_weights: dict[tuple, np.float32]  # phrase terms → weight_value
    expansions: dict[int, tuple[str, ...]]  # id-keyed MultiTermQuery rewrites
    all_terms: tuple[str, ...]


def _collect_terms(q: Query, reader: IndexReader, terms: set[str],
                   expansions: dict[int, tuple[str, ...]]) -> None:
    if isinstance(q, TermQuery):
        terms.add(q.term)
    elif isinstance(q, PhraseQuery):
        terms.update(t for t, _ in q.terms)
    elif isinstance(q, BooleanQuery):
        for c in q.clauses:
            _collect_terms(c.query, reader, terms, expansions)
    elif isinstance(q, DisjunctionMaxQuery):
        for sq in q.disjuncts:
            _collect_terms(sq, reader, terms, expansions)
    elif isinstance(q, MultiTermQuery):
        exp = tuple(reader.expand_terms(q.matches_term, q.max_expansions))
        expansions[id(q)] = exp
        terms.update(exp)
    elif isinstance(q, MatchAllDocsQuery):
        pass
    else:  # pragma: no cover
        raise TypeError(f"unsupported query node {type(q)}")


def plan_query(reader: IndexReader, query: Query,
               k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> QueryPlan:
    """Rewrite + weight computation (the CreateNormalizedWeight analog)."""
    terms: set[str] = set()
    expansions: dict[int, tuple[str, ...]] = {}
    _collect_terms(query, reader, terms, expansions)
    stats = reader.term_stats(sorted(terms))
    n = reader.num_docs
    avgdl = avg_field_length(reader.sum_total_term_freq, n)
    cache = norm_cache(avgdl, k1, b)
    weights = {
        t: TermWeight.build(t, df, ttf, n, k1=k1) for t, (df, ttf) in stats.items()
    }

    phrase_weights: dict[tuple, np.float32] = {}

    def walk(q: Query) -> None:
        if isinstance(q, PhraseQuery):
            # phrase idf = float32 sum of member idfs in term order
            # (BM25Similarity.IdfExplain(TermStatistics[]), :209-224)
            s = np.float32(0.0)
            for t, _ in q.terms:
                if t in weights:
                    s = np.float32(s + weights[t].idf)
            phrase_weights[q.terms] = np.float32(
                np.float32(s * np.float32(q.boost)) * np.float32(np.float32(k1) + np.float32(1.0))
            )
        elif isinstance(q, BooleanQuery):
            for c in q.clauses:
                walk(c.query)

    walk(query)
    return QueryPlan(
        query=query,
        k1=k1,
        b=b,
        num_docs=n,
        avgdl=avgdl,
        cache=cache,
        weights=weights,
        phrase_weights=phrase_weights,
        expansions=expansions,
        all_terms=tuple(sorted(terms)),
    )


# ---------------------------------------------------------------------------
# per-bucket evaluation


_EMPTY_D = np.empty(0, dtype=np.int64)
_EMPTY_S = np.empty(0, dtype=np.float32)


def _concat_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized concat of aranges [starts[i], starts[i]+lengths[i])."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    shifted = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return np.arange(total, dtype=np.int64) + np.repeat(starts - shifted, lengths)


def _eval_term(term: str, chunks: dict[str, PostingsChunk], plan: QueryPlan,
               bucket: BucketData) -> tuple[np.ndarray, np.ndarray]:
    c = chunks.get(term)
    w = plan.weights.get(term)
    if c is None or w is None:
        return _EMPTY_D, _EMPTY_S
    docs = c.docs()
    norms = bucket.norm_of_docs(docs)
    scores = score_freqs(c.freqs(), norms, w.weight_value, plan.cache)
    return docs, scores


def _eval_phrase(q: PhraseQuery, chunks: dict[str, PostingsChunk], plan: QueryPlan,
                 bucket: BucketData) -> tuple[np.ndarray, np.ndarray]:
    """ExactPhraseScorer semantics: freq = number of positions p such that
    term_i occurs at p + rel_i for all i; docs with freq>0 score with the
    summed-idf weight (PhraseQuery.cs / ExactPhraseScorer.cs)."""
    member = []
    for t, rel in q.terms:
        c = chunks.get(t)
        if c is None:
            return _EMPTY_D, _EMPTY_S
        member.append((c, rel))
    # docs present in ALL member chunks
    docs = member[0][0].docs()
    for c, _ in member[1:]:
        docs = docs[np.isin(docs, c.docs(), assume_unique=True)]
        if docs.size == 0:
            return _EMPTY_D, _EMPTY_S
    # Vectorized phrase matching: encode each (doc, shifted position) pair as
    # a single int64 key docidx*2^32 + (pos - rel) and intersect the key sets
    # across members. Surviving keys of member 0 are phrase occurrences;
    # phrase freq per doc = bincount over the key's docidx.
    SHIFT = np.int64(1) << np.int64(32)
    keys = None
    for c, rel in member:
        cd = c.docs()
        idx = np.searchsorted(cd, docs)  # doc rows of candidates in this chunk
        flat, offs = c.positions_flat()
        take = _concat_ranges(offs[idx], offs[idx + 1] - offs[idx])
        docrep = np.repeat(
            np.arange(docs.size, dtype=np.int64), (offs[idx + 1] - offs[idx])
        )
        k = docrep * SHIFT + (flat[take] - rel)
        keys = k if keys is None else k[np.isin(k, keys, assume_unique=True)]
        if keys.size == 0:
            return _EMPTY_D, _EMPTY_S
    counts = np.bincount((keys // SHIFT).astype(np.int64), minlength=docs.size)
    keep = counts > 0
    docs = docs[keep]
    freqs = counts[keep].astype(np.int32)
    if docs.size == 0:
        return _EMPTY_D, _EMPTY_S
    wv = plan.phrase_weights.get(q.terms)
    if wv is None:
        return _EMPTY_D, _EMPTY_S
    norms = bucket.norm_of_docs(docs)
    scores = score_freqs(freqs, norms, wv, plan.cache)
    return docs, scores


def _eval_multiterm(q: MultiTermQuery, chunks: dict[str, PostingsChunk],
                    plan: QueryPlan, bucket: BucketData) -> tuple[np.ndarray, np.ndarray]:
    exp = plan.expansions.get(id(q), ())
    if not exp:
        return _EMPTY_D, _EMPTY_S
    if q.constant_score:
        # CONSTANT_SCORE rewrite: every matching doc scores boost (==1·boost),
        # ConstantScoreQuery.cs:37
        arrs = [chunks[t].docs() for t in exp if t in chunks]
        if not arrs:
            return _EMPTY_D, _EMPTY_S
        docs = np.unique(np.concatenate(arrs))
        return docs, np.full(docs.size, np.float32(q.boost), dtype=np.float32)
    # SCORING_BOOLEAN rewrite: OR of TermQueries in term order
    sub = BooleanQuery(
        clauses=tuple(BooleanClause(Occur.SHOULD, TermQuery(term=t)) for t in exp)
    )
    return _eval_boolean(sub, chunks, plan, bucket)


def _eval_dismax(q: DisjunctionMaxQuery, chunks: dict[str, PostingsChunk],
                 plan: QueryPlan, bucket: BucketData) -> tuple[np.ndarray, np.ndarray]:
    """DisjunctionMaxScorer: score = max + tie_breaker*(sum - max), float32."""
    evaled = [_eval_query(sq, chunks, plan, bucket) for sq in q.disjuncts]
    arrs = [d for d, _s in evaled if d.size]
    if not arrs:
        return _EMPTY_D, _EMPTY_S
    cand = np.unique(np.concatenate(arrs))
    smax = np.zeros(cand.size, dtype=np.float32)
    ssum = np.zeros(cand.size, dtype=np.float32)
    for d, s in evaled:
        if d.size == 0:
            continue
        idx = np.searchsorted(cand, d)
        np.maximum.at(smax, idx, s)
        ssum[idx] += s
    tie = np.float32(q.tie_breaker)
    return cand, (smax + tie * (ssum - smax)).astype(np.float32)


def _eval_query(q: Query, chunks: dict[str, PostingsChunk], plan: QueryPlan,
                bucket: BucketData) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(q, TermQuery):
        return _eval_term(q.term, chunks, plan, bucket)
    if isinstance(q, PhraseQuery):
        return _eval_phrase(q, chunks, plan, bucket)
    if isinstance(q, BooleanQuery):
        return _eval_boolean(q, chunks, plan, bucket)
    if isinstance(q, DisjunctionMaxQuery):
        return _eval_dismax(q, chunks, plan, bucket)
    if isinstance(q, MultiTermQuery):
        return _eval_multiterm(q, chunks, plan, bucket)
    if isinstance(q, MatchAllDocsQuery):
        doc_ids, _lens, _norms = bucket.norms()
        return doc_ids, np.full(doc_ids.size, np.float32(q.boost), dtype=np.float32)
    raise TypeError(f"unsupported query node {type(q)}")


def _eval_boolean(q: BooleanQuery, chunks: dict[str, PostingsChunk], plan: QueryPlan,
                  bucket: BucketData) -> tuple[np.ndarray, np.ndarray]:
    pos = [(c.occur, c.query) for c in q.clauses if c.occur != Occur.MUST_NOT]
    neg = [c.query for c in q.clauses if c.occur == Occur.MUST_NOT]
    if not pos:
        return _EMPTY_D, _EMPTY_S
    evaled = [(occur, _eval_query(sq, chunks, plan, bucket)) for occur, sq in pos]
    must = [d for occur, (d, _s) in evaled if occur == Occur.MUST]
    if must:
        cand = must[0]
        for d in must[1:]:
            cand = cand[np.isin(cand, d, assume_unique=True)]
    else:
        cand = np.unique(np.concatenate([d for _o, (d, _s) in evaled])) if evaled else _EMPTY_D
    for nq in neg:
        nd, _ = _eval_query(nq, chunks, plan, bucket)
        if nd.size:
            cand = cand[~np.isin(cand, nd, assume_unique=True)]
    if cand.size == 0:
        return _EMPTY_D, _EMPTY_S
    acc = np.zeros(cand.size, dtype=np.float32)
    for _occur, (d, s) in evaled:  # clause order — float32 add order contract
        if d.size == 0:
            continue
        idx = np.searchsorted(cand, d)
        valid = (idx < cand.size)
        vi = idx[valid]
        sel = cand[vi] == d[valid]
        acc[vi[sel]] += s[valid][sel]
    return cand, acc


def _topk(docs: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(score desc, docID asc) — TopScoreDocCollector/HitQueue tie-break."""
    if docs.size == 0:
        return _EMPTY_D, _EMPTY_S
    if docs.size > k * 4 and k < docs.size:
        part = np.argpartition(-scores, min(k, scores.size - 1))[: max(k * 2, k)]
        # careful with score ties at the boundary: fall back to full sort when
        # the partition boundary is ambiguous
        kth = scores[part[:k]].min() if part.size >= k else -np.inf
        cut = scores >= kth
        docs, scores = docs[cut], scores[cut]
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return docs[order], scores[order]


def score_bucket(bucket: BucketData, plan: QueryPlan, k: int,
                 prune: bool = False) -> tuple[np.ndarray, np.ndarray, int]:
    """Score one bucket → (top-k docs, scores, total_hits)."""
    chunks = bucket.chunks_for_terms(list(plan.all_terms), full=True)
    q = plan.query
    if prune and _is_pure_or_terms(q):
        docs, scores = _eval_or_pruned(q, chunks, plan, bucket, k)
        # total hits under pruning = df-union size (computed exactly below
        # only when not pruned; here we report candidates seen)
        total = int(docs.size)
        d, s = _topk(docs, scores, k)
        return d, s, total
    docs, scores = _eval_query(q, chunks, plan, bucket)
    d, s = _topk(docs, scores, k)
    return d, s, int(docs.size)


def _is_pure_or_terms(q: Query) -> bool:
    return isinstance(q, BooleanQuery) and all(
        c.occur == Occur.SHOULD and isinstance(c.query, TermQuery) for c in q.clauses
    )


def _decode_freq_block(c: PostingsChunk, bi: int) -> np.ndarray:
    buf = np.frombuffer(c.freq_bytes, dtype=np.uint8)
    start = int(c.block_freq_off[bi])
    end = int(c.block_freq_off[bi + 1]) if bi + 1 < len(c.block_freq_off) else buf.size
    lo = bi * BLOCK_SIZE
    count = min(BLOCK_SIZE, c.df - lo)
    return read_vints(buf[start:end], count).astype(np.int32)


def _eval_term_restricted(term: str, cand: np.ndarray, chunks: dict[str, PostingsChunk],
                          plan: QueryPlan, bucket: BucketData,
                          threshold_gap: float | None = None
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Score `term` only for docs in `cand`, decoding only the 128-blocks that
    contain candidates (skip-in via block_last_doc — the skip list at work)."""
    c = chunks.get(term)
    w = plan.weights.get(term)
    if c is None or w is None:
        return _EMPTY_D, _EMPTY_S
    blocks = np.unique(np.searchsorted(c.block_last_doc, cand))
    blocks = blocks[blocks < len(c.block_last_doc)]
    # Block-skipping only pays when few blocks are touched AND the chunk is
    # not already decoded (the reader caches full decodes across queries —
    # IndexSearcher-style pinned state). Otherwise restrict on the full
    # arrays with one searchsorted.
    if c._docs is not None or blocks.size * BLOCK_SIZE * 4 > c.df:
        docs_full = c.docs()
        idx = np.searchsorted(docs_full, cand)
        valid = idx < docs_full.size
        vi = idx[valid]
        sel = docs_full[vi] == cand[valid]
        if not sel.any():
            return _EMPTY_D, _EMPTY_S
        dsel = docs_full[vi[sel]]
        fsel = c.freqs()[vi[sel]]
        norms = bucket.norm_of_docs(dsel)
        return dsel, score_freqs(fsel, norms, w.weight_value, plan.cache)
    out_d: list[np.ndarray] = []
    out_f: list[np.ndarray] = []
    for bi in blocks:
        bd = decode_doc_block(c.doc_bytes, int(bi), c.df, c.block_doc_off, c.block_last_doc)
        idx = np.searchsorted(bd, cand)
        valid = idx < bd.size
        vi = idx[valid]
        sel = bd[vi] == cand[valid]
        if not sel.any():
            continue
        bf = _decode_freq_block(c, int(bi))
        out_d.append(bd[vi[sel]])
        out_f.append(bf[vi[sel]])
    if not out_d:
        return _EMPTY_D, _EMPTY_S
    docs = np.concatenate(out_d)
    freqs = np.concatenate(out_f)
    norms = bucket.norm_of_docs(docs)
    return docs, score_freqs(freqs, norms, w.weight_value, plan.cache)


def _eval_or_pruned(q: BooleanQuery, chunks: dict[str, PostingsChunk], plan: QueryPlan,
                    bucket: BucketData, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Lossless MaxScore: full-evaluate clauses in descending upper bound until
    no unseen doc can reach the top-k; then candidate-restricted scoring with
    block skipping. Contributions replay in clause order → bit-identical."""
    terms = [c.query.term for c in q.clauses]
    ubs = np.zeros(len(terms), dtype=np.float64)
    for i, t in enumerate(terms):
        c = chunks.get(t)
        w = plan.weights.get(t)
        if c is not None and w is not None:
            ubs[i] = float(upper_bound(c.max_freq, c.max_norm, w.weight_value, plan.cache))
    order = np.argsort(-ubs, kind="stable")
    contributions: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    cand = _EMPTY_D
    acc = _EMPTY_S
    switch_at = len(order)
    for oi, ci in enumerate(order):
        # safety-margined remaining bound (float32 addition can round up)
        remaining = float(ubs[order[oi:]].sum()) * (1 + 1e-5) + 1e-30
        if cand.size >= k:
            theta = float(np.partition(acc, acc.size - k)[acc.size - k])
            # acc sums clauses in upper-bound order; the final score sums in
            # CLAUSE order — float32 reassociation can differ by ~m·eps, so
            # shrink theta before using it as a pruning threshold (scores are
            # non-negative; 1e-4 ≫ 1024 clauses × f32 eps)
            theta_safe = theta * (1.0 - 1e-4)
            if remaining < theta_safe:
                switch_at = oi
                break
        d, s = _eval_term(terms[ci], chunks, plan, bucket)
        contributions[ci] = (d, s)
        if d.size:
            new_cand = np.union1d(cand, d)
            new_acc = np.zeros(new_cand.size, dtype=np.float32)
            if cand.size:
                new_acc[np.searchsorted(new_cand, cand)] = acc
            idx = np.searchsorted(new_cand, d)
            new_acc[idx] += s
            cand, acc = new_cand, new_acc
    for ci in order[switch_at:]:
        contributions[ci] = _eval_term_restricted(terms[ci], cand, chunks, plan, bucket)
    # replay in clause order for float32 bit-identity with the naive path
    final = np.zeros(cand.size, dtype=np.float32)
    for ci in range(len(terms)):
        d, s = contributions.get(ci, (_EMPTY_D, _EMPTY_S))
        if d.size == 0:
            continue
        idx = np.searchsorted(cand, d)
        valid = idx < cand.size
        vi = idx[valid]
        sel = cand[vi] == d[valid]
        final[vi[sel]] += s[valid][sel]
    return cand, final


# ---------------------------------------------------------------------------
# driver-side search


@dataclass
class TopDocs:
    """The TopDocs analog: (doc, score) hits + totalHits (TopDocs.cs).

    Under block-max pruning totalHits is a LOWER BOUND (docs proven unable to
    reach the top-k are never counted) — ``total_hits_relation`` is "gte"
    then, mirroring Lucene 8's TotalHits.Relation; the top-k itself is always
    exact."""

    docs: np.ndarray
    scores: np.ndarray
    total_hits: int
    total_hits_relation: str = "eq"

    def to_list(self) -> list[tuple[int, float]]:
        return [(int(d), float(s)) for d, s in zip(self.docs, self.scores)]


def search(reader: IndexReader, query: Query, k: int = 10,
           prune: bool = False,
           after: tuple[float, int] | None = None) -> TopDocs:
    """Sequential scatter over buckets + TopDocs.Merge. For the actor-pool
    parallel path see ``lucenenet_ray.search.serve.QueryServer``.

    ``after=(score, doc)`` = deep paging: only hits strictly after the anchor
    in (score desc, doc asc) order (IndexSearcher.SearchAfter,
    IndexSearcher.cs:252-270).
    """
    plan = plan_query(reader, query)
    # SearchAfter needs k + enough headroom per bucket: collect k hits AFTER
    # the anchor within each bucket by filtering before the per-bucket top-k.
    all_d: list[np.ndarray] = []
    all_s: list[np.ndarray] = []
    total = 0
    for b in reader.bucket_ids:
        bd = reader.bucket(b)
        if after is None:
            d, s, t = score_bucket(bd, plan, k, prune=prune)
        else:
            chunks = bd.chunks_for_terms(list(plan.all_terms), full=True)
            docs, scores = _eval_query(plan.query, chunks, plan, bd)
            a_s = np.float32(after[0])
            a_d = np.int64(after[1])
            keep = (scores < a_s) | ((scores == a_s) & (docs > a_d))
            d, s = _topk(docs[keep], scores[keep], k)
            t = int(docs.size)
        all_d.append(d)
        all_s.append(s)
        total += t
    docs = np.concatenate(all_d) if all_d else _EMPTY_D
    scores = np.concatenate(all_s) if all_s else _EMPTY_S
    d, s = _topk(docs, scores, k)
    return TopDocs(docs=d, scores=s, total_hits=total,
                   total_hits_relation="gte" if (prune and after is None) else "eq")


def count_matches(reader: IndexReader, query: Query) -> int:
    """TotalHitCountCollector analog (Search/TotalHitCountCollector.cs)."""
    return search(reader, query, k=1, prune=False).total_hits


def rescore(reader: IndexReader, first_pass: TopDocs, query: Query,
            weight: float = 1.0, k: int | None = None) -> TopDocs:
    """QueryRescorer analog (Search/QueryRescorer.cs:32): re-evaluate `query`
    on the first-pass top hits only; combined score = first + weight*second
    (float32, like QueryRescorer.Combine with secondPassMatches). Hits that
    don't match the rescore query keep their first-pass score."""
    plan = plan_query(reader, query)
    docs = first_pass.docs
    combined = first_pass.scores.astype(np.float32).copy()
    for b in reader.bucket_ids:
        bd = reader.bucket(b)
        chunks = bd.chunks_for_terms(list(plan.all_terms), full=True)
        d2, s2 = _eval_query(plan.query, chunks, plan, bd)
        if d2.size == 0:
            continue
        idx = np.searchsorted(d2, docs)
        valid = idx < d2.size
        vi = idx[valid]
        sel = d2[vi] == docs[valid]
        hit_rows = np.flatnonzero(valid)[sel]
        combined[hit_rows] = combined[hit_rows] + np.float32(weight) * s2[vi[sel]]
    k = k or len(docs)
    d, s = _topk(docs, combined, k)
    return TopDocs(docs=d, scores=s, total_hits=first_pass.total_hits,
                   total_hits_relation=first_pass.total_hits_relation)
