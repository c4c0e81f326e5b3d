"""MultiReader analog — several indexes with DISJOINT doc-id spaces
searched as one, without a physical merge
(``Lucene.Net/Index/MultiReader.cs`` / ``BaseCompositeReader.cs``: sub
readers concatenate docID spaces via docBase; ``MultiFields.cs`` merges
the term dictionaries; ``IndexSearcher.cs:982-1007`` computes the
TermStatistics / CollectionStatistics over the WHOLE composite so scores
are comparable across sub-indexes).

Re-expressed for this engine: docIDs are already GLOBAL (each index owns
its ``[id_min, id_max]`` range from the build config), so composition
needs no docBase arithmetic — only disjointness. The composite serves:

* ``num_docs`` / ``sum_total_term_freq`` — sums over sub-readers (the
  CollectionStatistics contract that makes one idf/avgdl for the whole
  federation, exactly what a physical merge would produce);
* ``term_stats`` — element-wise (df, ttf) sums (MultiFields /
  MultiTerms semantics);
* buckets — the union, keyed ``(reader_idx, bucket_id)`` so the search
  scatter iterates every sub-index's buckets;
* deletes / doc-values updates — concatenated (delete-by-term is global:
  IndexWriter applies a delete term to every segment);
* multi-term expansion — sorted union of the sub term dictionaries
  (MultiTermsEnum's merged view), deduplicated.

The contract (tested): BM25 top-k over the composite is BIT-IDENTICAL to
the same query over one physically merged index of the same docs — a
shard federation is a layout choice, not a semantics change. This is the
query-side complement of index/merge_indexes.py (AddIndexes): merge when
you want one artifact, MultiReader when you want to search shards in
place."""

from __future__ import annotations

import numpy as np

from lucenenet_ray.search.reader import IndexReader


class _ScopedBucket:
    """Bucket view that resolves tombstones against ITS OWN sub-reader's
    delete log only — per-segment liveDocs semantics (a delete logged on
    one shard never affects docs another shard added later; the writer
    facade logs a delete onto every shard existing at delete time)."""

    def __init__(self, inner, deleted_terms: tuple[str, ...]):
        self._inner = inner
        self._deleted = deleted_terms

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def live_mask(self, deleted_terms):  # noqa: ARG002 — scoped override
        return self._inner.live_mask(self._deleted)


class MultiIndexReader:
    """Compose readers over disjoint doc-id ranges; the reader surface
    consumed by plan_query/search (term_stats, expansion, buckets,
    doc-values) federates across them."""

    def __init__(self, readers: list[IndexReader]):
        if not readers:
            raise ValueError("MultiIndexReader needs at least one reader")
        self.readers = list(readers)
        # BaseCompositeReader.cs:60-78 — sub readers are concatenated;
        # our global-docID layout requires the doc spaces be disjoint.
        # An index's doc space is its manifest "id_ranges" list (merged
        # indexes of non-adjacent shards leave holes) or the single
        # config [id_min, id_max].
        ranges = []
        for r in self.readers:
            cfg = r.manifest["config"]
            for lo, hi in r.manifest.get(
                    "id_ranges", [[cfg["id_min"], cfg["id_max"]]]):
                ranges.append((int(lo), int(hi), r))
        ranges.sort(key=lambda x: (x[0], x[1]))
        for (lo1, hi1, r1), (lo2, hi2, r2) in zip(ranges, ranges[1:]):
            if lo2 <= hi1 and r1 is not r2:
                raise ValueError(
                    f"doc-id ranges overlap: {r1.index_path} [{lo1},{hi1}] "
                    f"vs {r2.index_path} [{lo2},{hi2}]")
        self._ranges = ranges
        self.num_docs = sum(r.num_docs for r in self.readers)
        self.sum_total_term_freq = sum(
            r.sum_total_term_freq for r in self.readers)
        self.deleted_terms = tuple(
            t for r in self.readers for t in r.deleted_terms)
        self.dv_updates = tuple(
            u for r in self.readers for u in r.dv_updates)
        self.index_path = ";".join(r.index_path for r in self.readers)
        self.manifest = {
            "n_docs": self.num_docs,
            "sum_total_term_freq": self.sum_total_term_freq,
            "config": dict(self.readers[0].manifest["config"]),
        }

    # -- reader surface consumed by plan_query/search ----------------------
    @property
    def bucket_ids(self) -> list[tuple[int, int]]:
        return [(i, b) for i, r in enumerate(self.readers)
                for b in r.bucket_ids]

    def bucket(self, key: tuple[int, int]):
        i, b = key
        r = self.readers[i]
        return _ScopedBucket(r.bucket(b), r.deleted_terms)

    def version(self) -> tuple:
        return tuple(r.version() for r in self.readers)

    def term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """Element-wise (df, ttf) sums across sub-readers — the composite
        TermStatistics (IndexSearcher.cs:982-985 over MultiFields)."""
        out: dict[str, tuple[int, int]] = {}
        for r in self.readers:
            for t, (df, ttf) in r.term_stats(terms).items():
                pdf, pttf = out.get(t, (0, 0))
                out[t] = (pdf + df, pttf + ttf)
        return out

    def numeric_docvalues(self, key: tuple[int, int], field: str) -> np.ndarray:
        i, b = key
        return self.readers[i].numeric_docvalues(b, field)

    def _reader_of_doc(self, doc_id: int) -> IndexReader:
        for lo, hi, r in self._ranges:
            if lo <= doc_id <= hi:
                return r
        raise KeyError(f"doc {doc_id} outside every sub-reader's id range")

    def term_vector(self, doc_id: int, field: str | None = None):
        return self._reader_of_doc(doc_id).term_vector(doc_id, field)

    # -- merged term-dictionary view (MultiTermsEnum) -----------------------
    def expand_query(self, q) -> list[str]:
        """Sorted union across sub term dicts. Order matters downstream
        only as a SET (weights are per-term), but keep it deterministic."""
        seen: set[str] = set()
        for r in self.readers:
            seen.update(r.expand_query(q))
        return sorted(seen)

    def expand_terms(self, predicate, max_expansions: int = 1024) -> list[str]:
        seen: set[str] = set()
        for r in self.readers:
            seen.update(r.expand_terms(predicate, max_expansions))
        return sorted(seen)[:max_expansions]

    def terms_in_range(self, lower, upper, **kw) -> list[str]:
        seen: set[str] = set()
        for r in self.readers:
            seen.update(r.terms_in_range(lower, upper, **kw))
        return sorted(seen)

    def doc_count(self) -> int:
        return self.num_docs
