"""Index sorting + early-terminating sorted search (Lucene.Net.Misc analogs).

Reference semantics re-expressed (NOT ported):

- :func:`build_sorted_index` — ``Index/Sorter/SortingMergePolicy.cs`` /
  ``Sorter.cs``: the index is written with documents permuted into sort-key
  order, so docID order IS the sort order.  The reference sorts each merged
  segment (ties broken by old docID ascending — Sorter.cs DocComparer's
  stable sort); here the WHOLE index is one sorted "segment": new docIDs
  are the global dense ranks of ``(sort_col, old_id asc)``, and the
  id-range buckets therefore become contiguous RANK RANGES — bucket 0
  holds the best keys, bucket 1 the next, …  Original ids and the sort key
  ride along as per-bucket numeric doc-values (index/docvalues.py), the
  ``SortingAtomicReader`` doc-map analog.

- :func:`early_terminating_search` —
  ``Index/Sorter/EarlyTerminatingSortingCollector.cs:59-140``: on a sorted
  segment, collect only the first ``numDocsToCollect`` matching docs in
  docID order, then terminate the segment (total hits under-counted by
  design, :36-41).  Because buckets are rank-ordered, visiting them in
  order and stopping once ``k`` docs are collected prunes ENTIRE trailing
  buckets — the partition-pruning form of early termination (the
  per-segment first-k of the reference, plus the skip the reference can't
  do because its segments aren't globally ordered).

Scale note: the rank pre-pass sorts only the narrow ``(id, key)`` columns
(the exact-dedup pattern — a few % of corpus bytes) and the old→rank map
is broadcast once via ``ray.put``.  At 10^12 docs a dense driver-held map
is too big; the documented scale path drops dense ranks for range
partitioning — bucket by key-range quantiles and assign
``rank = bucket_base + local_rank`` inside each bucket's sort, which keeps
docID order == sort order without any driver-side array.  The query path
below is unchanged under that scheme.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SORT_META = "sort.json"


def build_sorted_index(src_parquet: str, index_path: str, sort_col: str,
                       descending: bool = True, n_buckets: int = 4,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Build an index whose docID order is (sort_col, old id asc)."""
    import ray
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.index.docvalues import build_docvalues

    narrow = pq.read_table(src_parquet, columns=[id_col, sort_col])
    order = pc.sort_indices(narrow, sort_keys=[
        (sort_col, "descending" if descending else "ascending"),
        (id_col, "ascending")])
    old_sorted = narrow.column(id_col).take(order).to_numpy().astype(np.int64)
    n = len(old_sorted)
    # old id -> rank, shipped as (sorted old ids, their ranks) for searchsorted
    o = np.argsort(old_sorted, kind="stable")
    map_ref = ray.put((old_sorted[o], o.astype(np.int64)))

    class Remap:
        def __init__(self, ref):
            self.ids, self.ranks = ray.get(ref) if not isinstance(
                ref, tuple) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            old = batch.column(id_col).to_numpy().astype(np.int64)
            rank = self.ranks[np.searchsorted(self.ids, old)]
            i = batch.column_names.index(id_col)
            return batch.set_column(i, id_col,
                                    pa.array(rank, type=pa.int64()))

    cfg = IndexConfig(index_path=index_path, id_min=0,
                      id_max=max(n - 1, 1), n_buckets=n_buckets)
    ds = rd.read_parquet(src_parquet, columns=[id_col, text_col]) \
           .map_batches(Remap, fn_constructor_args=(map_ref,),
                        batch_format="pyarrow", concurrency=2)
    manifest = build_index(ds, cfg)

    def with_dv(batch: pa.Table) -> pa.Table:
        old = batch.column(id_col).to_numpy().astype(np.int64)
        ids, ranks = ray.get(map_ref)
        rank = ranks[np.searchsorted(ids, old)]
        return pa.table({
            id_col: pa.array(rank, type=pa.int64()),
            "orig_doc_id": pa.array(old, type=pa.int64()),
            sort_col: batch.column(sort_col),
        })

    build_docvalues(
        rd.read_parquet(src_parquet, columns=[id_col, sort_col])
          .map_batches(with_dv, batch_format="pyarrow"),
        cfg, fields=["orig_doc_id", sort_col])
    # Sort.ToString() analog: the sort identity the collector checks
    with open(os.path.join(index_path, SORT_META), "w") as f:
        json.dump({"sort_col": sort_col, "descending": descending}, f)
    return manifest


def _bucket_matches(bucket, q) -> np.ndarray:
    """Sorted matching docIDs of a term/boolean-of-terms query in one
    bucket (the restricted node set early termination pays off for)."""
    from lucenenet_ray.search.query import (BooleanQuery, Occur, Query,
                                            TermQuery)

    def docs(term: str) -> np.ndarray:
        ch = bucket.chunks_for_terms([term]).get(term)
        return ch.docs().astype(np.int64) if ch is not None else \
            np.empty(0, np.int64)

    if isinstance(q, TermQuery):
        return docs(q.term)
    if isinstance(q, BooleanQuery):
        must: np.ndarray | None = None
        should: list[np.ndarray] = []
        exclude: list[np.ndarray] = []
        for cl in q.clauses:
            r = _bucket_matches(bucket, cl.query)
            if cl.occur is Occur.MUST:
                must = r if must is None else np.intersect1d(must, r)
            elif cl.occur is Occur.MUST_NOT:
                exclude.append(r)
            else:
                should.append(r)
        if must is None:
            if not should:
                return np.empty(0, np.int64)
            base = np.unique(np.concatenate(should))
        else:
            base = must
        for ex in exclude:
            base = np.setdiff1d(base, ex)
        return base
    raise TypeError(
        f"early_terminating_search supports term/boolean nodes, got "
        f"{type(q).__name__}")


def early_terminating_search(reader, q, k: int = 10):
    """Collect the first k matches in docID (= sort) order, pruning
    trailing buckets entirely.  Returns (table, stats): table has
    (doc_id = ORIGINAL id, <sort_col>) rows in sort order; stats reports
    ``buckets_visited`` / ``n_buckets`` / ``collected`` —
    EarlyTerminatingSortingCollector's terminated-early evidence."""
    with open(os.path.join(reader.index_path, SORT_META)) as f:
        meta = json.load(f)
    sort_col = meta["sort_col"]
    got_ranks: list[np.ndarray] = []
    visited = 0
    total = 0
    for b in sorted(reader.bucket_ids):
        visited += 1
        m = _bucket_matches(reader.bucket(b), q)
        if m.size:
            need = k - total
            got_ranks.append((b, m[:need]))
            total += min(m.size, need)
        if total >= k:
            break
    ids_out, keys_out = [], []
    for b, ranks in got_ranks:
        bucket = reader.bucket(b)
        doc_ids = bucket.norms()[0]
        pos = np.searchsorted(doc_ids, ranks)
        ids_out.append(bucket.docvalues("orig_doc_id")[pos])
        keys_out.append(bucket.docvalues(sort_col)[pos])
    stats = {"buckets_visited": visited,
             "n_buckets": len(reader.bucket_ids), "collected": total}
    if not ids_out:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         sort_col: pa.array([], type=pa.int64())}), stats
    return pa.table({
        "doc_id": pa.array(np.concatenate(ids_out), type=pa.int64()),
        sort_col: pa.array(np.concatenate(keys_out), type=pa.int64()),
    }), stats
