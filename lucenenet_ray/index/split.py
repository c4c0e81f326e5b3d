"""Index splitting (Lucene.Net.Misc analogs).

Reference semantics re-expressed (NOT ported):

- :func:`split_index` — ``Index/PKIndexSplitter.cs:38-75``: split one index
  into two by a filter; documents MATCHING the filter go to the first
  output, the rest to the second (the reference feeds a
  DocumentFilteredAtomicIndexReader into ``AddIndexes``, i.e. it rewrites
  segments applying the filter as liveDocs).  The primary-key form
  (:66-71, ``PKIndexSplitter(version, in, dir1, dir2, midTerm)``) sends
  ids < mid to the first index.

- :func:`split_index_round_robin` — ``Index/MultiPassIndexSplitter.cs:62``
  with ``seq=false``: N outputs, doc i of the global order lands in output
  ``i % n`` (the reference emulates this with FakeDeleteIndexReader masks
  — exactly the dead-set rewrite used here).

Both reuse the expunge machinery (``deletes.rewrite_without_docs`` — the
SegmentMerger-applying-liveDocs core, byte-identical to a direct build of
the surviving docs), so each output is a fully self-contained index with
recomputed stats: one distributed rewrite pass per output, dead sets
broadcast once via ``ray.put``.
"""

from __future__ import annotations

import numpy as np

from lucenenet_ray.index.deletes import rewrite_without_docs


def _matches_by_bucket(reader, first_filter) -> dict[int, np.ndarray]:
    """Per-bucket doc ids matching the filter: an int 'mid' (PK split:
    doc_id < mid matches) or a term/boolean Query (evaluated on postings
    via the sorter's restricted matcher)."""
    out: dict[int, np.ndarray] = {}
    for b in reader.bucket_ids:
        bucket = reader.bucket(b)
        all_docs = bucket.norms()[0]
        if isinstance(first_filter, (int, np.integer)):
            out[b] = all_docs[all_docs < int(first_filter)]
        else:
            from lucenenet_ray.index.sorter import _bucket_matches

            out[b] = np.intersect1d(_bucket_matches(bucket, first_filter),
                                    all_docs)
    return out


def split_index(index_path: str, out1: str, out2: str, first_filter):
    """Split into (matching → out1, rest → out2); returns both manifests."""
    from lucenenet_ray.search.reader import IndexReader

    reader = IndexReader(index_path, deletes_path="/nonexistent")
    codec = reader.manifest.get("config", {}).get("codec", "vint")
    match = _matches_by_bucket(reader, first_filter)
    dead1, dead2 = {}, {}
    for b in reader.bucket_ids:
        all_docs = reader.bucket(b).norms()[0]
        dead1[b] = np.setdiff1d(all_docs, match[b])  # out1 keeps matches
        dead2[b] = match[b]                          # out2 keeps the rest
    m1 = rewrite_without_docs(index_path, out1, dead1, codec,
                              reader.manifest)
    m2 = rewrite_without_docs(index_path, out2, dead2, codec,
                              reader.manifest)
    return m1, m2


def split_index_round_robin(index_path: str, outputs: list[str]):
    """MultiPassIndexSplitter seq=false: doc at global position i → output
    i % len(outputs); returns the manifests."""
    from lucenenet_ray.search.reader import IndexReader

    reader = IndexReader(index_path, deletes_path="/nonexistent")
    codec = reader.manifest.get("config", {}).get("codec", "vint")
    n = len(outputs)
    # global position = offset of the bucket + local row (buckets are
    # ascending id ranges, docs ascending inside)
    offsets: dict[int, int] = {}
    pos = 0
    for b in sorted(reader.bucket_ids):
        offsets[b] = pos
        pos += reader.bucket(b).norms()[0].size
    manifests = []
    for part, out in enumerate(outputs):
        dead: dict[int, np.ndarray] = {}
        for b in sorted(reader.bucket_ids):
            docs = reader.bucket(b).norms()[0]
            gpos = offsets[b] + np.arange(docs.size, dtype=np.int64)
            dead[b] = docs[(gpos % n) != part]
        manifests.append(rewrite_without_docs(index_path, out, dead, codec,
                                              reader.manifest))
    return manifests
