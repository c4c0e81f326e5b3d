"""IndexWriter / IndexSearcher facade — the reference's primary user API
(``Index/IndexWriter.cs`` add/update/delete/commit/forceMerge,
``Search/IndexSearcher.cs`` search) mapped onto this engine's batch
machinery, so a Lucene.NET caller can switch call-for-call:

* ``AddDocument``      -> :meth:`IndexWriter.add_document` (buffered)
* ``DeleteDocuments``  -> :meth:`IndexWriter.delete_documents`
* ``UpdateDocument``   -> :meth:`IndexWriter.update_document`
* ``Commit``           -> :meth:`IndexWriter.commit` (buffer flushes to a
  new shard index with the next doc-id range; a writer manifest is the
  segments_N analog, written temp+rename)
* ``MaybeMerge`` / ``ForceMerge(n)`` -> :meth:`IndexWriter.maybe_merge` /
  :meth:`IndexWriter.force_merge` (index/merge_policy.py selections,
  applied with merge_indexes; shard tombstone logs travel with the merge)
* ``DirectoryReader.Open(writer_dir)`` -> :meth:`IndexWriter.reader`
  (search/multi_reader.py federation over the committed shards)

Delete semantics match the writer contract: a delete applies to every
document added BEFORE the call — committed shards get a tombstone-log
generation (resolved at query time, ``index/deletes.py``), and matching
docs still in the RAM buffer are dropped eagerly (the DWPT
delete-queue analog), so ``update_document`` = delete + re-add never
tombstones its own replacement. Visibility is commit-granular (an NRT
reader without commit is not offered; SearcherManager-on-commits is the
supported refresh model, index/commits.py).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Iterable

from lucenenet_ray.search.query import FIELD_SEP

_MANIFEST = "writer_manifest.json"


class IndexWriter:
    """``doc`` is a plain dict: ``text`` (the analyzed body field) plus
    any columns named in ``extra_fields`` (same triples as
    ``IndexConfig.extra_fields``: (column, field, analyzed)). Doc ids are
    writer-assigned, dense, and stable across merges."""

    def __init__(self, root: str, n_buckets: int = 8,
                 extra_fields: tuple = (),
                 stored_fields: tuple[str, ...] = (),
                 merge_policy=None,
                 max_buffered_docs: int = 100_000):
        from lucenenet_ray.index.merge_policy import TieredMergePolicy

        self.root = root
        self.n_buckets = n_buckets
        self.extra_fields = tuple(extra_fields)
        # Field.Store.YES columns: each commit also writes a doc_id-sorted
        # docstore (store/docstore.py) so searcher.doc(id) works
        self.stored_fields = tuple(stored_fields)
        self.merge_policy = merge_policy or TieredMergePolicy()
        self.max_buffered_docs = max_buffered_docs
        os.makedirs(root, exist_ok=True)
        mpath = os.path.join(root, _MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as f:
                self._m = json.load(f)
        else:
            self._m = {"next_id": 0, "gen": 0, "shards": []}
        self._buffer: list[dict[str, Any]] = []

    # -- add / update / delete (IndexWriter.cs:1443,1538,1596) -------------
    def add_document(self, doc: dict[str, Any]) -> None:
        if self.max_buffered_docs and len(self._buffer) >= self.max_buffered_docs:
            self.commit()
        self._buffer.append(dict(doc))

    def add_documents(self, docs: Iterable[dict[str, Any]]) -> None:
        for d in docs:
            self.add_document(d)

    def _buffered_doc_matches(self, doc: dict[str, Any], term: str) -> bool:
        from lucenenet_ray.analysis import analyze

        if FIELD_SEP in term:
            fname, body = term.split(FIELD_SEP, 1)
            for col, f, analyzed in self.extra_fields:
                if f == fname:
                    v = doc.get(col)
                    if v is None:
                        return False
                    if analyzed is True:
                        return body in analyze(str(v))[0]
                    return str(v) == body
            return False
        return term in analyze(str(doc.get("text", "")))[0]

    def delete_documents(self, *terms: str) -> None:
        """Tombstone every committed shard AND eagerly drop matching
        buffered docs (docs added after this call are unaffected —
        IndexWriter delete-queue ordering)."""
        from lucenenet_ray.index.deletes import delete_documents

        for sh in self._m["shards"]:
            delete_documents(sh["deletes"], list(terms))
        self._buffer = [d for d in self._buffer
                        if not any(self._buffered_doc_matches(d, t)
                                   for t in terms)]

    def update_document(self, term: str, doc: dict[str, Any]) -> None:
        """Delete-by-term then add — last-writer-wins by key
        (IndexWriter.UpdateDocument, IndexWriter.cs:1538-1556)."""
        self.delete_documents(term)
        self.add_document(doc)

    # -- commit (two-phase manifest swap, IndexWriter.cs:228) --------------
    def commit(self) -> int:
        """Flush the buffer as a new shard index; returns the commit
        generation. A no-op commit (empty buffer) returns the current
        generation without writing."""
        if not self._buffer:
            return self._m["gen"]
        import pyarrow as pa
        import ray.data as rd

        from lucenenet_ray.index.build import IndexConfig, build_index

        lo = self._m["next_id"]
        hi = lo + len(self._buffer) - 1
        name = f"shard_{self._m['gen']:06d}"
        path = os.path.join(self.root, "shards", name)
        rows = []
        for i, d in enumerate(self._buffer):
            row = {"doc_id": lo + i, "text": str(d.get("text", ""))}
            for col, _f, _a in self.extra_fields:
                row[col] = d.get(col)
            rows.append(row)
        cfg = IndexConfig(index_path=path, id_min=lo, id_max=max(hi, lo),
                          n_buckets=self.n_buckets,
                          extra_fields=self.extra_fields)
        if self.stored_fields:
            for r, d in zip(rows, self._buffer):
                for c in self.stored_fields:
                    r.setdefault(c, d.get(c))
        t = pa.Table.from_pylist(rows)
        index_cols = ["doc_id", "text"] + [c for c, _f, _a in self.extra_fields]
        build_index(rd.from_arrow(t.select(index_cols)), cfg)
        entry = {"path": path,
                 "deletes": os.path.join(self.root, "deletes", name)}
        if self.stored_fields:
            from lucenenet_ray.store.docstore import build_docstore

            dpath = os.path.join(self.root, "docstore", name)
            build_docstore(rd.from_arrow(t), dpath,
                           columns=list(self.stored_fields))
            entry["docstore"] = dpath
        self._m["shards"].append(entry)
        self._m["next_id"] = hi + 1
        self._m["gen"] += 1
        self._buffer = []
        self._write_manifest()
        return self._m["gen"]

    def _write_manifest(self) -> None:
        tmp = os.path.join(self.root, "." + _MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(self._m, f, indent=1)
        os.replace(tmp, os.path.join(self.root, _MANIFEST))

    # -- merging (MaybeMerge / ForceMerge) ----------------------------------
    def _apply_merges(self, spec) -> int:
        """SegmentMerger.Merge: each source's tombstones are applied
        PHYSICALLY (expunge = liveDocs applied, docs dropped from
        postings/norms and stats recomputed) before the merge, so the
        merged shard starts with an empty delete log and its df/avgdl no
        longer count reclaimed docs — exactly the reference's
        merge-reclaims-deletes behavior. Old shard dirs are left on disk
        (an IndexFileDeleter-style GC of unreferenced dirs is the
        caller's concern); expunge temps are removed."""
        import glob as _g

        from lucenenet_ray.index.deletes import expunge_deletes
        from lucenenet_ray.index.merge_indexes import merge_indexes

        applied = 0
        for group in spec:
            if len(group) < 2:
                continue
            name = f"merged_{self._m['gen']:06d}_{applied}"
            out = os.path.join(self.root, "shards", name)
            by_path = {sh["path"]: sh for sh in self._m["shards"]}
            srcs = []
            temps = []
            dropped: set[str] = set()
            for i, s in enumerate(group):
                ddir = by_path[s.path]["deletes"]
                if _g.glob(os.path.join(ddir, "del-*.parquet")):
                    clean = os.path.join(self.root, "shards",
                                         f".exp_{name}_{i}")
                    shutil.rmtree(clean, ignore_errors=True)
                    m = expunge_deletes(s.path, clean, deletes_path=ddir)
                    if m["n_docs"] == 0:
                        # 100%-deleted segment: dropped at merge, like the
                        # reference (never written into the new segment)
                        shutil.rmtree(clean, ignore_errors=True)
                        dropped.add(s.path)
                        continue
                    srcs.append(clean)
                    temps.append(clean)
                else:
                    srcs.append(s.path)
            if dropped:
                self._m["shards"] = [sh for sh in self._m["shards"]
                                     if sh["path"] not in dropped]
            if len(srcs) < 2:
                if dropped:
                    applied += 1  # manifest changed even without a merge
                continue
            merge_indexes(srcs, out)
            for t in temps:
                shutil.rmtree(t, ignore_errors=True)
            merged_set = {s.path for s in group}
            entry = {"path": out,
                     "deletes": os.path.join(self.root, "deletes", name)}
            # stored fields travel as a file-level union (disjoint id
            # ranges; DocStore prunes by row-group stats regardless of
            # cross-file order). Documented delta vs the reference: stored
            # rows of RECLAIMED docs persist here until a docstore rebuild
            # — unreachable through search either way.
            src_stores = [sh.get("docstore") for sh in self._m["shards"]
                          if sh["path"] in merged_set and sh.get("docstore")]
            if src_stores:
                dpath = os.path.join(self.root, "docstore", name)
                os.makedirs(dpath, exist_ok=True)
                k = 0
                for sdir in src_stores:
                    for f in sorted(os.listdir(sdir)):
                        if f.endswith(".parquet"):
                            shutil.copy(os.path.join(sdir, f),
                                        os.path.join(dpath, f"{k:06d}.parquet"))
                            k += 1
                entry["docstore"] = dpath
            self._m["shards"] = [sh for sh in self._m["shards"]
                                 if sh["path"] not in merged_set]
            self._m["shards"].append(entry)
            applied += 1
        if applied:
            self._m["gen"] += 1
            self._write_manifest()
        return applied

    def _metas(self):
        from lucenenet_ray.index.merge_policy import SegmentMeta, _dir_bytes

        return [SegmentMeta(name=sh["path"], bytes=_dir_bytes(sh["path"]),
                            path=sh["path"])
                for sh in self._m["shards"]]

    def maybe_merge(self, max_rounds: int = 10) -> int:
        """Cascading policy merges (IndexWriter.MaybeMerge); returns the
        number of merges applied."""
        total = 0
        for _ in range(max_rounds):
            spec = self.merge_policy.find_merges(self._metas())
            n = self._apply_merges(spec)
            if not n:
                break
            total += n
        return total

    def force_merge(self, max_segment_count: int = 1,
                    max_rounds: int = 10) -> int:
        total = 0
        for _ in range(max_rounds):
            spec = self.merge_policy.find_forced_merges(
                self._metas(), max_segment_count=max_segment_count)
            n = self._apply_merges(spec)
            if not n:
                break
            total += n
        return total

    # -- read side ----------------------------------------------------------
    @property
    def num_shards(self) -> int:
        return len(self._m["shards"])

    def reader(self):
        """DirectoryReader.Open over the COMMITTED state: one federated
        reader across the shards, each with its tombstone log."""
        from lucenenet_ray.search.multi_reader import MultiIndexReader
        from lucenenet_ray.search.reader import IndexReader as _R

        if not self._m["shards"]:
            raise ValueError("no committed shards yet")
        return MultiIndexReader([
            _R(sh["path"], deletes_path=sh["deletes"])
            for sh in self._m["shards"]])

    def doc(self, doc_id: int, columns: list[str] | None = None
            ) -> dict[str, Any] | None:
        """IndexSearcher.Doc(docID): the stored fields of one document
        (row-group-pruned docstore read). None when the id is unknown or
        the writer stores no fields."""
        from lucenenet_ray.store.docstore import DocStore

        for sh in self._m["shards"]:
            dpath = sh.get("docstore")
            if not dpath:
                continue
            t = DocStore(dpath).get_ordered([int(doc_id)], columns=columns)
            if t.num_rows:
                return {k: v[0] for k, v in t.to_pydict().items()}
        return None

    def searcher(self) -> "IndexSearcher":
        """IndexSearcher over the committed state, with Doc(docID) wired
        to this writer's stored fields."""
        return IndexSearcher(self.reader(), doc_fn=self.doc)

    def close(self) -> None:
        self.commit()


class IndexSearcher:
    """``IndexSearcher.Search(query, n)`` over any reader this engine
    produces (single, parallel, or federated). Accepts a query string
    (classic parser) or a query-tree node."""

    def __init__(self, reader, doc_fn=None):
        self.reader = reader
        self._doc_fn = doc_fn

    def search(self, query, n: int = 10, **kw):
        from lucenenet_ray.search.query import Query, parse_query
        from lucenenet_ray.search.searcher import search as _search

        q = parse_query(query) if isinstance(query, str) else query
        return _search(self.reader, q, k=n, **kw)

    def doc(self, doc_id: int, columns: list[str] | None = None):
        """IndexSearcher.Doc(docID) — stored-fields fetch for a hit."""
        if self._doc_fn is None:
            raise ValueError("no stored fields: open via "
                             "IndexWriter.searcher() with stored_fields set")
        return self._doc_fn(doc_id, columns=columns)
