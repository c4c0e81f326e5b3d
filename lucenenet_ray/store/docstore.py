"""Stored-fields store: the ``IndexSearcher.Doc(docID)`` retrieval path.

The reference stores compressed document fields per segment and fetches them
by docID at hit-presentation time (``CompressingStoredFieldsReader`` /
``IndexSearcher.Doc``; ``Demo/SearchFiles.cs:141-160`` reads ``path`` +
``title`` of each hit). Here the stored-fields file IS doc_id-sorted Parquet:

- ``build_docstore``: one Ray Data job — select the stored columns, global
  sort by doc_id, write a multi-file Parquet directory. Because docIDs are
  also the index's doc-range bucket key, the sorted layout doubles as the
  per-bucket store; Parquet row-group min/max stats on the sorted doc_id
  column are the fdx index analog.
- ``DocStore.get``: fetch rows for a handful of docIDs via predicate
  pushdown — only row groups whose [min,max] covers a requested id are read
  (visible-locality contract tested in tests/test_docstore.py).

Scale: reads touch O(hits) row groups regardless of corpus size; the build
is a single sort of the stored columns (the one unavoidable all-to-all,
amortized across every later fetch).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


def build_docstore(ds, out_path: str, id_col: str = "doc_id",
                   columns: list[str] | None = None) -> str:
    """Write the stored-fields directory: doc_id-sorted multi-file Parquet.

    ``ds`` is a ray.data.Dataset containing at least ``id_col``; pass
    ``columns`` to restrict the stored fields (column pruning at the read
    belongs to the caller building ``ds``).
    """
    if columns is not None:
        ds = ds.select_columns([id_col] + [c for c in columns if c != id_col])
    ds.sort(id_col).write_parquet(out_path)
    return out_path


class DocStore:
    """Reader handle: pins the dataset metadata once, serves many gets."""

    def __init__(self, path: str, id_col: str = "doc_id"):
        self.path = path
        self.id_col = id_col
        self._ds = pads.dataset(path)

    def get(self, doc_ids, columns: list[str] | None = None) -> pa.Table:
        """Rows for the given docIDs, in ascending doc_id order. Missing ids
        are simply absent (like a deleted doc in Doc()). ``columns`` may
        omit the id column — it's fetched internally for ordering and
        dropped from the result."""
        ids = sorted(int(d) for d in doc_ids)
        drop_id = columns is not None and self.id_col not in columns
        cols = (list(dict.fromkeys([self.id_col, *columns]))
                if columns is not None else None)
        t = self._ds.to_table(
            filter=pc.field(self.id_col).isin(pa.array(ids, type=pa.int64())),
            columns=cols,
        )
        t = t.take(pc.sort_indices(t.column(self.id_col)))
        return t.drop_columns([self.id_col]) if drop_id else t

    def lazy(self, doc_id: int) -> "LazyDocument":
        """A ``LazyDocument`` handle — nothing is read until a field is
        asked for (``Lucene.Net.Misc/Document/LazyDocument.cs``: fields are
        realized on first access, then cached)."""
        return LazyDocument(self, int(doc_id))

    def get_ordered(self, doc_ids, columns: list[str] | None = None) -> pa.Table:
        """Rows in the CALLER's order (e.g. rank order of TopDocs hits)."""
        want = [int(d) for d in doc_ids]
        drop_id = columns is not None and self.id_col not in columns
        cols = (list(dict.fromkeys([self.id_col, *columns]))
                if columns is not None else None)
        t = self.get(want, columns=cols)
        have = t.column(self.id_col).to_numpy()
        pos = {int(d): i for i, d in enumerate(have)}
        take = [pos[d] for d in want if d in pos]
        t = t.take(pa.array(take, type=pa.int64()))
        return t.drop_columns([self.id_col]) if drop_id else t


class LazyDocument:
    """Deferred stored-field access for ONE doc
    (``Misc/Document/LazyDocument.cs:33-56``): constructing the handle does
    no I/O; ``get(field)`` reads exactly that column's row groups on first
    access and caches the value (LazyDocument.GetField realizes the shared
    inner Document once per field there; here per field-column, since
    Parquet is column-striped — reading only the asked-for column IS the
    point of laziness). Missing doc or field → None, like a StoredDocument
    without that field."""

    def __init__(self, store: DocStore, doc_id: int):
        self._store = store
        self.doc_id = doc_id
        self._fields: dict[str, object] = {}

    def get(self, field: str):
        if field not in self._fields:
            if field not in self._store._ds.schema.names:
                self._fields[field] = None
            else:
                t = self._store.get([self.doc_id], columns=[field])
                self._fields[field] = (
                    t.column(field)[0].as_py() if t.num_rows else None)
        return self._fields[field]

    def loaded_fields(self) -> tuple[str, ...]:
        """Which fields have been realized (test/observability hook)."""
        return tuple(sorted(self._fields))
