"""Numeric doc-values columns + update log.

The DocValues branch of the indexing chain (``Index/DocValuesProcessor.cs``;
SURVEY §3.1 step 3's parallel branch): per-document numeric columns stored
column-striped per doc-range bucket, read by sorting/faceting/expressions
without touching stored fields. Layout mirrors the norms files:
``<index>/docvalues/bucket=NNNNN.parquet`` with (doc_id ascending, one column
per field) — the Lucene42/Lucene45 DocValuesFormat analog where Parquet's
column chunks already provide the packed/delta encodings
(``Codecs/Lucene45/Lucene45DocValuesConsumer.cs:63-139`` picks
delta/gcd/table compression per segment; Parquet's dictionary/RLE/delta
encodings are the same trade, chosen per column chunk).

Updates — ``IndexWriter.UpdateNumericDocValues(term, field, value)``
(``Index/IndexWriter.cs:1764-1796``, ``NumericDocValuesFieldUpdates.cs``):
an update is buffered as (term, field, value), NOT doc IDs, and resolved
against postings when a reader opens — identical model to the tombstone
delete log (deletes.py). Each generation is a tiny sidecar parquet; readers
apply generations in order, later generations overriding earlier ones
(``ReaderAndUpdates.WriteFieldUpdates`` stacks .dvu gen files the same way).
The base column files are immutable — rewriting them would violate the
append-only index contract that makes builds idempotent under retries.

Scale: the build is a narrow (doc_id + numeric fields) projection of the
corpus — read only those columns, assign the doc-range bucket (pure function
of doc_id, no shuffle key materialization), and write one sorted file per
bucket. The only exchange is Ray Data's groupby on the int32 bucket label of
a ~16-byte row: at 10^12 docs this is the cheapest possible all-to-all (no
text moves), and it reuses the SAME partitioning key as every other index
file, so a bucket's norms, postings, and docvalues are co-resident.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def build_docvalues(ds, cfg, fields: list[str], id_col: str = "doc_id") -> None:
    """Write per-bucket numeric doc-values files for ``fields``.

    ``ds``: ray.data.Dataset holding at least (id_col, *fields);
    ``cfg``: the index's IndexConfig (bucket_of + index_path must match the
    built index so docvalues co-partition with norms/postings).
    """
    from lucenenet_ray.index.build import _atomic_write_parquet

    dv_dir = os.path.join(cfg.index_path, "docvalues")
    os.makedirs(dv_dir, exist_ok=True)

    def assign_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__bucket", pa.array(cfg.bucket_of(ids), type=pa.int32()))

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group.column("__bucket")[0].as_py())
        group = group.take(pc.sort_indices(group.column(id_col)))
        out = group.drop_columns(["__bucket"])
        _atomic_write_parquet(out, os.path.join(dv_dir, f"bucket={b:05d}.parquet"))
        return pa.table({"bucket": pa.array([b], type=pa.int32()),
                         "n_docs": pa.array([group.num_rows], type=pa.int64())})

    (
        ds.select_columns([id_col] + list(fields))
        .map_batches(assign_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .materialize()
    )


# ---------------------------------------------------------------------------
# update log (UpdateNumericDocValues analog)


def update_numeric_docvalue(updates_dir: str, term: str, field: str,
                            value: int) -> int:
    """Append one update generation: every doc matching ``term`` gets
    ``field := value`` when a reader resolves the log. Returns the new
    generation number. ``term`` uses the field-prefixed dictionary form for
    non-body fields (search.query.field_term)."""
    os.makedirs(updates_dir, exist_ok=True)
    gens = [
        int(os.path.basename(f)[4:-8])
        for f in glob.glob(os.path.join(updates_dir, "dvu-*.parquet"))
    ]
    gen = (max(gens) + 1) if gens else 0
    t = pa.table({
        "term": pa.array([term], type=pa.string()),
        "field": pa.array([field], type=pa.string()),
        "value": pa.array([value], type=pa.int64()),
    })
    tmp = os.path.join(updates_dir, f".dvu-{gen:06d}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(updates_dir, f"dvu-{gen:06d}.parquet"))
    return gen


def update_binary_docvalue(updates_dir: str, term: str, field: str,
                           value: bytes) -> int:
    """Binary twin of :func:`update_numeric_docvalue` —
    ``IndexWriter.UpdateBinaryDocValues(term, field, value)``
    (``Index/IndexWriter.cs:1723-1753``, ``BinaryDocValuesFieldUpdates.cs``):
    every doc matching ``term`` gets ``field := value`` (a byte payload) when
    a reader resolves the log. Binary updates live in their own ``dvb-*``
    generation sequence — a field is either numeric or binary (the reference
    rejects mixed types per field, ``DocValuesType`` check), so the two logs
    never interact."""
    os.makedirs(updates_dir, exist_ok=True)
    gens = [
        int(os.path.basename(f)[4:-8])
        for f in glob.glob(os.path.join(updates_dir, "dvb-*.parquet"))
    ]
    gen = (max(gens) + 1) if gens else 0
    t = pa.table({
        "term": pa.array([term], type=pa.string()),
        "field": pa.array([field], type=pa.string()),
        "value": pa.array([value], type=pa.binary()),
    })
    tmp = os.path.join(updates_dir, f".dvb-{gen:06d}.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(updates_dir, f"dvb-{gen:06d}.parquet"))
    return gen


def load_dvb_updates(
        updates_dir: str | None) -> tuple[tuple[str, str, bytes], ...]:
    """All binary (term, field, value) updates in generation order."""
    if not updates_dir or not os.path.isdir(updates_dir):
        return ()
    out: list[tuple[str, str, bytes]] = []
    for f in sorted(glob.glob(os.path.join(updates_dir, "dvb-*.parquet"))):
        t = pq.read_table(f)
        for i in range(t.num_rows):
            out.append((t.column("term")[i].as_py(),
                        t.column("field")[i].as_py(),
                        t.column("value")[i].as_py()))
    return tuple(out)


def load_dv_updates(updates_dir: str | None) -> tuple[tuple[str, str, int], ...]:
    """All (term, field, value) updates in generation order (later wins)."""
    if not updates_dir or not os.path.isdir(updates_dir):
        return ()
    out: list[tuple[str, str, int]] = []
    for f in sorted(glob.glob(os.path.join(updates_dir, "dvu-*.parquet"))):
        t = pq.read_table(f)
        for i in range(t.num_rows):
            out.append((t.column("term")[i].as_py(),
                        t.column("field")[i].as_py(),
                        int(t.column("value")[i].as_py())))
    return tuple(out)
