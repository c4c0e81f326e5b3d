"""Content-defined chunking (CDC) dedup — the storage-dedup primitive
(Muthitacharoen et al. SOSP'01 LBFS; FastCDC, USENIX ATC'16): cut each
document into chunks wherever a local fingerprint of the trailing w
bytes hits a modulus, so identical content produces identical chunks
REGARDLESS of its byte offset (the property fixed-size blocks lack), then
dedupe chunks corpus-wide by digest.

Cut rule (window fingerprint instead of a sequential gear/Rabin state, so
the SQL oracle can probe it positionally — the boundary-selection idea is
identical): 1-based position i >= w is a cut iff

    md5_int31(text[i-w+1 .. i]) % D == 0

Chunks are the segments between consecutive cuts (last chunk runs to the
end; docs shorter than w are one chunk). A chunk is duplicated iff its
md5 digest occurs >= 2 times corpus-wide (within-doc repeats count).

Distributed shape: chunking is a stateless ``map_batches`` emitting
(digest, doc_id, n_bytes) rows — chunk CONTENT never leaves the worker,
only 60-bit digests (the wire cost of storage dedup); ONE
``groupby(digest)`` makes the dup decision; ONE ``groupby(doc_id)``
folds per-doc stats; zeros via a map-side chunk-count pass."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

CDC_W = 8     # fingerprint window (bytes of text, unicode chars here)
CDC_D = 64    # expected chunk length ~ D


def doc_chunks(text: str, w: int = CDC_W, d: int = CDC_D
               ) -> list[tuple[int, int]]:
    """(start, end) 1-based inclusive chunk spans of one doc."""
    n = len(text)
    if n == 0:
        return []
    cuts = [i for i in range(w, n + 1)
            if md5_int31(text[i - w:i]) % d == 0]
    spans = []
    prev = 0
    for c in cuts:
        spans.append((prev + 1, c))
        prev = c
    if prev < n:
        spans.append((prev + 1, n))
    return spans


def _digest60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _chunk_rows(t: pa.Table, w: int, d: int) -> pa.Table:
    out_h, out_doc, out_b = [], [], []
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        s = txt or ""
        for a, b in doc_chunks(s, w, d):
            out_h.append(_digest60(s[a - 1:b]))
            out_doc.append(did)
            out_b.append(b - a + 1)
    return pa.table({
        "h": pa.array(out_h, type=pa.int64()),
        "doc_id": pa.array(out_doc, type=pa.int64()),
        "nb": pa.array(out_b, type=pa.int64()),
    })


def cdc_dedup_stats(ds, w: int = CDC_W, d: int = CDC_D) -> pa.Table:
    """(doc_id, n_chunks, n_dup_chunks, dup_bytes) for every doc,
    doc_id-sorted (zeros included)."""
    from ray.data.aggregate import Count, Sum

    from lucenenet_ray.util.tables import dataset_to_table

    chunks = ds.map_batches(_chunk_rows, fn_kwargs={"w": w, "d": d},
                            batch_format="pyarrow", batch_size=512)

    def mark(group: pa.Table) -> pa.Table:
        dup = 1 if group.num_rows >= 2 else 0
        n = group.num_rows
        return pa.table({
            "doc_id": group.column("doc_id"),
            "one": pa.array(np.ones(n, dtype=np.int64)),
            "dup": pa.array(np.full(n, dup, dtype=np.int64)),
            "dupb": pa.array(
                group.column("nb").to_numpy(zero_copy_only=False) * dup),
        })

    agg = dataset_to_table(
        chunks.groupby("h").map_groups(mark, batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(Sum("one"), Sum("dup"), Sum("dupb")),
        schema=pa.schema([("doc_id", pa.int64()),
                          ("sum(one)", pa.int64()),
                          ("sum(dup)", pa.int64()),
                          ("sum(dupb)", pa.int64())]))
    per = {d_: (int(a), int(b), int(c)) for d_, a, b, c in zip(
        agg.column("doc_id").to_pylist(),
        agg.column("sum(one)").to_pylist(),
        agg.column("sum(dup)").to_pylist(),
        agg.column("sum(dupb)").to_pylist())}
    ids = sorted(dataset_to_table(
        ds.map_batches(lambda t: t.select(["doc_id"]),
                       batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64())]))
        .column("doc_id").to_pylist())
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "n_chunks": pa.array([per.get(i, (0, 0, 0))[0] for i in ids],
                             type=pa.int64()),
        "n_dup_chunks": pa.array([per.get(i, (0, 0, 0))[1] for i in ids],
                                 type=pa.int64()),
        "dup_bytes": pa.array([per.get(i, (0, 0, 0))[2] for i in ids],
                              type=pa.int64()),
    })
