"""Document chunking for RAG / training-sequence preparation (no reference
analog: LLM-ops item; the fixed-size-with-overlap sliding window is the
standard retrieval-corpus preparation step, e.g. the chunking described in
RAG, Lewis et al. 2020, and every embedding-index pipeline since).

Semantics: whitespace tokens; chunks of ``window`` tokens advancing by
``stride = window - overlap``; chunk i covers tokens
[i*stride, i*stride + window); emitted while i*stride < n_tokens (the final
chunk may be short, and a document shorter than one window yields exactly
one chunk). Empty documents yield zero chunks.

Ray-Data-first shape: ONE stateless ``flat_map``-style ``map_batches`` —
each input row expands to its chunk rows with no shuffle; at 100 TB the
chunk table streams straight into the embed/index stages (ops/pq.py,
ops/knn.py) without ever materializing. The per-batch kernel is a single
pass over the split token lists (chunk boundaries are integer arithmetic,
not re-tokenization).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chunk_documents(ds, window: int = 32, overlap: int = 8,
                    text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset (doc_id, chunk_idx, start_tok, n_tok, chunk_text)."""
    if not 0 <= overlap < window:
        raise ValueError("need 0 <= overlap < window")
    stride = window - overlap

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id: list[int] = []
        out_ci: list[int] = []
        out_st: list[int] = []
        out_n: list[int] = []
        out_tx: list[str] = []
        for did, tx in zip(ids, texts):
            toks = (tx or "").split()
            n = len(toks)
            i = 0
            while i * stride < n:
                st = i * stride
                sub = toks[st:st + window]
                out_id.append(did)
                out_ci.append(i)
                out_st.append(st)
                out_n.append(len(sub))
                out_tx.append(" ".join(sub))
                i += 1
        return pa.table({
            id_col: pa.array(out_id, type=pa.int64()),
            "chunk_idx": pa.array(out_ci, type=pa.int64()),
            "start_tok": pa.array(out_st, type=pa.int64()),
            "n_tok": pa.array(out_n, type=pa.int64()),
            "chunk_text": pa.array(out_tx, type=pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def chunk_stats(ds, window: int = 32, overlap: int = 8,
                text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Corpus chunking report: per doc the chunk count, total chunk tokens
    (= n + (n_chunks-1)*overlap of duplicated coverage on full windows) and
    the md5-16 of the concatenated chunk texts — a content fingerprint the
    SQL oracle re-derives, proving chunk boundaries AND text byte-for-byte.

    All chunks of a document derive from ONE input row, so the per-doc
    aggregate fuses into the same stateless map_batches pass as the
    chunking itself — zero shuffles, and the only data that ever leaves a
    worker is one 40-byte row per document."""
    import hashlib

    from lucenenet_ray.util.tables import dataset_to_table

    if not 0 <= overlap < window:
        raise ValueError("need 0 <= overlap < window")
    stride = window - overlap

    def per_doc(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out_id: list[int] = []
        out_nc: list[int] = []
        out_tt: list[int] = []
        out_md: list[str] = []
        for did, tx in zip(ids, texts):
            toks = (tx or "").split()
            n = len(toks)
            if n == 0:
                continue
            h = hashlib.md5()
            n_chunks = 0
            total = 0
            i = 0
            while i * stride < n:
                st = i * stride
                sub = toks[st:st + window]
                h.update(" ".join(sub).encode("utf-8"))
                total += len(sub)
                n_chunks += 1
                i += 1
            out_id.append(did)
            out_nc.append(n_chunks)
            out_tt.append(total)
            out_md.append(h.hexdigest()[:16])
        return pa.table({
            id_col: pa.array(out_id, type=pa.int64()),
            "n_chunks": pa.array(out_nc, type=pa.int64()),
            "total_tok": pa.array(out_tt, type=pa.int64()),
            "chunks_md5": pa.array(out_md, type=pa.string()),
        })

    schema = pa.schema([(id_col, pa.int64()), ("n_chunks", pa.int64()),
                        ("total_tok", pa.int64()),
                        ("chunks_md5", pa.string())])
    out = dataset_to_table(
        ds.map_batches(per_doc, batch_format="pyarrow"), schema=schema)
    return out.sort_by(id_col)
