"""Corpus-wide paragraph deduplication (Dolma / RefinedWeb practice:
drop every repeated occurrence of a paragraph across the WHOLE corpus,
keeping the first).

Shape: two shuffles, both inherent to the op's semantics —

1. explode docs into paragraph rows (stateless ``map_batches``; a
   paragraph = a ``\\n``-split segment, md5-keyed), then ONE
   ``groupby(h)`` where each group keeps the occurrence with the minimum
   ``(doc_id, idx)`` (so within-doc repeats dedup too) and tombstones the
   rest — the keep decision needs every occurrence of a hash together,
   which is exactly what the shuffle provides;
2. ONE ``groupby(doc_id)`` reassembling each doc's kept paragraphs in
   original order.

Empty segments are structural, not content — they are always kept (the
dedup applies to non-empty paragraphs only).

At 100 TB both exchanges move paragraph rows once; text rides shuffle 1
only (needed to emit the kept rows), and the reassembly carries kept
text only. The gate output is integer/hash-only per doc, so the driver
never sees corpus text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _explode(t: pa.Table, text_col: str) -> pa.Table:
    ids = t.column("doc_id").to_pylist()
    texts = t.column(text_col).to_pylist()
    out_doc, out_idx, out_txt, out_h = [], [], [], []
    for d, x in zip(ids, texts):
        for i, seg in enumerate((x or "").split("\n")):
            out_doc.append(d)
            out_idx.append(i)
            out_txt.append(seg)
            # structural empties are never deduped; give each its OWN key
            # (position-derived) so they scatter instead of piling one
            # corpus-wide skew group onto a single reducer
            key = seg if seg else f"\x00{d}:{i}"
            out_h.append(
                int.from_bytes(
                    hashlib.md5(key.encode("utf-8")).digest()[:8], "big",
                    signed=True))
    return pa.table({
        "doc_id": pa.array(out_doc, type=pa.int64()),
        "idx": pa.array(out_idx, type=pa.int64()),
        "seg": pa.array(out_txt, type=pa.string()),
        "h": pa.array(out_h, type=pa.int64()),
    })


def _keep_winners(g: pa.Table) -> pa.Table:
    """One hash group: keep the min-(doc_id, idx) occurrence; empty
    segments always pass through (their keys are unique anyway)."""
    if g.column("seg")[0].as_py() == "":
        return g.append_column("keep", pa.array([1] * g.num_rows,
                                                type=pa.int64()))
    d = g.column("doc_id").to_numpy()
    i = g.column("idx").to_numpy()
    order = np.lexsort((i, d))
    keep = np.zeros(g.num_rows, dtype=np.int64)
    keep[order[0]] = 1
    return g.append_column("keep", pa.array(keep, type=pa.int64()))


def _reassemble(g: pa.Table) -> pa.Table:
    doc = g.column("doc_id")[0].as_py()
    idx = g.column("idx").to_numpy()
    keep = g.column("keep").to_numpy()
    segs = g.column("seg").to_pylist()
    order = np.argsort(idx)
    kept = [segs[j] for j in order if keep[j]]
    clean = "\n".join(kept)
    return pa.table({
        "doc_id": pa.array([doc], type=pa.int64()),
        "n_paras": pa.array([len(idx)], type=pa.int64()),
        "n_kept": pa.array([len(kept)], type=pa.int64()),
        "clean_len": pa.array([len(clean)], type=pa.int64()),
        "clean_md5": pa.array(
            [hashlib.md5(clean.encode("utf-8")).hexdigest()],
            type=pa.string()),
    })


def paragraph_dedup(ds, text_col: str = "text"):
    """Returns a Dataset of per-doc (doc_id, n_paras, n_kept, clean_len,
    clean_md5) after corpus-wide paragraph dedup. To materialize cleaned
    TEXT instead, swap _reassemble's output for (doc_id, clean) — the
    pipeline is identical."""
    paras = ds.map_batches(lambda t: _explode(t, text_col),
                           batch_format="pyarrow")
    decided = paras.groupby("h").map_groups(_keep_winners,
                                            batch_format="pyarrow")
    return decided.groupby("doc_id").map_groups(_reassemble,
                                                batch_format="pyarrow")
