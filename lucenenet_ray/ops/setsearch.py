"""Top-k set-overlap search (the Koios / set-similarity-search shape,
ICDE 2023 — PAPERS.md): given a query token SET, return the k documents
whose DISTINCT-token overlap with it is largest.

Scores are integers (|tokens(d) ∩ Q|), so ranking is exact at any
parallelism; tie-break (overlap desc, doc_id asc).

Distributed shape: the query set is broadcast once via ``ray.put``; one
stateless ``map_batches`` computes per-doc distinct-overlap counts with a
vectorized np.isin over each doc's unique tokens and keeps a per-batch
partial top-k; the driver merges k·blocks rows. No shuffle — overlap
search over 10^12 docs is one streaming read. A spatio-textual variant
(the ICDE 2023 spatio-textual top-k shape) pre-filters each batch by a
bounding box over the md5-synthesized coordinates (ops/spatial.py) before
scoring, so the spatial predicate prunes before any text work."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_overlap(t: pa.Table, qset: np.ndarray, k: int,
                   bbox: tuple[int, int, int, int] | None,
                   text_col: str, id_col: str) -> pa.Table:
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t.column(text_col).to_pylist()
    if bbox is not None:
        from lucenenet_ray.ops.spatial import synth_latlon_centi

        lat, lon = synth_latlon_centi(ids)
        keep = ((lat >= bbox[0]) & (lat < bbox[1])
                & (lon >= bbox[2]) & (lon < bbox[3]))
        idx = np.flatnonzero(keep)
    else:
        idx = np.arange(len(ids))
    ov = np.empty(len(idx), dtype=np.int64)
    for o, i in enumerate(idx.tolist()):
        toks = np.unique((texts[i] or "").split(" "))
        ov[o] = int(np.isin(toks, qset, assume_unique=True).sum())
    kk = min(k, len(idx))
    sel = np.lexsort((ids[idx], -ov))[:kk]
    return pa.table({
        id_col: pa.array(ids[idx][sel], type=pa.int64()),
        "overlap": pa.array(ov[sel], type=pa.int64()),
    })


def set_overlap_topk(ds, query_tokens: list[str], k: int = 10,
                     bbox: tuple[int, int, int, int] | None = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(rank, doc_id, overlap) top-k by (overlap desc, doc_id asc).
    ``bbox`` = (lat_lo, lat_hi, lon_lo, lon_hi) in centi-degrees filters
    docs spatially before scoring (half-open on the hi edges)."""
    import ray

    qset = np.unique(np.asarray(
        [q for q in query_tokens if q], dtype=object)).astype(str)
    qset.sort(kind="stable")
    qref = ray.put(qset)

    def part(t: pa.Table) -> pa.Table:
        return _batch_overlap(t, ray.get(qref), k, bbox, text_col, id_col)

    parts = []
    for ref in ds.map_batches(part, batch_format="pyarrow").to_arrow_refs():
        tab = ray.get(ref)
        if tab.num_rows and id_col in tab.schema.names:
            parts.append(tab)
    if not parts:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "overlap": pa.array([], type=pa.int64())})
    t = pa.concat_tables(parts)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    ov = t.column("overlap").to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, -ov))[:k]
    return pa.table({
        "rank": pa.array(range(1, len(sel) + 1), type=pa.int64()),
        id_col: pa.array(ids[sel], type=pa.int64()),
        "overlap": pa.array(ov[sel], type=pa.int64()),
    })
