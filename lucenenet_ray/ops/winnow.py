"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm): hash every k-gram, slide a window of w consecutive hashes,
select each window's MINIMUM (rightmost position on ties), and keep the
distinct selected (position, hash) pairs as the doc's fingerprints. The
guarantee (§3): any shared substring of length >= k + w - 1 yields at
least one shared fingerprint — a local, position-robust alternative to
MinHash for near-dup/overlap detection.

Spec mirrored bit-for-bit by the SQL oracle:
- grams: token k-grams (k=3) over the raw non-empty ``text.split(' ')``
  stream, 1-based positions, hash = md5_int31 of the space-joined gram;
- windows: every run of w=4 consecutive gram hashes (docs with fewer
  than w grams emit nothing);
- selection: min hash per window, RIGHTMOST attaining position
  (the paper's tie rule, §4);
- fingerprints: distinct (doc, pos, hash); ``n_shared_fp`` counts a
  doc's fingerprints whose hash is held by >= 2 distinct docs.

Distributed shape: fingerprint selection is a stateless vectorized
``map_batches`` (sliding-window min via numpy stride tricks — no Python
loop over windows); sharing needs ONE ``groupby(h)`` over the
fingerprint rows (already ~1/w of the gram stream — winnowing IS the
combiner), then one ``groupby(doc_id)`` fold. Docs report zeros via a
map-side length pass, never a corpus materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

WINNOW_K = 3   # token k-gram size
WINNOW_W = 4   # window of consecutive gram hashes


def _doc_fingerprints(tokens: list[str], k: int = WINNOW_K,
                      w: int = WINNOW_W) -> tuple[np.ndarray, np.ndarray]:
    """(positions 1-based, hashes) of the doc's distinct fingerprints."""
    m = len(tokens) - k + 1
    if m < w:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    h = np.asarray([md5_int31(" ".join(tokens[i:i + k]))
                    for i in range(m)], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(h, w)  # (m-w+1, w)
    # rightmost argmin: argmin over the reversed window, mapped back
    rev = win[:, ::-1]
    right_amin = (w - 1) - rev.argmin(axis=1)
    pos = np.arange(win.shape[0], dtype=np.int64) + right_amin
    sel = np.stack([pos + 1, h[pos]], axis=1)
    sel = np.unique(sel, axis=0)
    return sel[:, 0], sel[:, 1]


def _fp_rows(batch: pa.Table, k: int, w: int) -> pa.Table:
    out_d: list[int] = []
    out_p: list[int] = []
    out_h: list[int] = []
    for did, txt in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
        toks = (txt or "").split()
        pos, hs = _doc_fingerprints(toks, k, w)
        out_d.extend([did] * len(pos))
        out_p.extend(pos.tolist())
        out_h.extend(hs.tolist())
    return pa.table({
        "doc_id": pa.array(out_d, type=pa.int64()),
        "pos": pa.array(out_p, type=pa.int64()),
        "h": pa.array(out_h, type=pa.int64()),
    })


def winnow_stats(ds, k: int = WINNOW_K, w: int = WINNOW_W,
                 text_col: str = "text") -> pa.Table:
    """(doc_id, n_fp, n_shared_fp) for every doc, doc_id-sorted; docs too
    short for a full window report zeros."""
    import ray

    from lucenenet_ray.util.tables import dataset_to_table

    fps = ds.map_batches(_fp_rows, fn_kwargs={"k": k, "w": w},
                         batch_format="pyarrow", batch_size=512)

    def mark_shared(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").to_numpy(zero_copy_only=False)
        shared = len(np.unique(docs)) >= 2
        return pa.table({
            "doc_id": group.column("doc_id"),
            "shared": pa.array(
                np.full(group.num_rows, 1 if shared else 0,
                        dtype=np.int64)),
        })

    agg = (fps.groupby("h").map_groups(mark_shared, batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(*_count_sum()))
    marked = dataset_to_table(
        agg, schema=pa.schema([("doc_id", pa.int64()),
                               ("count()", pa.int64()),
                               ("sum(shared)", pa.int64())]))
    per_doc = {d: (int(n), int(s)) for d, n, s in zip(
        marked.column("doc_id").to_pylist(),
        marked.column("count()").to_pylist(),
        marked.column("sum(shared)").to_pylist())}

    def ids_only(t: pa.Table) -> pa.Table:
        return t.select(["doc_id"])

    ids = dataset_to_table(
        ds.map_batches(ids_only, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64())]))
    all_ids = sorted(ids.column("doc_id").to_pylist())
    return pa.table({
        "doc_id": pa.array(all_ids, type=pa.int64()),
        "n_fp": pa.array([per_doc.get(d, (0, 0))[0] for d in all_ids],
                         type=pa.int64()),
        "n_shared_fp": pa.array([per_doc.get(d, (0, 0))[1]
                                 for d in all_ids], type=pa.int64()),
    })


def _count_sum():
    from ray.data.aggregate import Count, Sum

    return [Count(), Sum("shared")]
