"""Sort-based exact-substring dedup — the suffix-array practice of Lee et
al. 2022 ("Deduplicating Training Data Makes Language Models Better", §4:
build a suffix array over the corpus, mark positions whose sorted
neighbor shares a >= k-token prefix), here in its k-truncated form: the
suffix key is the k-token window itself, so "LCP >= k with a sorted
neighbor" is exactly "equal key adjacent in the global sort".

Same spec as ops/neardup.duplicated_window_spans (a window is duplicated
iff its k-token string occurs >= 2 times corpus-wide, within-doc repeats
included; covered = union of duplicated-window spans) — but a genuinely
different distributed shape, the one you reach for when window-hash
groupby keys skew or the sorted order is wanted anyway:

1. stateless explode → (key, doc_id, pos) truncated-suffix rows;
2. ``ds.sort("key")`` — the distributed suffix-array construction (range-
   partitioned all-to-all; THE cost center, by design);
3. per-batch prune: after the sort equal keys are globally contiguous, so
   an interior run of length 1 (not touching a batch edge) provably has
   no other occurrence anywhere — drop it. Interior runs >= 2 and ALL
   edge runs (their key group may continue in the neighboring batch)
   survive. This is the batch-local combine that keeps step 4 small:
   the shuffle moves duplicate-candidates, not the token stream;
4. ONE ``groupby(key)`` finalizes the >= 2 decision exactly (edge-run
   fragments of one key reunite here), then ONE ``groupby(doc_id)``
   folds marked positions into per-doc coverage.

Skew note: a corpus-hot window (boilerplate) makes one key group large;
the group only carries (doc_id, pos) pairs for that window — bounded by
its true duplication count, which is the quantity being measured.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import DUPWIN_K


def _suffix_rows(batch: pa.Table, k: int) -> pa.Table:
    """(key, doc_id, pos) for every k-token window; pos 1-based (SQL
    range parity). Docs shorter than k emit nothing."""
    out_k: list[str] = []
    out_d: list[int] = []
    out_p: list[int] = []
    for did, txt in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
        toks = (txt or "").split()
        n = len(toks)
        for i in range(n - k + 1):
            out_k.append(" ".join(toks[i:i + k]))
            out_d.append(did)
            out_p.append(i + 1)
    return pa.table({
        "key": pa.array(out_k, type=pa.string()),
        "doc_id": pa.array(out_d, type=pa.int64()),
        "pos": pa.array(out_p, type=pa.int64()),
    })


def _prune_interior_singletons(batch: pa.Table) -> pa.Table:
    """Keep rows whose key run is length >= 2 OR touches a batch edge."""
    n = batch.num_rows
    if n == 0:
        return batch
    keys = np.asarray(batch.column("key").to_pylist(), dtype=object)
    same_prev = np.zeros(n, dtype=bool)
    same_prev[1:] = keys[1:] == keys[:-1]
    same_next = np.zeros(n, dtype=bool)
    same_next[:-1] = same_prev[1:]
    keep = same_prev | same_next
    keep[0] = True
    keep[-1] = True
    return batch.filter(pa.array(keep.tolist(), type=pa.bool_()))


def duplicated_window_spans_sorted(ds, k: int = DUPWIN_K):
    """Per doc (doc_id, n_dup_windows, n_covered) — identical contract to
    ops/neardup.duplicated_window_spans, via global sort instead of a
    window-hash shuffle. Docs with no duplicated window are absent."""

    wins = ds.map_batches(_suffix_rows, fn_kwargs={"k": k},
                          batch_format="pyarrow", batch_size=512)
    cand = wins.sort("key").map_batches(
        _prune_interior_singletons, batch_format="pyarrow")

    def dup_rows(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64())})
        return group.select(["doc_id", "pos"])

    def coverage(group: pa.Table) -> pa.Table:
        did = group.column("doc_id")[0].as_py()
        pos = np.asarray(group.column("pos"), dtype=np.int64)
        covered = np.unique((pos[:, None] + np.arange(k)[None, :]).ravel())
        return pa.table({
            "doc_id": pa.array([did], type=pa.int64()),
            "n_dup_windows": pa.array([group.num_rows], type=pa.int64()),
            "n_covered": pa.array([int(covered.size)], type=pa.int64()),
        })

    return (cand.groupby("key").map_groups(dup_rows, batch_format="pyarrow")
                .groupby("doc_id").map_groups(coverage,
                                              batch_format="pyarrow"))
