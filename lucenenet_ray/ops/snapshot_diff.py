"""Snapshot diff (change-data-capture) between two crawl snapshots — the
ingestion-side op every recurring-crawl pipeline runs before dedup:
classify every url as added / removed / changed / unchanged and feed only
added+changed into the expensive downstream stages (the incremental-crawl
practice behind ops/incdedup.py and ops/incneardup.py).

Snapshot synthesis (deterministic, SQL-re-derivable — the documents table
is one crawl; membership and mutation are md5-derived per doc_id):

    in OLD  <=>  md5_int31("old:{id}")  % 4 != 0      (~75%)
    in NEW  <=>  md5_int31("new:{id}")  % 4 != 0      (~75%)
    NEW text = text || " v2"  iff md5_int31("chg:{id}") % 5 == 0

so the gate tests the DIFF semantics (hash compare + side classification)
on realistic mixed statuses, not the synthesizer.

Distributed shape: each side is a narrow streaming pass emitting
(key, side, content-md5) rows — the text never leaves the worker, only
one 64-bit digest per doc; ONE ``groupby(key)`` co-locates both sides
and classifies; the per-status fold is a second tiny groupby. At 100 TB
this is the minimal-movement diff: 16 bytes/doc over the wire.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

STATUSES = ("added", "changed", "removed", "unchanged")


def _digest63(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _side_rows(t: pa.Table, side: int) -> pa.Table:
    """(key, side, h) for docs present in this synthesized snapshot."""
    out_k: list[int] = []
    out_h: list[int] = []
    tag = "old" if side == 0 else "new"
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        if md5_int31(f"{tag}:{did}") % 4 == 0:
            continue
        body = txt or ""
        if side == 1 and md5_int31(f"chg:{did}") % 5 == 0:
            body = body + " v2"
        out_k.append(did)
        out_h.append(_digest63(body))
    return pa.table({
        "key": pa.array(out_k, type=pa.int64()),
        "side": pa.array([side] * len(out_k), type=pa.int64()),
        "h": pa.array(out_h, type=pa.int64()),
    })


def snapshot_diff_counts(ds) -> pa.Table:
    """(status, n_docs) over the two synthesized snapshots — all four
    statuses always reported (zero rows included), status-sorted."""

    old_rows = ds.map_batches(lambda t: _side_rows(t, 0),
                              batch_format="pyarrow")
    new_rows = ds.map_batches(lambda t: _side_rows(t, 1),
                              batch_format="pyarrow")

    def classify(group: pa.Table) -> pa.Table:
        sides = group.column("side").to_numpy(zero_copy_only=False)
        hs = group.column("h").to_numpy(zero_copy_only=False)
        has_old = (sides == 0).any()
        has_new = (sides == 1).any()
        if has_old and has_new:
            st = ("unchanged" if hs[sides == 0][0] == hs[sides == 1][0]
                  else "changed")
        elif has_new:
            st = "added"
        else:
            st = "removed"
        return pa.table({"status": pa.array([st], type=pa.string())})

    agg = (old_rows.union(new_rows)
           .groupby("key").map_groups(classify, batch_format="pyarrow")
           .groupby("status").count().to_pandas())
    got = dict(zip(agg["status"].tolist(),
                   agg["count()"].astype(np.int64).tolist()))
    return pa.table({
        "status": pa.array(list(STATUSES), type=pa.string()),
        "n_docs": pa.array([int(got.get(s, 0)) for s in STATUSES],
                           type=pa.int64()),
    })
