"""Corpus partition-planning and resampling infrastructure — the three
bookkeeping ops a 100 TB pipeline runs around the actual transforms:

- ``shard_plan``: byte-balanced contiguous doc-id shard boundaries via an
  exact global prefix sum (the planner that decides the `ray job submit`
  shard ranges of job.py / docs/CLUSTER.md).  shard(doc) =
  (bytes_before_doc * n_shards) // total_bytes — every shard's byte
  spread is provably < max_doc_bytes + total/B.

- ``systematic_resample``: systematic (stratified-grid) resampling with
  replacement (Kitagawa, J. Comp. Graph. Stat. 1996; the lowest-variance
  standard resampler per Douc & Cappé 2005) — sample j of m sits at
  weight position (2j+1)·W/(2m); doc i receives
  f(C_i) - f(C_{i-1}) copies where f(C) = #{j : (2j+1)W < 2mC} — all
  integer arithmetic, so engine and SQL agree exactly.  The "epoch up-/
  down-sampling by quality weight" op of a data-mixing pipeline.

- ``split_leakage``: train/val exact-duplicate leakage audit — val docs
  whose full text also appears in train (md5 digest equality; the
  reported dedup-then-split hygiene check of Lee et al. 2022 §6.2).

Scale shape: prefix sums use the packing.py bucket exchange (per-bucket
totals → driver cumsums bucket bases → per-bucket exact cumsum; the
driver holds bucket-count rows, never corpus rows).  Leakage is ONE
groupby(digest) over 16-byte digests.  int64 holds 2mC up to ~10^18;
past that (extreme m × corpus bytes) the engine switches the closed form
to python ints per group — the oracle already computes in HUGEINT.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _bucketed_weights(ds, weight_fn, n_buckets: int, id_col: str):
    """(doc_id, w, bucket) stream + per-bucket base offsets (driver-side
    bucket-count array) + total weight."""
    n = ds.count()
    span = max(1, math.ceil((n or 1) / n_buckets))

    def narrow(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        w = weight_fn(t)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "w": pa.array(w.astype(np.int64)),
            "bucket": pa.array(ids // span, type=pa.int64()),
        })

    bucketed = ds.map_batches(narrow, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    totals = (bucketed.groupby("bucket").aggregate(Sum("w"))
              .to_pandas().sort_values("bucket"))
    bids = totals["bucket"].to_numpy(dtype=np.int64)
    btot = totals["sum(w)"].to_numpy(dtype=np.int64)
    base = np.concatenate(([0], np.cumsum(btot)[:-1]))
    base_of = {int(b): int(o) for b, o in zip(bids, base)}
    return bucketed, base_of, int(btot.sum())


def shard_plan(ds, n_shards: int = 8, n_buckets: int = 64,
               weight_col: str = "n_chars",
               id_col: str = "doc_id") -> pa.Table:
    """(shard_id, doc_lo, doc_hi, n_docs, n_bytes) — byte-balanced
    contiguous shard ranges; only non-empty shards appear, shard-sorted."""
    bucketed, base_of, total = _bucketed_weights(
        ds, lambda t: t.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_buckets, id_col)
    B = int(n_shards)

    def assign(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, w = ids[order], w[order]
        b = int(group.column("bucket")[0].as_py())
        before = base_of[b] + np.concatenate(([0], np.cumsum(w)[:-1]))
        shard = (before * B) // max(total, 1)
        # per-(shard) partial aggregate inside the group
        uniq, inv = np.unique(shard, return_inverse=True)
        lo = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        hi = np.full(len(uniq), -1, dtype=np.int64)
        nd = np.zeros(len(uniq), dtype=np.int64)
        nb = np.zeros(len(uniq), dtype=np.int64)
        np.minimum.at(lo, inv, ids)
        np.maximum.at(hi, inv, ids)
        np.add.at(nd, inv, 1)
        np.add.at(nb, inv, w)
        return pa.table({
            "shard_id": pa.array(uniq, type=pa.int64()),
            "doc_lo": pa.array(lo, type=pa.int64()),
            "doc_hi": pa.array(hi, type=pa.int64()),
            "n_docs": pa.array(nd, type=pa.int64()),
            "n_bytes": pa.array(nb, type=pa.int64()),
        })

    import pandas as pd

    parts = (bucketed.groupby("bucket").map_groups(
        assign, batch_format="pyarrow").to_pandas())
    agg = parts.groupby("shard_id").agg(
        doc_lo=("doc_lo", "min"), doc_hi=("doc_hi", "max"),
        n_docs=("n_docs", "sum"), n_bytes=("n_bytes", "sum")).reset_index()
    agg = agg.sort_values("shard_id").reset_index(drop=True)
    for c in agg.columns:
        agg[c] = agg[c].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


def systematic_resample(ds, m: int, n_buckets: int = 64,
                        weight_col: str = "n_chars",
                        id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_copies) for docs receiving >= 1 of the m systematic
    samples (weight = weight_col), doc-sorted."""
    bucketed, base_of, total = _bucketed_weights(
        ds, lambda t: t.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_buckets, id_col)
    W = max(total, 1)
    mm = int(m)

    def f_of(c: np.ndarray) -> np.ndarray:
        # f(C) = #{j in [0, m) : (2j+1) W < 2 m C} = clamp(ceil((2mC - W)
        # / (2W)), 0, m).  The ceil is computed as (x + 2W - 1) // (2W)
        # ONLY on the x > 0 branch so every division has positive
        # operands — python/numpy floor-division and DuckDB's
        # truncating // agree there (they differ on negatives)
        x = 2 * mm * c - W
        val = np.where(x > 0, (x + 2 * W - 1) // (2 * W), 0)
        return np.minimum(val, mm)

    def counts(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, w = ids[order], w[order]
        b = int(group.column("bucket")[0].as_py())
        before = base_of[b] + np.concatenate(([0], np.cumsum(w)[:-1]))
        n_copies = f_of(before + w) - f_of(before)
        keep = n_copies > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "n_copies": pa.array(n_copies[keep], type=pa.int64()),
        })

    out = (bucketed.groupby("bucket").map_groups(
        counts, batch_format="pyarrow").to_pandas())
    out = out.sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_copies"] = out["n_copies"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


VAL_ID_OFFSET = 1_000_000_000


def split_leakage(ds, pick_mod: int = 20, copy_mod: int = 3, k: int = 50,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_train_dups) for val docs whose exact text appears in
    >= 1 train doc; doc-sorted, first k.

    Input model (the incremental_dedup precedent — the val split is
    synthesized PER-ROW so the SQL oracle re-derives it, while the
    engine must still DISCOVER the leakage via the digest groupby):
    train = the corpus; val = one derived row per doc with
    md5('valpick-'+id) % pick_mod == 0, carrying the doc's own text when
    md5('leakcopy-'+id) % copy_mod == 0 (a leaked duplicate) and a fresh
    unique md5 text otherwise; val ids live at id + VAL_ID_OFFSET."""
    import hashlib

    from lucenenet_ray.ops.neardup import md5_int31

    def rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        dig, out_id, is_val = [], [], []
        for i, x in zip(ids, texts):
            dig.append(hashlib.md5((x or "").encode()).hexdigest())
            out_id.append(i)
            is_val.append(0)
            if md5_int31(f"valpick-{i}") % pick_mod == 0:
                if md5_int31(f"leakcopy-{i}") % copy_mod == 0:
                    vtext = x or ""
                else:
                    vtext = "fresh-" + hashlib.md5(
                        f"fresh-{i}".encode()).hexdigest()
                dig.append(hashlib.md5(vtext.encode()).hexdigest())
                out_id.append(i + VAL_ID_OFFSET)
                is_val.append(1)
        return pa.table({
            "digest": pa.array(dig, type=pa.string()),
            "doc_id": pa.array(out_id, type=pa.int64()),
            "is_val": pa.array(is_val, type=pa.int64()),
        })

    def leaked(group: pa.Table) -> pa.Table:
        is_val = group.column("is_val").to_numpy(zero_copy_only=False)
        n_train = int((is_val == 0).sum())
        if n_train == 0 or (is_val == 1).sum() == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_train_dups": pa.array([], type=pa.int64())})
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        vids = np.sort(ids[is_val == 1])
        return pa.table({
            "doc_id": pa.array(vids, type=pa.int64()),
            "n_train_dups": pa.array(
                np.full(vids.size, n_train, dtype=np.int64)),
        })

    from lucenenet_ray.util.tables import dataset_to_table

    out = dataset_to_table(
        ds.map_batches(rows, batch_format="pyarrow")
        .groupby("digest").map_groups(leaked, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64()),
                          ("n_train_dups", pa.int64())])).to_pandas()
    out = out.sort_values("doc_id").head(k).reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_train_dups"] = out["n_train_dups"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)
