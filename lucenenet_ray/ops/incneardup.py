"""Incremental MinHash near-dup: a NEW crawl snapshot against an OLD
corpus whose LSH band table was built once — the daily-increment shape of
fuzzy dedup at 100 TB (pair of ops/incdedup.py, which is the EXACT-hash
incremental path; Lee et al. 2022 / Gyawali et al. 2020 run exactly this
band-join between snapshots).

Distributed shape:
- stage 1 (once per old corpus): old docs' (doc_id, band, band_key) rows
  written hive-partitioned by ``band=N/`` — new snapshots reuse the files
  and never re-shingle the old corpus;
- stage 2 (per snapshot): new docs' band rows stream from one
  ``map_batches`` (ops/neardup.py MinHashLSH — per-actor shingle
  hash cache), union with the OLD parquet read, ONE
  ``groupby(band, band_key)`` co-locates both sides, and each group emits
  only CROSS pairs (new × old) — within-side pairs are the batch dedup's
  job, not the increment's.

Skew: a hot band_key (boilerplate shingle sets) makes |group| =
n_old × n_new pairs; ``max_side`` caps each side per group (lowest ids
kept, the same star-edge bound as neardup.candidate_pairs) — at gate
scale no group reaches the cap, so the SQL oracle models the uncapped
join exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import (MinHashLSH, NUM_BANDS,
                                       NUM_PERM, SHINGLE_K)


def build_band_index(ds, out_path: str, num_perm: int = NUM_PERM,
                     num_bands: int = NUM_BANDS,
                     shingle_k: int = SHINGLE_K) -> str:
    """Hive-partition the corpus' LSH band rows by band (built once)."""
    sig = ds.map_batches(
        MinHashLSH, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"num_perm": num_perm,
                               "num_bands": num_bands,
                               "shingle_k": shingle_k})
    sig.write_parquet(out_path, partition_cols=["band"])
    return out_path


def incremental_minhash_candidates(new_ds, band_index_path: str,
                                   num_perm: int = NUM_PERM,
                                   num_bands: int = NUM_BANDS,
                                   shingle_k: int = SHINGLE_K,
                                   max_side: int = 256) -> pa.Table:
    """(doc_new, doc_old, n_bands) for cross-corpus pairs sharing >= 1
    band key, (doc_new, doc_old)-sorted."""
    import ray
    import ray.data as rd

    new_bands = new_ds.map_batches(
        MinHashLSH, batch_format="pyarrow", concurrency=2,
        fn_constructor_kwargs={"num_perm": num_perm,
                               "num_bands": num_bands,
                               "shingle_k": shingle_k}).map_batches(
        lambda t: t.append_column(
            "side", pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow")
    old_bands = rd.read_parquet(band_index_path).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "band": pa.compute.cast(t.column("band"), pa.int32()),
            "band_key": t.column("band_key"),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        }), batch_format="pyarrow")

    def cross_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        old = np.sort(ids[side == 0])[:max_side]
        new = np.sort(ids[side == 1])[:max_side]
        if len(old) == 0 or len(new) == 0:
            return pa.table({"doc_new": pa.array([], type=pa.int64()),
                             "doc_old": pa.array([], type=pa.int64())})
        nn = np.repeat(new, len(old))
        oo = np.tile(old, len(new))
        return pa.table({
            "doc_new": pa.array(nn.astype(np.int64), type=pa.int64()),
            "doc_old": pa.array(oo.astype(np.int64), type=pa.int64()),
        })

    pairs = (new_bands.union(old_bands)
             .groupby(["band", "band_key"])
             .map_groups(cross_pairs, batch_format="pyarrow")
             .groupby(["doc_new", "doc_old"]).count())
    parts = []
    for ref in ray.get(pairs.to_arrow_refs()):
        if ref.num_rows and "doc_new" in ref.schema.names:
            parts.append(ref)
    if not parts:
        return pa.table({"doc_new": pa.array([], type=pa.int64()),
                         "doc_old": pa.array([], type=pa.int64()),
                         "n_bands": pa.array([], type=pa.int64())})
    t = pa.concat_tables(parts).rename_columns(
        ["doc_new", "doc_old", "n_bands"])
    idx = pa.compute.sort_indices(
        t, sort_keys=[("doc_new", "ascending"), ("doc_old", "ascending")])
    t = t.take(idx)
    return pa.table({
        "doc_new": t.column("doc_new"),
        "doc_old": t.column("doc_old"),
        "n_bands": pa.compute.cast(t.column("n_bands"), pa.int64()),
    })
