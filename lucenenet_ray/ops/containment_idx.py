"""Size-bucketed containment index — the LSH Ensemble partitioning idea
(Zhu, Nargesian, Pu & Miller, VLDB 2016 §4: partition sets BY SIZE so
containment search prunes whole partitions by upper bound) applied as an
EXACT top-k index over hive-partitioned Parquet.

Build (once per corpus): per doc, the distinct-token set and its size
``nd``; size bucket b = nd.bit_length() (b >= 1 covers nd in
[2^(b-1), 2^b - 1]; empty docs land in b = 0). Rows written
hive-partitioned by ``bucket=N/`` with the token set stored as a
list<string> column — queries never touch the documents table again.

Query: containment score = (|Q ∩ d| * S) // nd (ops/setsearch.py
CONTAIN_SCALE fixed point). For bucket b the provable upper bound is

    ub(b) = (min(|Q|, 2^b - 1) * S) // 2^(b-1)        (ub(0) = 0)

Buckets are visited in descending ub order and a bucket is SKIPPED when
the current k-th score strictly exceeds its ub (strict: an equal score
could still win on the doc_id tie-break, so equality reads the bucket) —
only the fragments that can matter leave storage: genuine partition
pruning, not post-filter. Exactness: every doc's score is bounded by its
bucket's ub, so no pruned bucket can hold a top-k row."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.setsearch import CONTAIN_SCALE


def build_containment_index(ds, out_path: str, text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    """Hive-partition (doc_id, nd, tokens list) by size bucket."""

    def rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        toks_all, nds, buckets = [], [], []
        for txt in t.column(text_col).to_pylist():
            toks = sorted(set(x for x in (txt or "").split(" ") if x))
            toks_all.append(toks)
            nds.append(len(toks))
            buckets.append(len(toks).bit_length())
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "nd": pa.array(nds, type=pa.int64()),
            "tokens": pa.array(toks_all, type=pa.list_(pa.string())),
            "bucket": pa.array(buckets, type=pa.int64()),
        })

    ds.map_batches(rows, batch_format="pyarrow").write_parquet(
        out_path, partition_cols=["bucket"])
    return out_path


def containment_topk_indexed(index_path: str, query_tokens: list[str],
                             k: int = 10
                             ) -> tuple[pa.Table, list[int], list[int]]:
    """Exact (rank, doc_id, score) top-k plus (buckets_read,
    buckets_pruned) evidence lists."""
    import ray.data as rd

    qset = np.unique(np.asarray(
        [q for q in query_tokens if q], dtype=object)).astype(str)
    nq = len(qset)

    buckets = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(index_path)
        if d.startswith("bucket="))

    def ub(b: int) -> int:
        if b == 0:
            return 0
        return (min(nq, (1 << b) - 1) * CONTAIN_SCALE) >> (b - 1)

    order = sorted(buckets, key=lambda b: (-ub(b), b))
    # running top-k as (score desc, doc_id asc)
    best: list[tuple[int, int]] = []  # (-score, doc_id)
    read: list[int] = []
    pruned: list[int] = []

    for b in order:
        if len(best) >= k and -sorted(best)[k - 1][0] > ub(b):
            pruned.append(b)
            continue
        read.append(b)
        frag = rd.read_parquet(os.path.join(index_path, f"bucket={b}"))
        for batch in frag.iter_batches(batch_format="pyarrow"):
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            nds = batch.column("nd").to_numpy(zero_copy_only=False)
            toks = batch.column("tokens").to_pylist()
            for i in range(len(ids)):
                nd = int(nds[i])
                if nd == 0:
                    sc = 0
                else:
                    ov = int(np.isin(
                        np.asarray(toks[i], dtype=object).astype(str),
                        qset, assume_unique=True).sum())
                    sc = (ov * CONTAIN_SCALE) // nd
                best.append((-sc, int(ids[i])))
        best = sorted(best)[:max(k, 1)]

    best = sorted(best)[:k]
    return (pa.table({
        "rank": pa.array(range(1, len(best) + 1), type=pa.int64()),
        "doc_id": pa.array([d for _s, d in best], type=pa.int64()),
        "score": pa.array([-s for s, _d in best], type=pa.int64()),
    }), read, pruned)
