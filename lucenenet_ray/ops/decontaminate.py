"""Benchmark decontamination + cross-document duplicated-n-gram detection —
LLM-training-data hygiene ops (no reference analog; standard practice from
the GPT-3/PaLM appendices: flag training docs sharing long n-grams with an
evaluation set, and measure corpus-internal n-gram duplication).

Scale shapes:

- :func:`benchmark_hashes` — the *benchmark* side is tiny by definition
  (eval sets are thousands of docs, not billions): hashed once on the
  driver from a column-pruned read, shipped to every worker via a single
  ``ray.put`` (never per batch).
- :class:`Decontaminate` — actor-pool ``map_batches`` stage: the sorted
  benchmark hash array is fetched ONCE per actor in ``__init__``;
  ``__call__`` does a vectorized ``np.searchsorted`` membership test per
  batch. Zero shuffles: every doc is judged locally.
- :func:`dup_ngram_counts` — corpus-internal duplication can't avoid a
  shuffle (the same 5-gram must meet itself across docs): ONE
  groupby(hash) with per-group emit of the documents that share it, then
  ONE small groupby(doc). No driver materialization of grams.

Hashing matches ops/textstats.fingerprints_of (md5 15-hex-digit → int60)
so the DuckDB oracle reproduces counts exactly (no engine-only hash).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _gram_hashes(tokens: list[str], k: int) -> np.ndarray:
    """Distinct md5-int60 hashes of the doc's k-grams (docs shorter than k
    contribute nothing — same as the SQL oracle's len(arr) >= k guard)."""
    n = len(tokens)
    if n < k:
        return np.empty(0, dtype=np.int64)
    hs = {
        int(hashlib.md5(" ".join(tokens[i : i + k]).encode("utf-8"))
            .hexdigest()[:15], 16)
        for i in range(n - k + 1)
    }
    return np.fromiter(hs, dtype=np.int64, count=len(hs))


def benchmark_hashes(parquet_path: str, modulo: int, k: int = 8,
                     text_col: str = "text", id_col: str = "doc_id") -> np.ndarray:
    """Sorted distinct k-gram hashes of the benchmark subset
    (doc_id % modulo == 0). Column-pruned read; the subset is the small
    side, so driver-side hashing is bounded by the eval set, not the
    corpus."""
    t = pq.read_table(parquet_path, columns=[id_col, text_col])
    ids = t.column(id_col).to_numpy()
    keep = ids % modulo == 0
    out: set[int] = set()
    for txt in np.asarray(t.column(text_col))[keep].tolist():
        out.update(_gram_hashes((txt or "").split(), k).tolist())
    return np.asarray(sorted(out), dtype=np.int64)


class Decontaminate:
    """Actor-pool stage: per doc, how many of its DISTINCT k-grams appear
    in the benchmark set. Emits only contaminated non-benchmark docs."""

    def __init__(self, bench_ref, modulo: int, k: int = 8,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        self.bench = ray.get(bench_ref)  # once per actor, not per batch
        self.modulo = modulo
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id: list[int] = []
        out_n: list[int] = []
        for did, txt in zip(ids, texts):
            if did % self.modulo == 0:
                continue  # the benchmark itself is not "contaminated"
            hs = _gram_hashes((txt or "").split(), self.k)
            if not hs.size:
                continue
            pos = np.searchsorted(self.bench, hs)
            inb = pos < self.bench.size
            inb[inb] = self.bench[pos[inb]] == hs[inb]
            n = int(inb.sum())
            if n:
                out_id.append(did)
                out_n.append(n)
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "n_hits": pa.array(out_n, type=pa.int64()),
        })


def decontaminate(sf_dir_parquet: str, modulo: int = 97, k: int = 8,
                  concurrency: int = 4):
    """Full pipeline: benchmark hash set → broadcast → actor-pool scan.
    Returns a doc_id-ascending DATASET of (doc_id, n_hits) for
    contaminated docs — streaming/write_parquet-able; gate wrappers
    materialize it (VERDICT r3 finding #5)."""
    import ray
    import ray.data as rd

    bench = benchmark_hashes(sf_dir_parquet, modulo, k)
    bench_ref = ray.put(bench)
    ds = rd.read_parquet(sf_dir_parquet, columns=["doc_id", "text"])
    # leave headroom for the downstream sort: an actor pool sized to the
    # whole cluster deadlocks the pipeline on small CPU counts
    cpus = int(ray.cluster_resources().get("CPU", 4))
    pool = max(1, min(concurrency, cpus - 2))
    return ds.map_batches(
        Decontaminate,
        fn_constructor_kwargs={"bench_ref": bench_ref, "modulo": modulo,
                               "k": k},
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool,
    ).sort("doc_id")


def _gram_pairs_batch(batch: pa.Table, k: int) -> pa.Table:
    """Stateless map_batches stage → distinct (h, doc_id) pairs per doc.
    A plain task-based stage (no actor pool): it holds no state, and an
    actor pool sized to the cluster would starve the downstream groupby
    of CPUs on small clusters."""
    out_h: list[int] = []
    out_d: list[int] = []
    for did, txt in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
        hs = _gram_hashes((txt or "").split(), k)
        out_h.extend(hs.tolist())
        out_d.extend([did] * hs.size)
    return pa.table({
        "h": pa.array(out_h, type=pa.int64()),
        "doc_id": pa.array(out_d, type=pa.int64()),
    })


def dup_ngram_counts(sf_dir_parquet: str, k: int = 5):
    """Per doc: how many of its distinct k-grams occur in >= 2 distinct
    docs corpus-wide. groupby(h) → emit shared grams' doc lists →
    groupby(doc_id).count — two shuffles of gram-pair rows; returns the
    doc_id-sorted DATASET (nothing materializes on the driver; gate
    wrappers collect — VERDICT r3 finding #5)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(sf_dir_parquet, columns=["doc_id", "text"])
    pairs = ds.map_batches(_gram_pairs_batch, fn_kwargs={"k": k},
                           batch_format="pyarrow", batch_size=512)

    def shared(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id")
        if len(set(docs.to_pylist())) < 2:
            return pa.table({"doc_id": pa.array([], type=pa.int64())})
        return pa.table({"doc_id": docs})

    return (
        pairs.groupby("h")
        .map_groups(shared, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_dup"))
        .sort("doc_id")
    )
