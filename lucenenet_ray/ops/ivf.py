"""IVF (inverted-file) approximate nearest neighbour — the coarse-quantizer
scale path for embedding search (no reference analog: LLM-ops item; the
design is the standard IVF-Flat layout, e.g. Jégou et al., "Product
Quantization for Nearest Neighbor Search", §IVFADC coarse stage).

Ray-Data-first shapes:

- :func:`train_centroids` — deterministic spherical k-means: the initial
  centroids are the ``n_lists`` lowest-id vectors (no RNG — reproducible
  across runs/workers), each Lloyd iteration is ONE ``map_batches`` pass
  emitting per-batch (centroid sum, count) partials with the centroids
  broadcast via ``ray.put``; the driver reduce touches only the tiny
  ``n_lists × dim`` matrix.  Empty lists keep their previous centroid.

- :func:`build_ivf_index` — assign every vector to its nearest centroid
  (one broadcast + map_batches) and write hive-partitioned parquet
  (``list=N/`` directories): one shuffle at build, zero at query.

- :func:`knn_ivf_pruned` — route each query to its ``nprobe`` closest
  centroids and read ONLY those lists' fragments (genuine partition
  pruning, same contract as ops/knn.py knn_lsh_pruned); exact cosine
  top-k inside the probed lists via the shared per-batch matmul partial
  (ops/knn.py _batch_topk_fn), per-row list filter vectorized with
  ``np.isin``, tiny driver merge.

At 10^12 vectors: n_lists scales as ~sqrt(N) (the IVF rule of thumb),
training samples a subset (pass a ``.limit()`` Dataset), and each query
touches nprobe/n_lists of the data.
"""

from __future__ import annotations

import glob as _glob
import os

import numpy as np
import pyarrow as pa


def _to_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    import pyarrow.compute as pc

    flat = pc.list_flatten(batch.column(vec_col)).to_numpy().astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def train_centroids(ds, n_lists: int = 16, n_iters: int = 5,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> np.ndarray:
    """Deterministic spherical k-means; returns (n_lists, dim) float64
    normalized centroids."""
    import ray

    from lucenenet_ray.util.tables import dataset_to_table

    # deterministic init: the n_lists lowest-id vectors. A full ds.sort
    # for 16 seed rows would be an all-to-all shuffle; instead a narrow
    # per-batch min-k partial (ids + vectors of each batch's n_lists
    # smallest) feeds a tiny driver merge — bytes moved ~ n_lists *
    # n_blocks rows, never the corpus.
    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        k = min(n_lists, len(ids))
        part = np.argpartition(ids, k - 1)[:k] if k < len(ids) else \
            np.arange(len(ids))
        return batch.take(pa.array(np.sort(part)))

    seed_t = dataset_to_table(
        ds.map_batches(seed_partial, batch_format="pyarrow"), schema=None)
    order = np.argsort(seed_t.column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64), kind="stable")[:n_lists]
    seed_t = seed_t.take(pa.array(order))
    cent = _normalize(_to_matrix(seed_t, vec_col))
    for _ in range(n_iters):
        cref = ray.put(cent)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            ids = batch.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            m = _normalize(_to_matrix(batch, vec_col))
            # within a batch, accumulate in ascending-id order so the
            # partial itself never depends on row order
            o = np.argsort(ids, kind="stable")
            m = m[o]
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=c.shape[0])
            bkey = int(ids.min()) if len(ids) else -1
            return pa.table({
                "bkey": pa.array(
                    np.full(c.shape[0], bkey), type=pa.int64()),
                "list_id": pa.array(np.arange(c.shape[0]), type=pa.int64()),
                "count": pa.array(counts, type=pa.int64()),
                "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
            })

        t = dataset_to_table(
            ds.map_batches(partials, batch_format="pyarrow"), schema=None)
        import pyarrow.compute as pc

        lids = t.column("list_id").to_numpy()
        cnts = t.column("count").to_numpy()
        bkeys = t.column("bkey").to_numpy()
        flat = pc.list_flatten(t.column("sum")).to_numpy()
        sums = flat.reshape(len(lids), cent.shape[1])
        # canonical accumulation order (list_id, block-min-id): float64
        # sums must not depend on which block finished first
        o = np.lexsort((bkeys, lids))
        lids, cnts, sums = lids[o], cnts[o], sums[o]
        new = np.zeros_like(cent)
        tot = np.zeros(cent.shape[0], dtype=np.int64)
        np.add.at(new, lids, sums)
        np.add.at(tot, lids, cnts)
        keep = tot == 0  # empty list keeps its previous centroid
        new[keep] = cent[keep]
        cent = _normalize(new)
    return cent


def build_ivf_index(ds, out_path: str, centroids: np.ndarray,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> str:
    """Hive-partition the vectors by nearest-centroid list (``list=N/``)."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(_to_matrix(batch, vec_col))
        lid = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return batch.append_column(
            "list", pa.array(lid, type=pa.int64())).append_column(
            "list_val", pa.array(lid, type=pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_path, partition_cols=["list"])
    return out_path


def knn_ivf_pruned(index_path: str, centroids: np.ndarray,
                   query_vectors: np.ndarray, k: int = 10, nprobe: int = 4,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k inside each query's nprobe closest lists.

    Returns (result_table, n_lists_read, n_lists_total)."""
    import ray
    import ray.data as rd

    from lucenenet_ray.ops.knn import _batch_topk_fn
    from lucenenet_ray.util.tables import dataset_to_table

    cent = np.asarray(centroids, dtype=np.float64)
    qv = np.asarray(query_vectors, dtype=np.float64)
    qsims = _normalize(qv) @ cent.T
    probe = np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]
    allowed = [np.sort(p.astype(np.int64)) for p in probe]
    union_allowed = sorted({int(x) for p in allowed for x in p})
    all_dirs = sorted(_glob.glob(os.path.join(index_path, "list=*")))
    present = {int(os.path.basename(d).split("=")[1]): d for d in all_dirs}
    read_dirs = [present[b] for b in union_allowed if b in present]
    empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "vec_id": pa.array([], type=pa.int64()),
                      "sim": pa.array([], type=pa.float64())})
    if not read_dirs:
        return empty, 0, len(all_dirs)
    files = [f for d in read_dirs
             for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    ds = rd.read_parquet(files, columns=[id_col, vec_col, "list_val"])
    qref = ray.put(qv)
    aref = ray.put(allowed)

    def topk_with_list(batch: pa.Table) -> pa.Table:
        allowed_ = ray.get(aref)
        out = _batch_topk_fn(batch, qref, k, vec_col, id_col)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lst = batch.column("list_val").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        sids, slst = ids[order], lst[order]
        ov = out.column("vec_id").to_numpy().astype(np.int64)
        oq = out.column("query_id").to_numpy().astype(np.int64)
        ol = slst[np.searchsorted(sids, ov)]
        keep = np.zeros(len(ov), dtype=bool)
        for qi, lists in enumerate(allowed_):
            m = oq == qi
            if m.any():
                keep[m] = np.isin(ol[m], lists)
        return out.filter(pa.array(keep))

    t = dataset_to_table(
        ds.map_batches(topk_with_list, batch_format="pyarrow"),
        schema=pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                          ("sim", pa.float64())]))
    q = t.column("query_id").to_numpy()
    v = t.column("vec_id").to_numpy()
    s = t.column("sim").to_numpy()
    rows = []
    for qi in range(qv.shape[0]):
        m = q == qi
        order = np.lexsort((v[m], -s[m]))[:k]
        for r, j in enumerate(order, 1):
            rows.append((qi, r, int(v[m][j]), float(s[m][j])))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "rank": pa.array([r[1] for r in rows], type=pa.int64()),
        "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "sim": pa.array([r[3] for r in rows], type=pa.float64()),
    }), len(read_dirs), len(all_dirs)
