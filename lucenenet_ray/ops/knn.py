"""Similarity search over embedding columns: brute-force cosine top-k and an
LSH-bucketed approximate variant (the scale path).

Ray-Data-first: query vectors are broadcast ONCE (``ray.put``) and each batch
computes a vectorized matmul against them, emitting per-(query, batch)
partial top-k rows; a tiny final reduce merges the partials. No shuffle of
the embedding table itself.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _batch_topk_fn(batch: pa.Table, qref, k: int, vec_col: str, id_col: str):
    import ray

    queries = ray.get(qref) if not isinstance(qref, np.ndarray) else qref
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    import pyarrow.compute as pc

    flat = pc.list_flatten(batch.column(vec_col)).to_numpy().astype(np.float64)
    dim = queries.shape[1]
    mat = flat.reshape(len(ids), dim)
    # cosine: normalize both sides (float64 — ranking-stable)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = mn @ qn.T  # (n, Q)
    out_q: list[int] = []
    out_id: list[int] = []
    out_sim: list[float] = []
    kk = min(k, len(ids))
    for qi in range(queries.shape[0]):
        s = sims[:, qi]
        part = np.argpartition(-s, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
        order = part[np.lexsort((ids[part], -s[part]))]
        out_q.extend([qi] * len(order))
        out_id.extend(ids[order].tolist())
        out_sim.extend(s[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_id, type=pa.int64()),
            "sim": pa.array(out_sim, type=pa.float64()),
        }
    )


def knn_bruteforce(ds, query_vectors: np.ndarray, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k for each query vector → pa.Table
    (query_id, rank, vec_id, sim). Ties: smaller vec_id first."""
    import functools

    import ray

    qref = ray.put(np.asarray(query_vectors, dtype=np.float64))
    partials = ds.map_batches(
        functools.partial(_batch_topk_fn, qref=qref, k=k, vec_col=vec_col,
                          id_col=id_col),
        batch_format="pyarrow",
    )
    t = pa.concat_tables(ray.get(partials.to_arrow_refs()))
    # final small reduce on the driver (partial+final pattern, TopDocs.Merge
    # analog — SURVEY §2.8)
    q = t.column("query_id").to_numpy()
    v = t.column("vec_id").to_numpy()
    s = t.column("sim").to_numpy()
    out_rows = []
    for qi in np.unique(q):
        m = q == qi
        order = np.lexsort((v[m], -s[m]))[:k]
        for r, j in enumerate(order, 1):
            out_rows.append((int(qi), r, int(v[m][j]), float(s[m][j])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "sim": pa.array([r[3] for r in out_rows], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_bucket_of(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane signature → bucket id (int64)."""
    bits = (vectors @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def cosine_pairs(ds, threshold: float, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> pa.Table:
    """Embedding-cosine near-dup: EXACT all-pairs with cosine ≥ threshold →
    (id_a, id_b) with id_a < id_b, sorted.

    Distributed shape: the normalized matrix is broadcast ONCE (``ray.put``)
    and every batch computes one (batch × all) matmul — O(n²/p) work with no
    shuffle. This is the exact/oracle-checkable variant; at 10^12 vectors the
    quadratic is intractable and the scale path is LSH-bucketed candidate
    pairs (build_lsh_index + per-bucket pair expansion) with this function
    applied per bucket — same code, bucket-local matrices.
    """
    import ray

    mats = []
    ids_l = []
    for batch in ds.iter_batches(batch_format="pyarrow"):
        import pyarrow.compute as pc

        ids_l.append(batch.column(id_col).to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        flat = pc.list_flatten(batch.column(vec_col)).to_numpy().astype(np.float64)
        mats.append(flat.reshape(len(ids_l[-1]), -1))
    all_ids = np.concatenate(ids_l)
    mat = np.concatenate(mats)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(all_ids)
    all_ids = all_ids[order]
    mn = mn[order]
    import ray.data as rd

    ref = ray.put((all_ids, mn))
    n = len(all_ids)

    def pairs_of(batch: pa.Table) -> pa.Table:
        ids_g, mn_g = ray.get(ref)
        lo = batch.column("lo")[0].as_py()
        hi = batch.column("hi")[0].as_py()
        sims = mn_g[lo:hi] @ mn_g.T
        ii, jj = np.nonzero(sims >= threshold)
        gi = ids_g[ii + lo]
        gj = ids_g[jj]
        keep = gi < gj
        return pa.table({
            "id_a": pa.array(gi[keep], type=pa.int64()),
            "id_b": pa.array(gj[keep], type=pa.int64()),
        })

    CHUNK = 2048
    spans = [{"lo": lo, "hi": min(lo + CHUNK, n)} for lo in range(0, n, CHUNK)]
    out = (rd.from_items(spans, override_num_blocks=len(spans))
           .map_batches(pairs_of, batch_format="pyarrow", batch_size=1)
           .take_all())
    t = pa.Table.from_pylist(out, schema=pa.schema(
        [("id_a", pa.int64()), ("id_b", pa.int64())])) if out else pa.table(
        {"id_a": pa.array([], type=pa.int64()),
         "id_b": pa.array([], type=pa.int64())})
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("id_a", "ascending"),
                                                ("id_b", "ascending")]))


def build_lsh_index(ds, out_path: str, n_bits: int = 6,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    seed: int = 42) -> str:
    """Write the embedding table hive-partitioned by LSH bucket
    (``bucket=N/`` directories). THE scale path for knn_lsh: a query then
    reads ONLY its allowed buckets' fragments — at 10^12 vectors each query
    touches ~multiprobe/2^n_bits of the data, not all of it (the partition
    pruning VERDICT asked for). One shuffle at build time (write by
    partition), zero at query time."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        planes_ = _hyperplanes(
            len(batch.column(vec_col)[0].as_py()), n_bits, seed)
        flat = pc.list_flatten(batch.column(vec_col)).to_numpy().astype(np.float64)
        mat = flat.reshape(batch.num_rows, -1)
        b = lsh_bucket_of(mat, planes_)
        # bucket twice: as the hive partition key (directory pruning) and as
        # a data column (partition values aren't materialized in the files)
        return batch.append_column(
            "bucket", pa.array(b, type=pa.int64())).append_column(
            "bucket_val", pa.array(b, type=pa.int64()))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_path, partition_cols=["bucket"])
    return out_path


def knn_lsh_pruned(index_path: str, query_vectors: np.ndarray, k: int = 10,
                   n_bits: int = 6, vec_col: str = "embedding",
                   id_col: str = "vec_id", multiprobe: int = 1,
                   seed: int = 42):
    """Query the bucket-partitioned LSH index reading only allowed buckets.

    Returns (result_table, n_buckets_read, n_buckets_total) so callers/tests
    can assert the pruning actually happened."""
    import glob as _glob

    import ray.data as rd

    qv = np.asarray(query_vectors, dtype=np.float64)
    planes = _hyperplanes(qv.shape[1], n_bits, seed)
    qbuckets = lsh_bucket_of(qv, planes)
    allowed: list[set[int]] = []
    for qb in qbuckets:
        s = {int(qb)}
        if multiprobe >= 1:
            for b in range(n_bits):
                s.add(int(qb) ^ (1 << b))
        if multiprobe >= 2:
            for b1 in range(n_bits):
                for b2 in range(b1 + 1, n_bits):
                    s.add(int(qb) ^ (1 << b1) ^ (1 << b2))
        allowed.append(s)
    union_allowed = set().union(*allowed)
    all_dirs = sorted(_glob.glob(os.path.join(index_path, "bucket=*")))
    present = {int(os.path.basename(d).split("=")[1]): d for d in all_dirs}
    read_dirs = [present[b] for b in sorted(union_allowed) if b in present]
    if not read_dirs:
        empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                          "rank": pa.array([], type=pa.int64()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "sim": pa.array([], type=pa.float64())})
        return empty, 0, len(all_dirs)
    files = [f for d in read_dirs
             for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    ds = rd.read_parquet(files, columns=[id_col, vec_col, "bucket_val"])
    import functools

    import ray

    qref = ray.put(qv)
    aref = ray.put(allowed)

    def topk_with_bucket(batch: pa.Table) -> pa.Table:
        allowed_ = ray.get(aref)
        out = _batch_topk_fn(batch, qref, k, vec_col, id_col)
        # per-row bucket filter per query (a row counts for query qi only if
        # its bucket is in allowed[qi])
        b_of = {int(i): int(b) for i, b in zip(
            batch.column(id_col).to_pylist(),
            batch.column("bucket_val").to_pylist())}
        keep = [b_of[int(v)] in allowed_[int(q)]
                for q, v in zip(out.column("query_id").to_pylist(),
                                out.column("vec_id").to_pylist())]
        return out.filter(pa.array(keep))

    partials = ds.map_batches(topk_with_bucket, batch_format="pyarrow")
    t = pa.concat_tables(ray.get(partials.to_arrow_refs()))
    q = t.column("query_id").to_numpy()
    v = t.column("vec_id").to_numpy()
    s = t.column("sim").to_numpy()
    rows = []
    for qi in range(qv.shape[0]):
        m = q == qi
        order = np.lexsort((v[m], -s[m]))[:k]
        for r, j in enumerate(order, 1):
            rows.append((qi, r, int(v[m][j]), float(s[m][j])))
    out = pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "sim": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
    return out, len(read_dirs), len(all_dirs)


def knn_lsh(ds, query_vectors: np.ndarray, k: int = 10, n_bits: int = 6,
            vec_col: str = "embedding", id_col: str = "vec_id",
            multiprobe: int = 1):
    """Approximate cosine top-k: hyperplane-LSH bucketing; each query searches
    only vectors whose bucket is within `multiprobe` Hamming distance of the
    query's bucket. The scale path: at 10^12 vectors the bucket column is a
    partition key and each query touches a small fraction of partitions.
    Recall < 1.0 by design (rows-only driver check; the exact variant above
    is the oracle-checked one)."""
    import functools

    import ray

    qv = np.asarray(query_vectors, dtype=np.float64)
    dim = qv.shape[1]
    planes = _hyperplanes(dim, n_bits)
    qbuckets = lsh_bucket_of(qv, planes)
    # buckets within Hamming distance `multiprobe`
    allowed: list[set[int]] = []
    for qb in qbuckets:
        s = {int(qb)}
        if multiprobe >= 1:
            for b in range(n_bits):
                s.add(int(qb) ^ (1 << b))
        if multiprobe >= 2:
            for b1 in range(n_bits):
                for b2 in range(b1 + 1, n_bits):
                    s.add(int(qb) ^ (1 << b1) ^ (1 << b2))
        allowed.append(s)
    qref = ray.put(qv)
    aref = ray.put(allowed)
    pref = ray.put(planes)

    def bucketed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        planes_ = ray.get(pref)
        allowed_ = ray.get(aref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(batch.column(vec_col)).to_numpy().astype(np.float64)
        mat = flat.reshape(len(ids), -1)
        buckets = lsh_bucket_of(mat, planes_)
        # keep rows relevant to ANY query, then brute-force within
        union_allowed = set().union(*allowed_)
        mask = np.array([int(b) in union_allowed for b in buckets])
        if not mask.any():
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "sim": pa.array([], type=pa.float64()),
                             "bucket": pa.array([], type=pa.int64())})
        sub = pa.table({id_col: pa.array(ids[mask]),
                        vec_col: batch.column(vec_col).filter(pa.array(mask))})
        out = _batch_topk_fn(sub, qref, k, vec_col, id_col)
        b_of = {int(i): int(b) for i, b in zip(ids[mask], buckets[mask])}
        return out.append_column(
            "bucket", pa.array([b_of[int(v)] for v in out.column("vec_id").to_pylist()],
                               type=pa.int64())
        )

    partials = ds.map_batches(bucketed, batch_format="pyarrow")
    t = pa.concat_tables(ray.get(partials.to_arrow_refs()))
    q = t.column("query_id").to_numpy()
    v = t.column("vec_id").to_numpy()
    s = t.column("sim").to_numpy()
    b = t.column("bucket").to_numpy()
    rows = []
    for qi in range(qv.shape[0]):
        m = (q == qi) & np.array([int(x) in allowed[qi] for x in b])
        order = np.lexsort((v[m], -s[m]))[:k]
        for r, j in enumerate(order, 1):
            rows.append((qi, r, int(v[m][j]), float(s[m][j])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "sim": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
