"""Product Quantization (PQ) — vector compression for embedding search at
corpus scale (no reference analog: LLM-ops item; the design is Jégou, Douze
& Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI 2011:
§II product quantizer, §IV ADC asymmetric distance computation).

Why it matters at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ
code at m=4 subspaces × 256 codewords would be 4 bytes — a 64× compression
that turns an exhaustive scan from disk-bound into memory-bandwidth-bound
table-lookup sums. Combined with the IVF coarse stage (ops/ivf.py) this is
IVFADC — the standard billion-scale ANN layout.

Ray-Data-first shapes:

- :func:`seed_codebooks` — deterministic, SQL-re-derivable codebooks: the
  ``k`` lowest-id vectors' subspace slices. Distributed min-k partial per
  batch + tiny driver merge (bytes moved ≈ k × n_blocks rows, never the
  corpus). This is the gate/oracle path, mirroring ops/semdedup.py's seed
  clusters; :func:`train_pq` is the pluggable real path.

- :func:`train_pq` — per-subspace Lloyd k-means, ALL ``m`` subspaces
  trained in the SAME ``map_batches`` pass per iteration (one corpus read
  per iteration, not m): each batch emits per (subspace, code) sum/count
  partials with the codebooks broadcast via ``ray.put``; the driver reduce
  touches only the tiny (m, k, dsub) tensor. Deterministic: seeded from
  :func:`seed_codebooks`, no RNG.

- :func:`pq_encode` — ONE stateless ``map_batches``: per subspace,
  ``argmin ||x_sub - c_j||²`` vectorized as ``-2 x@C.T + ||C||²`` (the
  ``||x||²`` term is constant per row and cannot change the argmin);
  ties → lowest code id (np.argmin first-occurrence). Output is flat
  int64 code columns ``c0..c{m-1}`` next to the id — a 100 TB encode is
  embarrassingly parallel and writes a table ~64× smaller than its input.

- :func:`adc_topk` — asymmetric distance: the query stays un-quantized;
  per query a tiny (m, k) table of squared L2 distances to every codeword
  is broadcast, and a code's distance is ``sum_s table[s, code_s]`` —
  pure fancy-indexing over the code columns, zero vector math in the scan.
  Per-batch partial top-k + tiny driver merge (the TopDocs.Merge partial+
  final pattern, SURVEY §2.8). Ties: (distance asc, vec_id asc).

Every step is exactly re-derivable in SQL from the seed codebooks, so BOTH
gate queries (``pq_codes``, ``knn_pq_adc``) are oracle-graded — the
approximate path itself, not a degenerate configuration of it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    import pyarrow.compute as pc

    flat = pc.list_flatten(batch.column(vec_col)).to_numpy().astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def seed_codebooks(ds, m: int = 4, k: int = 16,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """Deterministic (m, k, dsub) float64 codebooks: codeword j of subspace
    s = the subspace-s slice of the j-th lowest-id vector. Distributed
    min-k partial (ids + vectors of each batch's k smallest) + driver
    merge — the same narrow-seed shape as ivf.train_centroids."""
    from lucenenet_ray.util.tables import dataset_to_table

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kk = min(k, len(ids))
        part = np.argpartition(ids, kk - 1)[:kk] if kk < len(ids) else \
            np.arange(len(ids))
        return batch.take(pa.array(np.sort(part)))

    seed_t = dataset_to_table(
        ds.map_batches(seed_partial, batch_format="pyarrow"), schema=None)
    order = np.argsort(seed_t.column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64), kind="stable")[:k]
    seeds = _to_matrix(seed_t.take(pa.array(order)), vec_col)  # (k, dim)
    dim = seeds.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # (m, k, dsub): codebook s = all seeds' columns [s*dsub, (s+1)*dsub)
    return np.stack([seeds[:, s * dsub:(s + 1) * dsub] for s in range(m)])


def train_pq(ds, m: int = 4, k: int = 16, n_iters: int = 5,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> np.ndarray:
    """Per-subspace Lloyd k-means, all subspaces in one pass per iteration.
    Returns (m, k, dsub) float64 codebooks. Empty cells keep their previous
    codeword (the ivf.train_centroids convention)."""
    import ray

    from lucenenet_ray.util.tables import dataset_to_table

    books = seed_codebooks(ds, m=m, k=k, vec_col=vec_col, id_col=id_col)
    dsub = books.shape[2]
    for _ in range(n_iters):
        bref = ray.put(books)

        def partials(batch: pa.Table) -> pa.Table:
            b = ray.get(bref)  # (m, k, dsub)
            ids = batch.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            x = _to_matrix(batch, vec_col)
            # ascending-id accumulation: the partial must not depend on
            # row order within the block
            o = np.argsort(ids, kind="stable")
            x = x[o]
            bkey = int(ids.min()) if len(ids) else -1
            rows_s, rows_c, rows_n, rows_sum = [], [], [], []
            for s in range(b.shape[0]):
                xs = x[:, s * dsub:(s + 1) * dsub]
                c = b[s]
                d2 = -2.0 * (xs @ c.T) + (c * c).sum(axis=1)
                assign = np.argmin(d2, axis=1)
                sums = np.zeros_like(c)
                np.add.at(sums, assign, xs)
                counts = np.bincount(assign, minlength=c.shape[0])
                rows_s.extend([s] * c.shape[0])
                rows_c.extend(range(c.shape[0]))
                rows_n.extend(counts.tolist())
                rows_sum.extend(list(sums))
            return pa.table({
                "bkey": pa.array(
                    np.full(len(rows_s), bkey), type=pa.int64()),
                "s": pa.array(rows_s, type=pa.int64()),
                "code": pa.array(rows_c, type=pa.int64()),
                "count": pa.array(rows_n, type=pa.int64()),
                "sum": pa.array(rows_sum, type=pa.list_(pa.float64())),
            })

        t = dataset_to_table(
            ds.map_batches(partials, batch_format="pyarrow"), schema=None)
        import pyarrow.compute as pc

        ss = t.column("s").to_numpy()
        cc = t.column("code").to_numpy()
        nn = t.column("count").to_numpy()
        bkeys = t.column("bkey").to_numpy()
        sums = pc.list_flatten(t.column("sum")).to_numpy().reshape(
            len(ss), dsub)
        # canonical accumulation order (s, code, block-min-id): float64
        # sums must not depend on which block finished first
        o = np.lexsort((bkeys, cc, ss))
        ss, cc, nn, sums = ss[o], cc[o], nn[o], sums[o]
        new = np.zeros_like(books)
        tot = np.zeros((books.shape[0], books.shape[1]), dtype=np.int64)
        np.add.at(new, (ss, cc), sums)
        np.add.at(tot, (ss, cc), nn)
        keep = tot == 0
        with np.errstate(invalid="ignore"):
            new = new / np.maximum(tot, 1)[:, :, None]
        new[keep] = books[keep]
        books = new
    return books


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """Encode every vector → Dataset with int64 columns ``c0..c{m-1}``
    (lowest-code tie-break) alongside ``id_col``. One stateless
    map_batches; the vector column is dropped from the output."""
    import ray

    bref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def encode(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        m, _, dsub = b.shape
        x = _to_matrix(batch, vec_col)
        cols = {id_col: batch.column(id_col)}
        for s in range(m):
            xs = x[:, s * dsub:(s + 1) * dsub]
            c = b[s]
            d2 = -2.0 * (xs @ c.T) + (c * c).sum(axis=1)
            cols[f"c{s}"] = pa.array(np.argmin(d2, axis=1).astype(np.int64),
                                     type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(encode, batch_format="pyarrow")


def coarse_seeds(ds, n_lists: int = 8, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> np.ndarray:
    """Deterministic (n_lists, dim) float64 coarse centroids for the gate
    path: the n_lists lowest-id vectors, UN-normalized (the PQ family is
    L2 end-to-end, unlike ops/ivf.py's cosine IVF). ivf.train_centroids
    remains the pluggable trained path."""
    books = seed_codebooks(ds, m=1, k=n_lists, vec_col=vec_col,
                           id_col=id_col)
    return books[0]


def build_ivfpq_index(ds, out_path: str, coarse: np.ndarray,
                      codebooks: np.ndarray, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> str:
    """IVFADC build (Jégou et al. 2011 §V, non-residual variant — codes
    quantize the raw vector, not the residual; documented delta): ONE
    map_batches assigns each vector to its L2-nearest coarse list AND
    PQ-encodes it, then hive-partitions the (id, codes) table by list.
    The raw vector column never reaches the index — the on-disk artifact
    is the ~64×-compressed code table, pruned at query time by list."""
    import ray

    cref = ray.put(np.asarray(coarse, dtype=np.float64))
    bref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def assign_encode(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        b = ray.get(bref)
        m, _, dsub = b.shape
        x = _to_matrix(batch, vec_col)
        d2 = -2.0 * (x @ c.T) + (c * c).sum(axis=1)
        lid = np.argmin(d2, axis=1).astype(np.int64)
        cols = {id_col: batch.column(id_col)}
        for s in range(m):
            xs = x[:, s * dsub:(s + 1) * dsub]
            cw = b[s]
            ds2 = -2.0 * (xs @ cw.T) + (cw * cw).sum(axis=1)
            cols[f"c{s}"] = pa.array(
                np.argmin(ds2, axis=1).astype(np.int64), type=pa.int64())
        cols["list"] = pa.array(lid, type=pa.int64())
        cols["list_val"] = pa.array(lid, type=pa.int64())
        return pa.table(cols)

    ds.map_batches(assign_encode, batch_format="pyarrow").write_parquet(
        out_path, partition_cols=["list"])
    return out_path


def knn_ivfpq(index_path: str, coarse: np.ndarray, codebooks: np.ndarray,
              query_vectors: np.ndarray, k: int = 10, nprobe: int = 2,
              id_col: str = "vec_id"):
    """IVFADC query: route each query to its nprobe L2-closest coarse
    lists (ties → lower list id), read ONLY those lists' code fragments
    (genuine partition pruning — the knn_ivf_pruned contract), ADC-scan
    the codes with per-query list masks, tie-aware partial top-k, tiny
    driver merge. Returns (table(query_id, rank, vec_id), n_lists_read,
    n_lists_total)."""
    import glob as _glob
    import os

    import ray
    import ray.data as rd

    from lucenenet_ray.util.tables import dataset_to_table

    c = np.asarray(coarse, dtype=np.float64)
    b = np.asarray(codebooks, dtype=np.float64)
    m, kcw, dsub = b.shape
    q = np.asarray(query_vectors, dtype=np.float64)
    qd2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)  # (Q, L)
    probe = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]
    allowed = [np.sort(p.astype(np.int64)) for p in probe]
    union_allowed = sorted({int(x) for p in allowed for x in p})
    all_dirs = sorted(_glob.glob(os.path.join(index_path, "list=*")))
    present = {int(os.path.basename(d).split("=")[1]): d for d in all_dirs}
    read_dirs = [present[x] for x in union_allowed if x in present]
    empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                      "rank": pa.array([], type=pa.int64()),
                      "vec_id": pa.array([], type=pa.int64())})
    if not read_dirs:
        return empty, 0, len(all_dirs)
    files = [f for d in read_dirs
             for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
    tables = np.empty((q.shape[0], m, kcw), dtype=np.float64)
    for s in range(m):
        qs = q[:, s * dsub:(s + 1) * dsub]
        diff = qs[:, None, :] - b[s][None, :, :]
        tables[:, s, :] = (diff * diff).sum(axis=2)
    tref = ray.put(tables)
    aref = ray.put(allowed)

    def partial(batch: pa.Table) -> pa.Table:
        tabs = ray.get(tref)
        allowed_ = ray.get(aref)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lst = batch.column("list_val").to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = np.stack([
            batch.column(f"c{s}").to_numpy(zero_copy_only=False)
            for s in range(m)], axis=1)
        out_q, out_id, out_d = [], [], []
        srange = np.arange(m)
        for qi in range(tabs.shape[0]):
            msk = np.isin(lst, allowed_[qi])
            if not msk.any():
                continue
            d = tabs[qi][srange[None, :], codes[msk]].sum(axis=1)
            sub_ids = ids[msk]
            kk = min(k, len(sub_ids))
            order = np.lexsort((sub_ids, d))[:kk]  # structural-tie-aware
            out_q.extend([qi] * len(order))
            out_id.extend(sub_ids[order].tolist())
            out_d.extend(d[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_id, type=pa.int64()),
            "dist": pa.array(out_d, type=pa.float64()),
        })

    ds = rd.read_parquet(files, columns=[id_col, "list_val"] +
                         [f"c{s}" for s in range(m)])
    t = dataset_to_table(
        ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                          ("dist", pa.float64())]))
    qv = t.column("query_id").to_numpy()
    vv = t.column("vec_id").to_numpy()
    dd = t.column("dist").to_numpy()
    rows = []
    for qi in np.unique(qv):
        msk = qv == qi
        order = np.lexsort((vv[msk], dd[msk]))[:k]
        for r, j in enumerate(order, 1):
            rows.append((int(qi), r, int(vv[msk][j])))
    out = pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "rank": pa.array([r[1] for r in rows], type=pa.int64()),
        "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
    })
    return out, len(read_dirs), len(all_dirs)


def adc_topk(codes_ds, codebooks: np.ndarray, query_vectors: np.ndarray,
             k: int = 10, id_col: str = "vec_id") -> pa.Table:
    """ADC top-k over an encoded dataset → pa.Table (query_id, rank,
    vec_id). Distance(q, x) = sum_s ||q_sub - codebook[s][code_s(x)]||²;
    the (Q, m, k) distance-table tensor is broadcast once and the scan is
    table-lookup sums over the code columns."""
    import ray

    b = np.asarray(codebooks, dtype=np.float64)
    m, kcw, dsub = b.shape
    q = np.asarray(query_vectors, dtype=np.float64)
    # tables[qi, s, j] = ||q_sub - c_j||² (exact float64, position order)
    tables = np.empty((q.shape[0], m, kcw), dtype=np.float64)
    for s in range(m):
        qs = q[:, s * dsub:(s + 1) * dsub]
        diff = qs[:, None, :] - b[s][None, :, :]
        tables[:, s, :] = (diff * diff).sum(axis=2)
    tref = ray.put(tables)

    def partial(batch: pa.Table) -> pa.Table:
        tabs = ray.get(tref)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = np.stack([
            batch.column(f"c{s}").to_numpy(zero_copy_only=False)
            for s in range(m)], axis=1)  # (n, m)
        out_q, out_id, out_d = [], [], []
        kk = min(k, len(ids))
        srange = np.arange(m)
        for qi in range(tabs.shape[0]):
            d = tabs[qi][srange[None, :], codes].sum(axis=1)  # (n,)
            # ADC ties are STRUCTURAL (vectors sharing a code tuple have
            # identical distance), so the partial-k selection itself must
            # be (dist, id)-ordered — argpartition picks arbitrarily among
            # ties and would drop lower-id tied candidates
            order = np.lexsort((ids, d))[:kk]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order].tolist())
            out_d.extend(d[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_id, type=pa.int64()),
            "dist": pa.array(out_d, type=pa.float64()),
        })

    from lucenenet_ray.util.tables import dataset_to_table

    t = dataset_to_table(
        codes_ds.map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                          ("dist", pa.float64())]))
    qv = t.column("query_id").to_numpy()
    vv = t.column("vec_id").to_numpy()
    dd = t.column("dist").to_numpy()
    rows = []
    for qi in np.unique(qv):
        msk = qv == qi
        order = np.lexsort((vv[msk], dd[msk]))[:k]
        for r, j in enumerate(order, 1):
            rows.append((int(qi), r, int(vv[msk][j])))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "rank": pa.array([r[1] for r in rows], type=pa.int64()),
        "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
    })
