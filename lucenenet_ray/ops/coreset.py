"""K-center greedy coreset selection over the embedding table — the
farthest-point-sampling data-pruning rule (Sener & Savarese, ICLR 2018
"Active Learning for CNNs: A Core-Set Approach"; used at corpus scale to
pick maximally-diverse training subsets): starting from a seed, each
round adds the vector FARTHEST from the current selected set (here:
minimizing the maximum cosine similarity — the cosine-space k-center
objective), ties broken by lowest vec_id.

Distributed shape per round: the selected matrix (R × d, tiny) is
broadcast via ``ray.put``; one streaming ``map_batches`` computes each
batch's max-similarity-to-selected (vectorized matmul over normalized
float64 — the ops/knn.py kernel, whose float parity with DuckDB
``list_cosine_similarity`` is gate-proven) and emits a per-batch partial
argmin; the driver merges blocks' candidates. R rounds = R streaming
passes, zero shuffles, driver state = R ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def kcenter_greedy(ds, rounds: int = 8, seed_id: int = 0,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> pa.Table:
    """(round, vec_id) selections; round 1 is the seed."""
    import pyarrow.compute as pc
    import ray

    sel_ids = [int(seed_id)]
    sel_vecs: list[np.ndarray] = []

    def fetch_vec(target: int) -> np.ndarray:
        t = ds.filter(lambda row: row[id_col] == target) \
              .select_columns([vec_col]).take(1)
        v = np.asarray(t[0][vec_col], dtype=np.float64)
        return v / np.linalg.norm(v)

    sel_vecs.append(fetch_vec(seed_id))
    for _ in range(rounds - 1):
        smat = np.stack(sel_vecs)
        sref = ray.put((smat, tuple(sel_ids)))

        def part(t: pa.Table) -> pa.Table:
            sm, sids = ray.get(sref)
            ids = t.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(t.column(vec_col)).to_numpy().astype(
                np.float64)
            m = flat.reshape(len(ids), sm.shape[1])
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            ms = (mn @ sm.T).max(axis=1)
            mask = ~np.isin(ids, np.asarray(sids, dtype=np.int64))
            if not mask.any():
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "ms": pa.array([], type=pa.float64())})
            ids, ms = ids[mask], ms[mask]
            best = np.lexsort((ids, ms))[0]
            return pa.table({
                id_col: pa.array([int(ids[best])], type=pa.int64()),
                "ms": pa.array([float(ms[best])], type=pa.float64()),
            })

        cands_i: list[int] = []
        cands_m: list[float] = []
        for ref in ds.map_batches(part,
                                  batch_format="pyarrow").to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows and id_col in t.schema.names:
                cands_i.extend(t.column(id_col).to_pylist())
                cands_m.extend(t.column("ms").to_pylist())
        order = sorted(range(len(cands_i)),
                       key=lambda i: (cands_m[i], cands_i[i]))
        nxt = int(cands_i[order[0]])
        sel_ids.append(nxt)
        sel_vecs.append(fetch_vec(nxt))
    return pa.table({
        "round": pa.array(range(1, len(sel_ids) + 1), type=pa.int64()),
        "vec_id": pa.array(sel_ids, type=pa.int64()),
    })
