"""HNSW approximate nearest neighbor (Malkov & Yashunin 2016,
arXiv:1603.09320) — the graph member of the ANN family (brute / LSH / IVF /
PQ / SQ8 live in knn.py, ivf.py, pq.py, sq.py).

Distributed shape: an HNSW graph is inherently a shared mutable structure,
so the scale path is the segment model production vector stores use:
hash-partition vectors by ``vec_id % num_shards``, each shard ACTOR builds
its own graph once in ``__init__`` (parallel across shards), queries
broadcast to every shard, and the per-shard top-k partials (k rows each)
merge on the driver. Every shard is searched, so recall matches a
single-graph HNSW of shard size; search cost per query is
``S · O(ef · M · d)``. At gate scale each actor filters its rows from the
shared block refs; at 100 TB you'd hash-shuffle once into per-shard
parquet and point each actor at its fragment (same actor code).

Determinism (graph identical for a fixed shard count, any arrival order):
vectors are sorted by id before build; the level of id is
``floor(-ln(u) · mL)`` with the md5 uniform ``u = (md5_int60(id)+1)/2^60``;
neighbor selection is closest-M (the paper's basic variant) with
(sim desc, id asc) tie-break everywhere.

Exactness gate: with ``M ≥ n`` and ``ef_construction ≥ n`` no neighbor
list is ever pruned, layer 0 is the complete graph, and search is exact —
the ``knn_hnsw_full`` driver query runs THIS code path degenerately and
must hash-match the brute-force SQL oracle (the same trick as
``knn_lsh_full`` / ``knn_ivf_full``); real approximate configs are
recall-asserted in pytest.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31


def _level_of(vid: int, m_l: float) -> int:
    # md5 uniform in (0, 1]: never 0, so log is finite
    u = (md5_int31(f"hnsw-l-{vid}") + 1.0) / 2147483649.0
    return int(-math.log(u) * m_l)


class HnswIndex:
    """Single-shard HNSW over L2-normalized vectors (cosine similarity)."""

    def __init__(self, M: int = 8, ef_construction: int = 64):
        self.M = M
        self.M0 = 2 * M
        self.efc = max(ef_construction, M)
        self.m_l = 1.0 / math.log(max(M, 2))
        self.ids: np.ndarray | None = None
        self.vecs: np.ndarray | None = None
        # neighbors[level][node] -> np.ndarray of node indices
        self.neighbors: list[list[np.ndarray]] = []
        self.entry: int = -1
        self.max_level: int = -1

    # -- construction -----------------------------------------------------

    def build(self, ids: np.ndarray, vecs: np.ndarray) -> "HnswIndex":
        order = np.argsort(ids)
        self.ids = ids[order].astype(np.int64)
        v = vecs[order].astype(np.float64)
        self.vecs = v / np.linalg.norm(v, axis=1, keepdims=True)
        n = len(self.ids)
        levels = [_level_of(int(self.ids[i]), self.m_l) for i in range(n)]
        top = max(levels) if n else -1
        self.neighbors = [
            [np.empty(0, dtype=np.int64) for _ in range(n)]
            for _ in range(top + 1)
        ]
        for i in range(n):
            self._insert(i, levels[i])
        return self

    def _sims_to(self, i_or_vec, nodes: np.ndarray) -> np.ndarray:
        q = (self.vecs[i_or_vec] if isinstance(i_or_vec, (int, np.integer))
             else i_or_vec)
        return self.vecs[nodes] @ q

    def _search_layer(self, q: np.ndarray, entry: int, ef: int,
                      level: int) -> list[tuple[float, int]]:
        """Best-first search at one layer → [(sim, node)] best-first sorted,
        up to ef results; (sim desc, id asc) tie-break."""
        nbrs = self.neighbors[level]
        sim0 = float(self.vecs[entry] @ q)
        visited = {entry}
        # candidates: max-heap by sim (min-heap on (-sim, id))
        cand = [(-sim0, int(self.ids[entry]), entry)]
        # results: min-heap on (sim, -id) so the WORST result pops first
        res = [(sim0, -int(self.ids[entry]), entry)]
        while cand:
            negs, _, c = heapq.heappop(cand)
            if -negs < res[0][0] and len(res) >= ef:
                break
            nxt = nbrs[c]
            if len(nxt) == 0:
                continue
            new = np.array([x for x in nxt if x not in visited],
                           dtype=np.int64)
            if len(new) == 0:
                continue
            visited.update(new.tolist())
            sims = self._sims_to(q, new)
            worst = res[0][0]
            for s, x in zip(sims.tolist(), new.tolist()):
                if len(res) < ef or s > worst:
                    heapq.heappush(cand, (-s, int(self.ids[x]), x))
                    heapq.heappush(res, (s, -int(self.ids[x]), x))
                    if len(res) > ef:
                        heapq.heappop(res)
                    worst = res[0][0]
        out = [(s, x) for s, _, x in res]
        out.sort(key=lambda t: (-t[0], self.ids[t[1]]))
        return out

    def _insert(self, i: int, level: int) -> None:
        if self.entry < 0:
            self.entry = i
            self.max_level = level
            return
        q = self.vecs[i]
        ep = self.entry
        for lv in range(self.max_level, level, -1):
            ep = self._search_layer(q, ep, 1, lv)[0][1]
        for lv in range(min(self.max_level, level), -1, -1):
            found = self._search_layer(q, ep, self.efc, lv)
            mmax = self.M0 if lv == 0 else self.M
            sel = [x for _, x in found[:self.M]]
            self.neighbors[lv][i] = np.array(sel, dtype=np.int64)
            for x in sel:
                cur = self.neighbors[lv][x]
                merged = np.append(cur, i)
                if len(merged) > mmax:
                    sims = self._sims_to(x, merged)
                    order = np.lexsort((self.ids[merged], -sims))
                    merged = merged[order[:mmax]]
                self.neighbors[lv][x] = merged
            ep = found[0][1]
        if level > self.max_level:
            self.max_level = level
            self.entry = i

    # -- query -------------------------------------------------------------

    def search(self, q: np.ndarray, k: int, ef: int = 0
               ) -> list[tuple[int, float]]:
        """Top-k (vec_id, sim), sim desc / id asc; ef defaults to max(k,efc)."""
        if self.entry < 0:
            return []
        ef = max(ef or self.efc, k)
        qn = np.asarray(q, dtype=np.float64)
        qn = qn / np.linalg.norm(qn)
        ep = self.entry
        for lv in range(self.max_level, 0, -1):
            ep = self._search_layer(qn, ep, 1, lv)[0][1]
        found = self._search_layer(qn, ep, ef, 0)
        return [(int(self.ids[x]), s) for s, x in found[:k]]


import ray  # noqa: E402  (actor decorator below)


@ray.remote
class _HnswShard:
    """Owns the ``vec_id % num_shards == shard`` slice; graph built once."""

    def __init__(self, block_refs: list, shard: int, num_shards: int,
                 M: int, ef_construction: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import pyarrow.compute as pc

        ids_parts, vec_parts = [], []
        for ref in block_refs:
            t = ray.get(ref)
            if t.num_rows == 0 or id_col not in t.schema.names:
                continue
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            keep = (ids % num_shards) == shard
            if not keep.any():
                continue
            dim = len(t.column(vec_col)[0])
            flat = pc.list_flatten(t.column(vec_col)).to_numpy()
            ids_parts.append(ids[keep].astype(np.int64))
            vec_parts.append(flat.reshape(len(ids), dim)[keep])
        ids = (np.concatenate(ids_parts) if ids_parts
               else np.empty(0, dtype=np.int64))
        vecs = (np.concatenate(vec_parts) if vec_parts
                else np.empty((0, 1)))
        self.index = HnswIndex(M, ef_construction)
        if len(ids):
            self.index.build(ids, vecs)

    def search_many(self, queries: np.ndarray, k: int,
                    ef: int) -> list[list[tuple[int, float]]]:
        return [self.index.search(q, k, ef) for q in queries]


def build_hnsw_shards(ds, num_shards: int = 2, M: int = 8,
                      ef_construction: int = 64, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> list:
    """Parallel per-shard graph build; returns the shard actor handles."""
    refs = ds.to_arrow_refs()
    return [
        _HnswShard.remote(refs, s, num_shards, M, ef_construction,
                          vec_col, id_col)
        for s in range(num_shards)
    ]


def knn_hnsw(shards: list, query_vectors: np.ndarray, k: int = 10,
             ef: int = 0) -> pa.Table:
    """Fan out to every shard, merge k-row partials → (query_id, rank,
    vec_id, sim) with the knn_bruteforce tie-breaks."""
    qv = np.asarray(query_vectors, dtype=np.float64)
    parts = ray.get([s.search_many.remote(qv, k, ef) for s in shards])
    out_q, out_r, out_id, out_s = [], [], [], []
    for qi in range(len(qv)):
        merged = [hit for p in parts for hit in p[qi]]
        merged.sort(key=lambda t: (-t[1], t[0]))
        for r, (vid, sim) in enumerate(merged[:k], 1):
            out_q.append(qi)
            out_r.append(r)
            out_id.append(vid)
            out_s.append(sim)
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "rank": pa.array(out_r, type=pa.int64()),
        "vec_id": pa.array(out_id, type=pa.int64()),
        "sim": pa.array(out_s, type=pa.float64()),
    })
