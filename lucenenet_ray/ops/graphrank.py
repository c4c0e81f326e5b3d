"""Link-graph PageRank over the document corpus — the classic web-graph
quality signal (Page et al. 1999) used to weight Common-Crawl URLs in
training-data curation (e.g. the OpenWebText "karma" filter family).

Exact-integer formulation (so distribution order can never move a bit and
the gate oracle can unroll the iterations in SQL):

    base      = SCALE // N                         (uniform teleport mass)
    r_0(v)    = base
    contrib(u)= r_k(u) // outdeg(u)                (per-edge integer share)
    r_{k+1}(v)= (15 * base) // 100
                + (85 * sum_{u->v} contrib(u)) // 100

with SCALE = 10^12 — the standard damping 0.85 in fixed-point. Integer
sums are associative, so no float summation-order hazard exists anywhere.

Graph synthesis (deterministic, SQL-re-derivable, no external data): doc u
emits outdeg(u) = 1 + (u % 3) links; target j = md5_int31("link:{u}:{j}")
% N, bumped to (t+1) % N when it would self-loop. This mirrors a real
crawl frontier's skewed in-degree (md5 collisions make hubs) while staying
closed-form for the oracle.

Distributed shape (one iteration = ONE groupby shuffle):
- edges are NEVER materialized globally — each ``map_batches`` over the
  doc-id column synthesizes its batch's out-edges and emits per-batch
  PARTIAL (dst, contrib-sum) rows (the combiner: batch-local ``np.add.at``
  over int64), so the shuffle moves at most |batch-distinct dsts| rows,
  not |edges|;
- the rank vector is broadcast once per iteration via ``ray.put`` (int64,
  8 bytes/node). SCALE NOTE: at 10^12 nodes a broadcast vector no longer
  fits; the same iteration becomes a hash-partitioned join — shard ranks
  by ``node % P``, hash-partition edge partials by the same key, and run
  the add per shard (the exchange `index/build.py` already implements for
  terms). The per-iteration math and the oracle are unchanged — only the
  exchange widens.

Reference scope note: Lucene has no graph operator — this is one of the
beyond-reference ops for web-scale corpus curation (instructions: dedup /
similarity / quality families).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

SCALE = 10**12


def _out_edges(ids: np.ndarray, n_nodes: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(src, dst, outdeg-of-src) arrays for one batch of doc ids."""
    srcs, dsts, degs = [], [], []
    for u in ids.tolist():
        d = 1 + (u % 3)
        for j in range(d):
            t = md5_int31(f"link:{u}:{j}") % n_nodes
            if t == u:
                t = (t + 1) % n_nodes
            srcs.append(u)
            dsts.append(t)
            degs.append(d)
    return (np.asarray(srcs, dtype=np.int64),
            np.asarray(dsts, dtype=np.int64),
            np.asarray(degs, dtype=np.int64))


def pagerank(ds, n_nodes: int, n_iters: int = 3,
             id_col: str = "doc_id") -> np.ndarray:
    """Integer PageRank; returns the int64 rank vector indexed by node id.

    ``ds`` needs only the id column (callers should column-prune the
    read). Each iteration: map_batches emits per-batch partial (dst, sum)
    int64 rows; one ``groupby(dst).sum`` reduces them; the driver applies
    teleport+damping to the N-row aggregate (the rank vector — at
    broadcast scale by definition)."""
    import ray

    base = SCALE // n_nodes
    ranks = np.full(n_nodes, base, dtype=np.int64)
    for _ in range(n_iters):
        rref = ray.put(ranks)

        def partial(t: pa.Table) -> pa.Table:
            r = ray.get(rref)
            ids = t.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            src, dst, deg = _out_edges(ids, n_nodes)
            contrib = r[src] // deg
            # batch-local combine: ship distinct dsts, not edges
            uniq, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, contrib)
            return pa.table({
                "dst": pa.array(uniq, type=pa.int64()),
                "s": pa.array(sums, type=pa.int64()),
            })

        agg = ds.map_batches(
            partial, batch_format="pyarrow").groupby("dst").sum("s")
        new = np.full(n_nodes, (15 * base) // 100, dtype=np.int64)
        for t in agg.to_arrow_refs():
            tab = ray.get(t)
            if tab.num_rows == 0 or "dst" not in tab.schema.names:
                continue
            d = tab.column("dst").to_numpy(zero_copy_only=False)
            s = tab.column("sum(s)").to_numpy(zero_copy_only=False)
            new[d] += (85 * s) // 100
        ranks = new
    return ranks


def pagerank_topk(ds, n_nodes: int, n_iters: int = 3, k: int = 20,
                  id_col: str = "doc_id") -> pa.Table:
    """(rank_pos, node, pagerank) for the k highest-ranked nodes,
    (pagerank desc, node asc) order — integer-exact at any parallelism."""
    r = pagerank(ds, n_nodes, n_iters=n_iters, id_col=id_col)
    order = np.lexsort((np.arange(n_nodes), -r))[:k]
    return pa.table({
        "rank_pos": pa.array(range(1, len(order) + 1), type=pa.int64()),
        "node": pa.array(order.astype(np.int64), type=pa.int64()),
        "pagerank": pa.array(r[order], type=pa.int64()),
    })


# --- HITS (Kleinberg 1999, "Authoritative Sources in a Hyperlinked
# Environment") over the SAME synthesized link graph as pagerank().
#
# Exact-integer formulation: instead of the paper's L2 normalization
# (irrational, summation-order-sensitive), each half-step renormalizes by
# the vector MAX in fixed point —
#
#     a_raw(v) = sum_{u->v} h_k(u)         a_{k+1}(v) = (S * a_raw(v)) // max(a_raw)
#     h_raw(u) = sum_{u->v} a_{k+1}(v)     h_{k+1}(u) = (S * h_raw(u)) // max(h_raw)
#
# with S = 10^6. Max and integer floor-division are order-independent, so
# the result is bit-identical at any parallelism and the SQL oracle can
# unroll the iterations. S is sized so S * a_raw <= 10^6 * (10^6 * max
# in-degree) stays far inside int64 even at 10^6-degree hubs.
HITS_SCALE = 10**6


def hits(ds, n_nodes: int, n_iters: int = 3,
         id_col: str = "doc_id") -> tuple[np.ndarray, np.ndarray]:
    """(authority, hub) int64 vectors indexed by node id.

    Distributed shape per iteration: the authority half is ONE
    groupby(dst).sum shuffle of batch-combined partials (hub vector
    broadcast via ``ray.put``, same pattern as :func:`pagerank`); the hub
    half is shuffle-FREE — a node's out-edges are synthesized inside its
    own batch, so ``h_raw(u)`` is a batch-local dot product against the
    broadcast authority vector. Driver state is the two N-row rank
    vectors (broadcast-scale by definition; above ~10^9 nodes the same
    iteration becomes the hash-partitioned exchange noted in pagerank)."""
    import ray

    h = np.full(n_nodes, HITS_SCALE, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(n_iters):
        href = ray.put(h)

        def auth_partial(t: pa.Table) -> pa.Table:
            hv = ray.get(href)
            ids = t.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            src, dst, _deg = _out_edges(ids, n_nodes)
            uniq, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, hv[src])
            return pa.table({
                "dst": pa.array(uniq, type=pa.int64()),
                "s": pa.array(sums, type=pa.int64()),
            })

        a_raw = np.zeros(n_nodes, dtype=np.int64)
        agg = ds.map_batches(
            auth_partial, batch_format="pyarrow").groupby("dst").sum("s")
        for ref in agg.to_arrow_refs():
            tab = ray.get(ref)
            if tab.num_rows == 0 or "dst" not in tab.schema.names:
                continue
            d = tab.column("dst").to_numpy(zero_copy_only=False)
            s = tab.column("sum(s)").to_numpy(zero_copy_only=False)
            a_raw[d] += s
        mx = int(a_raw.max())
        a = (HITS_SCALE * a_raw) // mx if mx > 0 else a_raw

        aref = ray.put(a)

        def hub_partial(t: pa.Table) -> pa.Table:
            av = ray.get(aref)
            ids = t.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            src, dst, _deg = _out_edges(ids, n_nodes)
            uniq, inv = np.unique(src, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, av[dst])
            return pa.table({
                "u": pa.array(uniq, type=pa.int64()),
                "s": pa.array(sums, type=pa.int64()),
            })

        h_raw = np.zeros(n_nodes, dtype=np.int64)
        for ref in ds.map_batches(
                hub_partial, batch_format="pyarrow").to_arrow_refs():
            tab = ray.get(ref)
            if tab.num_rows == 0 or "u" not in tab.schema.names:
                continue
            u = tab.column("u").to_numpy(zero_copy_only=False)
            s = tab.column("s").to_numpy(zero_copy_only=False)
            h_raw[u] += s
        mx = int(h_raw.max())
        h = (HITS_SCALE * h_raw) // mx if mx > 0 else h_raw
    return a, h


def hits_topk(ds, n_nodes: int, n_iters: int = 3, k: int = 20,
              id_col: str = "doc_id") -> pa.Table:
    """(rank_pos, node, authority, hub) for the k highest-authority nodes,
    (authority desc, node asc) order — integer-exact at any parallelism."""
    a, h = hits(ds, n_nodes, n_iters=n_iters, id_col=id_col)
    order = np.lexsort((np.arange(n_nodes), -a))[:k]
    return pa.table({
        "rank_pos": pa.array(range(1, len(order) + 1), type=pa.int64()),
        "node": pa.array(order.astype(np.int64), type=pa.int64()),
        "authority": pa.array(a[order], type=pa.int64()),
        "hub": pa.array(h[order], type=pa.int64()),
    })


def trustrank(ds, n_nodes: int, n_iters: int = 3, seed_mod: int = 50,
              id_col: str = "doc_id") -> np.ndarray:
    """Integer TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004
    "Combating Web Spam with TrustRank"): PageRank with the teleport
    vector concentrated on a trusted seed set — here the deterministic
    seed rule ``node % seed_mod == 0`` (SQL-re-derivable; a real
    deployment plugs in its curated seed list the same way).

    Same int64 fixed-point discipline and per-iteration shape as
    ``pagerank``: per-batch partial (dst, sum) rows, ONE groupby, driver
    applies damping + seed-only teleport to the N-row vector."""
    import ray

    seed_mask = (np.arange(n_nodes, dtype=np.int64) % seed_mod) == 0
    n_seeds = int(seed_mask.sum())
    base = SCALE // n_seeds
    t15 = (15 * base) // 100
    ranks = np.where(seed_mask, base, np.int64(0)).astype(np.int64)
    for _ in range(n_iters):
        rref = ray.put(ranks)

        def partial(t: pa.Table) -> pa.Table:
            r = ray.get(rref)
            ids = t.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            src, dst, deg = _out_edges(ids, n_nodes)
            contrib = r[src] // deg
            uniq, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, contrib)
            return pa.table({
                "dst": pa.array(uniq, type=pa.int64()),
                "s": pa.array(sums, type=pa.int64()),
            })

        agg = ds.map_batches(
            partial, batch_format="pyarrow").groupby("dst").sum("s")
        new = np.where(seed_mask, np.int64(t15), np.int64(0)).astype(np.int64)
        for t in agg.to_arrow_refs():
            tab = ray.get(t)
            if tab.num_rows == 0 or "dst" not in tab.schema.names:
                continue
            d = tab.column("dst").to_numpy(zero_copy_only=False)
            s = tab.column("sum(s)").to_numpy(zero_copy_only=False)
            new[d] += (85 * s) // 100
        ranks = new
    return ranks


def trustrank_topk(ds, n_nodes: int, n_iters: int = 3, k: int = 20,
                   seed_mod: int = 50, id_col: str = "doc_id") -> pa.Table:
    """(rank_pos, node, trust) for the k most-trusted nodes,
    (trust desc, node asc) — integer-exact at any parallelism."""
    r = trustrank(ds, n_nodes, n_iters=n_iters, seed_mod=seed_mod,
                  id_col=id_col)
    order = np.lexsort((np.arange(n_nodes), -r))[:k]
    return pa.table({
        "rank_pos": pa.array(range(1, len(order) + 1), type=pa.int64()),
        "node": pa.array(order.astype(np.int64), type=pa.int64()),
        "trust": pa.array(r[order], type=pa.int64()),
    })
