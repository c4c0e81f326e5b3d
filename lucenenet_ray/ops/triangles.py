"""Distributed triangle counting over the synthesized crawl link graph —
the third classic web-graph op next to PageRank/HITS (local clustering /
link-spam signals; the MapReduce formulation is Suri & Vassilvitskii,
WWW'11 "Counting Triangles and the Curse of the Last Reducer").

Graph: the SAME md5 link synthesis as ops/graphrank.py, made undirected —
edge {a, b} exists iff either direction was emitted; multi-edges and the
self-loop bump dedup to one edge.

Exact node-iterator formulation (each triangle {x,y,z} found once per
vertex acting as wedge center, so per-node counts are triangle
memberships and total = Σ/3):

1. edge normalize: map over doc ids synthesizes out-edges, emits
   (min, max) rows; ONE ``groupby(a, b)`` dedups to the edge set E;
2. wedges: adjacency per node via ``groupby(u)`` over both directions;
   each group emits its neighbor pairs (v < w) keyed (v, w) — the
   degree² blowup is the algorithm's known cost, bounded by the hub
   cap of the synthetic graph (the "last reducer" of the paper; at a
   real 100 TB graph the standard mitigation is degree-ordered wedges,
   noted below);
3. close: wedge rows union E rows, ONE ``groupby(a, b)`` — groups
   holding an E row emit one hit per wedge center;
4. fold: ``groupby(center).count`` = per-node triangle counts.

Every step is integer counting over set-unique rows — exact at any
parallelism. Scale note: step 2 as written emits wedges at EVERY vertex;
the degree-ordered variant (emit wedges only at the lowest-degree vertex)
cuts the blowup to O(m^{3/2}) total and needs only a broadcast degree
map — same pipeline, different wedge filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.graphrank import _out_edges


def _undirected_rows(t: pa.Table, n_nodes: int,
                     id_col: str = "doc_id") -> pa.Table:
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    src, dst, _ = _out_edges(ids, n_nodes)
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    # batch-local dedup (the combiner)
    pair = a * np.int64(n_nodes) + b
    uniq = np.unique(pair)
    return pa.table({
        "a": pa.array(uniq // n_nodes, type=pa.int64()),
        "b": pa.array(uniq % n_nodes, type=pa.int64()),
    })


def triangle_counts(ds, n_nodes: int, id_col: str = "doc_id") -> pa.Table:
    """(node, n_triangles) for every node in >= 1 triangle, node-sorted."""
    edges = (ds.map_batches(
        _undirected_rows, fn_kwargs={"n_nodes": n_nodes, "id_col": id_col},
        batch_format="pyarrow")
        .groupby(["a", "b"]).count().materialize())
        # materialized: the edge SET (edge-scale, not corpus-scale) feeds
        # both the wedge and the close paths without re-running the shuffle

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), type=pa.int64()),
        })

    def wedges(group: pa.Table) -> pa.Table:
        u = int(group.column("u")[0].as_py())
        nb = np.unique(group.column("nbr").to_numpy(zero_copy_only=False))
        k = len(nb)
        if k < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "center": pa.array([], type=pa.int64())})
        ii, jj = np.triu_indices(k, 1)
        return pa.table({
            "a": pa.array(nb[ii], type=pa.int64()),
            "b": pa.array(nb[jj], type=pa.int64()),
            "center": pa.array(np.full(len(ii), u, dtype=np.int64)),
        })

    wedge_ds = (edges.map_batches(both_dirs, batch_format="pyarrow")
                .groupby("u").map_groups(wedges, batch_format="pyarrow"))
    edge_tagged = edges.map_batches(
        lambda t: pa.table({
            "a": t.column("a"),
            "b": t.column("b"),
            "center": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
        }), batch_format="pyarrow")

    def close(group: pa.Table) -> pa.Table:
        centers = group.column("center").to_numpy(zero_copy_only=False)
        if not (centers == -1).any():
            return pa.table({"center": pa.array([], type=pa.int64())})
        hits = centers[centers >= 0]
        return pa.table({"center": pa.array(hits, type=pa.int64())})

    agg = (wedge_ds.union(edge_tagged)
           .groupby(["a", "b"]).map_groups(close, batch_format="pyarrow")
           .groupby("center").count().to_pandas())
    agg = agg.sort_values("center")
    return pa.table({
        "node": pa.array(agg["center"].to_numpy(dtype=np.int64)),
        "n_triangles": pa.array(agg["count()"].to_numpy(dtype=np.int64)),
    })


def kcore_peel(ds, n_nodes: int, k: int = 3, rounds: int = 6,
               id_col: str = "doc_id") -> pa.Table:
    """Bounded-round k-core peeling (Seidman 1983 coreness; the
    distributed formulation is Montresor et al. 2013's iterative peel):
    round r computes every surviving node's degree in the subgraph
    induced by the round-(r-1) survivor set and drops nodes below k —
    after enough rounds the fixpoint IS the k-core; the gate runs a
    FIXED ``rounds`` so the SQL oracle can unroll the identical CTE
    chain (bounded-round semantics, documented rather than hidden).

    Returns (node, deg) for round-``rounds`` survivors with their final
    induced degree, node-sorted. Shape per round: ONE combiner-style
    groupby over the (deduped, materialized-once) edge set filtered by
    the broadcast survivor bitmap (n_nodes bits; the documented
    hash-partitioned alternative applies past broadcast scale)."""
    import ray

    edges = (ds.map_batches(
        _undirected_rows, fn_kwargs={"n_nodes": n_nodes, "id_col": id_col},
        batch_format="pyarrow")
        .groupby(["a", "b"]).count().materialize())

    alive = np.ones(n_nodes, dtype=bool)
    deg = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(rounds):
        aref = ray.put(alive)

        def deg_partial(t: pa.Table) -> pa.Table:
            al = ray.get(aref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            keep = al[a] & al[b]
            ends = np.concatenate([a[keep], b[keep]])
            uniq, cnt = np.unique(ends, return_counts=True)
            return pa.table({
                "node": pa.array(uniq, type=pa.int64()),
                "d": pa.array(cnt.astype(np.int64), type=pa.int64()),
            })

        deg = np.zeros(n_nodes, dtype=np.int64)
        for ref in (edges.map_batches(deg_partial, batch_format="pyarrow")
                    .groupby("node").sum("d").to_arrow_refs()):
            t = ray.get(ref)
            if t.num_rows and "node" in t.schema.names:
                nd = t.column("node").to_numpy(zero_copy_only=False)
                dv = t.column("sum(d)").to_numpy(zero_copy_only=False)
                deg[nd] += dv
        alive = alive & (deg >= k)
    nodes = np.flatnonzero(alive)
    return pa.table({
        "node": pa.array(nodes.astype(np.int64), type=pa.int64()),
        "deg": pa.array(deg[nodes], type=pa.int64()),
    })
