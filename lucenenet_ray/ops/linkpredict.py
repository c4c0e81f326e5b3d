"""Link-prediction and neighborhood analytics over the synthesized crawl
link graph (the SAME md5 edge synthesis as ops/graphrank.py / pagerank /
HITS / triangles — see `_out_edges`).

Two classic web-graph ops next to PageRank/triangles:

- ``neighborhood_sizes``: the exact small-radius neighborhood function
  N(u, r) — distinct nodes within distance <= r (r=1, 2), per node.  This
  is the exact variant of ANF (Palmer, Gibbons & Faloutsos, KDD'02); at
  100 TB graph scale the sketch path is HyperBall (Boldi & Vigna, 2013)
  with a HyperLogLog register per node, but the exact 2-hop form below is
  the oracle-checkable baseline and is itself distributed (wedge explode
  bounded by the hub cap, like triangle counting's step 2).

- ``resource_allocation_topk``: the Resource Allocation link-prediction
  index of Zhou, Lü & Zhang (Eur. Phys. J. B 71, 2009):
  RA(u, w) = sum over common neighbors z of 1/deg(z), ranked over
  NON-adjacent pairs.  Scores use integer fixed point
  ``SCALE // deg(z)`` summed as int64, so distribution order cannot move
  a bit and DuckDB re-derives the exact ranking (the same fixed-point
  discipline as ops/graphrank.py pagerank).

Shuffle budget: one ``groupby(a, b)`` edge dedup (shared), one
``groupby(center)`` wedge explode, one ``groupby(a, b)`` candidate fold.
The existing-edge exclusion reuses the triangle-counting "close" trick —
edge rows are union'd into the candidate groupby as marker rows, so no
driver-held edge set and no broadcast is needed at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.triangles import _undirected_rows

SCALE = 1_000_000_000


def _und_edges(ds, n_nodes: int, id_col: str = "doc_id"):
    """Deduped undirected edge Dataset (a < b), materialized once (edge
    scale, not corpus scale) so wedge and marker paths share it."""
    return (ds.map_batches(
        _undirected_rows, fn_kwargs={"n_nodes": n_nodes, "id_col": id_col},
        batch_format="pyarrow")
        .groupby(["a", "b"]).count().materialize())


def _both_dirs(t: pa.Table) -> pa.Table:
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    return pa.table({
        "u": pa.array(np.concatenate([a, b]), type=pa.int64()),
        "nbr": pa.array(np.concatenate([b, a]), type=pa.int64()),
    })


def neighborhood_sizes(ds, n_nodes: int, id_col: str = "doc_id") -> pa.Table:
    """(node, n1, n2): distinct nodes at distance exactly <= 1 and <= 2
    (self excluded), for every node with >= 1 edge; node-sorted."""
    edges = _und_edges(ds, n_nodes, id_col)

    def hop2_pairs(group: pa.Table) -> pa.Table:
        # wedge center z: every ordered pair of distinct neighbors is at
        # distance <= 2 through z
        nb = np.unique(group.column("nbr").to_numpy(zero_copy_only=False))
        k = len(nb)
        if k < 2:
            return pa.table({"src": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64()),
                             "direct": pa.array([], type=pa.int64())})
        src = np.repeat(nb, k - 1)
        w = np.concatenate([np.delete(nb, i) for i in range(k)])
        return pa.table({"src": pa.array(src, type=pa.int64()),
                         "w": pa.array(w, type=pa.int64()),
                         "direct": pa.array(np.zeros(src.size, dtype=np.int64))})

    def hop1_pairs(t: pa.Table) -> pa.Table:
        bd = _both_dirs(t)
        return pa.table({"src": bd.column("u"), "w": bd.column("nbr"),
                         "direct": pa.array(
                             np.ones(bd.num_rows, dtype=np.int64))})

    wedge_ds = (edges.map_batches(_both_dirs, batch_format="pyarrow")
                .groupby("u").map_groups(hop2_pairs, batch_format="pyarrow"))
    direct_ds = edges.map_batches(hop1_pairs, batch_format="pyarrow")

    def fold(group: pa.Table) -> pa.Table:
        src = int(group.column("src")[0].as_py())
        w = group.column("w").to_numpy(zero_copy_only=False)
        direct = group.column("direct").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array([src], type=pa.int64()),
            "n1": pa.array([len(np.unique(w[direct == 1]))], type=pa.int64()),
            "n2": pa.array([len(np.unique(w))], type=pa.int64()),
        })

    out = (wedge_ds.union(direct_ds)
           .groupby("src").map_groups(fold, batch_format="pyarrow")
           .to_pandas().sort_values("node").reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def cocitation_topk(ds, n_nodes: int, k: int = 20,
                    id_col: str = "doc_id") -> pa.Table:
    """Top-k doc pairs by co-citation count (Small, JASIS 1973): the
    number of distinct docs whose out-links contain BOTH — the classic
    relatedness signal over a citation/web graph.

    Shape: a doc's out-links are synthesized from its own id, so each
    src's full distinct out-set is batch-local — pair emission needs NO
    adjacency shuffle; ONE ``groupby(a, b).sum`` over per-batch partial
    pair counts is the only exchange (out-degree is bounded — <= 3 here,
    <= page-link caps on a real crawl — so the per-src pair fan-out is
    O(deg²) bounded).

    Returns (rank, a, b, n_cociting) ordered (count desc, a, b)."""
    from lucenenet_ray.ops.graphrank import _out_edges

    def pair_partials(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        src, dst, _ = _out_edges(ids, n_nodes)
        # per-src distinct out-sets (batch-local by construction)
        key = src * np.int64(n_nodes) + dst
        key = np.unique(key)
        s = key // n_nodes
        d = key % n_nodes
        aa, bb = [], []
        # out-degree <= 3: bounded pair fan-out per src
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        ends = np.r_[starts[1:], s.size]
        for lo, hi in zip(starts.tolist(), ends.tolist()):
            if hi - lo >= 2:
                nb = d[lo:hi]
                ii, jj = np.triu_indices(hi - lo, 1)
                aa.append(nb[ii])
                bb.append(nb[jj])
        if not aa:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        av = np.concatenate(aa)
        bv = np.concatenate(bb)
        pk = av * np.int64(n_nodes) + bv
        uniq, cnt = np.unique(pk, return_counts=True)
        return pa.table({
            "a": pa.array(uniq // n_nodes, type=pa.int64()),
            "b": pa.array(uniq % n_nodes, type=pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        c = t.column("sum(cnt)").to_numpy(zero_copy_only=False)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -c))[:k]
        return t.take(order)

    agg = (ds.map_batches(pair_partials, batch_format="pyarrow")
           .groupby(["a", "b"]).sum("cnt")
           .map_batches(partial_topk, batch_format="pyarrow")
           .to_pandas())
    agg = agg.rename(columns={"sum(cnt)": "n_cociting"})
    agg = agg.sort_values(["n_cociting", "a", "b"],
                          ascending=[False, True, True]).head(k)
    agg["n_cociting"] = agg["n_cociting"].astype(np.int64)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg.reset_index(drop=True),
                                preserve_index=False)


def resource_allocation_topk(ds, n_nodes: int, k: int = 20,
                             id_col: str = "doc_id") -> pa.Table:
    """Top-k non-adjacent pairs by the RA index in int64 fixed point:
    (rank, a, b, score) with score = sum_z SCALE // deg(z), ordered
    (score desc, a asc, b asc)."""
    edges = _und_edges(ds, n_nodes, id_col)

    def ra_wedges(group: pa.Table) -> pa.Table:
        nb = np.unique(group.column("nbr").to_numpy(zero_copy_only=False))
        kk = len(nb)
        if kk < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "wt": pa.array([], type=pa.int64())})
        wt = SCALE // kk  # deg(center) = kk distinct neighbors
        ii, jj = np.triu_indices(kk, 1)
        return pa.table({
            "a": pa.array(nb[ii], type=pa.int64()),
            "b": pa.array(nb[jj], type=pa.int64()),
            "wt": pa.array(np.full(ii.size, wt, dtype=np.int64)),
        })

    wedge_ds = (edges.map_batches(_both_dirs, batch_format="pyarrow")
                .groupby("u").map_groups(ra_wedges, batch_format="pyarrow"))
    # existing edges become poison markers (wt = -1): any candidate pair
    # that IS an edge is dropped inside the same groupby — no broadcast
    marker_ds = edges.map_batches(
        lambda t: pa.table({
            "a": t.column("a"), "b": t.column("b"),
            "wt": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
        }), batch_format="pyarrow")

    def fold(group: pa.Table) -> pa.Table:
        wt = group.column("wt").to_numpy(zero_copy_only=False)
        if (wt < 0).any():
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64())})
        return pa.table({
            "a": group.column("a").slice(0, 1),
            "b": group.column("b").slice(0, 1),
            "score": pa.array([int(wt.sum())], type=pa.int64()),
        })

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        import pandas as pd  # noqa: F401  (lexsort below is numpy)
        sc = t.column("score").to_numpy(zero_copy_only=False)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -sc))[:k]
        return t.take(order)

    cand = (wedge_ds.union(marker_ds)
            .groupby(["a", "b"]).map_groups(fold, batch_format="pyarrow")
            .map_batches(partial_topk, batch_format="pyarrow")
            .to_pandas())
    cand = cand.sort_values(["score", "a", "b"],
                            ascending=[False, True, True]).head(k)
    cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int64))
    return pa.Table.from_pandas(cand.reset_index(drop=True),
                                preserve_index=False)


def anchor_terms_topk(ds, n_nodes: int, k: int = 20) -> pa.Table:
    """Anchor-text aggregation (the classic web-indexing enrichment —
    Brin & Page 1998 §2.2 index anchor words with the page they point
    AT; Craswell, Hawking & Robertson CIKM 2001 measure its ranking
    value): every out-link (u, v) of the md5 graph carries u's anchor
    snippet (its first two non-empty tokens), aggregated per TARGET v.

    Shape: anchors are derived from the batch's own rows, so the only
    exchange is ONE ``groupby(node, term).sum`` over per-batch partial
    counts; multi-edges count once per link like a real crawl.  Returns
    the global top-k (node, term) pairs by (cnt desc, node, term)."""
    from lucenenet_ray.ops.graphrank import _out_edges

    def partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        texts = t.column("text").to_pylist()
        anchors = [[w for w in (x or "").split(" ") if w][:2]
                   for x in texts]
        pos_of = {int(u): i for i, u in enumerate(ids)}
        src, dst, _ = _out_edges(ids, n_nodes)
        nodes, terms = [], []
        for u, v in zip(src.tolist(), dst.tolist()):
            for w in anchors[pos_of[u]]:
                nodes.append(v)
                terms.append(w)
        if not nodes:
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "term": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        nv = np.asarray(nodes, dtype=np.int64)
        tv = np.asarray(terms, dtype=object).astype(str)
        joined = np.char.add(np.char.mod("%019d", nv), tv)
        uniq, cnt = np.unique(joined, return_counts=True)
        return pa.table({
            "node": pa.array([int(s[:19]) for s in uniq], type=pa.int64()),
            "term": pa.array([s[19:] for s in uniq], type=pa.string()),
            "cnt": pa.array(cnt.astype(np.int64)),
        })

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        import pandas as pd

        df = t.to_pandas()
        df = df.sort_values(["sum(cnt)", "node", "term"],
                            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby(["node", "term"]).sum("cnt")
           .map_batches(partial_topk, batch_format="pyarrow")
           .to_pandas())
    agg = agg.rename(columns={"sum(cnt)": "cnt"})
    agg = agg.sort_values(["cnt", "node", "term"],
                          ascending=[False, True, True]).head(k)
    agg["cnt"] = agg["cnt"].astype(np.int64)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg.reset_index(drop=True),
                                preserve_index=False)


def degree_distribution(ds, n_nodes: int,
                        id_col: str = "doc_id") -> pa.Table:
    """Directed degree histograms over the md5 link graph — the first
    sanity plot of any web-graph study (Broder et al. WWW 2000 §3 fit
    power laws to exactly these): rows (kind, deg, n_nodes) for kind in
    ('in', 'out'), (kind, deg)-sorted.  In-degrees need ONE
    corpus-scale groupby(dst) then a tiny histogram groupby; out-degrees
    are derived per batch and need only the tiny one."""
    from lucenenet_ray.ops.graphrank import _out_edges

    def in_partials(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        _, dst, _ = _out_edges(ids, n_nodes)
        uniq, cnt = np.unique(dst, return_counts=True)
        return pa.table({"dst": pa.array(uniq, type=pa.int64()),
                         "c": pa.array(cnt.astype(np.int64))})

    def hist_partial(t: pa.Table) -> pa.Table:
        c = t.column("sum(c)").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.table({"deg": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    indeg = (ds.map_batches(in_partials, batch_format="pyarrow")
             .groupby("dst").sum("c")
             .map_batches(hist_partial, batch_format="pyarrow")
             .groupby("deg").sum("n").to_pandas())
    # zero-in-degree nodes never appear as a dst — fold them in
    n_with_in = int(indeg["sum(n)"].sum())

    def out_partials(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        deg = 1 + (ids % 3)
        uniq, cnt = np.unique(deg, return_counts=True)
        return pa.table({"deg": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    outdeg = (ds.map_batches(out_partials, batch_format="pyarrow")
              .groupby("deg").sum("n").to_pandas())

    import pandas as pd

    rows = []
    if n_nodes > n_with_in:
        rows.append(("in", 0, n_nodes - n_with_in))
    rows += [("in", int(d), int(n)) for d, n in
             zip(indeg["deg"], indeg["sum(n)"])]
    rows += [("out", int(d), int(n)) for d, n in
             zip(outdeg["deg"], outdeg["sum(n)"])]
    df = pd.DataFrame(rows, columns=["kind", "deg", "n_nodes"])
    df = df.sort_values(["kind", "deg"]).reset_index(drop=True)
    df["deg"] = df["deg"].astype(np.int64)
    df["n_nodes"] = df["n_nodes"].astype(np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


def reciprocity(ds, n_nodes: int, id_col: str = "doc_id") -> pa.Table:
    """ONE-row directed-graph reciprocity report (the classic web-graph
    statistic — Broder et al. WWW 2000 measure link symmetry; Garlaschelli
    & Loffredo PRL 2004 formalize the reciprocity coefficient as the
    fraction of directed edges with a reverse edge): (n_directed,
    n_reciprocal_pairs, reciprocity_fp) with reciprocity =
    (2·pairs·10^9) // n_directed.

    Shape: per-batch distinct directed edges tagged by orientation on
    the normalized (min, max) key; ONE groupby fold counts pairs seen in
    BOTH orientations — no broadcast, no driver edge set."""
    from lucenenet_ray.ops.graphrank import _out_edges

    def rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        src, dst, _ = _out_edges(ids, n_nodes)
        key = src * np.int64(n_nodes) + dst
        key = np.unique(key)  # per-src distinct is batch-local
        u = key // n_nodes
        v = key % n_nodes
        a = np.minimum(u, v)
        b = np.maximum(u, v)
        fwd = (u < v).astype(np.int64)
        return pa.table({
            "a": pa.array(a, type=pa.int64()),
            "b": pa.array(b, type=pa.int64()),
            "fwd": pa.array(fwd),
            "bwd": pa.array(1 - fwd),
        })

    def fold(group: pa.Table) -> pa.Table:
        f = int(group.column("fwd").to_numpy(zero_copy_only=False).sum())
        w = int(group.column("bwd").to_numpy(zero_copy_only=False).sum())
        return pa.table({
            "n_dir": pa.array([int(f > 0) + int(w > 0)], type=pa.int64()),
            "n_recip": pa.array([int(f > 0 and w > 0)], type=pa.int64()),
        })

    agg = (ds.map_batches(rows, batch_format="pyarrow")
           .groupby(["a", "b"]).map_groups(fold, batch_format="pyarrow")
           .to_pandas())
    n_dir = int(agg["n_dir"].sum())
    n_recip = int(agg["n_recip"].sum())
    fp = (2 * n_recip * 1_000_000_000) // n_dir if n_dir else 0
    return pa.table({
        "n_directed": pa.array([n_dir], type=pa.int64()),
        "n_reciprocal_pairs": pa.array([n_recip], type=pa.int64()),
        "reciprocity_fp": pa.array([fp], type=pa.int64()),
    })


def clustering_coefficient(ds, n_nodes: int,
                           id_col: str = "doc_id") -> pa.Table:
    """ONE-row global clustering coefficient (transitivity — Watts &
    Strogatz 1998 popularized the local form; the global ratio
    C = 3·triangles / wedges is the standard web-graph cohesion stat):
    (n_wedges, n_triangles, global_cc_fp) with cc = (3·T·10^9) // W.

    Reuses the exact distributed triangle counter (one wedge-close
    groupby) plus a degree pass for the wedge count Σ C(deg, 2)."""
    from lucenenet_ray.ops.triangles import triangle_counts

    tri = triangle_counts(ds, n_nodes=n_nodes, id_col=id_col)
    total_tri = int(sum(tri.column("n_triangles").to_pylist())) // 3

    edges = _und_edges(ds, n_nodes, id_col)
    deg = (edges.map_batches(_both_dirs, batch_format="pyarrow")
           .groupby("u").count().to_pandas())
    d = deg["count()"].to_numpy(dtype=np.int64)
    wedges = int((d.astype(object) * (d.astype(object) - 1) // 2).sum())
    cc = (3 * total_tri * 1_000_000_000) // wedges if wedges else 0
    return pa.table({
        "n_wedges": pa.array([wedges], type=pa.int64()),
        "n_triangles": pa.array([total_tri], type=pa.int64()),
        "global_cc_fp": pa.array([cc], type=pa.int64()),
    })


def assortativity_stats(ds, n_nodes: int,
                        id_col: str = "doc_id") -> pa.Table:
    """ONE-row degree-assortativity SUFFICIENT STATISTICS (Newman, PRL
    2002 eq. 4 — the degree-degree Pearson correlation over edges):
    for every und edge counted in both orientations with x = deg(u),
    y = deg(v): (m, sum_x, sum_xy, sum_x2) — all exact integers (by
    symmetry Σx = Σy and Σx² = Σy², so these four determine r =
    (m·Σxy − Σx²_outer) / (m·Σx² − Σx·Σx)); the division is left to
    the consumer so no signed-floor-vs-trunc divergence can enter."""
    import ray

    edges = _und_edges(ds, n_nodes, id_col)
    deg_df = (edges.map_batches(_both_dirs, batch_format="pyarrow")
              .groupby("u").count().to_pandas())
    dk = deg_df["u"].to_numpy(dtype=np.int64)
    dv = deg_df["count()"].to_numpy(dtype=np.int64)
    deg = np.zeros(n_nodes, dtype=np.int64)
    deg[dk] = dv
    dref = ray.put(deg)

    def partial(t: pa.Table) -> pa.Table:
        dd = ray.get(dref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        x = np.concatenate([dd[a], dd[b]])
        y = np.concatenate([dd[b], dd[a]])
        return pa.table({
            "m": pa.array([x.size], type=pa.int64()),
            "sum_x": pa.array([int(x.sum())], type=pa.int64()),
            "sum_xy": pa.array([int((x * y).sum())], type=pa.int64()),
            "sum_x2": pa.array([int((x * x).sum())], type=pa.int64()),
        })

    agg = (edges.map_batches(partial, batch_format="pyarrow")
           .to_pandas().sum())
    return pa.table({
        "m": pa.array([int(agg["m"])], type=pa.int64()),
        "sum_x": pa.array([int(agg["sum_x"])], type=pa.int64()),
        "sum_xy": pa.array([int(agg["sum_xy"])], type=pa.int64()),
        "sum_x2": pa.array([int(agg["sum_x2"])], type=pa.int64()),
    })
