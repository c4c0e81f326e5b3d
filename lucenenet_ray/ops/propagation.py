"""Bounded-round label/distance propagation over the md5 link graph —
the two canonical Pregel-style primitives next to pagerank/kcore:

- ``label_propagation``: semi-supervised classification by synchronous
  majority-vote label spreading (Zhu & Ghahramani 2002 CMU-CALD-02-107;
  the community-detection form is Raghavan et al., Phys. Rev. E 2007).
  Seed nodes (``doc_id % seed_mod == 0``) carry the fixed label
  ``doc_id % n_labels`` (clamped every round); every other node takes
  the majority label among its LABELED neighbors (ties → smallest
  label), keeping its previous label when no neighbor is labeled.  A
  FIXED round count makes the fixpoint SQL-unrollable (the kcore
  bounded-round convention).

- ``bfs_distances``: exact multi-source BFS — per seed, the number of
  nodes at each hop distance <= max round (the Pregel "hello world";
  at web scale this is the frontier-expansion primitive behind
  crawl-depth and harmonic-centrality studies).

Scale shape: the deduped undirected edge set is materialized once
(edge-scale); each round is ONE groupby over per-batch pre-combined
rows; the per-node state vector (label / distance arrays) rides the
documented pagerank broadcast altitude with the same
hash-partitioned-join escalation path past broadcast scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.linkpredict import _both_dirs, _und_edges


def label_propagation(ds, n_nodes: int, n_rounds: int = 3,
                      seed_mod: int = 25, n_labels: int = 4,
                      id_col: str = "doc_id") -> pa.Table:
    """(node, label) for every node labeled after ``n_rounds``,
    node-sorted (unlabeled nodes are omitted)."""
    import ray

    edges = _und_edges(ds, n_nodes, id_col)
    bi = edges.map_batches(_both_dirs, batch_format="pyarrow") \
        .materialize()

    ids = np.arange(n_nodes, dtype=np.int64)
    seed_mask = (ids % seed_mod) == 0
    labels = np.where(seed_mask, ids % n_labels, np.int64(-1))

    for _ in range(n_rounds):
        lref = ray.put(labels)

        def votes(t: pa.Table) -> pa.Table:
            lab = ray.get(lref)
            u = t.column("u").to_numpy(zero_copy_only=False)
            nbr = t.column("nbr").to_numpy(zero_copy_only=False)
            lu = lab[nbr]  # the NEIGHBOR's label votes for node u
            m = lu >= 0
            if not m.any():
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "label": pa.array([], type=pa.int64()),
                                 "cnt": pa.array([], type=pa.int64())})
            key = u[m] * np.int64(n_labels) + lu[m]
            uniq, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "node": pa.array(uniq // n_labels, type=pa.int64()),
                "label": pa.array(uniq % n_labels, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def pick(group: pa.Table) -> pa.Table:
            lab = group.column("label").to_numpy(zero_copy_only=False)
            cnt = group.column("sum(cnt)").to_numpy(zero_copy_only=False)
            best = lab[np.lexsort((lab, -cnt))[0]]  # max count, min label
            return pa.table({
                "node": group.column("node").slice(0, 1),
                "new_label": pa.array([int(best)], type=pa.int64()),
            })

        maj = (bi.map_batches(votes, batch_format="pyarrow")
               .groupby(["node", "label"]).sum("cnt")
               .groupby("node").map_groups(pick, batch_format="pyarrow")
               .to_pandas())
        new = labels.copy()
        if len(maj):
            nd = maj["node"].to_numpy(dtype=np.int64)
            nl = maj["new_label"].to_numpy(dtype=np.int64)
            new[nd] = nl
        new[seed_mask] = ids[seed_mask] % n_labels  # clamp seeds
        labels = new

    keep = labels >= 0
    return pa.table({
        "node": pa.array(ids[keep], type=pa.int64()),
        "label": pa.array(labels[keep], type=pa.int64()),
    })


def bfs_distances(ds, n_nodes: int, seeds: tuple[int, ...] = (0, 1, 2, 3, 4),
                  max_rounds: int = 4,
                  id_col: str = "doc_id") -> pa.Table:
    """(seed, dist, n_nodes) histogram for dist in [0, max_rounds],
    (seed, dist)-sorted; unreached nodes are omitted."""
    import ray

    edges = _und_edges(ds, n_nodes, id_col)
    bi = edges.map_batches(_both_dirs, batch_format="pyarrow") \
        .materialize()

    ns = len(seeds)
    dist = np.full((ns, n_nodes), -1, dtype=np.int64)
    for si, s in enumerate(seeds):
        dist[si, s] = 0

    for r in range(1, max_rounds + 1):
        dref = ray.put(dist)

        def relax(t: pa.Table, r=r) -> pa.Table:
            d = ray.get(dref)
            u = t.column("u").to_numpy(zero_copy_only=False)
            nbr = t.column("nbr").to_numpy(zero_copy_only=False)
            rows_n, rows_s = [], []
            for si in range(ns):
                # frontier expansion: nbr at r-1 reaches unset u at r
                m = (d[si][nbr] == r - 1) & (d[si][u] < 0)
                if m.any():
                    uu = np.unique(u[m])
                    rows_n.append(uu)
                    rows_s.append(np.full(uu.size, si, dtype=np.int64))
            if not rows_n:
                return pa.table({"node": pa.array([], type=pa.int64()),
                                 "si": pa.array([], type=pa.int64())})
            return pa.table({
                "node": pa.array(np.concatenate(rows_n), type=pa.int64()),
                "si": pa.array(np.concatenate(rows_s), type=pa.int64()),
            })

        front = (bi.map_batches(relax, batch_format="pyarrow")
                 .groupby(["node", "si"]).count().to_pandas())
        if len(front) == 0:
            break
        nd = front["node"].to_numpy(dtype=np.int64)
        si = front["si"].to_numpy(dtype=np.int64)
        dist[si, nd] = r

    rows = []
    for si, s in enumerate(seeds):
        vals, cnts = np.unique(dist[si][dist[si] >= 0],
                               return_counts=True)
        for d, c in zip(vals.tolist(), cnts.tolist()):
            rows.append((s, d, c))
    rows.sort()
    return pa.table({
        "seed": pa.array([r[0] for r in rows], type=pa.int64()),
        "dist": pa.array([r[1] for r in rows], type=pa.int64()),
        "n_nodes": pa.array([r[2] for r in rows], type=pa.int64()),
    })
