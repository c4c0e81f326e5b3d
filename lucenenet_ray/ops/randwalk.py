"""Random-walk corpus generation over the link graph — the input stage of
DeepWalk / node2vec graph-embedding training (Perozzi et al. KDD'14 §4.1:
truncated random walks per start node become the "sentences" a skip-gram
model trains on; ops/cooccur.py is exactly the downstream consumer).

Determinism (so the SQL oracle can unroll the walk): the step-t hop from
node u takes out-edge index md5_int31("walk:{u}:{t}") % outdeg(u) of u's
j-ordered synthesized out-edges (the ops/graphrank.py graph) — a pure
function of (node, step), no RNG state.

Distributed shape: walks are per-start independent AND the graph is
locally synthesizable, so the WHOLE walk computes inside one stateless
``map_batches`` over the start nodes — zero shuffles, zero broadcasts;
on a stored graph the same loop becomes L rounds of the pagerank-style
hash-partitioned hop join (documented, not needed here)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

WALK_LEN = 5
START_MOD = 37


def _hop(u: int, t: int, n_nodes: int) -> int:
    """Step-t successor of u (deterministic edge choice)."""
    deg = 1 + (u % 3)
    j = md5_int31(f"walk:{u}:{t}") % deg
    tgt = md5_int31(f"link:{u}:{j}") % n_nodes
    if tgt == u:
        tgt = (tgt + 1) % n_nodes
    return tgt


def random_walks(ds, n_nodes: int, walk_len: int = WALK_LEN,
                 start_mod: int = START_MOD,
                 id_col: str = "doc_id") -> pa.Table:
    """(start, step, node) rows for walks from every start with
    doc_id % start_mod == 0; step 0 is the start node itself.
    (start, step)-sorted."""
    import ray

    def walk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = ids[ids % start_mod == 0]
        out_s, out_t, out_n = [], [], []
        for s in starts.tolist():
            u = int(s)
            out_s.append(s)
            out_t.append(0)
            out_n.append(u)
            for step in range(1, walk_len + 1):
                u = _hop(u, step, n_nodes)
                out_s.append(s)
                out_t.append(step)
                out_n.append(u)
        return pa.table({
            "start": pa.array(out_s, type=pa.int64()),
            "step": pa.array(out_t, type=pa.int64()),
            "node": pa.array(out_n, type=pa.int64()),
        })

    parts = []
    for ref in ds.map_batches(walk, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows and "start" in t.schema.names:
            parts.append(t)
    if not parts:
        return pa.table({"start": pa.array([], type=pa.int64()),
                         "step": pa.array([], type=pa.int64()),
                         "node": pa.array([], type=pa.int64())})
    t = pa.concat_tables(parts)
    idx = pa.compute.sort_indices(
        t, sort_keys=[("start", "ascending"), ("step", "ascending")])
    return t.take(idx)
