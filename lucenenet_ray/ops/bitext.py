"""Cross-lingual document alignment by mutual nearest neighbors — the
bitext/comparable-corpora mining shape (Artetxe & Schwenk, ACL 2019
margin-based mining; LASER/CCMatrix run exactly this over embedding
spaces): a doc pair (a in lang X, b in lang Y) aligns iff b is a's
cosine top-1 across the other language AND a is b's top-1 back — the
mutual-NN criterion that kills hub false positives.

Distributed shape: the SMALLER language side's normalized matrix is
broadcast once (``ray.put``; at 100 TB both sides shard and this becomes
the bucketed two-pass of ops/knn.py — noted, same contract); ONE
streaming pass over the larger side computes, per batch, (a) each a-row's
top-1 b (vectorized argmax, id tie-break) and (b) per-b best-a partials;
a tiny ``groupby(b)`` finalizes direction two; the mutual join is
driver-side over |B|-scale rows. Rank-only outputs (the gate-proven
``list_cosine_similarity`` float parity)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def mutual_align(docs_ds, emb_ds, lang_a: str = "fr", lang_b: str = "de",
                 id_col: str = "doc_id") -> pa.Table:
    """(doc_a, doc_b) mutual cosine-top-1 pairs, doc_a-sorted."""
    import pyarrow.compute as pc
    import ray

    langs = {}
    for ref in docs_ds.map_batches(
            lambda t: t.select([id_col, "lang"]),
            batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        for d, l in zip(t.column(id_col).to_pylist(),
                        t.column("lang").to_pylist()):
            langs[int(d)] = l
    a_ids = sorted(d for d, l in langs.items() if l == lang_a)
    b_ids = sorted(d for d, l in langs.items() if l == lang_b)
    bset = set(b_ids)

    # broadcast the smaller (B) side
    bt = emb_ds.filter(lambda row: row["vec_id"] in bset) \
               .select_columns(["vec_id", "embedding"]).take_all()
    bmat = np.asarray([r["embedding"] for r in bt], dtype=np.float64)
    bmat = bmat / np.linalg.norm(bmat, axis=1, keepdims=True)
    b_order = np.asarray([int(r["vec_id"]) for r in bt], dtype=np.int64)
    srt = np.argsort(b_order)
    b_order, bmat = b_order[srt], bmat[srt]
    bref = ray.put((b_order, bmat))
    aset = set(a_ids)

    def part(t: pa.Table) -> pa.Table:
        bo, bm = ray.get(bref)
        ids = t.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        mask = np.isin(ids, np.asarray(sorted(aset), dtype=np.int64))
        empty = pa.table({"kind": pa.array([], type=pa.int64()),
                          "x": pa.array([], type=pa.int64()),
                          "y": pa.array([], type=pa.int64()),
                          "s": pa.array([], type=pa.float64())})
        if not mask.any():
            return empty
        ids = ids[mask]
        flat = pc.list_flatten(t.filter(pa.array(mask.tolist()))
                               .column("embedding")).to_numpy()
        m = flat.astype(np.float64).reshape(len(ids), bm.shape[1])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ bm.T                      # (na, nb)
        # direction 1: each a's top-1 b (sim desc, b id asc)
        top = np.argmax(sims, axis=1)
        # resolve ties toward the lower b id: argmax picks first max,
        # and bm rows are b-id-sorted, so ties already break id-asc
        # direction 2 partials: per b, best a in this batch (lexsort:
        # sim desc then a id asc — exact regardless of batch row order)
        out_b, out_best, out_s = [], [], []
        for j in range(bm.shape[0]):
            col = sims[:, j]
            order = np.lexsort((ids, -col))[0]
            out_b.append(int(bo[j]))
            out_best.append(int(ids[order]))
            out_s.append(float(col[order]))
        # unified long format: kind 0 = (a, its top-1 b); kind 1 =
        # (b, this batch's best a, sim) partials
        kinds = [0] * len(ids) + [1] * len(out_b)
        xs = ids.tolist() + out_b
        ys = bo[top].astype(np.int64).tolist() + out_best
        ss = [0.0] * len(ids) + out_s
        return pa.table({
            "kind": pa.array(kinds, type=pa.int64()),
            "x": pa.array(xs, type=pa.int64()),
            "y": pa.array(ys, type=pa.int64()),
            "s": pa.array(ss, type=pa.float64()),
        })

    a_top: dict[int, int] = {}
    b_best: dict[int, tuple[float, int]] = {}
    for ref in emb_ds.map_batches(part,
                                  batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows or "kind" not in t.schema.names:
            continue
        for kind, x, y, s in zip(t.column("kind").to_pylist(),
                                 t.column("x").to_pylist(),
                                 t.column("y").to_pylist(),
                                 t.column("s").to_pylist()):
            if kind == 0:
                a_top[int(x)] = int(y)
            else:
                cur = b_best.get(int(x))
                key = (-float(s), int(y))
                if cur is None or key < cur:
                    b_best[int(x)] = key
    pairs = sorted((a, b) for a, b in a_top.items()
                   if b_best.get(b) is not None and b_best[b][1] == a)
    return pa.table({
        "doc_a": pa.array([p[0] for p in pairs], type=pa.int64()),
        "doc_b": pa.array([p[1] for p in pairs], type=pa.int64()),
    })
