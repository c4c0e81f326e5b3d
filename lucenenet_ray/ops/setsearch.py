"""Top-k set-overlap search (the Koios / set-similarity-search shape,
ICDE 2023 — PAPERS.md): given a query token SET, return the k documents
whose DISTINCT-token overlap with it is largest.

Scores are integers (|tokens(d) ∩ Q|), so ranking is exact at any
parallelism; tie-break (overlap desc, doc_id asc).

Distributed shape: the query set is broadcast once via ``ray.put``; one
stateless ``map_batches`` computes per-doc distinct-overlap counts with a
vectorized np.isin over each doc's unique tokens and keeps a per-batch
partial top-k; the driver merges k·blocks rows. No shuffle — overlap
search over 10^12 docs is one streaming read. A spatio-textual variant
(the ICDE 2023 spatio-textual top-k shape) pre-filters each batch by a
bounding box over the md5-synthesized coordinates (ops/spatial.py) before
scoring, so the spatial predicate prunes before any text work."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_overlap(t: pa.Table, qset: np.ndarray, k: int,
                   bbox: tuple[int, int, int, int] | None,
                   text_col: str, id_col: str) -> pa.Table:
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t.column(text_col).to_pylist()
    if bbox is not None:
        from lucenenet_ray.ops.spatial import synth_latlon_centi

        lat, lon = synth_latlon_centi(ids)
        keep = ((lat >= bbox[0]) & (lat < bbox[1])
                & (lon >= bbox[2]) & (lon < bbox[3]))
        idx = np.flatnonzero(keep)
    else:
        idx = np.arange(len(ids))
    ov = np.empty(len(idx), dtype=np.int64)
    for o, i in enumerate(idx.tolist()):
        toks = np.unique((texts[i] or "").split(" "))
        ov[o] = int(np.isin(toks, qset, assume_unique=True).sum())
    kk = min(k, len(idx))
    sel = np.lexsort((ids[idx], -ov))[:kk]
    return pa.table({
        id_col: pa.array(ids[idx][sel], type=pa.int64()),
        "overlap": pa.array(ov[sel], type=pa.int64()),
    })


def set_overlap_topk(ds, query_tokens: list[str], k: int = 10,
                     bbox: tuple[int, int, int, int] | None = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """(rank, doc_id, overlap) top-k by (overlap desc, doc_id asc).
    ``bbox`` = (lat_lo, lat_hi, lon_lo, lon_hi) in centi-degrees filters
    docs spatially before scoring (half-open on the hi edges)."""
    import ray

    qset = np.unique(np.asarray(
        [q for q in query_tokens if q], dtype=object)).astype(str)
    qset.sort(kind="stable")
    qref = ray.put(qset)

    def part(t: pa.Table) -> pa.Table:
        return _batch_overlap(t, ray.get(qref), k, bbox, text_col, id_col)

    parts = []
    for ref in ds.map_batches(part, batch_format="pyarrow").to_arrow_refs():
        tab = ray.get(ref)
        if tab.num_rows and id_col in tab.schema.names:
            parts.append(tab)
    if not parts:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "overlap": pa.array([], type=pa.int64())})
    t = pa.concat_tables(parts)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    ov = t.column("overlap").to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, -ov))[:k]
    return pa.table({
        "rank": pa.array(range(1, len(sel) + 1), type=pa.int64()),
        id_col: pa.array(ids[sel], type=pa.int64()),
        "overlap": pa.array(ov[sel], type=pa.int64()),
    })


def greedy_cover(ds, query_tokens: list[str], rounds: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"
                 ) -> pa.Table:
    """Greedy max-coverage document selection (the classic 1-1/e greedy
    over sets — the corpus-subset-selection shape used to cover a target
    vocabulary/benchmark with few documents): each round picks the doc
    with the largest MARGINAL overlap against the still-uncovered query
    tokens (ties → lowest doc_id; already-selected docs excluded), then
    marks its matched tokens covered.

    Output: (round, doc_id, gain, covered_total) — all integers, exact at
    any parallelism. Each round is ONE shuffle-free streaming pass with
    the shrinking uncovered set broadcast; the per-batch partial emits its
    local winner's MATCHED TOKENS alongside (id, overlap), so the driver
    never re-scans the corpus to fetch them (the same
    emit-winner-payload move as ops/coreset.py — r4 scale-shape fix)."""
    import ray

    uncovered = set(q for q in query_tokens if q)
    selected: set[int] = set()
    out_r, out_id, out_g, out_c = [], [], [], []
    covered_total = 0
    for r in range(1, rounds + 1):
        qset = np.unique(np.asarray(sorted(uncovered), dtype=object)
                         ).astype(str)
        qref = ray.put(qset)
        sel_ref = ray.put(np.asarray(sorted(selected), dtype=np.int64))

        def part(t: pa.Table) -> pa.Table:
            q = ray.get(qref)
            sel = ray.get(sel_ref)
            ids = t.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            keep = ~np.isin(ids, sel)
            sub = t.filter(pa.array(keep))
            empty = pa.table({
                id_col: pa.array([], type=pa.int64()),
                "overlap": pa.array([], type=pa.int64()),
                "_toks": pa.array([], type=pa.list_(pa.string())),
            })
            if sub.num_rows == 0:
                return empty
            top = _batch_overlap(sub, q, 1, None, text_col, id_col)
            if top.num_rows == 0:
                return empty
            wid = top.column(id_col)[0].as_py()
            sub_ids = sub.column(id_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            wtxt = sub.column(text_col)[
                int(np.flatnonzero(sub_ids == wid)[0])].as_py()
            wtoks = np.unique((wtxt or "").split(" "))
            matched = wtoks[np.isin(wtoks, q, assume_unique=True)]
            return top.append_column(
                "_toks", pa.array([matched.tolist()],
                                  type=pa.list_(pa.string())))

        best_id, best_g = None, -1
        winner_tokens: set[str] = set()
        for ref in ds.map_batches(
                part, batch_format="pyarrow").to_arrow_refs():
            tab = ray.get(ref)
            if tab.num_rows == 0 or id_col not in tab.schema.names:
                continue
            for i in range(tab.num_rows):
                g = tab.column("overlap")[i].as_py()
                d = tab.column(id_col)[i].as_py()
                if g > best_g or (g == best_g and d < best_id):
                    best_g, best_id = g, d
                    winner_tokens = set(tab.column("_toks")[i].as_py())
        if best_id is None:
            break
        winner_tokens &= uncovered
        assert len(winner_tokens) == best_g
        uncovered -= winner_tokens
        selected.add(best_id)
        covered_total += best_g
        out_r.append(r)
        out_id.append(best_id)
        out_g.append(best_g)
        out_c.append(covered_total)
    return pa.table({
        "round": pa.array(out_r, type=pa.int64()),
        "doc_id": pa.array(out_id, type=pa.int64()),
        "gain": pa.array(out_g, type=pa.int64()),
        "covered_total": pa.array(out_c, type=pa.int64()),
    })


CONTAIN_SCALE = 10**9


def containment_topk(ds, query_tokens: list[str], k: int = 10,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Top-k docs by CONTAINMENT of the doc in the query set — the LSH
    Ensemble measure (Zhu, Nargesian, Pu & Miller, VLDB 2016: containment
    |Q ∩ d| / |d| replaces Jaccard when set sizes are skewed). Scored in
    exact integer fixed-point, score = (|Q ∩ d| * 10^9) // |distinct(d)|
    (empty docs score 0), tie-break (score desc, doc_id asc) — bit-equal
    at any parallelism and re-derivable in SQL.

    Same shuffle-free shape as :func:`set_overlap_topk`: broadcast query
    set, per-batch vectorized distinct-overlap + partial top-k, k·blocks
    driver merge."""
    import ray

    qset = np.unique(np.asarray(
        [q for q in query_tokens if q], dtype=object)).astype(str)
    qref = ray.put(qset)

    def part(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        ids = t.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        texts = t.column(text_col).to_pylist()
        sc = np.empty(len(ids), dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = np.unique([x for x in (txt or "").split(" ") if x])
            if len(toks) == 0:
                sc[i] = 0
                continue
            ov = int(np.isin(toks, qs, assume_unique=True).sum())
            sc[i] = (ov * CONTAIN_SCALE) // len(toks)
        sel = np.lexsort((ids, -sc))[:min(k, len(ids))]
        return pa.table({
            id_col: pa.array(ids[sel], type=pa.int64()),
            "score": pa.array(sc[sel], type=pa.int64()),
        })

    parts = []
    for ref in ds.map_batches(part, batch_format="pyarrow").to_arrow_refs():
        tab = ray.get(ref)
        if tab.num_rows and id_col in tab.schema.names:
            parts.append(tab)
    if not parts:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.int64())})
    t = pa.concat_tables(parts)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    sc = t.column("score").to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, -sc))[:k]
    return pa.table({
        "rank": pa.array(range(1, len(sel) + 1), type=pa.int64()),
        id_col: pa.array(ids[sel], type=pa.int64()),
        "score": pa.array(sc[sel], type=pa.int64()),
    })
