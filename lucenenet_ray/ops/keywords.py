"""Unsupervised keyword / key-phrase extraction over the corpus — the
two classic graph- and phrase-statistics extractors:

- ``textrank_keywords``: TextRank (Mihalcea & Tarau, EMNLP 2004 §3.1) —
  PageRank over the word co-occurrence graph.  Nodes are the stop-
  filtered vocabulary; edges are adjacency pairs of the filtered token
  stream (window 1), undirected, weighted by pair count, no self-loops.
  Ranks use the ops/graphrank.py integer fixed-point discipline
  (teleport 15%, damping 85%, ``//`` everywhere), so the SQL oracle
  unrolls the identical rounds bit-for-bit.

- ``rake_phrases``: RAKE (Rose, Engel, Cramer & Cowley, 2010 "Automatic
  Keyword Extraction from Individual Documents" §1.2) — candidate
  phrases are maximal runs of non-stopword tokens (stopwords and
  document boundaries delimit); for every token occurrence inside a
  phrase of length L: freq(w) += 1 and deg(w) += L (the degree-includes-
  self convention); word score = (deg * 10^9) // freq (integer fixed
  point of deg/freq); phrase score = sum of member word scores (with
  multiplicity).  Top-k distinct phrases by (score desc, phrase asc).

Scale shape: token/pair/phrase statistics are emitted as per-batch
partial counts (np.unique combine) and reduced by ONE groupby each —
vocabulary- and phrase-type-bounded, never corpus-row-bounded.  The
rank vector / word-score map are vocabulary-scale broadcasts (the same
documented hash-partitioned-join escalation as pagerank's rank vector).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS

SCALE = 1_000_000_000


def _rank_contrib(rs: np.ndarray, w: np.ndarray,
                  ws: np.ndarray) -> np.ndarray:
    """Per-edge rank contribution (rs * w) // ws with an int64-overflow
    guard: ranks near 1e9 × corpus-scale edge weights can exceed 2^63,
    where numpy wraps SILENTLY while the DuckDB oracle's BIGINT errors —
    a silent divergence at extreme scale (ADVICE r3/r4). Near the limit
    the products escalate to Python ints; the quotient (≤ rs since
    w ≤ ws) always fits back in int64."""
    if rs.size and w.size and \
            float(rs.max()) * float(w.max()) >= float(2 ** 62):
        return np.asarray(
            [int(rv) * int(wv) // int(wsv)
             for rv, wv, wsv in zip(rs, w, ws)], dtype=np.int64)
    return (rs * w) // ws


def _filtered_tokens(text: str) -> list[str]:
    return [w for w in (text or "").split(" ")
            if w and w not in ENGLISH_STOP_WORDS]


def _phrase_runs(text: str) -> list[list[str]]:
    runs, cur = [], []
    for w in (text or "").split(" "):
        if not w or w in ENGLISH_STOP_WORDS:
            if cur:
                runs.append(cur)
                cur = []
        else:
            cur.append(w)
    if cur:
        runs.append(cur)
    return runs


def textrank_keywords(ds, n_iters: int = 3, k: int = 20,
                      text_col: str = "text") -> pa.Table:
    """(rank_pos, word, score) — top-k words by integer TextRank."""
    import ray

    def edge_partials(t: pa.Table) -> pa.Table:
        aa, bb = [], []
        for x in t.column(text_col).to_pylist():
            toks = _filtered_tokens(x)
            for a, b in zip(toks, toks[1:]):
                if a != b:
                    aa.append(min(a, b))
                    bb.append(max(a, b))
        if not aa:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        joined = np.char.add(np.char.add(
            np.asarray(aa, dtype=object).astype(str), "\x1f"),
            np.asarray(bb, dtype=object).astype(str))
        uniq, cnt = np.unique(joined, return_counts=True)
        sp = np.char.partition(uniq, "\x1f")
        return pa.table({"a": pa.array(sp[:, 0], type=pa.string()),
                         "b": pa.array(sp[:, 2], type=pa.string()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    edges = (ds.map_batches(edge_partials, batch_format="pyarrow")
             .groupby(["a", "b"]).sum("cnt").to_pandas())
    edges = edges.rename(columns={"sum(cnt)": "wt"})
    # vocabulary-scale driver state (documented broadcast altitude)
    words = sorted(set(edges["a"]) | set(edges["b"]))
    idx = {w: i for i, w in enumerate(words)}
    nv = len(words)
    if nv == 0:
        return pa.table({"rank_pos": pa.array([], type=pa.int64()),
                         "word": pa.array([], type=pa.string()),
                         "score": pa.array([], type=pa.int64())})
    ai = edges["a"].map(idx).to_numpy(dtype=np.int64)
    bi = edges["b"].map(idx).to_numpy(dtype=np.int64)
    wt = edges["wt"].to_numpy(dtype=np.int64)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    w2 = np.concatenate([wt, wt])
    wsum = np.zeros(nv, dtype=np.int64)
    np.add.at(wsum, src, w2)

    base = SCALE // nv
    t15 = (15 * base) // 100
    ranks = np.full(nv, base, dtype=np.int64)
    import ray.data as rd

    edge_ds = rd.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
        "wt": pa.array(w2), "wsum": pa.array(wsum[src]),
    }))
    for _ in range(n_iters):
        rref = ray.put(ranks)

        def contrib(t: pa.Table) -> pa.Table:
            r = ray.get(rref)
            s = t.column("src").to_numpy(zero_copy_only=False)
            d = t.column("dst").to_numpy(zero_copy_only=False)
            w = t.column("wt").to_numpy(zero_copy_only=False)
            ws = t.column("wsum").to_numpy(zero_copy_only=False)
            c = _rank_contrib(r[s], w, ws)
            uniq, inv = np.unique(d, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, c)
            return pa.table({"dst": pa.array(uniq, type=pa.int64()),
                             "s": pa.array(sums, type=pa.int64())})

        agg = (edge_ds.map_batches(contrib, batch_format="pyarrow")
               .groupby("dst").sum("s"))
        new = np.full(nv, t15, dtype=np.int64)
        for ref in agg.to_arrow_refs():
            tab = ray.get(ref)
            if tab.num_rows == 0 or "dst" not in tab.schema.names:
                continue
            d = tab.column("dst").to_numpy(zero_copy_only=False)
            s = tab.column("sum(s)").to_numpy(zero_copy_only=False)
            new[d] += (85 * s) // 100
        ranks = new

    order = np.lexsort((np.asarray(words, dtype=object), -ranks))[:k]
    return pa.table({
        "rank_pos": pa.array(range(1, len(order) + 1), type=pa.int64()),
        "word": pa.array([words[i] for i in order], type=pa.string()),
        "score": pa.array(ranks[order], type=pa.int64()),
    })


def rake_phrases(ds, k: int = 20, min_phrase_freq: int = 2,
                 text_col: str = "text") -> pa.Table:
    """(rank, phrase, n_words, phrase_freq, score) — top-k RAKE phrases."""
    def word_partials(t: pa.Table) -> pa.Table:
        freq: dict[str, int] = {}
        deg: dict[str, int] = {}
        for x in t.column(text_col).to_pylist():
            for run in _phrase_runs(x):
                L = len(run)
                for w in run:
                    freq[w] = freq.get(w, 0) + 1
                    deg[w] = deg.get(w, 0) + L
        ws = sorted(freq)
        return pa.table({
            "word": pa.array(ws, type=pa.string()),
            "freq": pa.array([freq[w] for w in ws], type=pa.int64()),
            "deg": pa.array([deg[w] for w in ws], type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    wstats = (ds.map_batches(word_partials, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("freq"), Sum("deg"))
              .to_pandas())
    score_of = {
        w: (int(d) * SCALE) // int(f)
        for w, f, d in zip(wstats["word"], wstats["sum(freq)"],
                           wstats["sum(deg)"])
    }
    import ray

    sref = ray.put(score_of)

    def phrase_partials(t: pa.Table) -> pa.Table:
        sc = ray.get(sref)
        cnt: dict[str, int] = {}
        meta: dict[str, tuple] = {}
        for x in t.column(text_col).to_pylist():
            for run in _phrase_runs(x):
                p = " ".join(run)
                cnt[p] = cnt.get(p, 0) + 1
                if p not in meta:
                    meta[p] = (len(run), sum(sc[w] for w in run))
        ps = sorted(cnt)
        return pa.table({
            "phrase": pa.array(ps, type=pa.string()),
            "freq": pa.array([cnt[p] for p in ps], type=pa.int64()),
            "n_words": pa.array([meta[p][0] for p in ps], type=pa.int64()),
            "score": pa.array([meta[p][1] for p in ps], type=pa.int64()),
        })

    from ray.data.aggregate import Max

    pstats = (ds.map_batches(phrase_partials, batch_format="pyarrow")
              .groupby("phrase").aggregate(Sum("freq"), Max("n_words"),
                                           Max("score"))
              .to_pandas())
    pstats = pstats.rename(columns={"sum(freq)": "phrase_freq",
                                    "max(n_words)": "n_words",
                                    "max(score)": "score"})
    pstats = pstats[pstats["phrase_freq"] >= min_phrase_freq]
    pstats = pstats.sort_values(["score", "phrase"],
                                ascending=[False, True]).head(k)
    pstats = pstats[["phrase", "n_words", "phrase_freq", "score"]] \
        .reset_index(drop=True)
    for c in ("n_words", "phrase_freq", "score"):
        pstats[c] = pstats[c].astype(np.int64)
    pstats.insert(0, "rank", np.arange(1, len(pstats) + 1, dtype=np.int64))
    return pa.Table.from_pandas(pstats, preserve_index=False)
