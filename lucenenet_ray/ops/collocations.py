"""Corpus collocation + lexical-diversity statistics over the raw token
stream — two classic corpus-linguistics ops a training-data pipeline runs
before/after curation:

- ``pmi_bigrams``: collocation extraction ranked by pointwise mutual
  information (Church & Hanks 1990).  PMI = ln(N·c_ab / (c_a·c_b)) is a
  monotone transform of the lift ratio, so the ranking is computed in
  EXACT integer fixed point ``(c_ab·N·10^9) // (c_a·c_b)`` — no float
  enters, distribution order cannot move a bit, and DuckDB re-derives the
  identical scores (the same discipline as ops/graphrank.py pagerank).

- ``ngram_diversity``: Distinct-N per source partition (the corpus-level
  diversity metric of Zhu et al. 2018 "Texygen", §4.2 — distinct n-grams
  over total n-grams; low values flag templated/boilerplate slices).
  Ratio in integer fixed point ``(distinct·10^9) // total``.

Tokenization (mirrored by the SQL oracles): raw ``text.split(' ')``
positions, empty tokens dropped, NO stopword removal — corpus statistics
keep function words, unlike the index analyzer chain (same contract as
ops/cooccur.py).

Distributed shape: every pass emits per-batch PARTIAL counts (np.unique
batch-local combine), ONE corpus-scale groupby reduces each count table;
unigram totals are vocabulary-scale and are joined driver-side (broadcast
altitude — at an open-web vocabulary the documented fallback is a hash
join of the bigram table against the unigram table on each component,
two key-aligned shuffles, same results).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1_000_000_000


def _token_arrays(t: pa.Table) -> list[np.ndarray]:
    return [np.asarray([w for w in (x or "").split(" ") if w], dtype=object)
            for x in t.column("text").to_pylist()]


def _unigram_partials(t: pa.Table) -> pa.Table:
    toks = _token_arrays(t)
    if toks:
        allw = np.concatenate([a for a in toks if a.size] or
                              [np.asarray([], dtype=object)])
    else:
        allw = np.asarray([], dtype=object)
    uniq, cnt = np.unique(allw.astype(str), return_counts=True)
    return pa.table({"term": pa.array(uniq, type=pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64))})


def _bigram_partials(t: pa.Table) -> pa.Table:
    toks = _token_arrays(t)
    aa, bb = [], []
    for a in toks:
        if a.size >= 2:
            aa.append(a[:-1])
            bb.append(a[1:])
    if not aa:
        return pa.table({"a": pa.array([], type=pa.string()),
                         "b": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    av = np.concatenate(aa).astype(str)
    bv = np.concatenate(bb).astype(str)
    joined = np.char.add(np.char.add(av, "\x1f"), bv)
    uniq, cnt = np.unique(joined, return_counts=True)
    sp = np.char.partition(uniq, "\x1f")
    return pa.table({"a": pa.array(sp[:, 0], type=pa.string()),
                     "b": pa.array(sp[:, 2], type=pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64))})


def pmi_bigrams(ds, k: int = 20, min_count: int = 5) -> pa.Table:
    """(rank, a, b, c_ab, lift) — top-k adjacent bigrams with
    c_ab >= min_count by lift = (c_ab*N*SCALE) // (c_a*c_b) (monotone in
    PMI), ties (a asc, b asc)."""
    uni = (ds.map_batches(_unigram_partials, batch_format="pyarrow")
           .groupby("term").sum("cnt").to_pandas())
    c_of = dict(zip(uni["term"], uni["sum(cnt)"].astype(np.int64)))
    n_total = int(uni["sum(cnt)"].sum())

    big = (ds.map_batches(_bigram_partials, batch_format="pyarrow")
           .groupby(["a", "b"]).sum("cnt").to_pandas())
    big = big.rename(columns={"sum(cnt)": "c_ab"})
    big = big[big["c_ab"] >= min_count].copy()
    ca = big["a"].map(c_of).astype(np.int64)
    cb = big["b"].map(c_of).astype(np.int64)
    # python-int products: c_ab*N*SCALE overflows int64 at corpus scale
    big["lift"] = [
        (int(cab) * n_total * SCALE) // (int(x) * int(y))
        for cab, x, y in zip(big["c_ab"], ca, cb)
    ]
    big = big.sort_values(["lift", "a", "b"],
                          ascending=[False, True, True]).head(k)
    big["c_ab"] = big["c_ab"].astype(np.int64)
    big["lift"] = big["lift"].astype(np.int64)
    big.insert(0, "rank", np.arange(1, len(big) + 1, dtype=np.int64))
    return pa.Table.from_pandas(big.reset_index(drop=True),
                                preserve_index=False)


def _diversity_partials(t: pa.Table, n: int) -> pa.Table:
    toks = _token_arrays(t)
    src = t.column("source").to_pylist()
    rows_s, rows_g = [], []
    for s, a in zip(src, toks):
        if a.size >= n:
            grams = a[: a.size - n + 1].astype(str)
            for j in range(1, n):
                grams = np.char.add(np.char.add(grams, "\x1f"),
                                    a[j: a.size - n + 1 + j].astype(str))
            rows_s.append(np.full(grams.size, s, dtype=object))
            rows_g.append(grams)
    if not rows_s:
        return pa.table({"source": pa.array([], type=pa.string()),
                         "gram": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    sv = np.concatenate(rows_s).astype(str)
    gv = np.concatenate(rows_g)
    joined = np.char.add(np.char.add(sv, "\x1e"), gv)
    uniq, cnt = np.unique(joined, return_counts=True)
    sp = np.char.partition(uniq, "\x1e")
    return pa.table({"source": pa.array(sp[:, 0], type=pa.string()),
                     "gram": pa.array(sp[:, 2], type=pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64))})


def ngram_diversity(ds, n: int = 2) -> pa.Table:
    """(source, total_ngrams, distinct_ngrams, diversity) per source,
    source-sorted; diversity = (distinct*SCALE) // total."""
    counts = (ds.map_batches(_diversity_partials, fn_kwargs={"n": n},
                             batch_format="pyarrow")
              .groupby(["source", "gram"]).sum("cnt"))

    def fold_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "source": t.column("source").to_pylist(),
            "cnt": t.column("sum(cnt)").to_numpy(zero_copy_only=False),
        })
        g = df.groupby("source")["cnt"].agg(["sum", "count"]).reset_index()
        return pa.table({
            "source": pa.array(g["source"], type=pa.string()),
            "total": pa.array(g["sum"].to_numpy(dtype=np.int64)),
            "distinct": pa.array(g["count"].to_numpy(dtype=np.int64)),
        })

    agg = (counts.map_batches(fold_partial, batch_format="pyarrow")
           .groupby("source").sum(["total", "distinct"]).to_pandas())
    agg = agg.rename(columns={"sum(total)": "total_ngrams",
                              "sum(distinct)": "distinct_ngrams"})
    agg["total_ngrams"] = agg["total_ngrams"].astype(np.int64)
    agg["distinct_ngrams"] = agg["distinct_ngrams"].astype(np.int64)
    agg["diversity"] = (agg["distinct_ngrams"].astype(object) * SCALE
                        // agg["total_ngrams"].astype(object)).astype(np.int64)
    agg = agg.sort_values("source").reset_index(drop=True)
    return pa.Table.from_pandas(agg, preserve_index=False)


def significant_terms(ds, focus_term: str, k: int = 20,
                      min_fg_df: int = 3) -> pa.Table:
    """Significant-terms aggregation (the Elasticsearch
    `significant_terms` shape; scoring is the epidemiology relative-risk
    / lift form, integer fixed point): terms whose document frequency
    inside the FOREGROUND set (docs containing ``focus_term``) is
    overrepresented vs the whole corpus.

    score(t) = (fg_df(t) * N_total * 10^9) // (df(t) * N_fg) — the lift
    of P(t | fg) over P(t); the focus term itself is excluded and terms
    with fg_df < min_fg_df are dropped (the ES shard_min_doc_count
    knob).  The foreground predicate here is term containment so the
    DuckDB oracle can re-derive it; an index-produced DocIdSet plugs
    into the same aggregation for arbitrary queries.

    Shape: ONE map_batches pass emits per-batch (term, fg_df, df)
    partials over per-doc DISTINCT terms + a (kind-tagged) doc-count
    row; ONE vocabulary-bounded groupby reduces; scoring and top-k run
    on the vocab-scale aggregate."""
    from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS

    def partials(t: pa.Table) -> pa.Table:
        fg_df: dict[str, int] = {}
        df: dict[str, int] = {}
        n_fg = n_tot = 0
        for x in t.column("text").to_pylist():
            toks = {w for w in (x or "").split(" ")
                    if w and w not in ENGLISH_STOP_WORDS}
            in_fg = focus_term in toks
            n_tot += 1
            n_fg += int(in_fg)
            for w in toks:
                df[w] = df.get(w, 0) + 1
                if in_fg:
                    fg_df[w] = fg_df.get(w, 0) + 1
        ws = sorted(df)
        # doc totals ride as a reserved-key row (single shared schema)
        return pa.table({
            "term": pa.array(ws + ["\x00docs"], type=pa.string()),
            "fg_df": pa.array([fg_df.get(w, 0) for w in ws] + [n_fg],
                              type=pa.int64()),
            "df": pa.array([df[w] for w in ws] + [n_tot],
                           type=pa.int64()),
        })

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("term").sum(["fg_df", "df"]).to_pandas())
    agg = agg.rename(columns={"sum(fg_df)": "fg_df", "sum(df)": "df"})
    totals = agg[agg["term"] == "\x00docs"].iloc[0]
    n_fg, n_tot = int(totals["fg_df"]), int(totals["df"])
    agg = agg[(agg["term"] != "\x00docs")
              & (agg["term"] != focus_term)
              & (agg["fg_df"] >= min_fg_df)].copy()
    agg["score"] = [
        (int(f) * n_tot * SCALE) // (int(d) * n_fg)
        for f, d in zip(agg["fg_df"], agg["df"])
    ]
    agg = agg.sort_values(["score", "term"],
                          ascending=[False, True]).head(k)
    out = agg[["term", "fg_df", "df", "score"]].reset_index(drop=True)
    for c in ("fg_df", "df", "score"):
        out[c] = out[c].astype(np.int64)
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return pa.Table.from_pandas(out, preserve_index=False)


def boilerplate_prefixes(ds, k: int = 20, n: int = 3) -> pa.Table:
    """(rank, prefix, n_docs) — top-k first-``n``-raw-token document
    prefixes (the boilerplate/template detector of web-corpus curation —
    C4's repeated-line family, applied at the doc-prefix level): docs
    sharing an opening phrase are template instances.  Per-batch prefix
    partials, ONE prefix-type-bounded groupby."""
    def partials(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for x in t.column("text").to_pylist():
            toks = (x or "").split(" ")
            if len(toks) >= n:
                p = " ".join(toks[:n])
                cnt[p] = cnt.get(p, 0) + 1
        ks = sorted(cnt)
        return pa.table({"prefix": pa.array(ks, type=pa.string()),
                         "cnt": pa.array([cnt[x] for x in ks],
                                         type=pa.int64())})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("prefix").sum("cnt").to_pandas())
    agg = agg.rename(columns={"sum(cnt)": "n_docs"})
    agg = agg.sort_values(["n_docs", "prefix"],
                          ascending=[False, True]).head(k)
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    agg = agg.reset_index(drop=True)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg, preserve_index=False)


def simpson_index(ds) -> pa.Table:
    """Per-source Simpson concentration index (Simpson, Nature 1949;
    the collision-probability form λ = Σ (c_w/N)² — the corpus
    CONCENTRATION metric dual to Distinct-N diversity): exact integers
    via the sufficient statistics (N, Σc²); λ_fp = (Σc²·10^9) // N².

    One vocab-bounded (source, term) count groupby + a per-source fold
    of squared counts.  Returns (source, n_tokens, sum_sq, simpson_fp),
    source-sorted."""
    counts = (ds.map_batches(
        lambda t: _src_term_partials(t), batch_format="pyarrow")
        .groupby(["source", "term"]).sum("cnt"))

    def fold(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "source": t.column("source").to_pylist(),
            "cnt": t.column("sum(cnt)").to_numpy(zero_copy_only=False),
        })
        g = df.groupby("source")["cnt"].agg(
            n_tokens="sum",
            sum_sq=lambda c: int((c.astype(object) ** 2).sum()),
        ).reset_index()
        return pa.table({
            "source": pa.array(g["source"], type=pa.string()),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
            "sum_sq": pa.array(g["sum_sq"].astype(np.int64)),
        })

    agg = (counts.map_batches(fold, batch_format="pyarrow")
           .groupby("source").sum(["n_tokens", "sum_sq"]).to_pandas())
    agg = agg.rename(columns={"sum(n_tokens)": "n_tokens",
                              "sum(sum_sq)": "sum_sq"})
    agg["simpson_fp"] = [
        (int(s) * SCALE) // (int(n) * int(n)) if n else 0
        for s, n in zip(agg["sum_sq"], agg["n_tokens"])
    ]
    agg = agg.sort_values("source").reset_index(drop=True)
    for c in ("n_tokens", "sum_sq", "simpson_fp"):
        agg[c] = agg[c].astype(np.int64)
    return pa.Table.from_pandas(agg, preserve_index=False)


def _src_term_partials(t: pa.Table) -> pa.Table:
    cnt: dict[tuple, int] = {}
    for s, x in zip(t.column("source").to_pylist(),
                    t.column("text").to_pylist()):
        for w in (x or "").split(" "):
            if w:
                cnt[(s, w)] = cnt.get((s, w), 0) + 1
    ks = sorted(cnt)
    return pa.table({
        "source": pa.array([a for a, _ in ks], type=pa.string()),
        "term": pa.array([b for _, b in ks], type=pa.string()),
        "cnt": pa.array([cnt[k] for k in ks], type=pa.int64()),
    })
