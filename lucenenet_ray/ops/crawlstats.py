"""Crawl-frontier analytics over the page URL space — the per-host
statistics every crawler maintains (politeness budgets, host-level
dedup, seed weighting; Cho & Garcia-Molina WWW 1998's crawl-ordering
work assumes exactly these tables).

``host_stats`` parses each page URL's host component (the engine does
REAL string parsing; the oracle re-derives hosts from the synthesizer's
generator formula — the repo's standard md5/formula-synthesis gate
pattern, so the gate verifies the PARSER): per-batch host-count
partials, ONE host-bounded groupby, (count desc, host asc) top-k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def host_stats(ds, k: int = 20, id_col: str = "doc_id") -> pa.Table:
    """(rank, host, n_pages) over the synthesized per-doc URLs."""
    from lucenenet_ray.sources.pages import url_for

    def partials(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for did in t.column(id_col).to_pylist():
            url = url_for(int(did))
            # scheme://host/path -> host
            host = url.split("/", 3)[2]
            cnt[host] = cnt.get(host, 0) + 1
        ks = sorted(cnt)
        return pa.table({"host": pa.array(ks, type=pa.string()),
                         "cnt": pa.array([cnt[x] for x in ks],
                                         type=pa.int64())})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("host").sum("cnt").to_pandas())
    agg = agg.rename(columns={"sum(cnt)": "n_pages"})
    agg = agg.sort_values(["n_pages", "host"],
                          ascending=[False, True]).head(k)
    agg["n_pages"] = agg["n_pages"].astype(np.int64)
    agg = agg.reset_index(drop=True)
    agg.insert(0, "rank", np.arange(1, len(agg) + 1, dtype=np.int64))
    return pa.Table.from_pandas(agg, preserve_index=False)


def host_gini(ds, id_col: str = "doc_id") -> pa.Table:
    """ONE-row Gini coefficient of page counts across hosts — the
    crawl-skew concentration metric (the standard Gini over the sorted
    host-size distribution; for ascending sizes c_1..c_n:
    G = (2·Σ i·c_i)/(n·T) − (n+1)/n).  Exact integers throughout:
    G_fp = ((2·Σ i·c_i − (n+1)·T) · 10^9) // (n·T) — the numerator is
    provably non-negative for ascending order, so floor semantics agree
    everywhere.  Host counts come from the host_stats groupby; the
    Gini fold runs on the |hosts| aggregate."""
    from lucenenet_ray.sources.pages import url_for

    def partials(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for did in t.column(id_col).to_pylist():
            host = url_for(int(did)).split("/", 3)[2]
            cnt[host] = cnt.get(host, 0) + 1
        ks = sorted(cnt)
        return pa.table({"host": pa.array(ks, type=pa.string()),
                         "cnt": pa.array([cnt[x] for x in ks],
                                         type=pa.int64())})

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("host").sum("cnt").to_pandas())
    c = np.sort(agg["sum(cnt)"].to_numpy(dtype=np.int64))
    n = int(c.size)
    T = int(c.sum())
    weighted = int((np.arange(1, n + 1, dtype=object) *
                    c.astype(object)).sum())
    gini_fp = ((2 * weighted - (n + 1) * T) * 1_000_000_000) // (n * T) \
        if n and T else 0
    return pa.table({
        "n_hosts": pa.array([n], type=pa.int64()),
        "n_pages": pa.array([T], type=pa.int64()),
        "gini_fp": pa.array([gini_fp], type=pa.int64()),
    })
