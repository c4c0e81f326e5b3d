"""URL canonicalization + canonical-URL dedup (Common-Crawl pipeline
practice: the same page is fetched under scheme/www/fragment/tracking-param
variants; dedup keys on the canonical form).

Canonicalization rules (mirrored exactly by the SQL oracle — every rule a
string transform both sides implement character-for-character):

1. strip the scheme (``http://`` / ``https://``);
2. drop the fragment (``#...``);
3. lowercase the HOST only, strip a leading ``www.``;
4. strip trailing ``/`` from the path;
5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref=``) and
   SORT the survivors by raw ``k=v`` string (param order is noise).

Dedup = ONE ``groupby(canonical)``; the minimum doc_id per group keeps.
Stateless per-row canonicalization streams; at 100 TB the one shuffle
moves (doc_id, canonical) pairs only.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TRACKING = ("utm_", "fbclid", "gclid", "ref=")
_TRAIL = re.compile(r"/+$")


def canonical_url(url: str) -> str:
    u = url
    for p in ("https://", "http://"):
        if u.startswith(p):
            u = u[len(p):]
            break
    u = u.split("#", 1)[0]
    if "?" in u:
        pathpart, q = u.split("?", 1)
    else:
        pathpart, q = u, ""
    if "/" in pathpart:
        host, rest = pathpart.split("/", 1)
        path = "/" + rest
    else:
        host, path = pathpart, ""
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    path = _TRAIL.sub("", path)
    params = sorted(kv for kv in q.split("&")
                    if kv and not kv.startswith(_TRACKING))
    return host + path + (("?" + "&".join(params)) if params else "")


class Canonicalize:
    """Stateless map_batches stage: add the canonical column."""

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t.column(self.url_col).to_pylist()
        return t.append_column(
            "canonical",
            pa.array([canonical_url(u or "") for u in urls],
                     type=pa.string()))


def _mark_winner(g: pa.Table) -> pa.Table:
    ids = g.column("doc_id").to_numpy()
    keep = np.zeros(len(ids), dtype=np.int64)
    keep[int(np.argmin(ids))] = 1
    return g.append_column("keep", pa.array(keep, type=pa.int64()))


def url_dedup(ds, url_col: str = "url"):
    """Returns a Dataset of (doc_id, url, canonical, keep): keep = 1 on
    the min-doc_id representative of each canonical group."""
    return (ds.map_batches(Canonicalize(url_col), batch_format="pyarrow")
            .groupby("canonical")
            .map_groups(_mark_winner, batch_format="pyarrow"))
