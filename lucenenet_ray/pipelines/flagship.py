"""Flagship pipeline: Common-Crawl-style pages → merged BM25 index → queries.

The end-to-end path of the north star (SURVEY §3.1/§3.2 Ray equivalents):

    read_parquet(pages)                      # column-pruned at the read
      → groupby(url) keep-latest             # exact dedup (IndexWriter
                                             #   UpdateDocument analog,
                                             #   IndexWriter.cs:1538-1556)
      → map_batches(ExtractHTML)             # DemoHTMLParser-equivalent
      → map_batches(add doc ids)             # deterministic md5-based docIDs
      → build_index(...)                     # invert → salted merge → shards
    then: parse_query → plan (global stats) → per-bucket score → TopDocs merge
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucenenet_ray.extract import ExtractHTML
from lucenenet_ray.index.build import IndexConfig, build_index
from lucenenet_ray.search.query import parse_query
from lucenenet_ray.search.reader import IndexReader
from lucenenet_ray.search.searcher import TopDocs, search
from lucenenet_ray.sources.pages import doc_id_for_url, pages_parquet

ID_SPACE_MAX = (1 << 60) - 1  # md5-derived docIDs live in [0, 2^60)


def keep_latest_by_url(group: pa.Table) -> pa.Table:
    """Exact dedup: per url keep the row with the greatest warc_ts (ties:
    lexicographically greatest html bytes — fully deterministic)."""
    if group.num_rows == 1:
        return group
    idx = pc.sort_indices(
        group, sort_keys=[("warc_ts", "descending"), ("html", "descending")]
    )
    return group.take(idx[:1])


def dedup_latest(ds, max_broadcast_urls: int = 10_000_000):
    """Exact dedup keep-latest-per-url (the IndexWriter.UpdateDocument
    last-writer-wins analog, IndexWriter.cs:1538-1556).

    Fast path (vectorized, no per-group Python): per-batch partial
    (url, max warc_ts) via pyarrow groupby → native groupby(url).aggregate(Max)
    over the small partials → broadcast the winner map with ray.put → filter
    inside map_batches. Rows tied on (url, warc_ts) are resolved by greatest
    html bytes in a per-batch pass (url+ts collisions across different
    batches are not expected from crawl data; the shuffle fallback handles
    them exactly).

    Above ``max_broadcast_urls`` the winner map no longer fits the object
    store comfortably → falls back to the exact hash-shuffle
    (groupby(url).map_groups), which scales but pays per-group overhead.
    """
    import ray
    import ray.data as rd

    def partial_max(t: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(t.select(["url", "warc_ts"]), "url").aggregate(
            [("warc_ts", "max"), ("url", "count")]
        )
        return agg.rename_columns(["url", "warc_ts", "cnt"])

    # Per-batch vectorized partials, final combine ON THE DRIVER (partials are
    # (url, ts) pairs — ≤ a few MB per million urls). Above the broadcast
    # threshold, fall back to the distributed hash shuffle.
    partials = ds.map_batches(partial_max, batch_format="pyarrow")
    partial_tables = ray.get(partials.to_arrow_refs())
    n_partial_rows = sum(t.num_rows for t in partial_tables)
    if n_partial_rows > max_broadcast_urls:
        return ds.groupby("url").map_groups(keep_latest_by_url, batch_format="pyarrow")
    allp = pa.concat_tables(partial_tables)
    agg = pa.TableGroupBy(allp, "url").aggregate(
        [("warc_ts", "max"), ("cnt", "sum")]
    ).rename_columns(["url", "max_ts", "n"])
    # only DUPLICATED urls need resolution — broadcast just those (dup rate in
    # crawl data is a few %, so this table is tiny even at large corpus
    # sizes); per-batch cnt partials sum correctly across batches.
    dups = agg.filter(pc.greater(agg.column("n"), 1)).select(["url", "max_ts"])
    winner_ref = ray.put(dups.combine_chunks())

    def keep_winners(t: pa.Table) -> pa.Table:
        winners = ray.get(winner_ref)
        if winners.num_rows == 0:
            return t
        # vectorized hash semi-join against the small dup-url table: a row is
        # dropped iff its url is duplicated AND its ts is not the winner ts
        t = t.append_column("__row", pa.array(range(t.num_rows), type=pa.int64()))
        j = t.select(["__row", "url", "warc_ts"]).join(
            winners, keys="url", join_type="inner"
        )
        drop_rows = j.filter(
            pc.invert(pc.equal(j.column("warc_ts"), j.column("max_ts")))
        ).column("__row")
        if len(drop_rows):
            mask = np.ones(t.num_rows, dtype=bool)
            mask[drop_rows.to_numpy()] = False
            t = t.filter(pa.array(mask))
        t = t.drop_columns(["__row"])
        # resolve exact (url, ts) ties within the batch deterministically
        if t.num_rows and len(set(t.column("url").to_pylist())) < t.num_rows:
            idx = pc.sort_indices(
                t, sort_keys=[("url", "ascending"), ("html", "descending")]
            )
            t = t.take(idx)
            uu = t.column("url").to_pylist()
            keep = [i == 0 or uu[i] != uu[i - 1] for i in range(len(uu))]
            t = t.filter(pa.array(keep, type=pa.bool_()))
        return t

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def _add_doc_ids(batch: pa.Table) -> pa.Table:
    ids = [doc_id_for_url(u) for u in batch.column("url").to_pylist()]
    return batch.append_column("doc_id", pa.array(ids, type=pa.int64()))


def index_pages(
    pages_path: str,
    index_path: str,
    n_buckets: int = 16,
    n_hparts: int = 8,
    concurrency: int | None = None,
    batch_size: int = 1024,
    overwrite: bool = True,
):
    """pages parquet → merged index at index_path; returns the manifest."""
    import time

    import ray.data as rd

    prof = os.environ.get("GRAFT_PROFILE")
    t0 = time.perf_counter()

    if overwrite and os.path.exists(index_path):
        shutil.rmtree(index_path)
    os.makedirs(index_path, exist_ok=True)

    # Fixed block target: coarse enough that per-task overheads amortize
    # (~20k pages/task at bench scale), fine enough to load-balance 8..256
    # workers. A data-layout-independent knob — output bytes don't depend on
    # blocking.
    ds = rd.read_parquet(pages_path, columns=["url", "warc_ts", "html", "lang"],
                         override_num_blocks=128)
    ds = dedup_latest(ds)
    if prof:
        import sys

        print(f"[prof] dedup plan+combine: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    # batch 1024 ≈ 0.2 s/task of HTML parsing: large enough that driver-side
    # task scheduling doesn't dominate, small enough to pipeline (html rows
    # are a few KB; for multi-MB pages lower this — SURVEY §4 memory-aware)
    ds = ds.map_batches(ExtractHTML(), batch_format="pyarrow", batch_size=1024)
    ds = ds.map_batches(_add_doc_ids, batch_format="pyarrow")
    ds = ds.select_columns(["doc_id", "text", "lang"])

    cfg = IndexConfig(
        index_path=index_path,
        id_min=0,
        id_max=ID_SPACE_MAX,
        n_buckets=n_buckets,
        n_hparts=n_hparts,
        batch_size=batch_size,
        concurrency=concurrency,
        lang_col="lang",  # per-language analyzer dispatch (input_hint)
    )
    return build_index(ds, cfg, text_col="text", id_col="doc_id")


def index_documents(
    sf_dir: str,
    index_path: str,
    n_buckets: int = 8,
    overwrite: bool = True,
    concurrency: int | None = None,
):
    """Index the driver testdata ``documents`` table directly (doc_id, text).
    This is the SQL-oracle-checkable path (__ray_entry__)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    if overwrite and os.path.exists(index_path):
        shutil.rmtree(index_path)
    src = os.path.join(sf_dir, "documents.parquet")
    md = pq.read_metadata(src)
    n = md.num_rows
    ds = rd.read_parquet(src, columns=["doc_id", "text"])
    cfg = IndexConfig(
        index_path=index_path,
        id_min=0,
        id_max=max(n - 1, 1),
        n_buckets=n_buckets,
        concurrency=concurrency,
    )
    return build_index(ds, cfg, text_col="text", id_col="doc_id")


_INDEX_CACHE: dict[str, str] = {}


def documents_index_for(sf_dir: str, cache_root: str = "/tmp/lucenenet_ray_idx") -> str:
    """Build (once per process/sf) the documents index; returns index path."""
    key = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(cache_root, f"documents_{key}")
    if key not in _INDEX_CACHE:
        if not os.path.exists(os.path.join(path, "manifest.json")):
            index_documents(sf_dir, path)
        _INDEX_CACHE[key] = path
    return _INDEX_CACHE[key]


def documents_multilang_index_for(sf_dir: str,
                                  cache_root: str = "/tmp/lucenenet_ray_idx") -> str:
    """documents index with per-language analyzer dispatch (lang column)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index

    key = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(cache_root, f"documents_ml_{key}")
    if not os.path.exists(os.path.join(path, "manifest.json")):
        src = os.path.join(sf_dir, "documents.parquet")
        n = pq.read_metadata(src).num_rows
        ds = rd.read_parquet(src, columns=["doc_id", "text", "lang"])
        cfg = IndexConfig(index_path=path, id_min=0, id_max=max(n - 1, 1),
                          n_buckets=8, lang_col="lang")
        build_index(ds, cfg, text_col="text", id_col="doc_id")
    return path


def run_query(index_path: str, query_text: str, k: int = 10,
              prune: bool = False) -> TopDocs:
    reader = IndexReader(index_path)
    return search(reader, parse_query(query_text), k=k, prune=prune)


def flagship_sf(sf_dir: str, index_root: str = "/tmp/lucenenet_ray_idx",
                queries: list[str] | None = None, k: int = 10):
    """entry() body: synthesize pages for sf_dir, index them, run the demo
    query set; returns a pandas DataFrame (query, rank, doc_id, score)."""
    import pandas as pd

    pages = pages_parquet(sf_dir)
    key = os.path.basename(os.path.normpath(sf_dir))
    index_path = os.path.join(index_root, f"pages_{key}")
    if not os.path.exists(os.path.join(index_path, "manifest.json")):
        index_pages(pages, index_path)
    reader = IndexReader(index_path)
    queries = queries or [
        "spark window",
        '"batch merge"',
        "vector AND dup",
        "customer filter order",
        "sp*",
    ]
    rows = []
    for qt in queries:
        td = search(reader, parse_query(qt), k=k)
        for rank, (doc, score) in enumerate(td.to_list()):
            rows.append(
                {"query": qt, "rank": rank, "doc_id": doc, "score": score,
                 "total_hits": td.total_hits}
            )
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score", "total_hits"])
