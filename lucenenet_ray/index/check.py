"""CheckIndex analog: walk every bucket verifying index invariants.

Mirrors ``src/Lucene.Net/Index/CheckIndex.cs:62`` (term counts, postings
monotonicity, norms presence, stats consistency) over the Parquet index
layout (FIXTURES.md §6). Raises ``CorruptIndexError`` on the first violation,
or returns a stats dict when clean.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq

from lucenenet_ray.index.codec import decode_docs, decode_freqs, decode_positions


class CorruptIndexError(Exception):
    pass


def check_index(index_path: str, check_positions: bool = True) -> dict:
    import json

    with open(os.path.join(index_path, "manifest.json")) as f:
        manifest = json.load(f)
    codec = manifest.get("config", {}).get("codec", "vint")

    n_terms = 0
    n_postings = 0
    df_by_term: dict[str, int] = {}
    for fp in sorted(glob.glob(os.path.join(index_path, "postings", "*.parquet"))):
        t = pq.read_table(fp)
        terms = t.column("term").to_pylist()
        if terms != sorted(terms):
            raise CorruptIndexError(f"{fp}: term dictionary not sorted")
        if len(set(terms)) != len(terms):
            raise CorruptIndexError(f"{fp}: duplicate terms")
        for i in range(t.num_rows):
            term = terms[i]
            df = t.column("df")[i].as_py()
            try:
                db = t.column("doc_bytes")[i].as_py()
                docs = decode_docs(db, df, codec=codec)
                freqs = decode_freqs(t.column("freq_bytes")[i].as_py(), df,
                                     codec=codec, doc_bytes=db)
            except ValueError as e:
                raise CorruptIndexError(f"{fp}:{term}: {e}") from e
            if len(docs) != df or len(freqs) != df:
                raise CorruptIndexError(f"{fp}:{term}: df mismatch")
            if df > 1 and not np.all(np.diff(docs) > 0):
                raise CorruptIndexError(f"{fp}:{term}: docIDs not increasing")
            if not np.all(freqs >= 1):
                raise CorruptIndexError(f"{fp}:{term}: freq < 1")
            if int(freqs.sum()) != t.column("ttf")[i].as_py():
                raise CorruptIndexError(f"{fp}:{term}: ttf != sum(freqs)")
            blast = t.column("block_last_doc")[i].as_py()
            if blast[-1] != docs[-1]:
                raise CorruptIndexError(f"{fp}:{term}: block_last_doc tail wrong")
            if int(max(freqs)) != t.column("max_freq")[i].as_py():
                raise CorruptIndexError(f"{fp}:{term}: max_freq wrong")
            if check_positions:
                pos_b = t.column("pos_bytes")[i].as_py()
                if pos_b:
                    for p, fr in zip(decode_positions(pos_b, freqs), freqs):
                        if len(p) != fr or (len(p) > 1 and not np.all(np.diff(p) > 0)):
                            raise CorruptIndexError(
                                f"{fp}:{term}: positions corrupt"
                            )
            df_by_term[term] = df_by_term.get(term, 0) + int(df)
            n_postings += int(df)
        n_terms += t.num_rows

    n_docs = 0
    sum_len = 0
    for fp in sorted(glob.glob(os.path.join(index_path, "norms", "*.parquet"))):
        t = pq.read_table(fp)
        ids = t.column("doc_id").to_numpy()
        if len(ids) > 1 and not np.all(np.diff(ids) > 0):
            raise CorruptIndexError(f"{fp}: norm docIDs not increasing")
        n_docs += len(ids)
        sum_len += int(np.sum(t.column("doc_len").to_numpy()))

    if n_docs != manifest["n_docs"]:
        raise CorruptIndexError(
            f"manifest n_docs {manifest['n_docs']} != norms {n_docs}"
        )
    if sum_len != manifest["sum_total_term_freq"]:
        raise CorruptIndexError("manifest sumTotalTermFreq != sum(doc_len)")

    # global termstats must equal per-bucket df sums
    ts = pq.read_table(os.path.join(index_path, "termstats"))
    for i in range(ts.num_rows):
        term = ts.column("term")[i].as_py()
        if df_by_term.get(term, 0) != ts.column("df")[i].as_py():
            raise CorruptIndexError(f"termstats df mismatch for {term!r}")

    return {
        "n_docs": n_docs,
        "n_terms_rows": n_terms,
        "n_postings": n_postings,
        "vocab": ts.num_rows,
        "status": "clean",
    }
