"""Weighted completion suggester — the AnalyzingSuggester analog.

Reference: ``src/Lucene.Net.Suggest/Suggest/Analyzing/AnalyzingSuggester.cs``
(Lookup.Build over (surface, weight) inputs compiled into an FST keyed by the
ANALYZED form, queried by analyzed prefix, completions ordered by weight
desc). Ray-Data-native equivalent:

- **build**: analyzed keys (here 2-gram shingle surfaces — multi-token
  completions, the suggester's raison d'être) with weight = total occurrence
  count, aggregated distributed (per-batch partial counts → one groupby),
  then written as a KEY-SORTED parquet dictionary. The sorted file plays the
  FST's role: parquet row-group statistics (min/max of ``key``) give the
  same prefix-range pruning an FST arc walk gives — a query touches only the
  row groups whose [min,max] intersects [prefix, prefix+∞).
- **query**: prefix range scan over the pruned row groups + top-k by
  (weight desc, key asc).

At 10^12 docs the dictionary build is the same one-shuffle pipeline as term
stats; the dictionary itself is key-partitioned parquet and each suggest
query reads a handful of row groups.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

ROW_GROUP_KEYS = 4096


def build_suggester(ds, out_path: str, text_col: str = "text",
                    shingle_size: int = 2,
                    row_group_size: int = ROW_GROUP_KEYS) -> str:
    """Build the weighted completion dictionary from a documents Dataset.

    Keys are ``shingle_size``-gram surfaces over the RAW token stream (no
    stop filter — ShingleAnalyzerWrapper default, matching shingle_stats);
    weight = corpus-wide occurrence count. Output: one parquet file sorted
    by key with small row groups for prefix pruning.
    """
    from ray.data.aggregate import Sum

    from lucenenet_ray.analysis.filters import ShingleAnalyzer

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        an = _SHINGLE_SINGLETON.get(shingle_size)
        if an is None:
            an = ShingleAnalyzer(shingle_size, shingle_size,
                                 output_unigrams=False)
            _SHINGLE_SINGLETON[shingle_size] = an
        c: Counter = Counter()
        for x in t.column(text_col).to_pylist():
            terms, _pos = an(x)
            c.update(terms)
        keys = sorted(c)
        return pa.table({
            "key": pa.array(keys, type=pa.string()),
            "weight": pa.array([c[k] for k in keys], type=pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=256)
        .groupby("key")
        .aggregate(Sum("weight", alias_name="weight"))
        .sort(key="key")
    )
    from lucenenet_ray.util.tables import dataset_to_table

    t = dataset_to_table(agg, schema=pa.schema(
        [("key", pa.string()), ("weight", pa.int64())]))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(t, tmp, row_group_size=row_group_size)
    os.replace(tmp, out_path)
    return out_path


_SHINGLE_SINGLETON: dict[int, object] = {}


def _prefix_upper_bound(prefix: str) -> str:
    """Smallest string > every string with this prefix (for a range filter)."""
    b = prefix.encode("utf-8")
    while b and b[-1] == 0xFF:
        b = b[:-1]
    if not b:
        return "\U0010FFFF" * 4
    return (b[:-1] + bytes([b[-1] + 1])).decode("utf-8", errors="surrogateescape")


def suggest_weighted(dict_path: str, prefix: str, k: int = 10) -> pa.Table:
    """Top-k completions of ``prefix`` by (weight desc, key asc).

    Row groups whose [min,max] key stats miss the prefix range are never
    read (the FST-prefix-walk analog); verified by tests asserting the
    pruned row-group count.
    """
    t, _n_read, _n_total = _suggest_scan(dict_path, prefix)
    import pyarrow.compute as pc

    idx = pc.sort_indices(
        t, sort_keys=[("weight", "descending"), ("key", "ascending")])
    return t.take(idx[:k])


def _suggest_scan(dict_path: str, prefix: str) -> tuple[pa.Table, int, int]:
    """Prefix range scan with explicit row-group pruning; returns
    (matches, row_groups_read, row_groups_total) so tests can assert the
    pruning happened."""
    import pyarrow.compute as pc

    hi = _prefix_upper_bound(prefix)
    f = pq.ParquetFile(dict_path)
    groups = []
    for g in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(g).column(0).statistics
        if st is None or st.min is None:
            groups.append(g)
            continue
        if st.max >= prefix and st.min < hi:
            groups.append(g)
    if not groups:
        return (pa.table({"key": pa.array([], type=pa.string()),
                          "weight": pa.array([], type=pa.int64())}),
                0, f.metadata.num_row_groups)
    t = f.read_row_groups(groups)
    mask = pc.and_(pc.greater_equal(t.column("key"), prefix),
                   pc.less(t.column("key"), hi))
    return t.filter(mask), len(groups), f.metadata.num_row_groups


def suggest_infix(dict_path: str, query: str, k: int = 10) -> pa.Table:
    """AnalyzingInfixSuggester analog
    (``Suggest/Analyzing/AnalyzingInfixSuggester.cs``): match completions
    whose ANY token starts with the query (the reference indexes the
    suggestion surfaces and prefix-matches the last query token anywhere
    in them), ranked weight desc, key asc.

    Unlike the key-sorted prefix scan, infix matching can't use the sorted
    dictionary's range pruning — the reference builds a dedicated search
    index for the same reason.  The dictionary is vocabulary-scale (not
    corpus-scale) so a vectorized full scan is the honest cost here; at
    10^12-doc vocabularies hang a permuterm (token → key) sidecar next to
    the dictionary."""
    import pyarrow.compute as pc

    t = pq.read_table(dict_path)
    q = query.strip()
    m = pc.or_(pc.starts_with(t.column("key"), q),
               pc.match_substring(t.column("key"), " " + q))
    t = t.filter(m)
    idx = pc.sort_indices(t, sort_keys=[("weight", "descending"),
                                        ("key", "ascending")])
    return t.take(idx).slice(0, k)


def suggest_blended(dict_path: str, query: str, k: int = 10,
                    blender: str = "POSITION_LINEAR",
                    num_factor: int = 10) -> pa.Table:
    """BlendedInfixSuggester analog
    (``Suggest/Analyzing/BlendedInfixSuggester.cs``): infix matches scored
    by ``(long)(weight * coefficient)`` where the coefficient comes from
    the FIRST position at which a token matches the query prefix —
    POSITION_LINEAR: 1 - 0.10*position; POSITION_RECIPROCAL:
    1/(position+1) (:CalculateCoefficient). The reference over-fetches
    num_factor*k infix matches before blending; our dictionary scan is
    exhaustive so the over-fetch is implicit."""
    import pyarrow.compute as pc

    t = pq.read_table(dict_path)
    q = query.strip()
    m = pc.or_(pc.starts_with(t.column("key"), q),
               pc.match_substring(t.column("key"), " " + q))
    t = t.filter(m)
    keys = t.column("key").to_pylist()
    weights = t.column("weight").to_pylist()
    rows = []
    for key, w in zip(keys, weights):
        pos = next(i for i, tok in enumerate(key.split(" "))
                   if tok.startswith(q))
        if blender == "POSITION_RECIPROCAL":
            coef = 1.0 / (pos + 1)
        else:
            coef = 1.0 - 0.10 * pos
        rows.append((key, int(w), int(w * coef)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:k]
    return pa.table({
        "key": pa.array([r[0] for r in rows], type=pa.string()),
        "weight": pa.array([r[1] for r in rows], type=pa.int64()),
        "score": pa.array([r[2] for r in rows], type=pa.int64()),
    })
