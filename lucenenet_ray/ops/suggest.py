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


def document_dictionary(ds, out_path: str, term_col: str,
                        weight_col: str | None = None,
                        payload_col: str | None = None,
                        row_group_size: int = ROW_GROUP_KEYS) -> str:
    """DocumentDictionary (``Suggest/DocumentDictionary.cs``): ONE
    suggestion entry per document — key = a stored field's value, weight
    = a numeric field (0 when absent, :118-124), optional payload.
    Documents with a null/missing key field are skipped (:104-109).
    Output: the same key-sorted parquet the suggest_* readers consume
    (duplicate keys legal — each doc keeps its own entry)."""
    import pyarrow.compute as pc

    cols = [term_col] + ([weight_col] if weight_col else []) \
        + ([payload_col] if payload_col else [])

    def project(t: pa.Table) -> pa.Table:
        keys = t.column(term_col)
        mask = pc.is_valid(keys)
        t = t.filter(mask)
        out = {"key": t.column(term_col).cast(pa.string())}
        if weight_col:
            w = t.column(weight_col).cast(pa.int64())
            out["weight"] = pc.fill_null(w, 0)
        else:
            out["weight"] = pa.array([0] * t.num_rows, type=pa.int64())
        if payload_col:
            out["payload"] = t.column(payload_col)
        return pa.table(out)

    agg = (ds.select_columns(cols)
           .map_batches(project, batch_format="pyarrow")
           .sort(key="key"))
    from lucenenet_ray.util.tables import dataset_to_table

    schema = [("key", pa.string()), ("weight", pa.int64())]
    t = dataset_to_table(agg) if payload_col else \
        dataset_to_table(agg, schema=pa.schema(schema))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(t, tmp, row_group_size=row_group_size)
    os.replace(tmp, out_path)
    return out_path


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


def _dl_within(a: str, b: str, k: int, transpositions: bool) -> bool:
    """edit_distance(a, b) <= k (optionally Damerau transpositions)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev2 = None
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(cur[j - 1] + 1, prev[j] + 1, prev[j - 1] + cost)
            if (transpositions and i > 1 and j > 1
                    and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]):
                cur[j] = min(cur[j], prev2[j - 2] + cost)
        if min(cur) > k:
            return False
        prev2, prev = prev, cur
    return prev[len(b)] <= k


def suggest_fuzzy(dict_path: str, query: str, k: int = 10,
                  max_edits: int = 1, transpositions: bool = True,
                  non_fuzzy_prefix: int = 1, min_fuzzy_length: int = 3,
                  exact_first: bool = True) -> pa.Table:
    """FuzzySuggester analog (``Suggest/Analyzing/FuzzySuggester.cs``,
    defaults :DEFAULT_*): completions whose key has SOME prefix within
    max_edits of the query (the Levenshtein-automaton × FST intersection),
    with the first non_fuzzy_prefix chars exact and no fuzzing at all for
    queries shorter than min_fuzzy_length. exact-prefix matches rank
    first (AnalyzingSuggester exactFirst), then weight desc, key asc."""
    import pyarrow.compute as pc

    q = query.strip()
    if len(q) < min_fuzzy_length or max_edits == 0:
        t = suggest_weighted(dict_path, q, k)
        return pa.table({
            "key": t.column("key"),
            "weight": t.column("weight"),
            "exact": pa.array([1] * t.num_rows, type=pa.int64()),
        })
    t = pq.read_table(dict_path)
    if non_fuzzy_prefix > 0:
        t = t.filter(pc.starts_with(t.column("key"),
                                    q[:non_fuzzy_prefix]))
    rows = []
    for key, w in zip(t.column("key").to_pylist(),
                      t.column("weight").to_pylist()):
        exact = key.startswith(q)
        ok = exact
        if not ok:
            for plen in range(max(1, len(q) - max_edits),
                              min(len(key), len(q) + max_edits) + 1):
                if _dl_within(key[:plen], q, max_edits, transpositions):
                    ok = True
                    break
        if ok:
            rows.append((key, int(w), 1 if exact else 0))
    if exact_first:
        rows.sort(key=lambda r: (-r[2], -r[1], r[0]))
    else:
        rows.sort(key=lambda r: (-r[1], r[0]))
    rows = rows[:k]
    return pa.table({
        "key": pa.array([r[0] for r in rows], type=pa.string()),
        "weight": pa.array([r[1] for r in rows], type=pa.int64()),
        "exact": pa.array([r[2] for r in rows], type=pa.int64()),
    })


def suggest_stop_filter(terms: list[str], text: str,
                        stop_words) -> list[tuple[str, bool]]:
    """SuggestStopFilter analog (``Suggest/Analyzing/SuggestStopFilter.cs``):
    stopwords are dropped EXCEPT a final stopword the user may still be
    typing — kept (keyword-marked True) when the input text ends exactly
    at the token's end (no trailing separator)."""
    out = []
    for i, t in enumerate(terms):
        if t not in stop_words:
            out.append((t, False))
        elif i == len(terms) - 1 and text.rstrip() == text \
                and text.endswith(t):
            out.append((t, True))
    return out


def suggest_fst_bucketed(dict_path: str, prefix: str, k: int = 10,
                         buckets: int = 10,
                         exact_match_first: bool = True) -> pa.Table:
    """FSTCompletionLookup analog (``Suggest/Fst/FSTCompletionLookup.cs``
    Build/DoLookup + FSTCompletionBuilder): weights are discretized into
    rank-based buckets — entries sorted (weight asc, key asc), bucket =
    line*buckets/count with equal weights inheriting the run's first
    bucket — and completions rank by (exact first, bucket desc, key asc).
    """
    t = pq.read_table(dict_path)
    rows = sorted(zip(t.column("key").to_pylist(),
                      t.column("weight").to_pylist()),
                  key=lambda r: (r[1], r[0]))
    n = len(rows)
    bucket_of = {}
    prev_w = None
    prev_b = 0
    for line, (key, w) in enumerate(rows):
        b = prev_b if (line > 0 and w == prev_w) \
            else line * buckets // n
        bucket_of[key] = b
        prev_w, prev_b = w, b
    out = [(key, int(w), bucket_of[key]) for key, w in rows
           if key.startswith(prefix)]
    if exact_match_first:
        out.sort(key=lambda r: (0 if r[0] == prefix else 1, -r[2], r[0]))
    else:
        out.sort(key=lambda r: (-r[2], r[0]))
    out = out[:k]
    return pa.table({
        "key": pa.array([r[0] for r in out], type=pa.string()),
        "bucket": pa.array([r[2] for r in out], type=pa.int64()),
    })
