"""DuckDB oracle-SQL generators for the driver correctness gate.

Each generator returns ANSI-ish SQL (DuckDB 1.0) computing the same result as
the corresponding Ray pipeline over the pre-registered testdata views.

The BM25 oracles reproduce the engine's float32 arithmetic BIT-EXACTLY in
SQL: DuckDB's REAL arithmetic is IEEE-754 binary32 with correct rounding
(verified empirically), but its decimal-literal→REAL parse is sloppy — so
every float constant is routed through ``CAST(CAST(x AS DOUBLE) AS REAL)``,
and the SmallFloat norm-byte quantization (SmallSingle.SingleToByte315) is
emulated with exponent/mantissa math on the float32 value (exactly
representable in DOUBLE).  Validated: norm bytes equal for doc lengths
1..10000; the 256-entry cache, idf, avgdl, and the score kernel are bit-equal
to the numpy float32 engine.

Tokenization parity: the documents corpus is single-space-separated lowercase
ASCII (verified), so ``string_split(text, ' ')`` equals the UAX#29 analyzer
output on this corpus; the 33-entry stop set is Lucene's
(StopAnalyzer.cs:44-56).
"""

from __future__ import annotations

from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS

STOP_SQL = "(" + ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS)) + ")"

# float32 constants (exact or via double-cast)
_R = "CAST(CAST({v} AS DOUBLE) AS REAL)"
K1_R = _R.format(v="1.2")
B_R = _R.format(v="0.75")
ONE_MINUS_B_R = _R.format(v="0.25")
ZERO_R = "CAST(0.0 AS REAL)"
K1P1_R = f"({K1_R} + CAST(1.0 AS REAL))"  # float32 1.2f + 1f

# ---------------------------------------------------------------------------
# shared CTE fragments over the `documents` view


def _toks_cte(table: str = "documents") -> str:
    return f"""
toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM {table}
),
kept AS (
  SELECT doc_id, term, pos FROM toks
  WHERE term <> '' AND term NOT IN {STOP_SQL}
),
doclen AS (
  SELECT d.doc_id, COALESCE(k.L, 0) AS L
  FROM {table} d
  LEFT JOIN (SELECT doc_id, count(*) AS L FROM kept GROUP BY doc_id) k
    USING (doc_id)
),
coll AS (
  SELECT count(*) AS N, sum(L) AS sumttf FROM doclen
)"""


_NORM_CTE = f"""
normf AS (
  SELECT doc_id, L,
         CASE WHEN L = 0 THEN NULL
              ELSE CAST(1.0 AS REAL) / CAST(sqrt(CAST(L AS DOUBLE)) AS REAL)
         END AS f
  FROM doclen
),
normb AS (
  -- SmallSingle.SingleToByte315(1/sqrt(L)): top-11-bit float32 truncation
  SELECT doc_id, L,
         CASE WHEN L = 0 THEN 255
              ELSE GREATEST(1,
                4 * (CAST(floor(log2(f)) AS BIGINT) + 127)
                + CAST(floor((f / power(2.0, floor(log2(f))) - 1.0) * 4.0) AS BIGINT)
                - 384)
         END AS nb
  FROM normf
),
normcache AS (
  -- BM25Similarity cache[b] = k1*((1-b) + b*NORM_TABLE[nb]/avgdl), float32
  SELECT n.doc_id, n.L, n.nb,
    {K1_R} * ({ONE_MINUS_B_R} + {B_R} *
      (CAST(1.0 AS REAL) /
        (CAST((1.0 + CAST((n.nb + 384) % 4 AS DOUBLE)/4.0)
              * power(2.0, CAST(floor((n.nb + 384)/4) AS BIGINT) - 127) AS REAL)
         * CAST((1.0 + CAST((n.nb + 384) % 4 AS DOUBLE)/4.0)
              * power(2.0, CAST(floor((n.nb + 384)/4) AS BIGINT) - 127) AS REAL)))
      / (SELECT CAST(CAST(sumttf AS DOUBLE)/N AS REAL) FROM coll)) AS cache
  FROM normb n
)"""


def term_stats_sql() -> str:
    """(term, df, ttf) over documents — mirrors the index's global termstats."""
    return f"""WITH {_toks_cte()}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
FROM kept GROUP BY term ORDER BY term"""


def collection_stats_sql() -> str:
    return f"""WITH {_toks_cte()}
SELECT N AS n_docs, sumttf AS sum_total_term_freq FROM coll"""


def doc_norms_sql() -> str:
    """(doc_id, doc_len, norm byte) — the index's norms columns."""
    return f"""WITH {_toks_cte()},{_NORM_CTE}
SELECT doc_id, L AS doc_len, nb AS norm FROM normb ORDER BY doc_id"""


def top_terms_sql(n: int = 20) -> str:
    """HighFreqTerms analog (Misc/HighFreqTerms.cs): top-n by df desc."""
    return f"""WITH {_toks_cte()}
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
FROM kept GROUP BY term ORDER BY df DESC, term LIMIT {n}"""


def prefix_df_sql(prefix: str) -> str:
    """PrefixQuery rewrite surface: matching terms with df (term order)."""
    esc = prefix.replace("'", "''")
    return f"""WITH {_toks_cte()}
SELECT term, count(DISTINCT doc_id) AS df FROM kept
WHERE term LIKE '{esc}%' GROUP BY term ORDER BY term"""


def _weights_cte(terms: list[str]) -> str:
    """Per-term float32 weightValue = idf * (k1+1); df over the whole corpus."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
qstats AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM kept
  WHERE term IN ({terms_sql}) GROUP BY term
),
qweights AS (
  SELECT term, df,
    CAST(ln(1 + (CAST((SELECT N FROM coll) AS DOUBLE) - df + 0.5)/(df + 0.5)) AS REAL) AS idf,
    CAST(ln(1 + (CAST((SELECT N FROM coll) AS DOUBLE) - df + 0.5)/(df + 0.5)) AS REAL) * {K1P1_R} AS wv
  FROM qstats
)"""


def bm25_topk_sql(terms: list[str], k: int = 10, mode: str = "or") -> str:
    """Full BM25 top-k oracle — float32-bit-identical to the engine.

    mode 'or'  → BooleanQuery of SHOULD TermQuery clauses
    mode 'and' → MUST clauses (doc must contain every term)
    Output: (rank, doc_id, score DOUBLE) ordered by (score desc, doc_id asc)
    — HitQueue tie-break (HitQueue.cs:77-87).
    """
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    # float32 left-assoc sum in clause order
    score_expr = f"COALESCE(s0, {ZERO_R})"
    for i in range(1, len(terms)):
        score_expr = f"({score_expr} + COALESCE(s{i}, {ZERO_R}))"
    pivot_cols = ",\n    ".join(
        f"MAX(CASE WHEN term = '{t}' THEN s END) AS s{i}" for i, t in enumerate(terms)
    )
    and_filter = (
        "HAVING count(DISTINCT term) = " + str(len(set(terms))) if mode == "and" else ""
    )
    return f"""WITH {_toks_cte()},{_NORM_CTE},{_weights_cte(terms)},
tf AS (
  SELECT doc_id, term, CAST(count(*) AS REAL) AS f
  FROM kept WHERE term IN ({terms_sql}) GROUP BY doc_id, term
),
persc AS (
  SELECT tf.doc_id, tf.term,
         (w.wv * tf.f) / (tf.f + c.cache) AS s
  FROM tf
  JOIN qweights w USING (term)
  JOIN normcache c ON c.doc_id = tf.doc_id
),
agg AS (
  SELECT doc_id, {pivot_cols}
  FROM persc GROUP BY doc_id {and_filter}
),
scored AS (
  SELECT doc_id, {score_expr} AS score FROM agg
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, CAST(score AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def bm25_phrase_sql(terms_positions: list[tuple[str, int]], k: int = 10) -> str:
    """Exact-phrase BM25 oracle (ExactPhraseScorer semantics): phrase freq =
    count of base positions matching all (term, rel) members; weight = float32
    sum of member idfs (in term order) * (k1+1)."""
    t0, r0 = terms_positions[0]
    joins = []
    for i, (t, r) in enumerate(terms_positions[1:], 1):
        joins.append(
            f"JOIN kept a{i} ON a{i}.doc_id = a0.doc_id AND a{i}.term = '{t}' "
            f"AND a{i}.pos = a0.pos - {r0} + {r}"
        )
    terms = [t for t, _ in terms_positions]
    idf_sum = "CAST(0.0 AS REAL)"
    for t in terms:
        idf_sum = f"({idf_sum} + COALESCE((SELECT idf FROM qweights WHERE term = '{t}'), {ZERO_R}))"
    return f"""WITH {_toks_cte()},{_NORM_CTE},{_weights_cte(terms)},
pmatch AS (
  SELECT a0.doc_id, a0.pos AS base
  FROM kept a0
  {' '.join(joins)}
  WHERE a0.term = '{t0}'
),
pf AS (
  SELECT doc_id, CAST(count(*) AS REAL) AS f FROM pmatch GROUP BY doc_id
),
scored AS (
  SELECT pf.doc_id,
         (({idf_sum} * {K1P1_R}) * pf.f) / (pf.f + c.cache) AS score
  FROM pf JOIN normcache c ON c.doc_id = pf.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, CAST(score AS DOUBLE) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}"""


def facet_lang_sql() -> str:
    """Facet-count analog (FacetsCollector): per-category match counts."""
    return "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang"


def dedup_exact_sql() -> str:
    """Exact content dedup: keep min doc_id per md5(text)."""
    return """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY text_hash"""


def grouping_topk_sql(k: int = 3) -> str:
    """Grouping-module analog: top-k docs per lang by (n_chars desc, doc_id)."""
    return f"""SELECT lang, doc_id, n_chars, rnk FROM (
  SELECT lang, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rnk
  FROM documents) WHERE rnk <= {k} ORDER BY lang, rnk"""
