"""MoreLikeThis: content-based query generation (content self-join).

Reference: ``src/Lucene.Net.Queries/Mlt/MoreLikeThis.cs`` — extract the
source doc's top terms by tf·idf and OR them into a query. Defaults mirrored:
``maxQueryTerms=25``, ``minTermFreq=2``, ``minDocFreq=5`` (MoreLikeThis.cs
DEFAULT_* constants); idf uses the classic ``1 + log(N/(df+1))``
(DefaultSimilarity.Idf) in double precision — SQL-reproducible bit-exactly.
"""

from __future__ import annotations

import math
from collections import Counter

MAX_QUERY_TERMS = 25
MIN_TERM_FREQ = 2
MIN_DOC_FREQ = 5


def mlt_terms(tokens: list[str], df_of, num_docs: int,
              max_query_terms: int = MAX_QUERY_TERMS,
              min_term_freq: int = MIN_TERM_FREQ,
              min_doc_freq: int = MIN_DOC_FREQ) -> list[tuple[str, int, int, float]]:
    """Top interesting terms of one document → [(term, tf, df, score)] ranked
    by (score desc, term asc). score = tf * (1 + ln(N/(df+1))), double."""
    tf = Counter(tokens)
    out = []
    for term, f in tf.items():
        if f < min_term_freq:
            continue
        df = df_of(term)
        if df < min_doc_freq:
            continue
        idf = 1.0 + math.log(num_docs / (df + 1.0))
        out.append((term, f, df, f * idf))
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:max_query_terms]


def more_like_this_query(reader, text: str, analyzer=None,
                         max_query_terms: int = MAX_QUERY_TERMS):
    """doc text → OR query of its top tf·idf terms (executes as a normal
    BM25 search; ``MoreLikeThisQuery.cs`` Rewrite → MoreLikeThis.Like).
    The Ray mapping of SURVEY §2.7 MoreLikeThis."""
    from lucenenet_ray.analysis.standard import StandardAnalyzer
    from lucenenet_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        Occur,
        TermQuery,
    )

    analyzer = analyzer or StandardAnalyzer()
    tokens, _pos = analyzer(text)
    stats = reader.term_stats(sorted(set(tokens)))

    def df_of(t: str) -> int:
        return stats.get(t, (0, 0))[0]

    ranked = mlt_terms(tokens, df_of, reader.num_docs,
                       max_query_terms=max_query_terms)
    return BooleanQuery(
        clauses=tuple(
            BooleanClause(Occur.SHOULD, TermQuery(term=t)) for t, _f, _d, _s in ranked
        )
    )
