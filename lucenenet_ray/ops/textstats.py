"""Text analysis ops: language-ID, quality scoring, token counting, document
fingerprinting — large-scale training-data pipeline stages, each a vectorized
map_batches over the documents table with an exact SQL oracle.

All outputs are INTEGER features (counts, ids) so the oracle comparison is
exact (no float rounding hazards).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# tiny per-language function-word lists (deterministic rule, not a model)
LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is was for with that".split()),
    "de": frozenset("der die das und ist von zu mit nicht ein".split()),
    "fr": frozenset("le la les et de un une est pour dans".split()),
    "es": frozenset("el la los las y de un una es para".split()),
}
LANG_ORDER = ("de", "en", "es", "fr")  # tie-break: alphabetical

STOP10 = LANG_MARKERS["en"]


def lang_id_of(tokens: list[str]) -> str:
    """argmax of marker-word hits; ties or zero hits → 'und'."""
    counts = {lang: sum(1 for t in tokens if t in m) for lang, m in LANG_MARKERS.items()}
    best = max(counts.values()) if counts else 0
    if best == 0:
        return "und"
    winners = [lang for lang in LANG_ORDER if counts[lang] == best]
    return winners[0] if len(winners) == 1 else "und" if len(winners) > 1 else winners[0]


class LangId:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        out = [lang_id_of((t or "").split()) for t in texts]
        return pa.table(
            {"doc_id": ids, "pred_lang": pa.array(out, type=pa.string())}
        )


class QualityStats:
    """Integer quality features per doc: token count, stopword hits, distinct
    tokens, max token length, char count."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        n_tok, n_stop, n_uniq, max_len, n_chars = [], [], [], [], []
        for t in texts:
            toks = (t or "").split()
            n_tok.append(len(toks))
            n_stop.append(sum(1 for x in toks if x in STOP10))
            n_uniq.append(len(set(toks)))
            max_len.append(max((len(x) for x in toks), default=0))
            n_chars.append(len(t or ""))
        return pa.table(
            {
                "doc_id": ids,
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "n_stopwords": pa.array(n_stop, type=pa.int64()),
                "n_unique": pa.array(n_uniq, type=pa.int64()),
                "max_token_len": pa.array(max_len, type=pa.int64()),
                "n_chars": pa.array(n_chars, type=pa.int64()),
            }
        )


def fingerprints_of(tokens: list[str], k: int = 3, window: int = 4) -> list[int]:
    """Winnowing document fingerprints: md5-based k-gram hashes, min per
    sliding window of `window` hashes, distinct, sorted. Deterministic and
    SQL-reproducible (window MIN + DISTINCT)."""
    if len(tokens) < k:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if not grams:
        return []
    hs = [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) for g in grams]
    if len(hs) <= window:
        return sorted({min(hs)})
    out = set()
    for i in range(len(hs) - window + 1):
        out.add(min(hs[i : i + window]))
    return sorted(out)


class Fingerprints:
    """map_batches stage → exploded (doc_id, fp) rows."""

    def __init__(self, k: int = 3, window: int = 4, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.k = k
        self.window = window
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id: list[int] = []
        out_fp: list[int] = []
        for did, t in zip(ids, texts):
            for fp in fingerprints_of((t or "").split(), self.k, self.window):
                out_id.append(did)
                out_fp.append(fp)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "fp": pa.array(out_fp, type=pa.int64()),
            }
        )


class BpeTokenCount:
    """GPT-2-style pre-tokenizer token count (the LLM-training 'how many
    tokens is this doc' estimator): the classic byte-pair-encoding
    PRE-tokenizer regex — space-attached letter runs, digit runs, and
    punctuation runs, whitespace remainder — counted per doc.  The pattern
    avoids lookahead so the DuckDB RE2 oracle tokenizes identically
    (leftmost-first alternation in both engines).  Compiled once per actor
    (``__init__``), vectorized batch emit."""

    PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import regex as _regex

        self.re = _regex.compile(self.PATTERN)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        counts = [len(self.re.findall(t or "")) for t in texts]
        return pa.table({
            "doc_id": batch.column(self.id_col),
            "n_bpe_tokens": pa.array(counts, type=pa.int64()),
        })


class FreqMass:
    """Corpus-frequency document scoring (training-data quality signal:
    docs dominated by ultra-common tokens vs rare-token docs). Per doc:
    the sum of the GLOBAL ttf and df of each kept token occurrence plus
    the kept-token count — all integers, so the oracle compare is exact.

    Scale shape: the global term stats come from the already-built index's
    termstats table — broadcast ONCE via ray.put and fetched per actor in
    ``__init__`` (never per batch). At web scale the dict holds the top-K
    head terms + an OOV default (the tail contributes negligible mass);
    at test scale it is the full vocabulary. Zero shuffles on the scoring
    pass itself.
    """

    def __init__(self, stats_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        from lucenenet_ray.analysis.standard import StandardAnalyzer

        self.text_col = text_col
        self.id_col = id_col
        self.an = StandardAnalyzer()
        t = ray.get(stats_ref)
        terms = t.column("term").to_pylist()
        dfs = t.column("df").to_pylist()
        ttfs = t.column("ttf").to_pylist()
        self.stats = {w: (d, f) for w, d, f in zip(terms, dfs, ttfs)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        ttf_mass, df_mass, n_kept = [], [], []
        stats = self.stats
        for x in texts:
            terms, _pos = self.an(x or "")
            tm = dm = 0
            for w in terms:
                d, f = stats.get(w, (0, 0))
                tm += f
                dm += d
            ttf_mass.append(tm)
            df_mass.append(dm)
            n_kept.append(len(terms))
        return pa.table({
            "doc_id": ids,
            "ttf_mass": pa.array(ttf_mass, type=pa.int64()),
            "df_mass": pa.array(df_mass, type=pa.int64()),
            "n_kept": pa.array(n_kept, type=pa.int64()),
        })


def vocab_growth(ds, text_col: str = "text",
                 id_col: str = "doc_id") -> "pa.Table":
    """Vocabulary-growth (Heaps' law) checkpoints — the corpus-curation
    curve that answers "how fast does new data stop adding new words"
    (Heaps 1978; used to size tokenizer vocabularies and detect corpus
    saturation): vocab(N) = distinct raw tokens appearing in the first N
    docs (doc_id order), at N = n//10, n//4, n//2, n.

    Exact distributed shape: one ``map_batches`` emits per-batch
    (term, min doc_id) partials (batch-local min — the combiner), ONE
    ``groupby(term).min`` finalizes first-occurrence docs, and the
    driver folds the vocab-bounded result into 4 checkpoint counts.
    Returns (n_docs, vocab) rows, n_docs ascending."""
    import numpy as np

    def firsts(t: pa.Table) -> pa.Table:
        best: dict = {}
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            for tok in set((txt or "").split(" ")):
                if tok and (tok not in best or did < best[tok]):
                    best[tok] = did
        ks = sorted(best)
        return pa.table({
            "term": pa.array(ks, type=pa.string()),
            "m": pa.array([best[k] for k in ks], type=pa.int64()),
        })

    agg = (ds.map_batches(firsts, batch_format="pyarrow")
           .groupby("term").min("m").to_pandas())
    mins = np.sort(agg["min(m)"].to_numpy(dtype=np.int64))
    n = ds.count()
    cps = [n // 10, n // 4, n // 2, n]
    return pa.table({
        "n_docs": pa.array(cps, type=pa.int64()),
        "vocab": pa.array([int(np.searchsorted(mins, cp, side="left"))
                           for cp in cps], type=pa.int64()),
    })
