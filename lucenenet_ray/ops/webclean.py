"""Web-corpus cleaning heuristics — the published Gopher quality rules and
C4 line-level cleaning, as vectorized Ray Data stages over the documents
table (no reference analog; LLM-training-data family alongside ops/scrub.py).

Rule provenance (public papers only):

- **Gopher rules** — Rae et al. 2021, "Scaling Language Models: Methods,
  Analysis & Insights from Training Gopher", Appendix A (quality filtering):
  word-count bounds, mean-word-length bounds, symbol-to-word ratio
  (``#`` / ``...``), bullet-line and ellipsis-line ratios, fraction of words
  containing an alphabetic character, and a required stop-word count.
- **C4 rules** — Raffel et al. 2020, "Exploring the Limits of Transfer
  Learning with a Unified Text-to-Text Transformer" §2.2: keep only lines
  ending in terminal punctuation with >= 3 words, drop lines mentioning
  javascript, drop pages containing "lorem ipsum" or a curly brace, and
  require >= 5 sentences per page.

Scale shapes: both ops are pure per-doc kernels inside ``map_batches`` —
zero shuffles, zero driver state, linear in input blocks. All ratio rules
are evaluated as INTEGER cross-multiplications (``10*symbols <= words``)
so the DuckDB oracle compare is exact with no float hazards.

The gate corpus is single-line punctuation-free text, so the driver queries
splice deterministic lines (bullets, ellipses, javascript, lorem ipsum,
curly braces, well-formed sentences) derived from ``md5_int31`` formulas
(:func:`webclean_augmented_text`); ``ops/sql_oracle.gopher_quality_sql`` /
``c4_clean_sql`` re-derive the SAME augmented text in SQL, so the compare
tests the RULES, not the synthesizer.
"""

from __future__ import annotations

import re

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

# Gopher Appendix A stop-word list (requires >= 2 present).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000

# C4 terminal punctuation set (a line is kept only if it ends in one).
C4_TERMINALS = frozenset({".", "!", "?", '"'})


def webclean_augmented_text(doc_id: int, text: str) -> str:
    """Deterministically splice web-page pathologies into a doc (driver-query
    input synthesizer; SQL mirror in ``sql_oracle._webclean_aug_sql``).

    Every branch is pure string concatenation / repetition over md5-derived
    integers so DuckDB rebuilds the identical text with ``||`` + ``repeat``.
    """
    h1 = md5_int31(f"{doc_id}:wc1")
    h2 = md5_int31(f"{doc_id}:wc2")
    h3 = md5_int31(f"{doc_id}:wc3")
    out = text
    # well-formed sentence lines (terminal punct, >=3 words, stop words)
    out += ("\nthe table of data holds " + str(h1 % 20)
            + " rows and that is fine.") * (h3 % 7)
    if h1 % 2 == 0:
        out += "\n- bullet item " + str(h1 % 50)
    if h1 % 3 == 0:
        out += "\nthis line trails off with more to come..."
    if h2 % 3 == 0:
        out += "\nplease enable javascript to view this page."
    if h2 % 5 == 0:
        out += "\nlorem ipsum dolor sit amet."
    if h3 % 5 == 0:
        out += "\nfunction f() { return " + str(h3 % 9) + "; }"
    if h1 % 5 == 0:
        out += "\n" + "#" * (h2 % 4 + 1) + " marks here"
    if h2 % 2 == 0:
        out += "\nok go."
    return out


class GopherQuality:
    """Gopher Appendix-A quality features + keep decision per doc.

    Integer features: word count, total word chars, alphabetic-word count,
    symbol hits (``#`` chars + non-overlapping ``...``), line / bullet-line /
    ellipsis-line counts, distinct-stop-word hits. ``keep`` applies the
    published thresholds via integer cross-multiplication:

    - ``min_words <= n_words <= max_words``
    - mean word length in [3, 10]: ``3*n <= chars <= 10*n``
    - symbol-to-word ratio <= 0.1: ``10*symbols <= n``
    - < 90% bullet lines: ``10*bullets <= 9*lines``
    - <= 30% ellipsis-ending lines: ``10*ellipsis <= 3*lines``
    - >= 80% words with an alphabetic char: ``5*alpha >= 4*n``
    - >= 2 distinct stop words present
    """

    def __init__(self, min_words: int = GOPHER_MIN_WORDS,
                 max_words: int = GOPHER_MAX_WORDS,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.min_words = min_words
        self.max_words = max_words
        self.text_col = text_col
        self.id_col = id_col
        self.alpha = re.compile(r"[a-zA-Z]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        cols: dict[str, list[int]] = {k: [] for k in (
            "n_words", "total_word_chars", "n_alpha_words", "n_symbol_hits",
            "n_lines", "n_bullet_lines", "n_ellipsis_lines", "n_stop_hits",
            "keep")}
        for t in texts:
            t = t or ""
            words = t.split()
            n = len(words)
            chars = sum(len(w) for w in words)
            alpha = sum(1 for w in words if self.alpha.search(w))
            symbols = t.count("#") + t.count("...")
            lines = t.split("\n")
            nl = len(lines)
            bullets = sum(1 for x in lines if x.startswith("- "))
            ell = sum(1 for x in lines if x.endswith("..."))
            wset = set(words)
            stops = sum(1 for s in GOPHER_STOPWORDS if s in wset)
            keep = int(
                self.min_words <= n <= self.max_words
                and 3 * n <= chars <= 10 * n
                and 10 * symbols <= n
                and 10 * bullets <= 9 * nl
                and 10 * ell <= 3 * nl
                and 5 * alpha >= 4 * n
                and stops >= 2)
            for k, v in (("n_words", n), ("total_word_chars", chars),
                         ("n_alpha_words", alpha), ("n_symbol_hits", symbols),
                         ("n_lines", nl), ("n_bullet_lines", bullets),
                         ("n_ellipsis_lines", ell), ("n_stop_hits", stops),
                         ("keep", keep)):
                cols[k].append(v)
        out = {"doc_id": ids}
        out.update({k: pa.array(v, type=pa.int64()) for k, v in cols.items()})
        return pa.table(out)


def c4_clean_doc(text: str) -> tuple[int, int, int, int, int]:
    """C4 §2.2 cleaning for one page. Returns integer features
    ``(n_lines, n_kept_lines, clean_n_chars, n_sentences, page_keep)``.

    Line kept iff it ends in terminal punctuation, has >= 3 words, and does
    not mention javascript. Sentences = terminal marks in the cleaned text.
    Page kept iff >= 5 sentences and the RAW page has no "lorem ipsum" and
    no curly brace.
    """
    lines = text.split("\n")
    kept = [x for x in lines
            if x[-1:] in C4_TERMINALS and len(x.split()) >= 3
            and "javascript" not in x]
    clean = "\n".join(kept)
    n_sent = clean.count(".") + clean.count("!") + clean.count("?")
    page_keep = int(n_sent >= 5 and "lorem ipsum" not in text
                    and "{" not in text)
    return len(lines), len(kept), len(clean), n_sent, page_keep


class C4Clean:
    """C4 line-level cleaning + page filter as integer per-doc features."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        rows = [c4_clean_doc(t or "") for t in texts]
        names = ("n_lines", "n_kept_lines", "clean_n_chars", "n_sentences",
                 "page_keep")
        out: dict[str, object] = {"doc_id": ids}
        for i, name in enumerate(names):
            out[name] = pa.array([r[i] for r in rows], type=pa.int64())
        return pa.table(out)
