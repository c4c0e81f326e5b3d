"""PII scrubbing + within-document repetition removal — LLM-training-data
hygiene ops (no reference analog; SURVEY §2.11 bonus family, standard
practice from C4 / RefinedWeb / Dolma pipeline write-ups: redact contact
strings, drop repeated spans before training).

Scale shapes:

- :class:`PiiScrub` — actor-pool ``map_batches`` stage: the three RE2-safe
  patterns are compiled ONCE per actor in ``__init__``; ``__call__`` runs
  ``findall``/``sub`` per document. Zero shuffles, zero driver state — every
  doc is judged locally, so the stage scales linearly with input blocks.
- :func:`dedup_chunks` — pure per-doc kernel (consecutive k-token chunks,
  keep the FIRST occurrence of each distinct chunk, preserving order); used
  inside ``map_batches``. No cross-doc state, no shuffle.

Both ops keep their outputs INTEGER (counts, lengths) or deterministic
strings so the DuckDB oracle compare is exact. The patterns avoid
backreferences and lookaround so Python ``re`` and DuckDB's RE2 agree on
every match (leftmost, non-overlapping, same greediness).

The gate corpus has no natural PII, so the driver query augments each doc
with deterministic PII spans derived from ``md5_int31`` formulas
(:func:`pii_augmented_text`); ``ops/sql_oracle.pii_scrub_sql`` re-derives
the SAME augmented text in SQL (md5 + string concat), making the compare a
true regex-semantics parity test, not a test of the synthesizer.
"""

from __future__ import annotations

import re

import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

# RE2-compatible (no lookaround / backrefs); DuckDB regexp_* uses RE2 with
# the same leftmost non-overlapping scan as Python re.findall/sub.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_augmented_text(doc_id: int, text: str) -> str:
    """Deterministically splice PII spans into a doc (driver-query input
    synthesizer; SQL mirror in ``sql_oracle.pii_scrub_sql``). Spans are
    appended, space-separated, and never overlap each other."""
    h1 = md5_int31(f"{doc_id}:email")
    h2 = md5_int31(f"{doc_id}:phone")
    h3 = md5_int31(f"{doc_id}:ip")
    out = text
    if h1 % 3 == 0:
        out += f" user{h1 % 97}@mail{h1 % 13}.com"
    if h2 % 4 == 0:
        out += f" +1-555-{1000 + h2 % 9000}"
    if h3 % 5 == 0:
        out += f" 10.{h3 % 256}.{h2 % 256}.{h1 % 256}"
    return out


class PiiScrub:
    """Detect + redact emails / phones / IPv4s per doc.

    Output per doc: match counts per class and the redacted text length
    (emails → ``<EMAIL>``, phones → ``<PHONE>``, IPs → ``<IP>``) — the
    length (not the text) keeps the gate table narrow while still pinning
    the exact replacement semantics.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.email = re.compile(EMAIL_RE)
        self.phone = re.compile(PHONE_RE)
        self.ip = re.compile(IPV4_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        n_e, n_p, n_i, red_len = [], [], [], []
        for t in texts:
            t = t or ""
            n_e.append(len(self.email.findall(t)))
            n_p.append(len(self.phone.findall(t)))
            n_i.append(len(self.ip.findall(t)))
            r = self.email.sub("<EMAIL>", t)
            r = self.phone.sub("<PHONE>", r)
            r = self.ip.sub("<IP>", r)
            red_len.append(len(r))
        return pa.table({
            "doc_id": ids,
            "n_emails": pa.array(n_e, type=pa.int64()),
            "n_phones": pa.array(n_p, type=pa.int64()),
            "n_ips": pa.array(n_i, type=pa.int64()),
            "redacted_n_chars": pa.array(red_len, type=pa.int64()),
        })


def dedup_chunks(tokens: list[str], k: int = 3) -> tuple[list[str], int]:
    """Split ``tokens`` into consecutive non-overlapping k-token chunks
    (the tail chunk may be shorter); keep the FIRST occurrence of each
    distinct chunk in order; return (kept tokens, number of chunks removed).
    """
    seen: set[str] = set()
    kept: list[str] = []
    removed = 0
    for i in range(0, len(tokens), k):
        chunk = tokens[i:i + k]
        key = " ".join(chunk)
        if key in seen:
            removed += 1
        else:
            seen.add(key)
            kept.extend(chunk)
    return kept, removed


class RepetitionRemover:
    """Within-doc repeated-chunk removal (C4-style span dedup, chunked
    k-gram variant): per doc, drop every repeat of an already-seen k-token
    chunk. Output: cleaned token count + chunks removed (integers)."""

    def __init__(self, k: int = 3, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        texts = batch.column(self.text_col).to_pylist()
        n_kept, n_removed = [], []
        for t in texts:
            kept, removed = dedup_chunks((t or "").split(), self.k)
            n_kept.append(len(kept))
            n_removed.append(removed)
        return pa.table({
            "doc_id": ids,
            "clean_n_tokens": pa.array(n_kept, type=pa.int64()),
            "chunks_removed": pa.array(n_removed, type=pa.int64()),
        })
