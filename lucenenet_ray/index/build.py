"""Distributed inverted-index build on ray.data.Dataset.

Pipeline (SURVEY §2.4, §3.1 — the Ray-native analog of Lucene's
DocumentsWriterPerThread → flush → SegmentMerger path):

    docs(id,text)
      → map_batches(Inverter, concurrency=K)        # the DWPT analog
            emits partial postings rows (term, bucket, hpart, docs[], freqs[],
            norms[], pos_bytes) — one row per (term, input-batch), plus one
            doc-length row per bucket (term="" sentinel) carrying
            (doc_id, field_len) used for norms + collection stats
      → groupby(bucket, hpart).map_groups(merge)    # the SegmentMerger analog:
            a salted term shuffle — hpart = hash(term) % H bounds reducer
            input; a Zipf head term is additionally split across doc-range
            buckets, so NO single reducer ever sees more than one bucket's
            share of one hash-slice (explicit skew design, SURVEY §4)
      → groupby(bucket).map_groups(BucketWriter)    # final index layout:
            per-bucket postings parquet sorted by term (term dictionary =
            sorted row groups, SURVEY §2.5), norms parquet, manifest row
      → termstats + manifest.json

DocIDs are caller-provided int64s (deterministic — unlike Lucene's
thread-timing-dependent docIDs, SURVEY §4 "ordering/determinism"); buckets are
contiguous docID ranges so concatenating bucket results preserves global doc
order. Merged index bytes are a pure function of the input rows: the same
corpus produces identical bytes at any parallelism level (tested).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from lucenenet_ray.analysis.standard import StandardAnalyzer
from lucenenet_ray.index.codec import encode_postings, write_vints
from lucenenet_ray.util.smallfloat import encode_norm

DOCLEN_TERM = ""  # sentinel term: per-bucket doc-length rows (sorts first)


@dataclass
class IndexConfig:
    index_path: str
    id_min: int
    id_max: int
    n_buckets: int = 16
    n_hparts: int = 8  # term-hash salt slices per bucket for the merge shuffle
    store_positions: bool = True
    batch_size: int = 2048
    # when set, per-document analyzer dispatch on this column (per-language
    # stop sets — SURVEY §2.2; 'und'/unknown routes to the default chain)
    lang_col: str | None = None
    # additional indexed fields: (column, field_name, analyzed) triples.
    # analyzed=True → TextField-like (analyzer chain, positions);
    # analyzed=False → StringField-like keyword (single term, position 0,
    # Demo/IndexFiles.cs:88-122 path field). Terms are stored prefixed
    # "field\x1fterm" in the shared dictionary (FieldInfos analog); these
    # fields omit norms and don't contribute to body doc length / sumttf
    # (per-field stats, CollectionStatistics).
    extra_fields: tuple[tuple[str, str, bool], ...] = ()
    # index-time field boost column (Document.Field.Boost /
    # FieldInvertState.Boost, Index/FieldInvertState.cs:180-196): per-doc
    # float multiplied into the norm byte at encode time —
    # SingleToByte315(boost / sqrt(len)). None = boost 1.0 (byte-identical
    # to an unboosted build).
    boost_col: str | None = None
    concurrency: int | None = None  # inverter actor pool size; None = tasks
    k1: float = 1.2
    b: float = 0.75
    # postings codec: "for" = bit-packed 128-blocks + freq-parity VInt tail
    # (Lucene41PostingsFormat layout semantics); "vint" = plain delta+VInt
    # (the v0 format). Recorded in the manifest (per-segment codec header).
    codec: str = "for"
    # per-position payloads (FieldInfo.IndexOptions
    # DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS /
    # TokenOffsetPayloadTokenFilter): "offset" stores each kept token's
    # start character offset as a payload stream parallel to positions —
    # per-doc self-contained VInt runs, so the segment merge moves payload
    # bytes without decoding (same invariant as pos_bytes). None = no
    # payloads (no pay_bytes column; index bytes unchanged).
    payloads: str | None = None
    # physical term-vector sidecar (CompressingTermVectorsWriter .tvd/.tvx
    # analog): each invert task side-writes its batch's doc-major
    # (doc_id, term, freq, positions[, start_offsets]) rows to
    # termvectors/tv-<mindoc>-<maxdoc>-<digest>.parquet (atomic temp+rename,
    # content-keyed name → idempotent under task retries). Point lookups
    # prune by filename doc range then parquet row-group stats — no
    # re-tokenization at retrieval time (vs the reconstruct-on-demand path).
    store_term_vectors: bool = False

    def bucket_of(self, doc_ids: np.ndarray) -> np.ndarray:
        """Doc-range bucket: (id - id_min) // ceil(span / n_buckets).

        Width-division form — the naive ``id * n_buckets // span`` overflows
        int64 for 60-bit docID spaces (observed: negative bucket labels and
        16 collapsed buckets at n_buckets=32)."""
        span = self.id_max - self.id_min + 1
        width = (span + self.n_buckets - 1) // self.n_buckets
        return ((doc_ids - self.id_min) // width).astype(np.int32)


def _term_hpart(terms: np.ndarray, n_hparts: int) -> np.ndarray:
    """Deterministic term → hash-slice (salt) assignment. Uses a simple FNV-1a
    over UTF-8 bytes (stable across processes, unlike Python's hash())."""
    out = np.empty(len(terms), dtype=np.int32)
    for i, t in enumerate(terms):
        h = np.uint64(0xCBF29CE484222325)
        for b in t.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = int(h) % n_hparts
    return out


class Inverter:
    """map_batches stage: (doc_id, text) batch → partial postings.

    The analyzer (compiled token DFA + stop set) is built once per worker,
    mirroring Lucene's per-thread Analyzer reuse (``Analyzer.cs``
    ReuseStrategy; SURVEY §2.3). Usable as an actor-pool class OR, via
    ``invert_batch_fn``, as plain tasks on the shared worker pool (no actor
    startup latency; the analyzer is a module-level per-process singleton).
    """

    def __init__(self, cfg: IndexConfig, text_col: str = "text", id_col: str = "doc_id"):
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        if cfg.lang_col:
            from lucenenet_ray.analysis.lang import MultiLangAnalyzer

            self.multilang = MultiLangAnalyzer()
        else:
            self.multilang = None
        self.analyzer = StandardAnalyzer()
        if cfg.payloads and (cfg.lang_col or not cfg.store_positions):
            raise ValueError(
                "payloads need store_positions and the standard analyzer "
                "(per-language chains don't report offsets)")
        self._hpart_cache: dict[str, int] = {}

    def _hpart(self, term: str) -> int:
        v = self._hpart_cache.get(term)
        if v is None:
            h = 0xCBF29CE484222325
            for b in term.encode("utf-8"):
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            v = h % self.cfg.n_hparts
            if len(self._hpart_cache) < 1_000_000:
                self._hpart_cache[term] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # Sort the batch by doc_id so docs (and hence buckets) are monotone —
        # every downstream slice is then contiguous and vectorizable.
        border = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[border]
        texts_all = batch.column(self.text_col).to_pylist()
        texts = [texts_all[i] for i in border]
        analyzer = self.analyzer

        langs = None
        if self.multilang is not None and self.cfg.lang_col in batch.column_names:
            langs_all = batch.column(self.cfg.lang_col).to_pylist()
            langs = [langs_all[i] for i in border]

        # Flatten the whole batch into (term, doc_idx, position[, payload])
        # tuples.
        want_pay = bool(self.cfg.payloads)
        flat_terms: list[str] = []
        flat_docidx: list[int] = []
        flat_pos: list[int] = []
        flat_pay: list[int] = []
        doc_lens = np.zeros(len(texts), dtype=np.int32)
        for di, text in enumerate(texts):
            if langs is not None:
                terms, positions = self.multilang(text or "", langs[di])
            elif want_pay:
                terms, positions, offs = analyzer.call_with_offsets(text or "")
                flat_pay.extend(offs)
            else:
                terms, positions = analyzer(text or "")
            doc_lens[di] = len(terms)
            flat_terms.extend(terms)
            flat_docidx.extend([di] * len(terms))
            flat_pos.extend(positions)

        # extra fields append AFTER the body stream. Correctness relies only
        # on each field's triples being doc-ordered internally: prefixed
        # terms never collide with body terms, so per-term runs stay
        # (doc, position)-sorted for the pair detection below.
        from lucenenet_ray.search.query import FIELD_SEP

        for col, fname, analyzed in self.cfg.extra_fields:
            if col not in batch.column_names:
                continue
            if isinstance(analyzed, str) and analyzed.startswith("numeric"):
                # NumericTokenStream analog (NumericUtils.cs:150-174): one
                # prefix-coded trie term per shift level 0, ps, 2ps, ... < 64,
                # all at position 0, vectorized per shift over the batch.
                from lucenenet_ray.index.numeric import (
                    PRECISION_STEP_DEFAULT, int64_array_to_prefix_coded,
                    trie_shifts)

                ps = (int(analyzed.split(":", 1)[1]) if ":" in analyzed
                      else PRECISION_STEP_DEFAULT)
                arr = batch.column(col)
                valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)[border]
                vals = (arr.combine_chunks() if hasattr(arr, "combine_chunks")
                        else arr)
                vals = pc.fill_null(pc.cast(vals, pa.int64()), 0).to_numpy(
                    zero_copy_only=False)[border]
                idxs = np.flatnonzero(valid)
                sel = vals[idxs].astype(np.int64)
                pfx = fname + FIELD_SEP
                idx_list = idxs.tolist()
                for sh in trie_shifts(ps):
                    toks = int64_array_to_prefix_coded(sel, sh)
                    flat_terms.extend(pfx + t for t in toks)
                    flat_docidx.extend(idx_list)
                    flat_pos.extend([0] * len(toks))
                    if want_pay:
                        flat_pay.extend([0] * len(toks))
                continue
            vals_all = batch.column(col).to_pylist()
            prefix = fname + FIELD_SEP
            for di in range(len(texts)):
                v = vals_all[border[di]]
                if v is None:
                    continue
                if analyzed:
                    terms, positions = analyzer(str(v))
                    flat_terms.extend(prefix + t for t in terms)
                    flat_docidx.extend([di] * len(terms))
                    flat_pos.extend(positions)
                    if want_pay:  # keyword/extra fields carry payload 0
                        flat_pay.extend([0] * len(terms))
                else:
                    flat_terms.append(prefix + str(v))
                    flat_docidx.append(di)
                    flat_pos.append(0)
                    if want_pay:
                        flat_pay.append(0)

        out_term_arr = pa.array([], type=pa.string())
        out_bucket_arr = np.empty(0, dtype=np.int64)
        out_hpart_arr = np.empty(0, dtype=np.int64)
        out_pos: list[bytes] = []
        out_pay: list[bytes] = []

        if self.cfg.boost_col and self.cfg.boost_col in batch.column_names:
            boosts = batch.column(self.cfg.boost_col).to_numpy(
                zero_copy_only=False).astype(np.float32)[border]
            norms_all = encode_norm(doc_lens, boosts)
        else:
            norms_all = encode_norm(doc_lens)
        buckets_all = self.cfg.bucket_of(doc_ids)
        store_pos = self.cfg.store_positions

        pair_docid = np.empty(0, dtype=np.int64)
        pair_freq = np.empty(0, dtype=np.int32)
        pair_norm = np.empty(0, dtype=np.uint8)

        if flat_terms:
            # Arrow dictionary-encode replaces np.unique on an object array:
            # the string hashing runs in C and the sort below works on int32
            # codes, not Python string compares (~2× less inverter CPU).
            # uniq order is first-appearance, not lexicographic — downstream
            # canonicalization (_merge_group term sort + docID sort) makes
            # the final index bytes independent of this order (digest-tested).
            darr = pa.array(flat_terms, type=pa.string()).dictionary_encode()
            term_inv = darr.indices.to_numpy().astype(np.int64)
            uniq_terms = darr.dictionary.to_pylist()
            docidx_arr = np.array(flat_docidx, dtype=np.int32)
            pos_arr = np.array(flat_pos, dtype=np.int64)
            # docidx is already doc_id-ordered; stable sort by term keeps
            # (doc, position) order inside each term run
            order = np.argsort(term_inv, kind="stable")
            t_sorted = term_inv[order]
            d_sorted = docidx_arr[order]
            p_sorted = pos_arr[order]
            # (term, doc) run boundaries
            n = len(order)
            new_pair = np.empty(n, dtype=bool)
            new_pair[0] = True
            np.not_equal(t_sorted[1:], t_sorted[:-1], out=new_pair[1:])
            new_pair[1:] |= d_sorted[1:] != d_sorted[:-1]
            pair_starts = np.flatnonzero(new_pair)
            pair_term = t_sorted[pair_starts]
            pair_doci = d_sorted[pair_starts]
            pair_freq = np.diff(np.append(pair_starts, n)).astype(np.int32)
            pair_docid = doc_ids[pair_doci]
            pair_norm = norms_all[pair_doci]
            pair_bucket = buckets_all[pair_doci]

            # per-run delta-encoded positions, one vectorized pass:
            # delta[i] = p[i] - p[i-1], reset to absolute at run starts
            pos_delta = p_sorted.copy()
            pos_delta[1:] -= p_sorted[:-1]
            pos_delta[pair_starts] = p_sorted[pair_starts]
            if want_pay:
                # payload stream mirrors positions exactly: offsets ascend
                # within a (term, doc) run, so the same delta scheme applies
                pay_arr = np.array(flat_pay, dtype=np.int64)[order]
                pay_delta = pay_arr.copy()
                pay_delta[1:] -= pay_arr[:-1]
                pay_delta[pair_starts] = pay_arr[pair_starts]

            # output rows = (term, bucket) runs over the pair list (bucket is
            # monotone within a term because docs are sorted)
            m = len(pair_starts)
            new_row = np.empty(m, dtype=bool)
            new_row[0] = True
            np.not_equal(pair_term[1:], pair_term[:-1], out=new_row[1:])
            new_row[1:] |= pair_bucket[1:] != pair_bucket[:-1]
            row_starts = np.flatnonzero(new_row)
            row_ends = np.append(row_starts[1:], m)
            pair_val_ends = np.append(pair_starts[1:], n)

            # fully vectorized row assembly — no per-row Python loop:
            # terms via one Arrow dictionary take, hpart computed once per
            # UNIQUE term (not per row), and positions/payloads VInt-encoded
            # in ONE bulk pass over the whole batch then split at row
            # boundaries (rows are contiguous slices of the pair arrays).
            row_codes = pair_term[row_starts]
            out_term_arr = darr.dictionary.take(pa.array(row_codes))
            out_bucket_arr = pair_bucket[row_starts].astype(np.int64)
            hp = self._hpart
            uniq_hparts = np.fromiter(
                (hp(t) for t in uniq_terms), dtype=np.int64,
                count=len(uniq_terms))
            out_hpart_arr = uniq_hparts[row_codes]
            if store_pos:
                row_pos_counts = (
                    pair_val_ends[row_ends - 1] - pair_starts[row_starts]
                ).astype(np.int64)
                out_pos = _split_vint_stream(
                    write_vints(pos_delta.astype(np.uint64)), row_pos_counts)
                if want_pay:
                    out_pay = _split_vint_stream(
                        write_vints(pay_delta.astype(np.uint64)),
                        row_pos_counts)
            else:
                out_pos = [b""] * len(row_starts)

            if self.cfg.store_term_vectors:
                _write_term_vector_file(
                    self.cfg.index_path, pair_docid, pair_term, pair_freq,
                    pair_starts, pair_val_ends,
                    p_sorted if store_pos else None,
                    pay_arr if (store_pos and want_pay) else None,
                    darr.dictionary)

        # assemble per-row value arrays (contiguous slices of the pair arrays)
        n_rows = len(out_term_arr)
        docs_vals = np.empty(0, np.int64)
        freqs_vals = np.empty(0, np.int64)
        norms_vals = np.empty(0, np.uint8)
        lens = np.empty(0, dtype=np.int64)
        if n_rows:
            lens = (row_ends - row_starts).astype(np.int64)
            docs_vals = pair_docid
            freqs_vals = pair_freq.astype(np.int64)
            norms_vals = pair_norm

        # per-bucket doc-length sentinel rows (norms + collection stats);
        # doc_ids already sorted → buckets contiguous
        bk_starts = np.flatnonzero(
            np.concatenate(([True], buckets_all[1:] != buckets_all[:-1]))
        ) if len(doc_ids) else np.empty(0, np.int64)
        bk_ends = np.append(bk_starts[1:], len(doc_ids))
        dl_term: list[str] = []
        dl_bucket: list[int] = []
        for s, e in zip(bk_starts, bk_ends):
            dl_term.append(DOCLEN_TERM)
            dl_bucket.append(int(buckets_all[s]))

        all_lens = np.concatenate((lens, (bk_ends - bk_starts).astype(np.int64)))
        docs_vals = np.concatenate((docs_vals, doc_ids))
        freqs_vals = np.concatenate((freqs_vals, doc_lens.astype(np.int64)))
        norms_vals = np.concatenate((norms_vals, norms_all))

        # Shuffle wire format: docs RAW little-endian int64 (docIDs are
        # md5-random 60-bit values — their deltas average ~7 VInt bytes, so
        # VInt bought ~nothing while costing a 7-pass encode here and a
        # 7-pass decode in every reducer; raw int64 is one memcpy each way),
        # freqs VInt (mostly 1 byte), norms raw uint8. Transient format only
        # — the on-disk index keeps Lucene-style delta+VInt (codec.py).
        bounds = np.concatenate(([0], np.cumsum(all_lens)))
        doc_b = docs_vals.astype("<i8").tobytes()
        doc_rows = [doc_b[bounds[i] * 8 : bounds[i + 1] * 8]
                    for i in range(len(all_lens))]
        freq_stream = write_vints(freqs_vals.astype(np.uint64))
        freq_rows = _split_vint_stream(freq_stream, all_lens)
        norm_b = norms_vals.tobytes()
        norm_rows = [
            norm_b[bounds[i] : bounds[i + 1]] for i in range(len(all_lens))
        ]

        cols = {
            "term": pa.concat_arrays(
                [out_term_arr.cast(pa.string()),
                 pa.array(dl_term, type=pa.string())]),
            "bucket": pa.array(
                np.concatenate((out_bucket_arr,
                                np.asarray(dl_bucket, dtype=np.int64))),
                type=pa.int32()),
            "hpart": pa.array(
                np.concatenate((out_hpart_arr,
                                np.zeros(len(dl_term), dtype=np.int64))),
                type=pa.int32()),
            "n": pa.array(all_lens, type=pa.int32()),
            "doc_bytes": pa.array(doc_rows, type=pa.large_binary()),
            "freq_bytes": pa.array(freq_rows, type=pa.large_binary()),
            "norm_bytes": pa.array(norm_rows, type=pa.large_binary()),
            "pos_bytes": pa.array(
                out_pos + [b""] * len(dl_term), type=pa.large_binary()
            ),
        }
        if want_pay:
            cols["pay_bytes"] = pa.array(
                out_pay + [b""] * len(dl_term), type=pa.large_binary())
        return pa.table(cols)


def _split_vint_stream(stream: np.ndarray, counts: np.ndarray) -> list[bytes]:
    """Split a bulk VInt byte stream into per-row byte strings, where row i
    holds counts[i] values. Vectorized terminator scan + python slicing."""
    if stream.size == 0:
        return [b""] * len(counts)
    ends = np.flatnonzero((stream & 0x80) == 0)  # last byte of each value
    vbound = np.cumsum(counts)  # value index after each row
    tail = np.where(vbound > 0, ends[np.maximum(vbound, 1) - 1] + 1, 0)
    byte_bound = np.concatenate(([0], tail))
    raw = stream.tobytes()
    return [bytes(raw[byte_bound[i] : byte_bound[i + 1]]) for i in range(len(counts))]


def _binary_blob(col: "pa.ChunkedArray", take_idx: "pa.Array") -> bytes:
    """Concatenate a binary column's values in ``take_idx`` order as one
    buffer. ``Array.take`` materializes values contiguously in taken order,
    so the result's data buffer IS the concatenation — a single C gather
    instead of a per-row ``.as_py()`` + join loop. Nulls contribute b''."""
    arr = col.combine_chunks().take(take_idx)
    offs_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    if data_buf is None:
        return b""
    width = 8 if pa.types.is_large_binary(arr.type) else 4
    dt = np.int64 if width == 8 else np.int32
    offs = np.frombuffer(offs_buf, dtype=dt)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(data_buf, dtype=np.uint8)
    return data[int(offs[0]) : int(offs[-1])].tobytes()


def _grouped_take(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized concat of aranges: [starts[i] .. starts[i]+lengths[i]) ."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    shifted = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    return np.arange(total, dtype=np.int64) + np.repeat(starts - shifted, lengths)


def _segmented_cumsum_reset(deltas: np.ndarray, run_starts: np.ndarray,
                            run_lengths: np.ndarray) -> np.ndarray:
    """Absolute values from per-run delta encoding (first delta absolute)."""
    c = np.cumsum(deltas)
    base = c[run_starts] - deltas[run_starts]
    return c - np.repeat(base, run_lengths)


_INVERTER_SINGLETON: dict[tuple, Inverter] = {}


def _write_term_vector_file(index_path: str, pair_docid, pair_term,
                            pair_freq, pair_starts, pair_val_ends,
                            p_sorted, pay_arr, term_dict) -> None:
    """Side-write one batch's physical term vectors (doc-major, term-sorted
    within doc — TermVectorsReader enumerates terms in term order). All
    columns assembled by vectorized gathers over the inverter's pair arrays;
    no re-tokenization. Idempotent: the file name is content-keyed and the
    write is temp+rename, so task retries replace with identical bytes."""
    import hashlib

    terms_np = np.asarray(term_dict.to_pylist(), dtype=object)[pair_term]
    tv_order = np.lexsort((terms_np, pair_docid))
    docs = pair_docid[tv_order]
    terms = terms_np[tv_order]
    freqs = pair_freq[tv_order].astype(np.int32)
    cols: dict = {
        "doc_id": pa.array(docs, type=pa.int64()),
        "term": pa.array(terms, type=pa.string()),
        "freq": pa.array(freqs, type=pa.int32()),
    }
    if p_sorted is not None:
        lens_tv = (pair_val_ends - pair_starts)[tv_order]
        offs = np.concatenate(([0], np.cumsum(lens_tv)))
        gather = (np.repeat(pair_starts[tv_order] - offs[:-1], lens_tv)
                  + np.arange(offs[-1]))
        cols["positions"] = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(p_sorted[gather].astype(np.int32)))
        if pay_arr is not None:
            cols["start_offsets"] = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(pay_arr[gather].astype(np.int32)))
    tbl = pa.table(cols)
    tvdir = os.path.join(index_path, "termvectors")
    os.makedirs(tvdir, exist_ok=True)
    key = hashlib.md5(docs.tobytes()).hexdigest()[:12]
    name = f"tv-{int(docs[0]):015d}-{int(docs[-1]):015d}-{key}.parquet"
    tmp = os.path.join(tvdir, f".{name}.{os.getpid()}.tmp")
    pq.write_table(tbl, tmp, row_group_size=8192)
    os.replace(tmp, os.path.join(tvdir, name))


def read_term_vector(index_path: str, doc_id: int) -> pa.Table:
    """Point-lookup a doc's stored term vector: prune sidecar files by the
    doc range in the name, then parquet row-group stats prune inside the
    file (Lucene .tvx doc→pointer analog). Raises if the index was built
    without store_term_vectors."""
    tvdir = os.path.join(index_path, "termvectors")
    if not os.path.isdir(tvdir):
        raise FileNotFoundError(
            f"index at {index_path} has no termvectors/ sidecar")
    parts = []
    for f in sorted(os.listdir(tvdir)):
        if not (f.startswith("tv-") and f.endswith(".parquet")):
            continue
        _, lo, hi, _rest = f.split("-", 3)
        if int(lo) <= doc_id <= int(hi):
            t = pq.read_table(
                os.path.join(tvdir, f),
                filters=pc.field("doc_id") == doc_id)
            if t.num_rows:
                parts.append(t)
    if not parts:
        return None
    from lucenenet_ray.util.tables import concat_tables

    return concat_tables(parts, schema=parts[0].schema)


def invert_batch_fn(batch: pa.Table, cfg: IndexConfig, text_col: str,
                    id_col: str) -> pa.Table:
    """Task-mode inverter: reuses a per-process Inverter (worker pool is warm
    from earlier stages — no actor cold-start). The singleton key includes
    every config field that changes the inverter's output, so rebuilding the
    same index_path with a different IndexConfig never reuses stale state."""
    key = (cfg.index_path, text_col, id_col, cfg.id_min, cfg.id_max,
           cfg.n_buckets, cfg.n_hparts, cfg.lang_col, cfg.store_positions,
           cfg.extra_fields, cfg.payloads)
    inv = _INVERTER_SINGLETON.get(key)
    if inv is None:
        inv = Inverter(cfg, text_col, id_col)
        _INVERTER_SINGLETON.clear()
        _INVERTER_SINGLETON[key] = inv
    return inv(batch)


def _merge_group(group: pa.Table, store_positions: bool,
                 codec: str = "vint") -> pa.Table:
    """Merge all partial rows of one (bucket, hpart) group: for every term,
    concatenate the per-batch runs, sort by docID, and encode the canonical
    chunk (delta+VInt + 128-block skip/block-max metadata).

    Mirrors ``SegmentMerger.MergeTerms`` (SegmentMerger.cs:443): a k-way
    per-term postings merge in term order — fully vectorized here (sort +
    grouped gathers; VInt position streams are bulk-decoded, reordered to the
    merged doc order, and re-encoded in single numpy passes).
    """
    from lucenenet_ray.index.codec import read_vints

    terms = group.column("term").to_numpy(zero_copy_only=False)
    bucket = int(group.column("bucket")[0].as_py())
    row_lens = group.column("n").to_numpy(zero_copy_only=False).astype(np.int64)

    order = np.argsort(terms, kind="stable")
    terms_s = terms[order]
    new_term = np.empty(len(terms_s), dtype=bool)
    if len(terms_s):
        new_term[0] = True
        new_term[1:] = terms_s[1:] != terms_s[:-1]
    starts = np.flatnonzero(new_term)
    ends = np.append(starts[1:], len(terms_s))

    # bulk-decode the partial rows in term-sorted row order: the reorder-and-
    # concatenate of each binary column is ONE arrow take (the taken array's
    # data buffer IS the bytes in row order) — no per-row Python join
    srow_lens = row_lens[order]
    srow_offs = np.concatenate(([0], np.cumsum(srow_lens)))
    take_idx = pa.array(order)
    doc_blob = _binary_blob(group.column("doc_bytes"), take_idx)
    freq_blob = _binary_blob(group.column("freq_bytes"), take_idx)
    norm_blob = _binary_blob(group.column("norm_bytes"), take_idx)
    total_vals = int(srow_offs[-1])
    # docs are raw little-endian int64 on the shuffle wire (see Inverter)
    g_docs = np.frombuffer(doc_blob, dtype="<i8")
    if g_docs.size != total_vals:
        raise ValueError(
            f"doc stream corrupt: {g_docs.size} values, expected {total_vals}")
    g_docs = g_docs.astype(np.int64, copy=False)
    g_freqs = read_vints(
        np.frombuffer(freq_blob, dtype=np.uint8), total_vals
    ).astype(np.int32)
    g_norms = np.frombuffer(norm_blob, dtype=np.uint8)

    # Position streams are NEVER decoded in the merge: each (term, doc)
    # pair's run is a self-contained VInt segment (first delta absolute per
    # pair — see Inverter), and the final on-disk layout is the same per-doc
    # runs concatenated in merged doc order. So merging positions is a pure
    # BYTE reorder: scan terminators once to find each pair's byte segment,
    # then gather segments per term in doc order. (Was: full decode →
    # segmented cumsum → re-delta → re-encode; ~2/3 of reducer CPU.)
    has_pos = store_positions
    has_pay = "pay_bytes" in group.column_names
    if has_pos:
        pos_blob = _binary_blob(group.column("pos_bytes"), take_idx)
        pb = np.frombuffer(pos_blob, dtype=np.uint8)
        pos_ends = np.flatnonzero((pb & 0x80) == 0)
        # pair value counts in row-sorted pair order; doclen sentinel rows
        # carry no positions
        is_doclen_row = terms_s == DOCLEN_TERM
        pair_has_pos = ~np.repeat(is_doclen_row, srow_lens)
        pos_counts = np.where(pair_has_pos, g_freqs.astype(np.int64), 0)
        vbound = np.cumsum(pos_counts)
        if int(vbound[-1] if vbound.size else 0) != pos_ends.size:
            raise ValueError(
                f"position stream corrupt: {pos_ends.size} values, "
                f"expected {int(vbound[-1] if vbound.size else 0)}"
            )
        if pos_ends.size:
            pair_byte_end = np.where(
                vbound > 0, pos_ends[np.maximum(vbound, 1) - 1] + 1, 0
            ).astype(np.int64)
        else:
            # group holds only doclen-sentinel rows (possible whenever a
            # hash partition draws no position-bearing term — small
            # corpora, or an hpart hosting only the sentinel): np.where
            # evaluates both branches, so guard the empty-stream indexing
            pair_byte_end = np.zeros(vbound.size, dtype=np.int64)
        pair_byte_start = np.concatenate(([0], pair_byte_end[:-1]))
        if has_pay:
            # payload runs have the SAME per-pair value counts as positions
            # (one payload per position), so the identical terminator-scan +
            # byte-segment gather applies to the payload stream
            pay_blob = _binary_blob(group.column("pay_bytes"), take_idx)
            yb = np.frombuffer(pay_blob, dtype=np.uint8)
            pay_ends = np.flatnonzero((yb & 0x80) == 0)
            if int(vbound[-1] if vbound.size else 0) != pay_ends.size:
                raise ValueError(
                    f"payload stream corrupt: {pay_ends.size} values, "
                    f"expected {int(vbound[-1] if vbound.size else 0)}"
                )
            if pay_ends.size:
                pay_byte_end = np.where(
                    vbound > 0, pay_ends[np.maximum(vbound, 1) - 1] + 1, 0
                ).astype(np.int64)
            else:
                pay_byte_end = np.zeros(vbound.size, dtype=np.int64)
            pay_byte_start = np.concatenate(([0], pay_byte_end[:-1]))

    out = {k: [] for k in (
        "bucket", "term", "df", "ttf", "max_freq", "max_norm", "doc_bytes",
        "freq_bytes", "pos_bytes", "doclen_norm_bytes", "block_last_doc",
        "block_doc_off", "block_freq_off", "block_max_freq", "block_max_norm",
        "skip1_last_doc", "skip1_max_freq", "skip1_max_norm")}
    if has_pay:
        out["pay_bytes"] = []

    for s, e in zip(starts, ends):
        term = terms_s[s]
        v0, v1 = srow_offs[s], srow_offs[e]
        docs = g_docs[v0:v1]
        freqs = g_freqs[v0:v1]
        norms = g_norms[v0:v1]
        ordd = np.argsort(docs, kind="stable")
        docs = docs[ordd]
        freqs = freqs[ordd]
        norms = norms[ordd]

        pos_stream = b""
        pay_stream = b""
        if has_pos and term != DOCLEN_TERM:
            # gather this term's pairs' byte segments in merged doc order
            bstarts = pair_byte_start[v0:v1][ordd]
            blens = (pair_byte_end[v0:v1] - pair_byte_start[v0:v1])[ordd]
            pos_stream = pb[_grouped_take(bstarts, blens)].tobytes()
            if has_pay:
                ystarts = pay_byte_start[v0:v1][ordd]
                ylens = (pay_byte_end[v0:v1] - pay_byte_start[v0:v1])[ordd]
                pay_stream = yb[_grouped_take(ystarts, ylens)].tobytes()

        enc = encode_postings(docs, freqs, norms, None, codec=codec)
        out["bucket"].append(bucket)
        out["term"].append(term)
        out["df"].append(len(docs))
        out["ttf"].append(int(freqs.sum()))
        out["max_freq"].append(int(freqs.max()) if len(freqs) else 0)
        out["max_norm"].append(int(norms.max()) if len(norms) else 0)
        out["doc_bytes"].append(enc["doc_bytes"])
        out["freq_bytes"].append(enc["freq_bytes"])
        out["pos_bytes"].append(pos_stream)
        if has_pay:
            out["pay_bytes"].append(pay_stream)
        # the sentinel row keeps its per-doc norm BYTES (merged doc order):
        # norms can't be re-derived from doc_len when an index-time boost is
        # baked in (encode_norm(boost/sqrt(L))); dropped before the postings
        # write so on-disk bytes are unchanged
        out["doclen_norm_bytes"].append(
            norms.tobytes() if term == DOCLEN_TERM else b"")
        out["block_last_doc"].append(enc["block_last_doc"].tolist())
        out["block_doc_off"].append(enc["block_doc_off"].tolist())
        out["block_freq_off"].append(enc["block_freq_off"].tolist())
        out["block_max_freq"].append(enc["block_max_freq"].tolist())
        out["block_max_norm"].append(enc["block_max_norm"].tolist())
        out["skip1_last_doc"].append(enc["skip1_last_doc"].tolist())
        out["skip1_max_freq"].append(enc["skip1_max_freq"].tolist())
        out["skip1_max_norm"].append(enc["skip1_max_norm"].tolist())

    return pa.table(
        {
            "bucket": pa.array(out["bucket"], type=pa.int32()),
            "term": pa.array(out["term"], type=pa.string()),
            "df": pa.array(out["df"], type=pa.int64()),
            "ttf": pa.array(out["ttf"], type=pa.int64()),
            "max_freq": pa.array(out["max_freq"], type=pa.int32()),
            "max_norm": pa.array(out["max_norm"], type=pa.int32()),
            "doc_bytes": pa.array(out["doc_bytes"], type=pa.large_binary()),
            "freq_bytes": pa.array(out["freq_bytes"], type=pa.large_binary()),
            "pos_bytes": pa.array(out["pos_bytes"], type=pa.large_binary()),
            "doclen_norm_bytes": pa.array(out["doclen_norm_bytes"],
                                          type=pa.large_binary()),
            **({"pay_bytes": pa.array(out["pay_bytes"], type=pa.large_binary())}
               if has_pay else {}),
            "block_last_doc": pa.array(out["block_last_doc"], type=pa.list_(pa.int64())),
            "block_doc_off": pa.array(out["block_doc_off"], type=pa.list_(pa.int64())),
            "block_freq_off": pa.array(out["block_freq_off"], type=pa.list_(pa.int64())),
            "block_max_freq": pa.array(out["block_max_freq"], type=pa.list_(pa.int32())),
            "block_max_norm": pa.array(out["block_max_norm"], type=pa.list_(pa.int32())),
            # level-1 skip entries (MultiLevelSkipListWriter fan-out 128):
            # empty lists for terms below df = 128^2
            "skip1_last_doc": pa.array(out["skip1_last_doc"], type=pa.list_(pa.int64())),
            "skip1_max_freq": pa.array(out["skip1_max_freq"], type=pa.list_(pa.int32())),
            "skip1_max_norm": pa.array(out["skip1_max_norm"], type=pa.list_(pa.int32())),
        }
    )


def _doclen_norms(row: pa.Table, nd: int, doc_lens: np.ndarray) -> np.ndarray:
    """Per-doc norm bytes for the merged doclen sentinel row: the carried
    inverter-encoded bytes when present (they embed any index-time boost,
    FieldInvertState.Boost), else re-derived from doc lengths (older
    partials / shard-merge paths where boost is always 1)."""
    if "doclen_norm_bytes" in row.column_names:
        nb = row.column("doclen_norm_bytes")[0].as_py()
        if nb is not None and len(nb) == nd:
            return np.frombuffer(nb, dtype=np.uint8)
    return encode_norm(doc_lens)


def _merge_write_group(group: pa.Table, store_positions: bool,
                       index_path: str, codec: str = "vint") -> pa.Table:
    """Fused reducer: merge one (bucket, hpart) group's chunks, then write
    postings (term-sorted) and — for the hpart-0 group — the bucket's norms.
    Returns one manifest row."""
    merged = _merge_group(group, store_positions, codec=codec)
    bucket = int(group.column("bucket")[0].as_py())
    hpart = int(group.column("hpart")[0].as_py())

    terms = merged.column("term")
    is_doclen = pc.equal(terms, DOCLEN_TERM)
    doclen_rows = merged.filter(is_doclen)
    postings = merged.filter(pc.invert(is_doclen))

    os.makedirs(os.path.join(index_path, "postings"), exist_ok=True)
    os.makedirs(os.path.join(index_path, "norms"), exist_ok=True)

    n_docs = 0
    sum_len = 0
    if doclen_rows.num_rows:
        from lucenenet_ray.index.codec import decode_docs, decode_freqs

        row = doclen_rows.slice(0, 1)
        nd = int(row.column("df")[0].as_py())
        db = row.column("doc_bytes")[0].as_py()
        doc_ids = decode_docs(db, nd, codec=codec)
        doc_lens = decode_freqs(row.column("freq_bytes")[0].as_py(), nd,
                                codec=codec, doc_bytes=db)
        norms = _doclen_norms(row, nd, doc_lens)
        n_docs = nd
        sum_len = int(doc_lens.sum())
        norm_table = pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "doc_len": pa.array(doc_lens, type=pa.int32()),
                "norm": pa.array(norms.astype(np.int32), type=pa.int32()),
            }
        )
        _atomic_write_parquet(
            norm_table, os.path.join(index_path, "norms", f"bucket={bucket:05d}.parquet")
        )

    if postings.num_rows:
        # rows are already term-sorted by _merge_group; the sentinel-only
        # norm-bytes column never reaches disk (on-disk bytes unchanged)
        if "doclen_norm_bytes" in postings.column_names:
            postings = postings.drop_columns(["doclen_norm_bytes"])
        _atomic_write_parquet(
            postings,
            os.path.join(index_path, "postings",
                         f"bucket={bucket:05d}_h{hpart:02d}.parquet"),
            row_group_size=2048,
        )

    return pa.table(
        {
            "bucket": pa.array([bucket], type=pa.int32()),
            "hpart": pa.array([hpart], type=pa.int32()),
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "sum_len": pa.array([sum_len], type=pa.int64()),
            "n_terms": pa.array([postings.num_rows], type=pa.int64()),
        }
    )


def _write_bucket(group: pa.Table, index_path: str,
                  codec: str = "vint") -> pa.Table:
    """Write one bucket's merged index files (atomically: temp + rename —
    idempotent under Ray task retries, SURVEY §4 'stragglers/retries').

    Produces ``postings/bucket=NNNNN.parquet`` (rows sorted by term — the
    sorted-term row groups ARE the term dictionary, cf. BlockTree .tim blocks
    ``Codecs/BlockTreeTermsWriter.cs:146-168``) and
    ``norms/bucket=NNNNN.parquet`` (doc_id asc, doc_len, norm byte).
    Returns the bucket manifest row.
    """
    from lucenenet_ray.index.codec import decode_docs, decode_freqs

    bucket = int(group.column("bucket")[0].as_py())
    order = pc.sort_indices(group.column("term"))
    group = group.take(order)

    terms = group.column("term")
    is_doclen = pc.equal(terms, DOCLEN_TERM)
    doclen_rows = group.filter(is_doclen)
    postings = group.filter(pc.invert(is_doclen))

    n_docs = 0
    sum_len = 0
    os.makedirs(os.path.join(index_path, "postings"), exist_ok=True)
    os.makedirs(os.path.join(index_path, "norms"), exist_ok=True)

    if doclen_rows.num_rows:
        # there is exactly one merged doclen row per bucket (hpart 0)
        row = doclen_rows.slice(0, 1)
        nd = int(row.column("df")[0].as_py())
        db = row.column("doc_bytes")[0].as_py()
        doc_ids = decode_docs(db, nd, codec=codec)
        doc_lens = decode_freqs(row.column("freq_bytes")[0].as_py(), nd,
                                codec=codec, doc_bytes=db)
        norms = _doclen_norms(row, nd, doc_lens)
        n_docs = nd
        sum_len = int(doc_lens.sum())
        norm_table = pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "doc_len": pa.array(doc_lens, type=pa.int32()),
                "norm": pa.array(norms.astype(np.int32), type=pa.int32()),
            }
        )
        _atomic_write_parquet(
            norm_table, os.path.join(index_path, "norms", f"bucket={bucket:05d}.parquet")
        )

    if postings.num_rows:
        if "doclen_norm_bytes" in postings.column_names:
            postings = postings.drop_columns(["doclen_norm_bytes"])
        _atomic_write_parquet(
            postings,
            os.path.join(index_path, "postings", f"bucket={bucket:05d}.parquet"),
            row_group_size=2048,
        )

    return pa.table(
        {
            "bucket": pa.array([bucket], type=pa.int32()),
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "sum_len": pa.array([sum_len], type=pa.int64()),
            "n_terms": pa.array([postings.num_rows], type=pa.int64()),
        }
    )


def _atomic_write_parquet(table: pa.Table, path: str, row_group_size: int = 65536) -> None:
    d = os.path.dirname(path)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    try:
        pq.write_table(table, tmp, row_group_size=row_group_size)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _hash_shuffle_merge_write(partials, cfg: IndexConfig, store_pos: bool) -> list[dict]:
    """Raw-Ray map-reduce hash exchange, STREAMED against the map stage.

    Map side: as the inverter produces output blocks (consumed via
    ``iter_internal_ref_bundles`` — no materialize barrier), groups of blocks
    are handed to split tasks that partition rows into P tables by
    ``(bucket * n_hparts + hpart) % P`` (num_returns=P → reducers fetch only
    their slice). The exchange's partitioning work and object creation
    therefore overlap the map tail instead of serializing after it. Reduce
    side: one task per partition concats its slices, groups by exact
    (bucket, hpart), and runs the merge+write reducer per group.

    Deterministic OUTPUT despite nondeterministic stream order: partition
    assignment is a pure key function, and ``_merge_group`` canonicalizes
    each term's postings by (term, docID) sort — docIDs are globally unique,
    so merged bytes are independent of block arrival order (tested: identical
    digests at 8 vs 32 CPUs).

    REDUCER-SIZING RULE (the 100×-scale contract, tested in
    tests/test_index_search.py::test_reducer_bytes_bounded_under_skew):
    a reducer's memory is the bytes of its (bucket, hpart) groups.
    ``bucket`` is a docID-range partition, so even a single head term —
    the worst skew an inverted index can produce — spreads its postings
    uniformly over ALL buckets: max group bytes ≤ corpus_postings_bytes /
    (n_buckets × n_hparts) + one term-chunk. To run at 100× the corpus,
    raise ``n_buckets`` (and/or ``n_hparts``) proportionally and lift the
    reduce-task cap (GRAFT_REDUCE_PARTS, default 128 ≈ 4× a 32-core box)
    to ~4× the cluster's cores; output bytes are invariant to both knobs.
    """
    import ray

    # 128 reduce tasks: fine enough that reducer waves pack well at 32 CPUs
    # (64 tasks = 2 ragged waves; zipf-skewed groups straggle), coarse enough
    # that per-task overhead stays small at 8. Output bytes are independent
    # of n_parts (files are written per exact (bucket, hpart) group).
    # GRAFT_REDUCE_PARTS overrides for wave-packing experiments.
    n_parts = min(cfg.n_buckets * cfg.n_hparts,
                  int(os.environ.get("GRAFT_REDUCE_PARTS", "128")))

    @ray.remote
    def split_block(n_parts_: int, *tables):
        # ONE stable sort by partition key + zero-copy slices, instead of
        # n_parts mask+filter passes (which re-scan the key column and
        # re-gather the table once per partition — 128x the memory traffic).
        # Each slice is compacted to Arrow IPC bytes: the IPC writer
        # truncates sliced buffers, so returned objects hold only their own
        # rows (a pickled Table slice would ship the whole parent buffers),
        # and the reducer's deserialization is a zero-copy stream read.
        table = pa.concat_tables([t for t in tables if t is not None])
        key = (
            table.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
            * cfg.n_hparts
            + table.column("hpart").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        part = key % n_parts_
        order = np.argsort(part, kind="stable")  # stable: block order kept
        ts = table.take(order)
        bounds = np.searchsorted(part[order], np.arange(n_parts_ + 1))
        out = []
        for p in range(n_parts_):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if hi == lo:
                out.append(None)
                continue
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, ts.schema) as w:
                w.write_table(ts.slice(lo, hi - lo))
            out.append(sink.getvalue())
        return tuple(out)

    @ray.remote
    def reduce_part(index_path: str, store_pos_: bool, *tables):
        import time as _t

        t_start = _t.perf_counter()
        tabs = []
        for tb in tables:
            if tb is None:
                continue
            if isinstance(tb, (pa.Buffer, bytes, memoryview)):  # IPC slice
                tb = pa.ipc.open_stream(tb).read_all()
            if tb.num_rows:
                tabs.append(tb)
        if not tabs:
            return []
        # no table-level combine_chunks: it would copy every binary column
        # once more — _binary_blob combines exactly the columns it gathers
        t = pa.concat_tables(tabs)
        key = (
            t.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
            * cfg.n_hparts
            + t.column("hpart").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        t_concat = _t.perf_counter()
        out_rows = []
        prof_dir = os.environ.get("GRAFT_CPROFILE_REDUCE")
        for kv in np.unique(key):
            g = t.filter(pa.array(key == kv))
            if prof_dir:
                import cProfile

                pr = cProfile.Profile()
                pr.enable()
                m = _merge_write_group(g, store_pos_, index_path, cfg.codec)
                pr.disable()
                pr.dump_stats(os.path.join(prof_dir, f"red_{int(kv)}.prof"))
            else:
                m = _merge_write_group(g, store_pos_, index_path, cfg.codec)
            out_rows.append({c: m.column(c)[0].as_py() for c in m.column_names})
        if os.environ.get("GRAFT_PROF_REDUCE"):
            import sys as _sys

            print(f"[red] concat={t_concat-t_start:.2f}s "
                  f"merge+write={_t.perf_counter()-t_concat:.2f}s "
                  f"rows={t.num_rows}", file=_sys.stderr)
        return out_rows

    # Stream map-output blocks into split tasks in groups of 4: bounds the
    # object count (⌈M/4⌉ × P entries; plasma creation serializes) while
    # keeping splits flowing during the map stage.
    import sys
    import time as _time

    prof = os.environ.get("GRAFT_PROFILE")
    t0 = _time.perf_counter()
    GROUP = int(os.environ.get("GRAFT_SPLIT_GROUP", "8"))
    # split tasks are brief memory-bound repartitions on blocks that already
    # exist; give them a fractional CPU so they schedule DURING the map stage
    # instead of queueing behind map tasks — otherwise the last splits only
    # start after the map drains and sit on the critical path
    split_cpus = float(os.environ.get("GRAFT_SPLIT_CPUS", "0.5"))
    split_refs: list = []
    raw_refs: list = []
    group: list = []
    n_bundles = 0
    t_first = None
    for bundle in partials.iter_internal_ref_bundles():
        if t_first is None:
            t_first = _time.perf_counter() - t0
        n_bundles += 1
        for bref in bundle.block_refs:
            if n_parts == 1:
                raw_refs.append(bref)
                continue
            group.append(bref)
            if len(group) >= GROUP:
                split_refs.append(
                    split_block.options(num_returns=n_parts, num_cpus=split_cpus)
                    .remote(n_parts, *group)
                )
                group = []
    if group:
        split_refs.append(
            split_block.options(num_returns=n_parts, num_cpus=split_cpus)
            .remote(n_parts, *group)
        )
    if prof:
        print(f"[prof]   map stream drained: {_time.perf_counter()-t0:.1f}s "
              f"({len(split_refs)} split tasks; first bundle at "
              f"{t_first if t_first is not None else -1:.1f}s, "
              f"{n_bundles} bundles)", file=sys.stderr)
        if os.environ.get("GRAFT_PROFILE_STATS"):
            print(partials.stats(), file=sys.stderr)
        t0 = _time.perf_counter()
    if prof and n_parts > 1 and split_refs:
        # how much of the tail is the LAST split tasks still running?
        ray.wait([sr[0] for sr in split_refs], num_returns=len(split_refs),
                 fetch_local=False)
        print(f"[prof]   splits settled: +{_time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    if n_parts == 1:
        # no split needed: hand the map blocks straight to the one reducer
        # (num_returns=1 would wrap the 1-tuple as a single object)
        result_refs = [reduce_part.remote(cfg.index_path, store_pos, *raw_refs)]
    else:
        result_refs = [
            reduce_part.remote(cfg.index_path, store_pos,
                               *[sr[p] for sr in split_refs])
            for p in range(n_parts)
        ]
    rows: list[dict] = []
    for rr in ray.get(result_refs):
        rows.extend(rr)
    if prof:
        print(f"[prof]   reduce tail: {_time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    return rows


def write_termstats(index_path: str, n_term_rows: int) -> None:
    """Aggregate global (term, df, ttf) across buckets from the postings dir.
    Below ~2M term rows a driver-side pyarrow aggregate beats a distributed
    groupby's fixed costs; above it the Ray groupby shuffles (web-scale vocab
    ~1e9 rows → distributed)."""
    import ray.data

    import glob as _glob

    ts_path = os.path.join(index_path, "termstats")
    postings_dir = os.path.join(index_path, "postings")
    if not _glob.glob(os.path.join(postings_dir, "*.parquet")):
        # an index whose every doc was dropped (expunge of a fully-deleted
        # shard) legitimately has no postings files — write empty stats
        os.makedirs(ts_path, exist_ok=True)
        empty = pa.table({"term": pa.array([], type=pa.string()),
                          "df": pa.array([], type=pa.int64()),
                          "ttf": pa.array([], type=pa.int64())})
        _atomic_write_parquet(empty, os.path.join(ts_path, "termstats.parquet"))
        return
    if n_term_rows <= 2_000_000:
        stats_t = pq.read_table(postings_dir, columns=["term", "df", "ttf"])
        agg = pa.TableGroupBy(stats_t, "term").aggregate([("df", "sum"), ("ttf", "sum")])
        agg = agg.rename_columns(["term", "df", "ttf"])
        agg = agg.take(pc.sort_indices(agg.column("term")))
        os.makedirs(ts_path, exist_ok=True)
        _atomic_write_parquet(agg, os.path.join(ts_path, "termstats.parquet"))
    else:
        stats_ds = ray.data.read_parquet(postings_dir, columns=["term", "df", "ttf"])
        from ray.data.aggregate import Sum

        termstats = (
            stats_ds.groupby("term")
            .aggregate(Sum("df", alias_name="df"), Sum("ttf", alias_name="ttf"))
            .sort("term")
        )
        termstats.write_parquet(ts_path)


def build_index(
    ds,
    cfg: IndexConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Run the full index build; returns the manifest dict.

    ``ds`` is a ray.data.Dataset with at least (id_col:int64, text_col:str).
    Never calls ray.init (caller owns the session).
    """
    import ray
    import ray.data  # local import: module import must not require ray

    store_pos = cfg.store_positions

    # Task-mode inverter on the shared worker pool (warm processes, analyzer
    # cached per process). If cfg.concurrency is set, use an actor pool of
    # that size instead (sized to leave headroom for the read stage — a pool
    # reserving every CPU starves the reader and the pipeline stalls).
    import functools

    if cfg.concurrency:
        partials = ds.map_batches(
            Inverter,
            fn_constructor_args=(cfg, text_col, id_col),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=min(
                cfg.concurrency, max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
            ),
            num_cpus=1,
        )
    else:
        partials = ds.map_batches(
            functools.partial(
                invert_batch_fn, cfg=cfg, text_col=text_col, id_col=id_col
            ),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
        )

    # ONE exchange: each (bucket, hpart) reducer merges its term chunks AND
    # writes its index file directly (atomic temp+rename — idempotent under
    # retries). The term dictionary is per-(bucket,hpart)-file sorted; a
    # term's chunk lives in exactly one hpart, so lookups stay pushdown-able.
    #
    # The exchange is a raw-Ray HASH shuffle (split each map block into P
    # partition tables, reducers concat their slice), STREAMED against the
    # map stage — split tasks launch as inverter blocks complete, so no
    # materialize() barrier sits between map and exchange. Ray Data's groupby
    # is a full SORT shuffle, which at 32 CPUs cost more wall time than all
    # the map compute combined; we only need partitioning, not order. This is
    # the documented drop-to-ray-core case: the Dataset API has no sortless
    # keyed exchange.
    import sys
    import time as _time

    prof = os.environ.get("GRAFT_PROFILE")
    t0 = _time.perf_counter()
    rows = _hash_shuffle_merge_write(partials, cfg, store_pos)
    if prof:
        print(f"[prof] map+exchange (streamed): {_time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t0 = _time.perf_counter()
    by_bucket: dict[int, dict] = {}
    for r in rows:
        b = int(r["bucket"])
        agg = by_bucket.setdefault(
            b, {"bucket": b, "n_docs": 0, "sum_len": 0, "n_terms": 0}
        )
        agg["n_docs"] += int(r["n_docs"])
        agg["sum_len"] += int(r["sum_len"])
        agg["n_terms"] += int(r["n_terms"])
    buckets = [by_bucket[b] for b in sorted(by_bucket)]
    n_docs = sum(r["n_docs"] for r in buckets)
    sum_ttf = sum(r["sum_len"] for r in buckets)

    # global term stats (df/ttf summed across buckets) — the CollectionStatistics
    # / TermStatistics source (IndexSearcher.cs:982-1007). Per-bucket stats
    # rows number n_buckets × bucket-vocab; below ~2M rows a driver-side
    # pyarrow aggregate beats a distributed groupby's fixed costs, above it
    # the Ray groupby shuffles (vocab at web scale is ~1e9 rows → distributed).
    n_term_rows = sum(r["n_terms"] for r in buckets)
    write_termstats(cfg.index_path, n_term_rows)

    manifest = {
        "format_version": 1,
        "config": {k: v for k, v in asdict(cfg).items()},
        "n_docs": int(n_docs),
        "sum_total_term_freq": int(sum_ttf),
        "buckets": [
            {k: int(v) if isinstance(v, (int, np.integer)) else v for k, v in r.items()}
            for r in buckets
        ],
    }
    tmp = os.path.join(cfg.index_path, ".manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(cfg.index_path, "manifest.json"))
    if prof:
        print(f"[prof] termstats+manifest: {_time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
    return manifest
