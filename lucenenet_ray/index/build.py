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
    batch_size: int = 1024
    concurrency: int | None = None  # inverter actor pool size; None = tasks
    k1: float = 1.2
    b: float = 0.75

    def bucket_of(self, doc_ids: np.ndarray) -> np.ndarray:
        span = self.id_max - self.id_min + 1
        return ((doc_ids - self.id_min) * self.n_buckets // span).astype(np.int32)


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
    """Actor-pool map_batches stage: (doc_id, text) batch → partial postings.

    The analyzer (compiled token DFA + stop set) is built once per actor
    (__init__), mirroring Lucene's per-thread Analyzer reuse
    (``Analyzer.cs`` ReuseStrategy; SURVEY §2.3).
    """

    def __init__(self, cfg: IndexConfig, text_col: str = "text", id_col: str = "doc_id"):
        self.cfg = cfg
        self.text_col = text_col
        self.id_col = id_col
        self.analyzer = StandardAnalyzer()
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
        texts = batch.column(self.text_col).to_pylist()
        analyzer = self.analyzer

        # Flatten the whole batch into (term, doc_idx, position) triples.
        flat_terms: list[str] = []
        flat_docidx: list[int] = []
        flat_pos: list[int] = []
        doc_lens = np.zeros(len(texts), dtype=np.int32)
        for di, text in enumerate(texts):
            terms, positions = analyzer(text or "")
            doc_lens[di] = len(terms)
            flat_terms.extend(terms)
            flat_docidx.extend([di] * len(terms))
            flat_pos.extend(positions)

        out_term: list[str] = []
        out_bucket: list[int] = []
        out_hpart: list[int] = []
        out_docs: list[np.ndarray] = []
        out_freqs: list[np.ndarray] = []
        out_norms: list[np.ndarray] = []
        out_pos: list[bytes] = []

        norms_all = encode_norm(doc_lens)
        buckets_all = self.cfg.bucket_of(doc_ids)

        if flat_terms:
            terms_arr = np.array(flat_terms, dtype=object)
            docidx_arr = np.array(flat_docidx, dtype=np.int32)
            pos_arr = np.array(flat_pos, dtype=np.int32)
            # group by (term, doc): np.unique sorts terms lexicographically
            uniq_terms, term_inv = np.unique(terms_arr, return_inverse=True)
            order = np.lexsort((pos_arr, docidx_arr, term_inv))
            t_sorted = term_inv[order]
            d_sorted = docidx_arr[order]
            p_sorted = pos_arr[order]
            # (term, doc) run boundaries
            new_pair = np.empty(len(order), dtype=bool)
            new_pair[0] = True
            np.not_equal(t_sorted[1:], t_sorted[:-1], out=new_pair[1:])
            new_pair[1:] |= d_sorted[1:] != d_sorted[:-1]
            pair_starts = np.flatnonzero(new_pair)
            pair_term = t_sorted[pair_starts]
            pair_doc = d_sorted[pair_starts]
            pair_freq = np.diff(np.append(pair_starts, len(order))).astype(np.int32)
            # term run boundaries over the pair list
            new_term = np.empty(len(pair_starts), dtype=bool)
            new_term[0] = True
            np.not_equal(pair_term[1:], pair_term[:-1], out=new_term[1:])
            term_starts = np.flatnonzero(new_term)
            term_ends = np.append(term_starts[1:], len(pair_starts))

            # per (term, doc) positions are contiguous runs of p_sorted;
            # docs within a term must additionally split by bucket.
            pair_bucket = buckets_all[pair_doc]
            pair_docid = doc_ids[pair_doc]
            store_pos = self.cfg.store_positions
            for ti, (s, e) in enumerate(zip(term_starts, term_ends)):
                term = uniq_terms[pair_term[s]]
                hp = self._hpart(term)
                bks = pair_bucket[s:e]
                # docs within a term arrive doc-sorted; bucket is monotone in
                # doc_id only if doc_ids were sorted in the batch — group
                # explicitly to be safe.
                for bk in np.unique(bks):
                    sel = np.flatnonzero(bks == bk)
                    idx = s + sel
                    out_term.append(term)
                    out_bucket.append(int(bk))
                    out_hpart.append(hp)
                    d = pair_docid[idx]
                    ordd = np.argsort(d, kind="stable")
                    out_docs.append(d[ordd])
                    out_freqs.append(pair_freq[idx][ordd])
                    out_norms.append(norms_all[pair_doc[idx]][ordd])
                    if store_pos:
                        # per-doc delta-encoded positions, concatenated VInts
                        chunks = []
                        for j in idx[ordd]:
                            ps = int(pair_starts[j])
                            pe = ps + int(pair_freq[j])
                            pp = p_sorted[ps:pe].astype(np.int64)
                            chunks.append(np.diff(pp, prepend=0))
                        out_pos.append(
                            write_vints(np.concatenate(chunks).astype(np.uint64)).tobytes()
                        )
                    else:
                        out_pos.append(b"")

        # per-bucket doc-length sentinel rows (norms + collection stats)
        border = np.argsort(doc_ids, kind="stable")
        b_sorted = buckets_all[border]
        for bk in np.unique(b_sorted):
            sel = border[b_sorted == bk]
            out_term.append(DOCLEN_TERM)
            out_bucket.append(int(bk))
            out_hpart.append(0)
            out_docs.append(doc_ids[sel])
            out_freqs.append(doc_lens[sel])
            out_norms.append(norms_all[sel])
            out_pos.append(b"")

        return pa.table(
            {
                "term": pa.array(out_term, type=pa.string()),
                "bucket": pa.array(out_bucket, type=pa.int32()),
                "hpart": pa.array(out_hpart, type=pa.int32()),
                "docs": pa.array([d.tolist() for d in out_docs], type=pa.list_(pa.int64())),
                "freqs": pa.array(
                    [f.tolist() for f in out_freqs], type=pa.list_(pa.int32())
                ),
                "norms": pa.array(
                    [n.tolist() for n in out_norms], type=pa.list_(pa.int32())
                ),
                "pos_bytes": pa.array(out_pos, type=pa.large_binary()),
            }
        )


def _merge_group(group: pa.Table, store_positions: bool) -> pa.Table:
    """Merge all partial rows of one (bucket, hpart) group: for every term,
    concatenate the per-batch runs, sort by docID, and encode the canonical
    chunk (delta+VInt + 128-block skip/block-max metadata).

    Mirrors ``SegmentMerger.MergeTerms`` (SegmentMerger.cs:443): a k-way
    per-term postings merge in term order — here a vectorized sort.
    """
    terms = group.column("term").to_numpy(zero_copy_only=False)
    bucket = int(group.column("bucket")[0].as_py())

    out = {
        "bucket": [],
        "term": [],
        "df": [],
        "ttf": [],
        "max_freq": [],
        "max_norm": [],
        "doc_bytes": [],
        "freq_bytes": [],
        "pos_bytes": [],
        "block_last_doc": [],
        "block_doc_off": [],
        "block_freq_off": [],
        "block_max_freq": [],
        "block_max_norm": [],
    }

    order = np.argsort(terms, kind="stable")
    terms_s = terms[order]
    new_term = np.empty(len(terms_s), dtype=bool)
    if len(terms_s):
        new_term[0] = True
        new_term[1:] = terms_s[1:] != terms_s[:-1]
    starts = np.flatnonzero(new_term)
    ends = np.append(starts[1:], len(terms_s))

    docs_col = group.column("docs")
    freqs_col = group.column("freqs")
    norms_col = group.column("norms")
    posb_col = group.column("pos_bytes")

    for s, e in zip(starts, ends):
        rows = order[s:e]
        term = terms_s[s]
        docs = np.concatenate([np.asarray(docs_col[int(r)].as_py(), dtype=np.int64) for r in rows])
        freqs = np.concatenate([np.asarray(freqs_col[int(r)].as_py(), dtype=np.int32) for r in rows])
        norms = np.concatenate([np.asarray(norms_col[int(r)].as_py(), dtype=np.uint8) for r in rows])
        ordd = np.argsort(docs, kind="stable")
        docs = docs[ordd]
        freqs = freqs[ordd]
        norms = norms[ordd]

        pos_stream = b""
        if store_positions and term != DOCLEN_TERM:
            # reorder the per-doc VInt position runs to the merged doc order:
            # decode per-row runs lazily by byte-slicing on freq counts
            from lucenenet_ray.index.codec import read_vints

            runs: list[bytes] = []
            run_freqs: list[np.ndarray] = []
            for r in rows:
                runs.append(posb_col[int(r)].as_py())
                run_freqs.append(np.asarray(freqs_col[int(r)].as_py(), dtype=np.int64))
            # boundaries of each doc's positions inside each run's byte stream
            per_doc_bytes: list[bytes] = []
            for rb, rf in zip(runs, run_freqs):
                arr = np.frombuffer(rb, dtype=np.uint8)
                is_end = (arr & 0x80) == 0
                ends_v = np.flatnonzero(is_end)
                # value index boundaries per doc: cumsum of freqs
                vbounds = np.concatenate(([0], np.cumsum(rf)))
                for di in range(len(rf)):
                    b0 = 0 if vbounds[di] == 0 else ends_v[vbounds[di] - 1] + 1
                    b1 = ends_v[vbounds[di + 1] - 1] + 1 if vbounds[di + 1] > 0 else 0
                    per_doc_bytes.append(rb[b0:b1])
            reordered = [per_doc_bytes[i] for i in ordd]
            pos_stream = b"".join(reordered)

        enc = encode_postings(docs, freqs, norms, None)
        out["bucket"].append(bucket)
        out["term"].append(term)
        out["df"].append(len(docs))
        out["ttf"].append(int(freqs.sum()))
        out["max_freq"].append(int(freqs.max()) if len(freqs) else 0)
        out["max_norm"].append(int(norms.max()) if len(norms) else 0)
        out["doc_bytes"].append(enc["doc_bytes"])
        out["freq_bytes"].append(enc["freq_bytes"])
        out["pos_bytes"].append(pos_stream)
        out["block_last_doc"].append(enc["block_last_doc"].tolist())
        out["block_doc_off"].append(enc["block_doc_off"].tolist())
        out["block_freq_off"].append(enc["block_freq_off"].tolist())
        out["block_max_freq"].append(enc["block_max_freq"].tolist())
        out["block_max_norm"].append(enc["block_max_norm"].tolist())

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
            "block_last_doc": pa.array(out["block_last_doc"], type=pa.list_(pa.int64())),
            "block_doc_off": pa.array(out["block_doc_off"], type=pa.list_(pa.int64())),
            "block_freq_off": pa.array(out["block_freq_off"], type=pa.list_(pa.int64())),
            "block_max_freq": pa.array(out["block_max_freq"], type=pa.list_(pa.int32())),
            "block_max_norm": pa.array(out["block_max_norm"], type=pa.list_(pa.int32())),
        }
    )


def _write_bucket(group: pa.Table, index_path: str) -> pa.Table:
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
        doc_ids = decode_docs(row.column("doc_bytes")[0].as_py(), nd)
        doc_lens = decode_freqs(row.column("freq_bytes")[0].as_py(), nd)
        norms = encode_norm(doc_lens)
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
    import ray.data  # local import: module import must not require ray

    store_pos = cfg.store_positions

    partials = ds.map_batches(
        Inverter,
        fn_constructor_args=(cfg, text_col, id_col),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency or 4,
        num_cpus=1,
    )

    merged = partials.groupby(["bucket", "hpart"]).map_groups(
        lambda g: _merge_group(g, store_pos), batch_format="pyarrow"
    )

    manifest_rows = merged.groupby("bucket").map_groups(
        lambda g: _write_bucket(g, cfg.index_path), batch_format="pyarrow"
    )

    rows = manifest_rows.take_all()  # tiny: one row per bucket
    buckets = sorted(rows, key=lambda r: r["bucket"])
    n_docs = sum(r["n_docs"] for r in buckets)
    sum_ttf = sum(r["sum_len"] for r in buckets)

    # global term stats (df/ttf summed across buckets) — the CollectionStatistics
    # / TermStatistics source (IndexSearcher.cs:982-1007)
    stats_ds = ray.data.read_parquet(
        os.path.join(cfg.index_path, "postings"), columns=["term", "df", "ttf"]
    )
    from ray.data.aggregate import Sum

    termstats = (
        stats_ds.groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("ttf", alias_name="ttf"))
        .sort("term")
    )
    ts_path = os.path.join(cfg.index_path, "termstats")
    termstats.write_parquet(ts_path)

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
    return manifest
