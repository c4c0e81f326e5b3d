"""Training-sequence packing — the concat-and-chunk step of an LLM
pretraining data pipeline (GPT-2/3 practice: concatenate all documents in
a fixed order with an EOS separator, slice the token stream into
fixed-length training sequences; each document's tokens land in a
contiguous span of sequences).

Semantics (exact, integer-only — the oracle mirrors it in SQL window
functions):

- ``n_tokens(doc)`` = BPE pre-tokenizer count (ops/textstats.BpeTokenCount
  pattern — identical RE2 regex in the DuckDB oracle).
- Documents are packed in ``doc_id`` order; every doc is followed by
  ``sep_tokens`` separator tokens (EOS).
- ``start_off(doc)`` = sum over all earlier docs of (n_tokens + sep).
- ``first_seq`` = start_off // seq_len; ``last_seq`` = (start_off +
  max(n_tokens, 1) - 1) // seq_len (an empty doc still owns its start
  slot); ``n_seqs`` = last - first + 1.

Scale shape (100 TB story): the global prefix sum is computed WITHOUT a
driver-side corpus scan —

1. stateless ``map_batches`` emits the narrow (doc_id, n_tokens) stream
   (text never leaves this stage);
2. rows get a range-bucket key ``doc_id // span`` (span sized so bucket
   count ≈ a few hundred per run — the driver exchange is bucket-count
   rows, never corpus rows);
3. ONE small ``groupby(bucket).aggregate(Sum, Count)`` (map-side
   combined) gives per-bucket totals; the driver cumsums them into
   per-bucket base offsets (tiny) and broadcasts;
4. ONE ``groupby(bucket).map_groups`` computes the exact within-bucket
   cumsum and adds the bucket base — each group is a bounded doc-id
   range, vectorized numpy inside.

Two key-aligned shuffles total, both on the same range key; no stage ever
materializes the corpus on the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Narrow (doc_id, n_tokens) stream via the BPE pre-tokenizer count."""
    from lucenenet_ray.ops.textstats import BpeTokenCount

    return ds.map_batches(
        BpeTokenCount, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
    ).map_batches(
        lambda t: t.rename_columns(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )


def pack_sequences(ds, seq_len: int = 128, sep_tokens: int = 1,
                   n_buckets: int = 64,
                   text_col: str = "text", id_col: str = "doc_id"):
    """Pack documents into fixed-length training sequences; returns a Ray
    Dataset of (doc_id, n_tokens, start_off, first_seq, last_seq, n_seqs)
    in arbitrary block order (sort at the consumer if needed)."""
    from ray.data.aggregate import Count, Sum

    counts = token_counts(ds, text_col=text_col, id_col=id_col)
    n = ds.count()  # parquet metadata only — no scan
    span = max(1, math.ceil((n or 1) / n_buckets))
    sep = int(sep_tokens)
    L = int(seq_len)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.append_column("bucket", pa.array(ids // span,
                                                  type=pa.int64()))

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow")
    # per-bucket totals: map-side combined, driver sees bucket-count rows
    totals = bucketed.groupby("bucket").aggregate(
        Sum("n_tokens"), Count()).to_pandas()
    totals = totals.sort_values("bucket")
    bucket_ids = totals["bucket"].to_numpy()
    bucket_tok = totals["sum(n_tokens)"].to_numpy(dtype=np.int64)
    bucket_cnt = totals["count()"].to_numpy(dtype=np.int64)
    bucket_total = bucket_tok + sep * bucket_cnt
    base = np.concatenate(([0], np.cumsum(bucket_total)[:-1]))
    base_of = {int(b): int(o) for b, o in zip(bucket_ids, base)}

    def pack_group(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        ntok = t.column("n_tokens").to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, ntok = ids[order], ntok[order]
        b = int(t.column("bucket")[0].as_py())
        starts = base_of[b] + np.concatenate(
            ([0], np.cumsum(ntok + sep)[:-1]))
        first = starts // L
        last = (starts + np.maximum(ntok, 1) - 1) // L
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(ntok, type=pa.int64()),
            "start_off": pa.array(starts, type=pa.int64()),
            "first_seq": pa.array(first, type=pa.int64()),
            "last_seq": pa.array(last, type=pa.int64()),
            "n_seqs": pa.array(last - first + 1, type=pa.int64()),
        })

    return bucketed.groupby("bucket").map_groups(
        pack_group, batch_format="pyarrow")


def pack_best_fit(ds, seq_len: int = 128, shard_span: int = 256,
                  text_col: str = "text", id_col: str = "doc_id"):
    """Best-fit-DECREASING bin packing (the padding-minimizing sequence
    packer — Krell et al. 2021 "Efficient Sequence Packing" practice)
    WITHIN doc-id-range shards: docs sorted by (eff_tokens desc, doc_id
    asc) per shard; each doc goes into the open bin with the SMALLEST
    remaining capacity that still fits (= the LARGEST load ≤ cap - x;
    ties → lowest bin id), else opens a new bin. ``eff_tokens =
    min(n_tokens, seq_len)`` so every doc is placeable (overlong docs
    truncate to one full sequence).

    Scale shape: packing is inherently sequential, so bins are
    SHARD-LOCAL (shard = doc_id // shard_span) — ONE groupby(shard) +
    bounded per-group Python (≤ shard_span docs), zero driver state; the
    global bin id is (shard, bin_id) re-keyed arithmetically. Returns a
    doc_id-sorted Dataset of (doc_id, n_tokens, eff_tokens, shard,
    bin_id, global_bin)."""
    counts = token_counts(ds, text_col=text_col, id_col=id_col)

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array(ids // shard_span, type=pa.int64()))

    def pack_group(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64)
        nt = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(
            np.int64)
        shard = int(t.column("shard")[0].as_py())
        eff = np.minimum(nt, seq_len)
        order = np.lexsort((ids, -eff))
        bins: list[int] = []
        out_bin = np.empty(len(ids), dtype=np.int64)
        for j in order:
            x = int(eff[j])
            best_i, best_load = -1, -1
            for i, b in enumerate(bins):
                if b + x <= seq_len and b > best_load:
                    best_i, best_load = i, b
            if best_i < 0:
                bins.append(x)
                out_bin[j] = len(bins) - 1
            else:
                bins[best_i] += x
                out_bin[j] = best_i
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(nt, type=pa.int64()),
            "eff_tokens": pa.array(eff, type=pa.int64()),
            "shard": pa.array(np.full(len(ids), shard), type=pa.int64()),
            "bin_id": pa.array(out_bin, type=pa.int64()),
            "global_bin": pa.array(shard * (1 << 20) + out_bin,
                                   type=pa.int64()),
        })

    return (counts.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(pack_group, batch_format="pyarrow")
            .sort("doc_id"))
