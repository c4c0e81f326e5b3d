"""Deterministic stratified sampling + epoch shuffling — training-data
mixture building and data ordering.

A per-stratum (e.g. per-language) keep-fraction applied with a
content-keyed md5 hash, so the sample is reproducible, order-independent,
and requires ZERO shuffles: one stateless ``map_batches`` filter over the
stream (every worker makes the same decision for a row no matter which
block it lands in). The standard quota-mixing step of a 100-TB corpus
build (e.g. downsample head languages, keep the tail whole).
"""

from __future__ import annotations

import pyarrow as pa

from lucenenet_ray.ops.neardup import HASH_DOMAIN, md5_int31


def stratified_sample(ds, fractions: dict[str, float],
                      strata_col: str = "lang",
                      key_col: str = "doc_id",
                      default: float = 1.0, salt: str = "strat"):
    """Keep each row iff md5(salt:key) < fraction(stratum) · 2^31.

    `ds` is a Ray Dataset; returns the filtered Dataset (streaming — no
    materialization, no shuffle)."""
    thresholds = {s: int(f * HASH_DOMAIN) for s, f in fractions.items()}
    default_thr = int(default * HASH_DOMAIN)

    def keep(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        strata = t.column(strata_col).to_pylist()
        mask = [md5_int31(f"{salt}:{k}") < thresholds.get(s, default_thr)
                for k, s in zip(keys, strata)]
        return t.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def equalized_sample(ds, per_group: int, strata_col: str = "lang",
                     key_col: str = "doc_id", salt: str = "eqmix"):
    """Data-mixing with CORPUS-DERIVED quotas: keep ≈``per_group`` docs
    from every stratum regardless of its size (the temperature→0 limit of
    multilingual temperature sampling, Conneau & Lample 2019 practice —
    head languages down-sampled hard, tail languages kept whole).

    Keep rule is an exact integer cross-multiplication so the oracle
    compares bit-for-bit: keep iff ``md5_int31(salt:key) * n_g <
    per_group * 2^31`` (i.e. hash-fraction < per_group/n_g; groups with
    n_g <= per_group keep everything).

    Two passes: ONE low-cardinality ``groupby(strata)`` count (driver sees
    group-count rows), then a zero-shuffle streaming filter with the
    counts dict in the batch closure. Returns the filtered Dataset."""
    counts = {r[strata_col]: int(r["count()"])
              for r in ds.groupby(strata_col)  # bounded-collect: strata-cardinality rows
              .count().take_all()}

    def keep(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        strata = t.column(strata_col).to_pylist()
        mask = [md5_int31(f"{salt}:{k}") * counts.get(s, 1)
                < per_group * HASH_DOMAIN
                for k, s in zip(keys, strata)]
        return t.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def epoch_shuffle(ds, seed: int = 1, key_col: str = "doc_id",
                  salt: str = "epoch"):
    """Deterministic global training-epoch shuffle: reorder the corpus by
    ``md5(f"{salt}:{seed}:{key}")`` — every epoch (seed) is a different but
    fully reproducible permutation, independent of block layout or worker
    scheduling (the property a resumable 100-TB training run needs: any
    shard of the shuffled order can be re-derived from the key alone).

    The reorder is Ray Data's distributed ``sort`` — a genuine all-to-all,
    because a global shuffle IS an all-to-all; at scale the sorted stream
    is written back as partitioned parquet (range-partitioned by the hash
    key, so a trainer can read any contiguous slice). Hex-string keys make
    the DuckDB oracle byte-identical (``md5(...)`` there returns the same
    hex)."""
    import hashlib

    def add_key(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        sk = [hashlib.md5(f"{salt}:{seed}:{k}".encode()).hexdigest()
              for k in keys]
        return t.append_column("shuffle_key", pa.array(sk, type=pa.string()))

    return ds.map_batches(add_key, batch_format="pyarrow").sort(
        ["shuffle_key", key_col])


def weighted_sample(ds, k: int, weight_col: str, key_col: str = "doc_id",
                    salt: str = "wsamp") -> pa.Table:
    """Weighted random sampling without replacement (Efraimidis & Spirakis
    2006, the A-ES one-pass scheme): each row draws the md5 uniform
    ``u = (md5_int60(salt:key)+1) / 2^60`` and the k rows with the largest
    ``u^(1/w)`` form the sample — exactly the WRS-N-P distribution, but
    fully deterministic and order/partition-independent here because u is
    content-keyed, so the "random" sample is reproducible corpus-wide.

    Distributed shape: one streaming ``map_batches`` computes per-batch
    partial top-k (ranked by ``ln(u)/w``, monotone in the key, float64),
    the driver merges the tiny partials — no shuffle, no corpus
    materialization, driver state = O(k · blocks) rows.

    Rows with weight <= 0 are excluded (u^(1/w) undefined — the paper's
    items must have positive weight). Returns (rank, key, weight) —
    the selection only; float keys stay internal."""
    import hashlib

    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.schema.names:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "weight": pa.array([], type=pa.int64()),
                             "lnkey": pa.array([], type=pa.float64())})
        keys = t.column(key_col).to_pylist()
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        m = np.array(
            [int(hashlib.md5(f"{salt}:{kk}".encode()).hexdigest()[:15], 16)
             for kk in keys], dtype=np.float64)
        pos = w > 0
        # rank key: ln(u)/w  (monotone transform of u^(1/w); closer to 0
        # is better since ln(u) < 0)
        lnu = np.log((m + 1.0) / 1152921504606846976.0)
        score = np.where(pos, lnu / np.where(pos, w, 1.0), -np.inf)
        idx = np.flatnonzero(pos)
        if len(idx) > k:
            part = idx[np.argpartition(-score[idx], k - 1)[:k]]
        else:
            part = idx
        karr = np.asarray(keys, dtype=np.int64)[part]
        order = np.lexsort((karr, -score[part]))
        part = part[order]
        return pa.table({
            key_col: pa.array(karr[order], type=pa.int64()),
            "weight": pa.array(
                w[part].astype(np.int64), type=pa.int64()),
            "lnkey": pa.array(score[part], type=pa.float64()),
        })

    # bounded-collect: k-per-batch partial top-k rows (k·blocks)
    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["lnkey"], r[key_col]))
    top = rows[:k]
    return pa.table({
        "rank": pa.array(range(1, len(top) + 1), type=pa.int64()),
        key_col: pa.array([r[key_col] for r in top], type=pa.int64()),
        "weight": pa.array([r["weight"] for r in top], type=pa.int64()),
    })
