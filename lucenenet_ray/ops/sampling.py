"""Deterministic stratified sampling — training-data mixture building.

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
