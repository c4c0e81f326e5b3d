"""Domain-level corpus hygiene — the RefinedWeb/CCNet-style step that
caps any single web domain's share of the training mix and drops
blocklisted domains outright.

The synthetic ``documents`` table has no url column, so (like
ops/scrub.py's md5-spliced PII) the domain is DERIVED deterministically
from ``doc_id``: ``d = md5_int31(f"dom:{doc_id}") % 40`` then squashed to
``(d*d) // 40`` — a deliberately skewed integer map (low domain numbers
absorb several ``d`` values, so a few domains really do exceed the share
cap) that DuckDB reproduces with the same md5/int arithmetic. The gate
therefore tests the *filter semantics* (share math + blocklist), not the
synthesizer.

Scale shape: ONE ``groupby(domain)`` over a narrow (doc_id, domain)
stream — domains are low-cardinality so the map-side combine collapses
each block to ~|domains| rows before the exchange; the blocked-domain set
is tiny and broadcast via ``ray.put`` for the corpus filter pass (zero
additional shuffles)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

N_DOMAINS = 40


def synth_domains(doc_ids) -> list[str]:
    """doc_id → deterministic skewed domain name (see module docstring)."""
    out = []
    for k in doc_ids:
        d = md5_int31(f"dom:{k}") % N_DOMAINS
        out.append(f"d{(d * d) // N_DOMAINS}.example.com")
    return out


def _domain_ds(ds, id_col: str = "doc_id"):
    def add(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        return pa.table({
            "doc_id": t.column(id_col),
            "domain": pa.array(synth_domains(ids), type=pa.string()),
        })

    return ds.map_batches(add, batch_format="pyarrow")


def domain_stats(ds, blocklist: tuple[str, ...] = ("d3.example.com",),
                 cap_num: int = 1, cap_den: int = 20,
                 id_col: str = "doc_id") -> pa.Table:
    """Per-domain doc counts + block flags: ``blocked_list`` (explicit
    blocklist) and ``blocked_cap`` (share strictly above cap_num/cap_den
    of the corpus — exact integer cross-multiplication, no float share).
    Returns a small Arrow table sorted by domain."""
    total = ds.count()
    agg = _domain_ds(ds, id_col).groupby("domain").count().to_pandas()
    agg = agg.sort_values("domain")
    domains = agg["domain"].tolist()
    counts = agg["count()"].to_numpy(dtype=np.int64)
    bl = set(blocklist)
    return pa.table({
        "domain": pa.array(domains, type=pa.string()),
        "n_docs": pa.array(counts, type=pa.int64()),
        "blocked_list": pa.array([d in bl for d in domains],
                                 type=pa.bool_()),
        "blocked_cap": pa.array(
            (counts * cap_den > total * cap_num).tolist(), type=pa.bool_()),
    })


def domain_filter(ds, blocklist: tuple[str, ...] = ("d3.example.com",),
                  cap_num: int = 1, cap_den: int = 20,
                  id_col: str = "doc_id"):
    """Corpus filter pass: drop every doc whose domain is blocked (by list
    or by share cap). The blocked set comes from :func:`domain_stats`
    (bucket-count rows), is ``ray.put`` once, and each task filters its
    batch locally — zero shuffles on the corpus stream."""
    import ray

    st = domain_stats(ds, blocklist, cap_num, cap_den, id_col)
    blocked = {
        d for d, bl_, bc in zip(st.column("domain").to_pylist(),
                                st.column("blocked_list").to_pylist(),
                                st.column("blocked_cap").to_pylist())
        if bl_ or bc
    }
    blocked_ref = ray.put(blocked)

    def keep(t: pa.Table) -> pa.Table:
        bset = ray.get(blocked_ref)
        doms = synth_domains(t.column(id_col).to_pylist())
        mask = [d not in bset for d in doms]
        return t.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


# --- Temperature-scaled domain mixing (the UniMax / T5 mixing-rate family:
# Raffel et al. 2020 §3.4.2 "temperature-scaled mixing", Chung et al. 2023
# UniMax): sample domain d at a rate proportional to n_d^alpha with
# alpha = 1/temperature < 1, so giant domains are down-weighted and small
# ones survive. alpha is FIXED at 1/2 (temperature 2) so the keep rule has
# an exact integer form:
#
#     keep doc  <=>  key^2 * n_d < c^2,   key = md5_int31("tmix:{doc_id}")
#
# i.e. P(keep | d) = min(1, c / (2^31 * sqrt(n_d))), hence the expected
# kept count n_d * P ~ (c / 2^31) * sqrt(n_d) = n_d^(1/2) up to the cap —
# exactly the alpha=1/2 mixing rate. Both sides of the rule are integers
# (DuckDB compares them in HUGEINT; the engine precomputes the per-domain
# threshold T_d = isqrt((c^2 - 1) // n_d) with Python bigints so workers
# run a pure int64 `key <= T_d` compare — the two forms are equivalent:
# key^2 * n_d < c^2  <=>  key <= isqrt((c^2 - 1) // n_d)).
TMIX_C_MULT = 6  # c = TMIX_C_MULT * 2^31: ~50% keep at n_d ~ 144 docs


def temperature_mix_stats(ds, c_mult: int = TMIX_C_MULT,
                          id_col: str = "doc_id") -> pa.Table:
    """(domain, n_docs, n_kept) per synthesized domain, domain-sorted —
    the alpha=1/2 temperature-mix keep rule applied corpus-wide.

    Scale shape: stage 1 is the same narrow one-groupby domain count as
    :func:`domain_stats`; the driver turns the |domains|-row aggregate
    into exact integer thresholds; stage 2 is a shuffle-FREE map_batches
    that compares each row's md5 key against its domain's broadcast
    threshold and emits per-batch (domain, kept-partial) rows reduced by
    one tiny groupby. The corpus stream is never materialized."""
    import ray

    c = c_mult << 31
    agg = _domain_ds(ds, id_col).groupby("domain").count().to_pandas()
    agg = agg.sort_values("domain")
    domains = agg["domain"].tolist()
    counts = [int(x) for x in agg["count()"].tolist()]
    from math import isqrt
    thresh = {d: min(isqrt((c * c - 1) // n), (1 << 31) - 1)
              for d, n in zip(domains, counts)}
    tref = ray.put(thresh)

    def kept_partial(t: pa.Table) -> pa.Table:
        th = ray.get(tref)
        ids = t.column(id_col).to_pylist()
        doms = synth_domains(ids)
        keys = [md5_int31(f"tmix:{k}") for k in ids]
        cnt: dict = {}
        for d, k in zip(doms, keys):
            if k <= th[d]:
                cnt[d] = cnt.get(d, 0) + 1
        ks = sorted(cnt)
        return pa.table({
            "domain": pa.array(ks, type=pa.string()),
            "kept": pa.array([cnt[d] for d in ks], type=pa.int64()),
        })

    kept = {d: 0 for d in domains}
    agg2 = ds.map_batches(
        kept_partial, batch_format="pyarrow").groupby("domain").sum("kept")
    for d, s in zip(*[agg2.to_pandas()[c_].tolist()
                      for c_ in ("domain", "sum(kept)")]):
        kept[d] = int(s)
    return pa.table({
        "domain": pa.array(domains, type=pa.string()),
        "n_docs": pa.array(counts, type=pa.int64()),
        "n_kept": pa.array([kept[d] for d in domains], type=pa.int64()),
    })


# --- Group-aware (leakage-free) dataset split: the sklearn GroupShuffleSplit
# contract at corpus scale — the split is keyed on the GROUP (web domain),
# never the document, so near-duplicate pages from one site can never
# straddle train/validation/test (the leakage mode document-level random
# splits suffer; Kandpal et al. 2022 measure exactly this effect for LMs).
GSPLIT_NAMES = ("train", "val", "test")


def group_split_counts(ds, id_col: str = "doc_id") -> pa.Table:
    """(split, n_domains, n_docs) under split(domain) =
    md5_int31("gsplit:" + domain) % 10 → 0-7 train / 8 val / 9 test.
    Shape: one narrow (domain, split) distinct-pair groupby — the doc
    stream is read once; by construction a domain appears in exactly one
    split, so the contract is structural, not statistical."""
    def cells(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        doms = synth_domains(ids)
        splits = []
        for dm in doms:
            b = md5_int31(f"gsplit:{dm}") % 10
            splits.append("train" if b < 8 else ("val" if b == 8 else "test"))
        return pa.table({
            "split": pa.array(splits, type=pa.string()),
            "domain": pa.array(doms, type=pa.string()),
        })

    agg = (ds.map_batches(cells, batch_format="pyarrow")
           .groupby(["split", "domain"]).count().to_pandas())
    out = []
    for s in GSPLIT_NAMES:
        g = agg[agg["split"] == s]
        out.append((s, len(g), int(g["count()"].sum())))
    return pa.table({
        "split": pa.array([r[0] for r in out], type=pa.string()),
        "n_domains": pa.array([r[1] for r in out], type=pa.int64()),
        "n_docs": pa.array([r[2] for r in out], type=pa.int64()),
    })
