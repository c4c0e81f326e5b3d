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
