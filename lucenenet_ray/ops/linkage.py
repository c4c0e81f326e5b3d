"""Record linkage (entity resolution) — blocking + Fellegi-Sunter-style
agreement scoring (Fellegi & Sunter 1969; the Splink/dedupe.io pipeline
shape): two record sources about the same entities, candidate pairs
generated only WITHIN blocks, pairs scored by integer agreement weights,
matches = score above threshold, all evaluated against ground truth.

Record synthesis (md5-derived from the customer table, so the SQL oracle
re-derives every rule and the gate tests the LINKAGE semantics, not the
synthesizer):

    in A  <=>  md5("inA:{k}") % 4 != 0        (~75% of customers)
    in B  <=>  md5("inB:{k}") % 4 != 0
    fields: nation = c_nationkey, seg = c_mktsegment,
            bucket = floor(c_acctbal / 1000),
            area = md5("area:{k}") % 100          (a synthetic phone area)
    B perturbs: nation -> (nation+1) % 25  iff md5("pnat:{k}") % 3 == 0
                area   -> (area+1) % 100   iff md5("parea:{k}") % 6 == 0
                seg    -> next segment     iff md5("pseg:{k}") % 5 == 0

Blocking key = (bucket, nation): cheap and realistic — nation is NOISY,
so nation-perturbed true pairs fall outside every block (the classic
blocking recall loss; the gate MEASURES it instead of hiding it).
Scoring: area agree +25 / disagree -15; seg agree +10 / disagree -10;
match <=> score >= 15 (area must agree; segment only breaks borderline).
Area has cardinality 100, so false matches occur and are counted.

Distributed shape: two narrow synthesis passes (A/B tagged rows), ONE
``groupby(bucket, nation)`` co-locates candidates, each block does a
vectorized outer comparison bounded by |A_block| x |B_block| and emits
ONE partial counter row; the fold is driver-side addition of block
counters. Ground-truth totals come from the same synthesis rules, never
a side channel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.neardup import md5_int31

SEGS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
W_AREA_A, W_AREA_D = 25, -15
W_SEG_A, W_SEG_D = 10, -10
THRESH = 15


def _records(t: pa.Table, side: str) -> pa.Table:
    keys = t.column("c_custkey").to_pylist()
    nat = t.column("c_nationkey").to_pylist()
    seg = t.column("c_mktsegment").to_pylist()
    bal = t.column("c_acctbal").to_numpy(zero_copy_only=False)
    bucket = np.floor(bal / 1000.0).astype(np.int64)
    out = {"key": [], "bucket": [], "nation": [], "seg": [], "area": [],
           "side": []}
    tag = 0 if side == "A" else 1
    for i, k in enumerate(keys):
        if md5_int31(f"in{side}:{k}") % 4 == 0:
            continue
        n, s = int(nat[i]), seg[i]
        area = md5_int31(f"area:{k}") % 100
        if side == "B":
            if md5_int31(f"pnat:{k}") % 3 == 0:
                n = (n + 1) % 25
            if md5_int31(f"parea:{k}") % 6 == 0:
                area = (area + 1) % 100
            if md5_int31(f"pseg:{k}") % 5 == 0:
                s = SEGS[(SEGS.index(s) + 1) % len(SEGS)]
        out["key"].append(int(k))
        out["bucket"].append(int(bucket[i]))
        out["nation"].append(n)
        out["seg"].append(SEGS.index(s))
        out["area"].append(area)
        out["side"].append(tag)
    return pa.table({
        "key": pa.array(out["key"], type=pa.int64()),
        "bucket": pa.array(out["bucket"], type=pa.int64()),
        "nation": pa.array(out["nation"], type=pa.int64()),
        "seg": pa.array(out["seg"], type=pa.int64()),
        "area": pa.array(out["area"], type=pa.int64()),
        "side": pa.array(out["side"], type=pa.int64()),
    })


def link_records(customer_ds) -> pa.Table:
    """One row: (n_candidates, n_matches, n_true_found, n_true_in_blocks,
    n_true_total) — exact integers."""

    rows = customer_ds.map_batches(
        lambda t: pa.concat_tables([_records(t, "A"), _records(t, "B")]),
        batch_format="pyarrow")

    def block_counts(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        a = side == 0
        b = side == 1
        if not a.any() or not b.any():
            z = pa.array([0], type=pa.int64())
            return pa.table({"cand": z, "match": z, "true_found": z,
                             "true_blocked": z})
        key = group.column("key").to_numpy(zero_copy_only=False)
        seg = group.column("seg").to_numpy(zero_copy_only=False)
        area = group.column("area").to_numpy(zero_copy_only=False)
        ka, kb = key[a], key[b]
        sa, sb = seg[a], seg[b]
        ra, rb = area[a], area[b]
        same_area = ra[:, None] == rb[None, :]
        same_seg = sa[:, None] == sb[None, :]
        score = (np.where(same_area, W_AREA_A, W_AREA_D)
                 + np.where(same_seg, W_SEG_A, W_SEG_D))
        m = score >= THRESH
        truth = ka[:, None] == kb[None, :]
        return pa.table({
            "cand": pa.array([int(m.size)], type=pa.int64()),
            "match": pa.array([int(m.sum())], type=pa.int64()),
            "true_found": pa.array([int((m & truth).sum())],
                                   type=pa.int64()),
            "true_blocked": pa.array([int(truth.sum())], type=pa.int64()),
        })

    agg = (rows.groupby(["bucket", "nation"])
           .map_groups(block_counts, batch_format="pyarrow")
           .sum(["cand", "match", "true_found", "true_blocked"])
           )
    # total true pairs (key in both sources), from the same narrow stream
    import ray

    both = 0
    for ref in rows.groupby("key").count().to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows and "count()" in t.schema.names:
            c = t.column("count()").to_numpy(zero_copy_only=False)
            both += int((c == 2).sum())
    return pa.table({
        "n_candidates": pa.array([int(agg["sum(cand)"])], type=pa.int64()),
        "n_matches": pa.array([int(agg["sum(match)"])], type=pa.int64()),
        "n_true_found": pa.array([int(agg["sum(true_found)"])],
                                 type=pa.int64()),
        "n_true_in_blocks": pa.array([int(agg["sum(true_blocked)"])],
                                     type=pa.int64()),
        "n_true_total": pa.array([both], type=pa.int64()),
    })
