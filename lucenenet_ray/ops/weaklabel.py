"""Weak supervision by labeling functions — the Snorkel data-programming
shape (Ratner et al., VLDB 2017: many cheap heuristic labelers vote;
conflicts and abstentions are first-class): each labeling function (LF)
either emits a class or ABSTAINS per doc; the label model here is the
deterministic unweighted majority vote (ties and all-abstain → no
label), which is Snorkel's own baseline ("majority vote") and exactly
re-derivable in SQL.

LFs over the corpus (keyword heuristics — the most common real LF kind):

    lf1: token 'spark'  present → class 1     lf2: 'merge'  → class 1
    lf3: token 'window' present → class 2     lf4: 'sort'   → class 2

Distributed shape: one stateless ``map_batches`` evaluates ALL LFs per
batch on the token sets (no per-LF corpus passes) and emits per-doc
votes; the per-class tally and the argmax are batch-local; one tiny
``groupby(label)`` folds corpus counts. Adding LFs changes only the
broadcastable rule table, never the pass count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LFS: tuple[tuple[str, int], ...] = (
    ("spark", 1), ("merge", 1), ("window", 2), ("sort", 2))


def label_docs(ds, lfs: tuple[tuple[str, int], ...] = LFS,
               text_col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """(doc_id, label, n_votes) for majority-labeled docs, doc_id-sorted;
    ties between classes and all-abstain docs are excluded (label 0
    semantics left to the caller, like Snorkel's -1)."""
    from lucenenet_ray.util.tables import dataset_to_table

    classes = sorted({c for _t, c in lfs})

    def lab(t: pa.Table) -> pa.Table:
        out_d, out_l, out_v = [], [], []
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            toks = set((txt or "").split(" "))
            votes = {c: 0 for c in classes}
            for term, cls in lfs:
                if term in toks:
                    votes[cls] += 1
            best = max(classes, key=lambda c: (votes[c], -c))
            n = votes[best]
            if n == 0 or sum(1 for c in classes
                             if votes[c] == n) > 1:
                continue  # abstain: no votes, or an exact tie
            out_d.append(did)
            out_l.append(best)
            out_v.append(n)
        return pa.table({
            "doc_id": pa.array(out_d, type=pa.int64()),
            "label": pa.array(out_l, type=pa.int64()),
            "n_votes": pa.array(out_v, type=pa.int64()),
        })

    t = dataset_to_table(
        ds.map_batches(lab, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64()), ("label", pa.int64()),
                          ("n_votes", pa.int64())]))
    idx = pa.compute.sort_indices(t, sort_keys=[("doc_id", "ascending")])
    return t.take(idx)
