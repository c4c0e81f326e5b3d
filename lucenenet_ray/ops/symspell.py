"""Deletion-neighborhood spelling-variant mining — the SymSpell candidate
scheme (Garbe 2012; the same deletion-key trick powers FAISS-free fuzzy
term joins in spell correction and query-log canonicalization): two terms
within Levenshtein distance 1 necessarily share a single-deletion variant
(or one IS the other's deletion), so the candidate join is ONE groupby on
deletion keys over the VOCABULARY — never a quadratic scan, never the
corpus stream.

Pipeline (all vocab-bounded after the first groupby):
1. vocabulary: distinct raw tokens + counts — ONE corpus groupby;
2. key explode: every term emits itself + its |term| single-deletion
   variants (Σ|term| rows over the vocab);
3. candidates: ONE ``groupby(variant)``; each group emits its distinct
   (a < b) pairs (per-group cap documented for pathological keys);
4. verify: exact Levenshtein-distance-1 check per candidate (equal
   length → exactly one mismatched position; length diff 1 → deletion
   match) — candidates-scale, like ops/neardup.jaccard_verify;
5. rank: top-k pairs by (freq_sum desc, a asc, b asc).

The SQL oracle re-derives the same keys, join and verification, so the
gate covers candidate generation AND the exact-distance filter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _dist1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance-==-1 (lengths differ by at most 1)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la < lb:
        a, b, la, lb = b, a, lb, la
    if la != lb + 1:
        return False
    i = 0
    while i < lb and a[i] == b[i]:
        i += 1
    return a[i + 1:] == b[i:]


def spell_variant_pairs(ds, k: int = 20, max_group: int = 64,
                        text_col: str = "text") -> pa.Table:
    """(term_a, term_b, freq_sum) top-k verified distance-1 pairs."""
    import ray

    def vocab_partial(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for txt in t.column(text_col).to_pylist():
            for tok in (txt or "").split(" "):
                if tok:
                    cnt[tok] = cnt.get(tok, 0) + 1
        ks = sorted(cnt)
        return pa.table({
            "term": pa.array(ks, type=pa.string()),
            "c": pa.array([cnt[x] for x in ks], type=pa.int64()),
        })

    vocab = (ds.map_batches(vocab_partial, batch_format="pyarrow")
             .groupby("term").sum("c").materialize())

    def key_rows(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_pylist()
        out_v, out_t = [], []
        for term in terms:
            out_v.append(term)
            out_t.append(term)
            for i in range(len(term)):
                out_v.append(term[:i] + term[i + 1:])
                out_t.append(term)
        return pa.table({
            "v": pa.array(out_v, type=pa.string()),
            "term": pa.array(out_t, type=pa.string()),
        })

    def group_pairs(g: pa.Table) -> pa.Table:
        terms = sorted(set(g.column("term").to_pylist()))[:max_group]
        if len(terms) < 2:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string())})
        out_a, out_b = [], []
        for i in range(len(terms)):
            for j in range(i + 1, len(terms)):
                out_a.append(terms[i])
                out_b.append(terms[j])
        return pa.table({"a": pa.array(out_a, type=pa.string()),
                         "b": pa.array(out_b, type=pa.string())})

    cand = (vocab.map_batches(key_rows, batch_format="pyarrow")
            .groupby("v").map_groups(group_pairs, batch_format="pyarrow")
            .groupby(["a", "b"]).count())

    counts = {t: int(c) for t, c in zip(
        *[vocab.to_pandas()[col].tolist() for col in ("term", "sum(c)")])}
    pairs: list[tuple[int, str, str]] = []
    for ref in cand.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows or "a" not in t.schema.names:
            continue
        for a, b in zip(t.column("a").to_pylist(),
                        t.column("b").to_pylist()):
            if _dist1(a, b):
                pairs.append((counts[a] + counts[b], a, b))
    pairs.sort(key=lambda r: (-r[0], r[1], r[2]))
    pairs = pairs[:k]
    return pa.table({
        "term_a": pa.array([p[1] for p in pairs], type=pa.string()),
        "term_b": pa.array([p[2] for p in pairs], type=pa.string()),
        "freq_sum": pa.array([p[0] for p in pairs], type=pa.int64()),
    })


def augment_typos(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Deterministic typo injection (the gate-corpus pattern of
    ops/scrub.py: splice md5-derived pathologies so the gate exercises
    the matcher, not the synthesizer): for docs with
    md5_int31("typo:{id}") % 10 == 0 whose 4th raw token has >= 3 chars,
    append that token with character (md5_int31("typopos:{id}") % len)
    deleted — guaranteeing distance-1 vocabulary neighbors."""
    from lucenenet_ray.ops.neardup import md5_int31

    def aug(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        out = []
        for did, txt in zip(ids, texts):
            s = txt or ""
            toks = s.split(" ")
            if md5_int31(f"typo:{did}") % 10 == 0 and len(toks) >= 4 \
                    and len(toks[3]) >= 3:
                w = toks[3]
                p = md5_int31(f"typopos:{did}") % len(w)
                out.append(s + " " + w[:p] + w[p + 1:])
            else:
                out.append(s)
        return pa.table({id_col: t.column(id_col),
                         text_col: pa.array(out, type=pa.string())})

    return ds.map_batches(aug, batch_format="pyarrow")


def context_spell_correct(ds, k: int = 50, text_col: str = "text",
                          id_col: str = "doc_id") -> pa.Table:
    """Noisy-channel context-sensitive spell correction (Kernighan,
    Church & Gale, COLING 1990: channel candidates × language-model
    context; candidates come from the SymSpell deletion-key scheme, the
    LM is the clean corpus' left-bigram table): for every injected typo
    occurrence (the augment_typos rule — typo appended after the doc's
    last word), choose among the distance-1 vocabulary candidates the
    one maximizing (bigram(left, cand) desc, unigram(cand) desc,
    cand asc).

    Returns (doc_id, typo, left_word, chosen, bigram_n), doc-sorted,
    first k.  Statistics are vocab-bounded groupbys broadcast once (the
    deletion-key join replaces the vocab scan at open-web scale)."""
    import ray

    from lucenenet_ray.ops.neardup import md5_int31

    def uni_partial(t: pa.Table) -> pa.Table:
        cnt: dict[str, int] = {}
        for x in t.column(text_col).to_pylist():
            for w in (x or "").split(" "):
                if w:
                    cnt[w] = cnt.get(w, 0) + 1
        ks = sorted(cnt)
        return pa.table({"term": pa.array(ks, type=pa.string()),
                         "cnt": pa.array([cnt[w] for w in ks],
                                         type=pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        cnt = {}
        for x in t.column(text_col).to_pylist():
            toks = [w for w in (x or "").split(" ") if w]
            for a, b in zip(toks, toks[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        ks = sorted(cnt)
        return pa.table({
            "a": pa.array([a for a, _ in ks], type=pa.string()),
            "b": pa.array([b for _, b in ks], type=pa.string()),
            "cnt": pa.array([cnt[x] for x in ks], type=pa.int64()),
        })

    uni = (ds.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("term").sum("cnt").to_pandas())
    uni_of = dict(zip(uni["term"], uni["sum(cnt)"].astype(int)))
    big = (ds.map_batches(bi_partial, batch_format="pyarrow")
           .groupby(["a", "b"]).sum("cnt").to_pandas())
    bi_of = {(a, b): int(c) for a, b, c in
             zip(big["a"], big["b"], big["sum(cnt)"])}
    # SymSpell deletion-key index over the vocabulary
    key_index: dict[str, list] = {}
    for term in uni_of:
        for v in {term} | {term[:i] + term[i + 1:]
                           for i in range(len(term))}:
            key_index.setdefault(v, []).append(term)
    bref = ray.put((uni_of, bi_of, key_index))

    def correct(t: pa.Table) -> pa.Table:
        un, bg, ki = ray.get(bref)
        rows = {"doc_id": [], "typo": [], "left_word": [],
                "chosen": [], "bigram_n": []}
        for did, txt in zip(t.column(id_col).to_pylist(),
                            t.column(text_col).to_pylist()):
            s = txt or ""
            toks = s.split(" ")
            if not (md5_int31(f"typo:{did}") % 10 == 0
                    and len(toks) >= 4 and len(toks[3]) >= 3):
                continue
            w = toks[3]
            p = md5_int31(f"typopos:{did}") % len(w)
            typo = w[:p] + w[p + 1:]
            nonempty = [x for x in toks if x]
            left = nonempty[-1] if nonempty else ""
            cands = set()
            for v in {typo} | {typo[:i] + typo[i + 1:]
                               for i in range(len(typo))}:
                for term in ki.get(v, ()):
                    if term != typo and _dist1(term, typo):
                        cands.add(term)
            if not cands:
                continue
            best = sorted(
                cands,
                key=lambda c: (-bg.get((left, c), 0), -un.get(c, 0), c)
            )[0]
            rows["doc_id"].append(did)
            rows["typo"].append(typo)
            rows["left_word"].append(left)
            rows["chosen"].append(best)
            rows["bigram_n"].append(bg.get((left, best), 0))
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "typo": pa.array(rows["typo"], type=pa.string()),
            "left_word": pa.array(rows["left_word"], type=pa.string()),
            "chosen": pa.array(rows["chosen"], type=pa.string()),
            "bigram_n": pa.array(rows["bigram_n"], type=pa.int64()),
        })

    from lucenenet_ray.util.tables import dataset_to_table

    out = dataset_to_table(
        ds.map_batches(correct, batch_format="pyarrow"),
        schema=pa.schema([("doc_id", pa.int64()), ("typo", pa.string()),
                          ("left_word", pa.string()),
                          ("chosen", pa.string()),
                          ("bigram_n", pa.int64())])).to_pandas()
    out = out.sort_values("doc_id").head(k).reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["bigram_n"] = out["bigram_n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)
