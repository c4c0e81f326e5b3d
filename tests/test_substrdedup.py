"""ExactSubstr dedup (ops/substrdedup.py): fixed-window duplicated-span
detection and removal vs a brute-force model — cross-doc repeats,
within-doc repeats, interval cover merging, short docs, partition
invariance."""

import hashlib

import pyarrow as pa
import pytest
import ray.data as rd

from lucenenet_ray.ops.substrdedup import dedup_substrings

L = 4


def brute(docs: dict[int, str]):
    from collections import Counter

    occ = Counter()
    wins = {}
    for d, txt in docs.items():
        toks = txt.split(" ")
        ws = [" ".join(toks[i:i + L]) for i in range(max(len(toks) - L + 1, 0))]
        wins[d] = (toks, ws)
        occ.update(ws)
    out = {}
    for d, (toks, ws) in wins.items():
        dup_idx = [i for i, w in enumerate(ws) if occ[w] >= 2]
        covered = set()
        for i in dup_idx:
            covered.update(range(i, i + L))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[d] = (len(toks), len(ws), len(dup_idx), len(covered),
                  hashlib.md5(" ".join(kept).encode()).hexdigest())
    return out


DOCS = {
    # docs 0/1 share the run "a b c d e" (two overlapping dup windows each)
    0: "x a b c d e y z w q",
    1: "p a b c d e r s t u",
    # doc 2 repeats "m n o k" internally (within-doc repeat must count)
    2: "m n o k z z m n o k",
    # doc 3: unique text, no dups
    3: "one two three four five six",
    # doc 4: shorter than L → no windows, text kept
    4: "tiny doc",
    # doc 5: entirely one duplicated window (covers everything) — shares
    # with doc 6
    5: "q1 q2 q3 q4",
    6: "q1 q2 q3 q4",
}


@pytest.mark.parametrize("blocks", [1, 4])
def test_matches_brute_force(ray_session, blocks):
    t = pa.table({"doc_id": pa.array(sorted(DOCS), type=pa.int64()),
                  "text": pa.array([DOCS[k] for k in sorted(DOCS)],
                                   type=pa.string())})
    ds = rd.from_arrow(t).repartition(blocks)
    out = dedup_substrings(ds, L=L)
    exp = brute(DOCS)
    for r in out.take_all():
        d = r["doc_id"]
        assert (r["n_tokens"], r["n_windows"], r["n_dup_windows"],
                r["n_covered_tokens"], r["clean_md5"]) == exp[d], d


def test_specific_semantics(ray_session):
    t = pa.table({"doc_id": pa.array(sorted(DOCS), type=pa.int64()),
                  "text": pa.array([DOCS[k] for k in sorted(DOCS)],
                                   type=pa.string())})
    out = {r["doc_id"]: r for r in
           dedup_substrings(rd.from_arrow(t), L=L).take_all()}
    # doc 3: untouched — clean hash == original hash
    assert out[3]["n_dup_windows"] == 0
    assert out[3]["clean_md5"] == hashlib.md5(DOCS[3].encode()).hexdigest()
    # doc 4: no windows, kept verbatim
    assert out[4]["n_windows"] == 0
    assert out[4]["clean_md5"] == hashlib.md5(DOCS[4].encode()).hexdigest()
    # docs 5/6: fully covered → empty cleaned text
    for d in (5, 6):
        assert out[d]["n_covered_tokens"] == 4
        assert out[d]["clean_md5"] == hashlib.md5(b"").hexdigest()
    # doc 2's within-doc repeat: both occurrences of "m n o k" covered
    assert out[2]["n_dup_windows"] == 2
    assert out[2]["n_covered_tokens"] == 8
