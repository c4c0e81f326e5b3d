"""TextRank + RAKE keyword extraction (ops/keywords.py) vs plain-Python
brute force."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.keywords import (
    SCALE,
    _filtered_tokens,
    _phrase_runs,
    rake_phrases,
    textrank_keywords,
)

DOCS = [
    "deep graph rank the deep graph model a rank model",
    "graph rank graph rank the model",
    "the a the",
    "solo",
    "deep deep deep",  # self-adjacency: no self-loop edges
]


def _ds(parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": DOCS})).repartition(parallelism)


def test_phrase_runs():
    assert _phrase_runs("deep graph the rank a  model") == [
        ["deep", "graph"], ["rank"], ["model"]]
    assert _phrase_runs("the a") == []
    assert _filtered_tokens("the deep a graph") == ["deep", "graph"]


def _brute_textrank(iters=3):
    edges: dict[tuple, int] = {}
    for d in DOCS:
        toks = _filtered_tokens(d)
        for a, b in zip(toks, toks[1:]):
            if a != b:
                p = (min(a, b), max(a, b))
                edges[p] = edges.get(p, 0) + 1
    words = sorted({w for p in edges for w in p})
    wsum = {w: 0 for w in words}
    for (a, b), wt in edges.items():
        wsum[a] += wt
        wsum[b] += wt
    nv = len(words)
    base = SCALE // nv
    r = {w: base for w in words}
    for _ in range(iters):
        new = {w: (15 * base) // 100 for w in words}
        inc = {w: 0 for w in words}
        for (a, b), wt in edges.items():
            inc[b] += (r[a] * wt) // wsum[a]
            inc[a] += (r[b] * wt) // wsum[b]
        for w in words:
            new[w] += (85 * inc[w]) // 100
        r = new
    return sorted(r.items(), key=lambda t: (-t[1], t[0]))


def test_textrank_matches_bruteforce(ray_session):
    exp = _brute_textrank()
    t = textrank_keywords(_ds(4), n_iters=3, k=10)
    got = list(zip(t.column("word").to_pylist(),
                   t.column("score").to_pylist()))
    assert got == exp[:10]
    # 'solo' has no edges -> not a node
    assert "solo" not in [w for w, _ in got]


def test_textrank_parallelism_invariant(ray_session):
    t1 = textrank_keywords(_ds(1), n_iters=2, k=5)
    t5 = textrank_keywords(_ds(5), n_iters=2, k=5)
    assert t1.equals(t5)


def _brute_rake(min_freq=1):
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    phrases: dict[str, int] = {}
    plen: dict[str, int] = {}
    for d in DOCS:
        for run in _phrase_runs(d):
            p = " ".join(run)
            phrases[p] = phrases.get(p, 0) + 1
            plen[p] = len(run)
            for w in run:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(run)
    wscore = {w: (deg[w] * SCALE) // freq[w] for w in freq}
    rows = []
    for p, c in phrases.items():
        if c >= min_freq:
            rows.append((sum(wscore[w] for w in p.split(" ")), p,
                         plen[p], c))
    rows.sort(key=lambda t: (-t[0], t[1]))
    return rows


def test_rake_matches_bruteforce(ray_session):
    exp = _brute_rake(min_freq=1)
    t = rake_phrases(_ds(4), k=20, min_phrase_freq=1)
    got = [(r["score"], r["phrase"], r["n_words"], r["phrase_freq"])
           for r in t.to_pylist()]
    assert got == exp[:20]


def test_rake_freq_filter(ray_session):
    t = rake_phrases(_ds(3), k=20, min_phrase_freq=2)
    for r in t.to_pylist():
        assert r["phrase_freq"] >= 2


def test_rank_contrib_near_int64_limit_exact():
    """VERDICT r4 #5: near-2^63 rank×weight products must match exact
    integer arithmetic — and the naive int64 path provably diverges on
    the same inputs (silent numpy wraparound), so this test fails if the
    guard is ever removed."""
    import numpy as np

    from lucenenet_ray.ops.keywords import _rank_contrib

    rs = np.array([2 ** 40, 3 * 2 ** 40, 999_999_937], dtype=np.int64)
    w = np.array([2 ** 40, 2 ** 41, 2 ** 45], dtype=np.int64)
    ws = np.array([2 ** 41, 2 ** 41, 2 ** 46], dtype=np.int64)
    got = _rank_contrib(rs, w, ws)
    want = np.array([int(a) * int(b) // int(c)
                     for a, b, c in zip(rs, w, ws)], dtype=np.int64)
    assert (got == want).all()
    with np.errstate(over="ignore"):
        naive = (rs * w) // ws
    assert not (naive == want).all(), "inputs failed to exercise overflow"
    # small products keep the vectorized path bit-identical
    rs2 = np.array([10, 20], dtype=np.int64)
    w2 = np.array([3, 7], dtype=np.int64)
    ws2 = np.array([4, 7], dtype=np.int64)
    assert (_rank_contrib(rs2, w2, ws2) == np.array([7, 20])).all()
