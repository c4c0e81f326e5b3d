"""PMI collocations + Distinct-N diversity (ops/collocations.py) and
co-citation (ops/linkpredict.py) vs plain-Python brute force."""

import numpy as np
import pyarrow as pa

from lucenenet_ray.ops.collocations import SCALE, ngram_diversity, pmi_bigrams
from lucenenet_ray.ops.linkpredict import cocitation_topk

DOCS = [
    ("new york is big", "s1"),
    ("new york new york", "s1"),
    ("big data is new", "s2"),
    ("data data data data", "s2"),
    ("", "s2"),
    ("york  is", "s1"),  # double space -> empty token dropped, adjacency
]


def _ds(parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "text": [t for t, _ in DOCS],
        "source": [s for _, s in DOCS],
    })).repartition(parallelism)


def _brute_counts():
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for t, _ in DOCS:
        toks = [w for w in t.split(" ") if w]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    return uni, big


def test_pmi_matches_bruteforce(ray_session):
    uni, big = _brute_counts()
    n = sum(uni.values())
    min_count = 2
    exp = []
    for (a, b), cab in big.items():
        if cab >= min_count:
            exp.append((cab * n * SCALE // (uni[a] * uni[b]), a, b, cab))
    exp.sort(key=lambda r: (-r[0], r[1], r[2]))
    t = pmi_bigrams(_ds(4), k=10, min_count=min_count)
    got = [(r["lift"], r["a"], r["b"], r["c_ab"]) for r in t.to_pylist()]
    assert got == [(s, a, b, c) for s, a, b, c in exp[:10]]


def test_pmi_parallelism_invariant(ray_session):
    t1 = pmi_bigrams(_ds(1), k=5, min_count=1)
    t5 = pmi_bigrams(_ds(5), k=5, min_count=1)
    assert t1.equals(t5)


def test_diversity_matches_bruteforce(ray_session):
    per: dict[str, list] = {}
    for t, s in DOCS:
        toks = [w for w in t.split(" ") if w]
        per.setdefault(s, []).extend(zip(toks, toks[1:]))
    t = ngram_diversity(_ds(3), n=2)
    got = {r["source"]: (r["total_ngrams"], r["distinct_ngrams"],
                         r["diversity"]) for r in t.to_pylist()}
    for s, grams in per.items():
        total, distinct = len(grams), len(set(grams))
        assert got[s] == (total, distinct, distinct * SCALE // total), s
    assert set(got) == set(per)


def test_diversity_trigram(ray_session):
    t = ngram_diversity(_ds(2), n=3)
    row = {r["source"]: r for r in t.to_pylist()}
    # s2 trigrams: (big,data,is),(data,is,new),(data,data,data)x2
    assert row["s2"]["total_ngrams"] == 4
    assert row["s2"]["distinct_ngrams"] == 3


def test_cocitation_matches_bruteforce(ray_session):
    from lucenenet_ray.ops.graphrank import _out_edges
    import ray.data as rd

    n, k = 80, 15
    src, dst, _ = _out_edges(np.arange(n, dtype=np.int64), n)
    outs: dict[int, set] = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        outs.setdefault(a, set()).add(b)
    counts: dict[tuple, int] = {}
    for nb in outs.values():
        snb = sorted(nb)
        for i in range(len(snb)):
            for j in range(i + 1, len(snb)):
                p = (snb[i], snb[j])
                counts[p] = counts.get(p, 0) + 1
    exp = sorted(((c, a, b) for (a, b), c in counts.items()),
                 key=lambda t: (-t[0], t[1], t[2]))[:k]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n))})).repartition(5)
    t = cocitation_topk(ds, n_nodes=n, k=k)
    got = [(r["n_cociting"], r["a"], r["b"]) for r in t.to_pylist()]
    assert got == exp


def test_significant_terms_matches_bruteforce(ray_session):
    from lucenenet_ray.analysis.standard import ENGLISH_STOP_WORDS
    from lucenenet_ray.ops.collocations import significant_terms

    import ray.data as rd

    docs = ["spark rank deep", "spark rank", "rank model", "deep model",
            "spark deep rank", "model", "spark model rank"]
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(3)
    fg_df, df = {}, {}
    n_fg = 0
    for d in docs:
        toks = {w for w in d.split() if w not in ENGLISH_STOP_WORDS}
        fg = "spark" in toks
        n_fg += int(fg)
        for w in toks:
            df[w] = df.get(w, 0) + 1
            if fg:
                fg_df[w] = fg_df.get(w, 0) + 1
    exp = []
    for w in df:
        if w != "spark" and fg_df.get(w, 0) >= 2:
            exp.append(((fg_df[w] * len(docs) * SCALE)
                        // (df[w] * n_fg), w, fg_df[w], df[w]))
    exp.sort(key=lambda t: (-t[0], t[1]))
    t = significant_terms(ds, "spark", k=10, min_fg_df=2)
    got = [(r["score"], r["term"], r["fg_df"], r["df"])
           for r in t.to_pylist()]
    assert got == exp[:10]


def test_simpson_index_bruteforce(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.collocations import simpson_index

    docs = [("a a a b", "s1"), ("b c", "s1"), ("x x", "s2")]
    ds = rd.from_arrow(pa.table({
        "text": [t for t, _ in docs],
        "source": [s for _, s in docs],
    })).repartition(2)
    out = {r["source"]: r for r in simpson_index(ds).to_pylist()}
    # s1: counts a=3, b=2, c=1; N=6; sum_sq=14
    assert out["s1"]["n_tokens"] == 6
    assert out["s1"]["sum_sq"] == 14
    assert out["s1"]["simpson_fp"] == 14 * SCALE // 36
    # s2: single type -> maximal concentration (1.0)
    assert out["s2"]["simpson_fp"] == SCALE


def test_host_gini_uniform_is_low(ray_session):
    import ray.data as rd

    from lucenenet_ray.ops.crawlstats import host_gini

    # 97 hosts each with ~equal page counts -> Gini near 0
    n = 97 * 4
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
    })).repartition(3)
    r = host_gini(ds).to_pylist()[0]
    assert r["n_hosts"] == 97 and r["n_pages"] == n
    assert r["gini_fp"] == 0  # perfectly uniform
