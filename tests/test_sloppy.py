"""SloppyPhraseScorer tests — golden cases ported from the reference's
``src/Lucene.Net.Tests/Search/TestSloppyPhraseQuery.cs`` (docs/queries
renamed to lowercase non-stopword tokens; semantics identical)."""

import numpy as np
import pytest

from lucenenet_ray.analysis.standard import StandardAnalyzer
from lucenenet_ray.search.sloppy import repeat_groups, sloppy_phrase_freq

_AN = StandardAnalyzer()

# token renames vs the C# fixture (A→alpha etc.; all non-stopwords)
S_1 = "alpha alpha alpha"
S_2 = "alpha one two three alpha four five six alpha"
DOC_1 = f"xray {S_1} yang"
DOC_2 = f"xray {S_2} yang"
DOC_3 = f"xray {S_1} alpha yang"
DOC_1_B = f"xray {S_1} yang nape nape nape nape {S_1} zulu"
DOC_2_B = f"xray {S_2} yang nape nape nape nape {S_2} zulu"
DOC_3_B = f"xray {S_1} alpha yang nape nape nape nape {S_1} alpha yang"
DOC_4 = ("alpha alpha xray alpha xray bravo alpha xray bravo bravo "
         "alpha alpha xray bravo alpha alpha")
DOC_5_3 = "hotel hotel hotel xray xray xray hotel hotel hotel xray xray xray hotel hotel hotel"
DOC_5_4 = "hotel hotel hotel hotel"

QUERY_1 = S_1
QUERY_2 = S_2
QUERY_4 = "xray alpha alpha"
QUERY_5_4 = "hotel hotel hotel hotel"


def phrase_freq(doc_text: str, phrase: str | tuple, slop: int) -> float:
    """Analyze doc, build per-phrase-position tp lists, run the scorer.

    Mirrors the engine's scorer routing (PhraseQuery.cs:392-393): slop=0 uses
    exact semantics (negative phrase-start alignments rejected), slop>0 the
    sloppy greedy traversal."""
    toks, poss = _AN(doc_text)
    posmap: dict[str, list[int]] = {}
    for t, p in zip(toks, poss):
        posmap.setdefault(t, []).append(p)
    if isinstance(phrase, str):
        qt, qp = _AN(phrase)
        terms = tuple((t, p - qp[0]) for t, p in zip(qt, qp))
    else:
        terms = tuple(phrase)
    plists, offs = [], []
    for t, rel in terms:
        if t not in posmap:
            return 0.0
        plists.append(np.array(posmap[t], dtype=np.int64))
        offs.append(rel)
    if slop == 0:
        aligns = [set(int(p) - r for p in pl if int(p) - r >= 0)
                  for pl, r in zip(plists, offs)]
        return float(len(set.intersection(*aligns)))
    return float(sloppy_phrase_freq(plists, offs, repeat_groups(terms), slop))


# --- ported golden hit-count cases -----------------------------------------

def test_doc4_query4_fuzzy_len1():
    # "QUERY_4 has a fuzzy (len=1) match to DOC_4, so all slop values > 0
    # should succeed" (TestSloppyPhraseQuery.cs:65-76)
    for slop in range(30):
        hit = phrase_freq(DOC_4, QUERY_4, slop) > 0
        assert hit == (slop >= 1), f"slop={slop}"


def test_doc1_query1_exact_all_slops_and_multi_occurrence():
    # exact match at every slop; the B doc (two occurrences) scores higher
    # (:80-92)
    for slop in range(30):
        f1 = phrase_freq(DOC_1, QUERY_1, slop)
        f2 = phrase_freq(DOC_1_B, QUERY_1, slop)
        assert f1 > 0 and f2 > 0
        assert f2 > f1, f"slop={slop}"


def test_doc2_query1_min_slop_6():
    # 6 is the minimum slop making QUERY_1 match DOC_2 (:96-112)
    for slop in range(30):
        f1 = phrase_freq(DOC_2, QUERY_1, slop)
        assert (f1 > 0) == (slop >= 6), f"slop={slop}"
        if slop >= 6:
            f2 = phrase_freq(DOC_2_B, QUERY_1, slop)
            assert f2 > f1


def test_doc2_query2_exact_all_slops():
    for slop in range(30):
        f1 = phrase_freq(DOC_2, QUERY_2, slop)
        f2 = phrase_freq(DOC_2_B, QUERY_2, slop)
        assert f1 > 0 and f2 > f1, f"slop={slop}"


def test_doc3_query1_exact_all_slops():
    for slop in range(30):
        f1 = phrase_freq(DOC_3, QUERY_1, slop)
        f2 = phrase_freq(DOC_3_B, QUERY_1, slop)
        assert f1 > 0 and f2 > f1, f"slop={slop}"


def test_doc5_query5_consistent():
    # LUCENE-3412 (:143-163): "h h h h" always finds DOC_5_4, never DOC_5_3
    for slop in range(3):
        assert phrase_freq(DOC_5_4, QUERY_5_4, slop) > 0
        assert phrase_freq(DOC_5_3, QUERY_5_4, slop) == 0.0


def test_slop_with_holes():
    # LUCENE-3215 (:304-326): phrase (drug@1, drug@4), i.e. a 2-position hole
    docs = [
        "drug drug",
        "drug druggy drug",
        "drug druggy druggy drug",
        "drug druggy drug druggy drug",
    ]
    phrase = (("drug", 1), ("drug", 4))
    hits = lambda slop: sum(phrase_freq(d, phrase, slop) > 0 for d in docs)
    assert hits(0) == 0
    assert hits(1) == 3
    assert hits(2) == 4


def test_infinite_freq_docs_sane():
    # LUCENE-3215 TestInfiniteFreq1/2 (:328-380): scorer terminates with
    # finite freq on these once-pathological repeat docs
    f = phrase_freq("drug druggy drug drug drug",
                    (("drug", 1), ("drug", 3)), 1)
    assert np.isfinite(f) and f >= 0
    f = phrase_freq(
        "So much fun to be had in my head No more sunshine Forget your"
        " face while you wander the halls",
        (("fun", 0), ("much", 1)), 1)
    assert np.isfinite(f) and f >= 0


# --- semantics details ------------------------------------------------------

def test_greedy_two_match_example():
    # the scorer docstring example (SloppyPhraseScorer.cs:89-90): doc
    # "x a b a y", query "a b"~2 scores twice: d=0 and d=2
    f = phrase_freq("xray alpha bravo alpha yang", "alpha bravo", 2)
    want = float(np.float32(np.float32(1.0) + np.float32(1.0) / np.float32(3.0)))
    assert f == pytest.approx(want, abs=0)


def test_greedy_single_match_cb():
    # ":97-98: for doc 'a b c b a f g', query 'c b'~2 ... matched once"
    f = phrase_freq("alpha bravo charlie bravo alpha foxtrot golf",
                    "charlie bravo", 2)
    assert f == 1.0  # one greedy match at distance 0


def test_slop0_equals_exact_count():
    # at slop=0 the greedy traversal scores every exact occurrence
    rng = np.random.RandomState(7)
    vocab = ["alpha", "bravo", "charlie"]
    for trial in range(50):
        doc = " ".join(rng.choice(vocab, size=rng.randint(4, 30)))
        toks = doc.split()
        for qlen in (2, 3):
            q = " ".join(rng.choice(vocab, size=qlen, replace=False))
            qtoks = q.split()
            exact = sum(
                toks[i:i + qlen] == qtoks for i in range(len(toks) - qlen + 1)
            )
            # the greedy sloppy traversal at slop=0 scores each exact
            # occurrence once (distinct-term phrases, first rel = 0)
            plists = [np.array([i for i, t in enumerate(toks) if t == qt],
                               dtype=np.int64) for qt in qtoks]
            if any(len(p) == 0 for p in plists):
                assert exact == 0
                continue
            got = float(sloppy_phrase_freq(plists, list(range(qlen)), [], 0))
            assert got == float(np.float32(exact)), (doc, q)


# --- end-to-end through the index + searcher --------------------------------

def test_sloppy_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.search.query import PhraseQuery, parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    docs = [
        "drug drug",
        "drug druggy drug",
        "drug druggy druggy drug",
        "drug druggy drug druggy drug",
        "totally unrelated text here",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs)})
    path = str(tmp_path / "idx")
    cfg = IndexConfig(index_path=path, id_min=0, id_max=len(docs) - 1,
                      n_buckets=2, n_hparts=1)
    build_index(rd.from_arrow(t), cfg)
    reader = IndexReader(path)

    q = PhraseQuery(terms=(("drug", 1), ("drug", 4)), slop=1)
    td = search(reader, q, k=10)
    assert td.total_hits == 3
    q2 = PhraseQuery(terms=(("drug", 1), ("drug", 4)), slop=2)
    assert search(reader, q2, k=10).total_hits == 4

    # parser syntax "..."~N end-to-end
    pq = parse_query('"druggy drug"~1')
    assert isinstance(pq, PhraseQuery) and pq.slop == 1
    td = search(reader, pq, k=10)
    assert td.total_hits == 3  # docs 1-3 each contain "druggy drug" in-slop
