"""FreeTextSuggester (ops/freetext.py): model counts vs brute force,
backoff semantics, prefix completion, seen-set suppression."""

import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"
LONG_MAX = (1 << 63) - 1


@pytest.fixture(scope="module")
def model(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucenenet_ray.ops.freetext import (FreeTextModel,
                                            build_freetext_model)

    path = str(tmp_path_factory.mktemp("ft") / "model.parquet")
    build_freetext_model(
        rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"]),
        path)
    return FreeTextModel(path)


def _brute():
    from collections import Counter

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    uni: Counter = Counter()
    bi: Counter = Counter()
    for x in t.column("text").to_pylist():
        toks = x.split()
        uni.update(toks)
        bi.update(" ".join(p) for p in zip(toks, toks[1:]))
    return uni, bi


def test_counts_match_bruteforce(model):
    uni, bi = _brute()
    assert model.counts[0] == dict(uni)
    assert model.counts[1] == dict(bi)
    assert model.tot_tokens == sum(uni.values())


def test_completed_context_scores(model):
    uni, bi = _brute()
    rows = model.lookup("spark ", k=5)
    ctx = uni["spark"]
    for token, w in rows:
        assert w == (LONG_MAX * bi[f"spark {token}"]) // ctx


def test_unknown_context_backs_off_to_unigrams(model):
    uni, _bi = _brute()
    rows = model.lookup("zzznotaterm ", k=3)
    tot = sum(uni.values())
    # backoff level 1: weight = (MAX * cnt * 4) // (10 * totTokens)
    best = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [t for t, _w in rows] == [t for t, _c in best]
    for (token, w), (_t, cnt) in zip(rows, best):
        assert w == (LONG_MAX * cnt * 4) // (10 * tot)


def test_prefix_completion(model):
    rows = model.lookup("spark b", k=5)
    assert rows and all(t.startswith("b") for t, _w in rows)


def test_seen_suppression(model):
    """A token emitted at the bigram level must not reappear from the
    backed-off unigram level."""
    rows = model.lookup("spark ", k=10_000)
    tokens = [t for t, _w in rows]
    assert len(tokens) == len(set(tokens))
