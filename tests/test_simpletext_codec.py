"""SimpleText debug codec (index/codec.py 'simpletext'): human-readable
ASCII streams plugged into the same codec registry as 'for'/'vint'
(Codecs/SimpleText/SimpleTextCodec.cs analog — semantics parity with the
reference's pluggable debug codec, not byte parity)."""

import numpy as np
import pytest

from lucenenet_ray.index.codec import (
    BLOCK_SIZE,
    CODECS,
    decode_doc_block,
    decode_docs,
    decode_freq_block,
    decode_freqs,
    encode_postings,
)


def _mk(rng, df, maxdoc):
    docs = np.sort(rng.choice(maxdoc, size=df, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 12, size=df).astype(np.int32)
    norms = rng.integers(0, 256, size=df).astype(np.uint8)
    return docs, freqs, norms


def test_registry_lists_simpletext():
    assert "simpletext" in CODECS


@pytest.mark.parametrize("df", [1, 5, 127, 128, 129, 300, 1000])
def test_simpletext_roundtrip(df):
    rng = np.random.default_rng(df)
    docs, freqs, norms = _mk(rng, df, 100_000)
    enc = encode_postings(docs, freqs, norms, None, codec="simpletext")
    assert np.array_equal(decode_docs(enc["doc_bytes"], df,
                                      codec="simpletext"), docs)
    assert np.array_equal(decode_freqs(enc["freq_bytes"], df,
                                       codec="simpletext"), freqs)
    # identical block metadata semantics to the canonical codecs
    encv = encode_postings(docs, freqs, norms, None, codec="vint")
    for k in ("block_last_doc", "block_max_freq", "block_max_norm"):
        assert np.array_equal(enc[k], encv[k]), k


def test_simpletext_is_human_readable():
    docs = np.array([3, 10, 11], dtype=np.int64)
    freqs = np.array([2, 1, 5], dtype=np.int32)
    norms = np.zeros(3, dtype=np.uint8)
    enc = encode_postings(docs, freqs, norms, None, codec="simpletext")
    # d-gaps 3,7,1 and freqs 2,1,5 as one decimal per line
    assert enc["doc_bytes"] == b"3\n7\n1\n"
    assert enc["freq_bytes"] == b"2\n1\n5\n"


@pytest.mark.parametrize("df", [129, 300, 1000])
def test_simpletext_block_skip_decode(df):
    rng = np.random.default_rng(df + 7)
    docs, freqs, norms = _mk(rng, df, 10_000_000)
    enc = encode_postings(docs, freqs, norms, None, codec="simpletext")
    nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["block_doc_off"]) == nblocks
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, df)
        bd = decode_doc_block(enc["doc_bytes"], bi, df,
                              enc["block_doc_off"], enc["block_last_doc"],
                              codec="simpletext")
        bf = decode_freq_block(enc["freq_bytes"], enc["doc_bytes"], bi, df,
                               enc["block_freq_off"], enc["block_doc_off"],
                               codec="simpletext")
        assert np.array_equal(bd, docs[lo:hi]), bi
        assert np.array_equal(bf, freqs[lo:hi]), bi


def test_simpletext_empty():
    enc = encode_postings(np.empty(0, dtype=np.int64),
                          np.empty(0, dtype=np.int32),
                          np.empty(0, dtype=np.uint8), None,
                          codec="simpletext")
    assert enc["doc_bytes"] == b"" and enc["freq_bytes"] == b""
    assert decode_docs(b"", 0, codec="simpletext").size == 0


@pytest.mark.usefixtures("ray_session")
def test_simpletext_index_query_identity(tmp_path):
    """A full index built with codec='simpletext' returns bit-identical
    BM25 results to the default codec."""
    import ray.data as rd

    from lucenenet_ray.index.build import IndexConfig, build_index
    from lucenenet_ray.search.query import parse_query
    from lucenenet_ray.search.reader import IndexReader
    from lucenenet_ray.search.searcher import search

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    results = {}
    for codec in ("simpletext", "for"):
        path = str(tmp_path / f"idx_{codec}")
        build_index(ds, IndexConfig(index_path=path, id_min=0, id_max=499,
                                    n_buckets=4, codec=codec))
        r = IndexReader(path)
        results[codec] = [
            search(r, parse_query(q), k=10).to_list()
            for q in ("spark window", '"batch merge"', "vector AND dup")]
    assert results["simpletext"] == results["for"]
