"""Randomized postings-codec round-trips (the BasePostingsFormatTestCase
pattern, SURVEY §5.1): encode → decode == identity; block metadata honest."""

import numpy as np
import pytest

from lucenenet_ray.index.codec import (
    BLOCK_SIZE,
    decode_doc_block,
    decode_docs,
    decode_freqs,
    decode_positions,
    encode_postings,
    read_vints,
    write_vints,
)


def test_vint_edges():
    for vals in ([0], [127], [128], [16383], [16384], [2**32 - 1], [2**60],
                 list(range(300))):
        v = np.array(vals, dtype=np.uint64)
        assert np.array_equal(read_vints(write_vints(v)), v)


def test_vint_empty():
    assert write_vints(np.empty(0, np.uint64)).size == 0
    assert read_vints(np.empty(0, np.uint8)).size == 0


def test_vint_wire_format_is_lucenes():
    # DataOutput.cs:197-240: low 7 bits first, high bit = continuation
    assert write_vints(np.array([5], np.uint64)).tolist() == [5]
    assert write_vints(np.array([300], np.uint64)).tolist() == [0xAC, 0x02]


@pytest.mark.parametrize("df", [1, 2, 127, 128, 129, 1000, 1300])
def test_roundtrip_structured(df):
    rng = np.random.default_rng(df)
    docs = np.sort(rng.choice(10**12, size=df, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 255, size=df).astype(np.int32)
    norms = rng.integers(0, 256, size=df).astype(np.uint8)
    positions = [
        np.sort(rng.choice(100000, size=f, replace=False)).astype(np.int64)
        for f in freqs
    ]
    enc = encode_postings(docs, freqs, norms, positions)
    assert np.array_equal(decode_docs(enc["doc_bytes"], df), docs)
    assert np.array_equal(decode_freqs(enc["freq_bytes"], df), freqs)
    dec_pos = decode_positions(enc["pos_bytes"], freqs)
    for a, b in zip(dec_pos, positions):
        assert np.array_equal(a, b)
    # block metadata (skip list + block-max, SURVEY §2.5)
    nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["block_last_doc"]) == nblocks
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min(df, (bi + 1) * BLOCK_SIZE)
        assert enc["block_last_doc"][bi] == docs[hi - 1]
        assert enc["block_max_freq"][bi] == freqs[lo:hi].max()
        assert enc["block_max_norm"][bi] == norms[lo:hi].max()
        # independent block decode (skip-in) matches the slice
        blk = decode_doc_block(
            enc["doc_bytes"], bi, df, enc["block_doc_off"], enc["block_last_doc"]
        )
        assert np.array_equal(blk, docs[lo:hi])


def test_random_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(50):
        df = int(rng.integers(1, 700))
        docs = np.sort(rng.choice(10**9, size=df, replace=False)).astype(np.int64)
        freqs = rng.integers(1, 64, size=df).astype(np.int32)
        norms = rng.integers(0, 256, size=df).astype(np.uint8)
        enc = encode_postings(docs, freqs, norms, None)
        assert np.array_equal(decode_docs(enc["doc_bytes"], df), docs)
        assert np.array_equal(decode_freqs(enc["freq_bytes"], df), freqs)


def test_bucket_of_no_overflow():
    """Regression: 60-bit docID spaces must not overflow the bucket formula
    (observed: negative bucket labels at n_buckets=32)."""
    import numpy as np

    from lucenenet_ray.index.build import IndexConfig

    cfg = IndexConfig(index_path="/x", id_min=0, id_max=(1 << 60) - 1,
                      n_buckets=32)
    ids = np.array([0, 1 << 58, 1 << 59, (1 << 60) - 1], dtype=np.int64)
    b = cfg.bucket_of(ids)
    assert b.min() >= 0 and b.max() < 32
    assert b[0] == 0 and b[-1] == 31
    # monotone in doc_id
    rng = np.random.default_rng(1)
    ids2 = np.sort(rng.integers(0, 1 << 60, size=10000))
    b2 = cfg.bucket_of(ids2)
    assert np.all(np.diff(b2) >= 0)
    assert len(np.unique(b2)) == 32


# ---------------------------------------------------------------------------
# FOR codec (bit-packed 128-blocks + freq-parity VInt tail,
# Lucene41PostingsFormat.cs:200-225 / ForUtil.cs:157-244 layout semantics)


def _mk_postings(rng, df, id_space):
    docs = np.sort(rng.choice(id_space, size=df, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 12, size=df).astype(np.int32)
    # bias many freqs to 1 to exercise the parity fold
    freqs[rng.random(df) < 0.6] = 1
    norms = rng.integers(0, 256, size=df).astype(np.uint8)
    return docs, freqs, norms


@pytest.mark.parametrize("df", [1, 5, 127, 128, 129, 300, 1000])
def test_for_roundtrip(df):
    from lucenenet_ray.index.codec import (
        decode_docs,
        decode_freqs,
        encode_postings,
    )

    rng = np.random.default_rng(df)
    docs, freqs, norms = _mk_postings(rng, df, 100_000)
    enc = encode_postings(docs, freqs, norms, None, codec="for")
    got_d = decode_docs(enc["doc_bytes"], df, codec="for")
    got_f = decode_freqs(enc["freq_bytes"], df, codec="for",
                         doc_bytes=enc["doc_bytes"])
    assert np.array_equal(got_d, docs)
    assert np.array_equal(got_f, freqs)
    # block metadata identical semantics to the vint codec
    encv = encode_postings(docs, freqs, norms, None, codec="vint")
    for k in ("block_last_doc", "block_max_freq", "block_max_norm"):
        assert np.array_equal(enc[k], encv[k]), k


@pytest.mark.parametrize("df", [129, 300, 1000])
def test_for_block_skip_decode(df):
    from lucenenet_ray.index.codec import (
        BLOCK_SIZE,
        decode_doc_block,
        decode_freq_block,
        encode_postings,
    )

    rng = np.random.default_rng(df + 7)
    docs, freqs, norms = _mk_postings(rng, df, 10_000_000)
    enc = encode_postings(docs, freqs, norms, None, codec="for")
    nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, df)
        bd = decode_doc_block(enc["doc_bytes"], bi, df,
                              enc["block_doc_off"], enc["block_last_doc"],
                              codec="for")
        bf = decode_freq_block(enc["freq_bytes"], enc["doc_bytes"], bi, df,
                               enc["block_freq_off"], enc["block_doc_off"],
                               codec="for")
        assert np.array_equal(bd, docs[lo:hi]), bi
        assert np.array_equal(bf, freqs[lo:hi]), bi


def test_for_smaller_than_vint_dense():
    """Dense postings (small deltas) must pack tighter than VInt."""
    from lucenenet_ray.index.codec import encode_postings

    df = 4096
    docs = np.arange(0, df * 3, 3, dtype=np.int64)  # delta 3 → 2 bits
    freqs = np.ones(df, dtype=np.int32)
    norms = np.zeros(df, dtype=np.uint8)
    f = encode_postings(docs, freqs, norms, None, codec="for")
    v = encode_postings(docs, freqs, norms, None, codec="vint")
    assert len(f["doc_bytes"]) < len(v["doc_bytes"]) / 2


@pytest.mark.parametrize("codec", ["vint", "for"])
def test_skip1_level_entries(codec):
    """Level-1 skip entries (MultiLevelSkipListWriter fan-out 128): present
    exactly when df > 128*128 (2+ regions), aggregates equal recomputation
    from level-0, and the two-level block lookup equals the flat one."""
    from lucenenet_ray.index.codec import SKIP1_FANOUT, build_skip1

    rng = np.random.default_rng(5)
    # head term: df spanning > 2 regions, gappy docids
    df = BLOCK_SIZE * SKIP1_FANOUT * 2 + 777
    docs = np.cumsum(rng.integers(1, 4, size=df)).astype(np.int64)
    freqs = rng.integers(1, 9, size=df).astype(np.int32)
    norms = rng.integers(1, 255, size=df).astype(np.uint8)
    enc = encode_postings(docs, freqs, norms, None, codec=codec)
    nb = len(enc["block_last_doc"])
    n1 = (nb + SKIP1_FANOUT - 1) // SKIP1_FANOUT
    assert len(enc["skip1_last_doc"]) == n1
    # aggregates match a recomputation from level-0
    want_last, want_maxf, want_maxn = build_skip1(
        enc["block_last_doc"], enc["block_max_freq"], enc["block_max_norm"])
    assert np.array_equal(enc["skip1_last_doc"], want_last)
    assert np.array_equal(enc["skip1_max_freq"], want_maxf)
    assert np.array_equal(enc["skip1_max_norm"], want_maxn)
    assert enc["skip1_last_doc"][-1] == docs[-1]
    # small term: no level-1
    enc_small = encode_postings(docs[:BLOCK_SIZE * 4], freqs[:BLOCK_SIZE * 4],
                                norms[:BLOCK_SIZE * 4], None, codec=codec)
    assert len(enc_small["skip1_last_doc"]) == 0


def test_skip_to_blocks_two_level_equals_flat():
    """The level-1 pre-select must pick exactly the blocks the flat
    binary search picks, while examining far fewer level-0 entries."""
    from lucenenet_ray.index.codec import SKIP1_FANOUT
    from lucenenet_ray.search.reader import PostingsChunk
    from lucenenet_ray.search.searcher import SKIP_STATS, _skip_to_blocks

    rng = np.random.default_rng(11)
    df = BLOCK_SIZE * SKIP1_FANOUT * 12 + 13
    docs = np.cumsum(rng.integers(1, 3, size=df)).astype(np.int64)
    freqs = np.ones(df, dtype=np.int32)
    norms = np.ones(df, dtype=np.uint8)
    enc = encode_postings(docs, freqs, norms, None, codec="for")

    def mk(skip1):
        return PostingsChunk(
            term="t", df=df, ttf=df, max_freq=1, max_norm=1,
            doc_bytes=enc["doc_bytes"], freq_bytes=enc["freq_bytes"],
            pos_bytes=b"", codec="for",
            block_last_doc=enc["block_last_doc"],
            block_doc_off=enc["block_doc_off"],
            block_freq_off=enc["block_freq_off"],
            block_max_freq=enc["block_max_freq"],
            block_max_norm=enc["block_max_norm"],
            skip1_last_doc=skip1)

    # candidates: a tight cluster + block-boundary docs + out-of-range
    cands = np.unique(np.concatenate([
        docs[1000:1100], enc["block_last_doc"][:3],
        np.array([docs[-1] + 50])]))
    flat = mk(np.empty(0, dtype=np.int64))  # forces the flat path
    nb = len(enc["block_last_doc"])
    want = np.unique(np.searchsorted(enc["block_last_doc"], cands))
    want = want[want < nb]
    before = dict(SKIP_STATS)
    got = _skip_to_blocks(mk(enc["skip1_last_doc"]), cands)
    examined = SKIP_STATS["level0_examined"] - before["level0_examined"]
    total = SKIP_STATS["level0_total"] - before["level0_total"]
    assert np.array_equal(np.asarray(got), want)
    # measured decode-skip reduction: clustered candidates touch few regions
    assert examined <= 3 * SKIP1_FANOUT
    assert examined < total / 10
    # derive path (index without the stored column) agrees too
    derived = mk(None)
    got2 = _skip_to_blocks(derived, cands)
    assert np.array_equal(np.asarray(got2), want)
