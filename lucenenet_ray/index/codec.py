"""Postings wire format: delta-gap + VInt with 128-block skip/block-max metadata.

Matches the layout *semantics* of Lucene 4.1's postings format
(``src/Lucene.Net/Codecs/Lucene41/Lucene41PostingsFormat.cs:200-225``): docIDs
as d-gaps, block size 128 (``:375``), per-block skip entries carrying the last
doc of the block plus byte offsets (``Lucene41SkipWriter.cs``), augmented with
block-max impact metadata (max termFreq + max norm byte per block) for
lossless block-max pruning — Lucene 4.8 has skip lists but no WAND; the
block-max arrays double as both (SURVEY §2.5).

VInt semantics are Lucene's ``DataOutput.WriteVInt32/64``
(``src/Lucene.Net/Store/DataOutput.cs:197-240``): 7 bits per byte, low group
first, high bit = continuation. Encode/decode are vectorized numpy — no
per-posting Python loops.

We deliberately keep VInt (not FOR bit-packing) for the packed blocks: the
north-star contract asks for VInt/delta + skip lists; FOR is an inventoried
follow-up (SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene41PostingsFormat.cs:375


def write_vints(values: np.ndarray) -> np.ndarray:
    """Vectorized VInt encode of a uint64 array → uint8 byte stream."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    # 7-bit groups per value (≥1), by repeated shifting (≤10 rounds for 64-bit)
    ngroups = np.ones(v.shape, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while np.any(shifted > 0):
        ngroups += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(7)
    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    # byte positions: for each value, its groups start at cumsum
    starts = np.concatenate(([0], np.cumsum(ngroups)[:-1]))
    # write group g of each value that has > g groups
    max_g = int(ngroups.max())
    for g in range(max_g):
        mask = ngroups > g
        vals = (v[mask] >> np.uint64(7 * g)) & np.uint64(0x7F)
        cont = (ngroups[mask] - 1) > g
        out[starts[mask] + g] = (vals | (cont.astype(np.uint64) << np.uint64(7))).astype(
            np.uint8
        )
    return out


def read_vints(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """Vectorized VInt decode of a uint8 byte stream → uint64 array."""
    b = np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if count is not None and count == b.size and not (b & 0x80).any():
        # all values single-byte (the common case for freq streams):
        # one cast instead of the terminator-scan decode
        return b.astype(np.uint64)
    is_end = (b & 0x80) == 0  # terminator bytes
    # group index of each byte within its value
    ends = np.flatnonzero(is_end)
    n = ends.size
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    max_len = int(lengths.max())
    for g in range(max_len):
        mask = lengths > g
        out[mask] |= (b[starts[mask] + g].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(
            7 * g
        )
    if count is not None and n != count:
        raise ValueError(f"VInt stream had {n} values, expected {count}")
    return out


def encode_postings(
    docs: np.ndarray,
    freqs: np.ndarray,
    norms: np.ndarray,
    positions: list[np.ndarray] | None = None,
) -> dict:
    """Encode one term-chunk's postings (docs ascending, unique).

    Returns a dict of binary buffers + block metadata arrays:
      doc_bytes    — VInt d-gaps (first doc absolute)
      freq_bytes   — VInt freqs
      pos_bytes    — VInt per-doc delta-encoded positions (concatenated;
                     per-doc counts == freqs), empty if positions is None
      block_last_doc / block_doc_off / block_freq_off — one entry per
                     BLOCK_SIZE postings (the skip list, SURVEY §2.5)
      block_max_freq / block_max_norm — block-max impact bounds
    """
    docs = np.asarray(docs, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int32)
    norms = np.asarray(norms, dtype=np.uint8)
    n = docs.size
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = np.uint64(docs[0])
        np.subtract(docs[1:], docs[:-1], out=deltas[1:], casting="unsafe")
    doc_bytes = write_vints(deltas)
    freq_bytes = write_vints(freqs.astype(np.uint64))

    if positions is not None and len(positions):
        # per-doc position deltas (first delta is the absolute first position)
        dl = np.concatenate(
            [np.diff(np.asarray(p, dtype=np.int64), prepend=0) for p in positions]
        )
        pos_bytes = write_vints(dl.astype(np.uint64))
    else:
        pos_bytes = np.empty(0, dtype=np.uint8)

    # block metadata (one entry per full-or-partial 128 block) — vectorized
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    if nblocks:
        starts = np.arange(nblocks, dtype=np.int64) * BLOCK_SIZE
        his = np.minimum(starts + BLOCK_SIZE, n)
        blk_last = docs[his - 1]
        blk_maxf = np.maximum.reduceat(freqs, starts).astype(np.int32)
        blk_maxn = (
            np.maximum.reduceat(norms, starts).astype(np.uint8)
            if norms.size
            else np.zeros(nblocks, dtype=np.uint8)
        )
        doc_ends = np.flatnonzero((doc_bytes & 0x80) == 0)
        frq_ends = np.flatnonzero((freq_bytes & 0x80) == 0)
        blk_doc_off = np.empty(nblocks, dtype=np.int64)
        blk_frq_off = np.empty(nblocks, dtype=np.int64)
        blk_doc_off[0] = 0
        blk_frq_off[0] = 0
        blk_doc_off[1:] = doc_ends[starts[1:] - 1] + 1
        blk_frq_off[1:] = frq_ends[starts[1:] - 1] + 1
    else:
        blk_last = np.empty(0, dtype=np.int64)
        blk_maxf = np.empty(0, dtype=np.int32)
        blk_maxn = np.empty(0, dtype=np.uint8)
        blk_doc_off = np.empty(0, dtype=np.int64)
        blk_frq_off = np.empty(0, dtype=np.int64)
    return {
        "doc_bytes": doc_bytes.tobytes(),
        "freq_bytes": freq_bytes.tobytes(),
        "pos_bytes": pos_bytes.tobytes(),
        "block_last_doc": blk_last,
        "block_doc_off": blk_doc_off,
        "block_freq_off": blk_frq_off,
        "block_max_freq": blk_maxf,
        "block_max_norm": blk_maxn,
        "first_doc": int(docs[0]) if n else -1,
    }


def decode_docs(doc_bytes: bytes, n: int) -> np.ndarray:
    """Decode the full doc list of a chunk → int64 ascending docIDs."""
    deltas = read_vints(np.frombuffer(doc_bytes, dtype=np.uint8), n)
    return np.cumsum(deltas.astype(np.int64))


def decode_freqs(freq_bytes: bytes, n: int) -> np.ndarray:
    return read_vints(np.frombuffer(freq_bytes, dtype=np.uint8), n).astype(np.int32)


def decode_positions(pos_bytes: bytes, freqs: np.ndarray) -> list[np.ndarray]:
    """Decode per-doc positions (delta-encoded per doc) → list of arrays."""
    total = int(np.asarray(freqs).sum())
    flat = read_vints(np.frombuffer(pos_bytes, dtype=np.uint8), total).astype(np.int64)
    out: list[np.ndarray] = []
    offs = np.concatenate(([0], np.cumsum(np.asarray(freqs, dtype=np.int64))))
    for i in range(len(freqs)):
        seg = flat[offs[i] : offs[i + 1]]
        out.append(np.cumsum(seg))
    return out


def decode_doc_block(
    doc_bytes: bytes,
    block_idx: int,
    n_postings: int,
    block_doc_off: np.ndarray,
    block_last_doc: np.ndarray,
) -> np.ndarray:
    """Decode one 128-block of docIDs without touching earlier blocks.

    The block's first d-gap is relative to the previous block's last doc
    (carried in ``block_last_doc``) — this is what makes skip-in possible,
    mirroring Lucene's skip entries storing file pointers + last doc
    (``Lucene41SkipWriter.cs``).
    """
    buf = np.frombuffer(doc_bytes, dtype=np.uint8)
    start = int(block_doc_off[block_idx])
    end = (
        int(block_doc_off[block_idx + 1])
        if block_idx + 1 < len(block_doc_off)
        else buf.size
    )
    lo = block_idx * BLOCK_SIZE
    count = min(BLOCK_SIZE, n_postings - lo)
    deltas = read_vints(buf[start:end], count).astype(np.int64)
    base = int(block_last_doc[block_idx - 1]) if block_idx > 0 else 0
    return base + np.cumsum(deltas)
