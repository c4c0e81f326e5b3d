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

Two codecs, selected per index (``IndexConfig.codec``, recorded in the
manifest — the per-segment codec-name header of SegmentInfos):

- ``vint``: every stream plain delta+VInt (the v0 format).
- ``for`` (default): full 128-blocks are bit-packed FOR frames — 1 width
  byte + w 16-byte bit-planes per block (plane j = bit j of all 128 values;
  same size as Lucene's value-major packing, chosen for vectorized bulk
  decode) — and the partial tail block is VInt with Lucene's freq-parity
  fold: ``(docDelta << 1) | (freq == 1)`` then the freq only when > 1,
  interleaved in the DOC stream (``Lucene41PostingsFormat.cs:200-225``,
  ``ForUtil.cs:157-244``; semantics parity, not byte parity). The freq
  stream holds only full FOR blocks. Positions stay per-doc self-contained
  VInt runs in BOTH codecs — that is what lets the segment merge and the
  expunge rewrite move position bytes without decoding them (build.py
  _merge_group; a deliberate departure from Lucene's packed .pos).

A third registry entry, ``simpletext``, mirrors the SimpleText debug codec
(ASCII decimal, one value per line). The reference's other extra formats
(``src/Lucene.Net.Codecs/{Memory,Direct,Sep,IntBlock,Appending,DiskDV}``)
are n/a by design: they are alternate PHYSICAL layouts of the same postings
contract motivated by JVM heap / filesystem constraints — here the
per-bucket Arrow tables actor-cached by ``search/reader.py`` ARE the
RAM-resident (Direct/Memory) form, Parquet files are already append-only
immutable (Appending), and doc values already live as Parquet columns
(DiskDV). The format CONTRACT those codecs share — round-trip, skip
metadata, query identity — is what this registry tests across its three
implementations.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene41PostingsFormat.cs:375

# Multi-level skip (MultiLevelSkipListWriter.cs fan-out): for small terms
# np.searchsorted(block_last_doc, target) is the skip list — a vectorized
# binary search over the in-memory level-0 entries. For HEAD terms
# (df > BLOCK_SIZE * SKIP1_FANOUT) a stored LEVEL-1 array (one entry per
# SKIP1_FANOUT level-0 blocks: last doc + max freq/norm bounds) lets the
# reader locate candidate REGIONS first and touch only those regions'
# level-0 slices — at 10^9-df terms the level-0 arrays are ~10^7 entries
# and the level-1 pre-select keeps cold lookups from scanning them
# (see search/searcher.py _eval_term_restricted).
SKIP1_FANOUT = 128


def build_skip1(block_last_doc: np.ndarray, block_max_freq: np.ndarray,
                block_max_norm: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                     np.ndarray]:
    """Level-1 skip entries: per SKIP1_FANOUT blocks, (last doc, max freq,
    max norm). Empty until the term has at least 2 regions (df > 128²) —
    Lucene's writer likewise only adds a level when it has ≥2 entries."""
    nb = len(block_last_doc)
    if nb < SKIP1_FANOUT * 2:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32),
                np.empty(0, dtype=np.int32))
    starts = np.arange(0, nb, SKIP1_FANOUT, dtype=np.int64)
    ends = np.minimum(starts + SKIP1_FANOUT, nb)
    return (
        np.asarray(block_last_doc)[ends - 1].astype(np.int64),
        np.maximum.reduceat(np.asarray(block_max_freq), starts).astype(np.int32),
        np.maximum.reduceat(np.asarray(block_max_norm), starts).astype(np.int32),
    )

DEFAULT_CODEC = "for"

# Registered codec names (the 2-codec registry of SURVEY §2.12 plus the
# SimpleText debug codec). Selected per index via IndexConfig.codec and
# recorded in the manifest — the per-segment codec-name header of
# SegmentInfos.
CODECS = ("for", "vint", "simpletext")


# --- SimpleText debug codec (Codecs/SimpleText/SimpleTextCodec.cs analog:
# "FOR RECREATIONAL USE ONLY" — a human-readable index you can cat).
# Doc and freq streams are ASCII decimal lines, one value per line (d-gaps
# in the doc stream, plain freqs in the freq stream; NO parity fold).
# Positions stay per-doc VInt runs like every other codec here — that
# invariant is what lets the segment merge move position bytes without
# decoding them. Semantics parity with the reference (a readable debug
# format plugged into the same codec registry), not byte parity.

def _encode_simpletext(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (uint8 stream of ``<value>\\n`` lines, per-BLOCK_SIZE block start
    byte offsets). Per-value Python formatting — this codec is explicitly
    a debug format, never a hot path."""
    if vals.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    strs = [str(int(v)) for v in vals.tolist()]
    stream = np.frombuffer(("\n".join(strs) + "\n").encode("ascii"),
                           dtype=np.uint8)
    lens = np.fromiter((len(s) + 1 for s in strs), dtype=np.int64,
                       count=len(strs))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return stream, starts[::BLOCK_SIZE].copy()


def _decode_simpletext(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """Parse a slice of ``<value>\\n`` lines → uint64 array."""
    b = np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    vals = np.array(bytes(b).split(), dtype=np.uint64)
    if count is not None and vals.size != count:
        raise ValueError(
            f"simpletext stream had {vals.size} values, expected {count}")
    return vals


_PLANE_BYTES = BLOCK_SIZE // 8  # 16 bytes per bit-plane


def _pack_for_block(vals: np.ndarray) -> bytes:
    """One full FOR frame: width byte + w bit-PLANES of 16 bytes each —
    plane j holds bit j of all 128 values (LSB-first). The plane layout is
    this engine's choice (semantics parity with Lucene's FOR, not byte
    parity): it makes bulk decode w contiguous unpack/shift passes instead
    of per-value bit arithmetic."""
    v = vals.astype("<u8")
    mx = int(v.max()) if v.size else 0
    w = max(1, mx.bit_length()) if mx else 0
    if w == 0:
        return bytes([0])
    vb = v.view(np.uint8).reshape(BLOCK_SIZE, 8)
    bits = np.unpackbits(vb, axis=1, bitorder="little")[:, :w]  # (128, w)
    planes = np.packbits(bits.T.reshape(w * BLOCK_SIZE), bitorder="little")
    return bytes([w]) + planes.tobytes()


def _frame_nbytes(w: int) -> int:
    return w * _PLANE_BYTES if w else 0


def _planes_to_vals(payload: np.ndarray, k: int, w: int) -> np.ndarray:
    """(k frames × w planes × 16 bytes) → (k, 128) uint64."""
    bits = np.unpackbits(payload.reshape(k * w, _PLANE_BYTES), axis=1,
                         bitorder="little")  # (k*w, 128)
    planes = bits.reshape(k, w, BLOCK_SIZE)
    vals = np.zeros((k, BLOCK_SIZE), dtype=np.uint64)
    for j in range(w):
        vals |= planes[:, j, :].astype(np.uint64) << np.uint64(j)
    return vals


def _unpack_for_block(buf: np.ndarray, off: int) -> tuple[np.ndarray, int]:
    """Decode one FOR frame at byte offset ``off`` → (128 uint64, next off)."""
    w = int(buf[off])
    if w == 0:
        return np.zeros(BLOCK_SIZE, dtype=np.uint64), off + 1
    nbytes = _frame_nbytes(w)
    payload = buf[off + 1 : off + 1 + nbytes]
    return _planes_to_vals(payload, 1, w)[0], off + 1 + nbytes


def _encode_tail_parity(deltas: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """Freq-parity VInt tail: (delta<<1)|(freq==1), then freq when > 1 —
    interleaved, Lucene41's tail doc-stream layout."""
    if deltas.size == 0:
        return np.empty(0, dtype=np.uint8)
    one = freqs == 1
    folded = (deltas.astype(np.uint64) << np.uint64(1)) | one.astype(np.uint64)
    vals = np.empty(deltas.size + int((~one).sum()), dtype=np.uint64)
    # interleave: positions of folded deltas account for preceding freqs
    slot = np.arange(deltas.size) + np.concatenate(([0], np.cumsum(~one)[:-1]))
    vals[slot] = folded
    vals[slot[~one] + 1] = freqs[~one].astype(np.uint64)
    return write_vints(vals)


def _decode_tail_parity(buf: np.ndarray, count: int) -> tuple[np.ndarray, np.ndarray]:
    """→ (deltas, freqs) of the ``count`` tail postings."""
    if count == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
    vals = read_vints(buf)  # count + #freq>1 values
    deltas = np.empty(count, dtype=np.uint64)
    freqs = np.empty(count, dtype=np.uint64)
    i = 0
    for k in range(count):
        if i >= vals.size:
            raise ValueError(
                f"parity tail truncated: {vals.size} values for {count} postings")
        v = int(vals[i]); i += 1
        deltas[k] = v >> 1
        if v & 1:
            freqs[k] = 1
        else:
            if i >= vals.size:
                raise ValueError("parity tail truncated at freq value")
            freqs[k] = int(vals[i]); i += 1
    return deltas, freqs


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
    codec: str = "vint",
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
    if codec == "for":
        n_full = (n // BLOCK_SIZE) * BLOCK_SIZE
        doc_frames: list[bytes] = []
        frq_frames: list[bytes] = []
        doc_offs: list[int] = []
        frq_offs: list[int] = []
        od = of = 0
        for s in range(0, n_full, BLOCK_SIZE):
            doc_offs.append(od)
            frq_offs.append(of)
            fd = _pack_for_block(deltas[s : s + BLOCK_SIZE])
            ff = _pack_for_block(freqs[s : s + BLOCK_SIZE].astype(np.uint64))
            doc_frames.append(fd)
            frq_frames.append(ff)
            od += len(fd)
            of += len(ff)
        if n > n_full:  # parity VInt tail, interleaved in the doc stream
            doc_offs.append(od)
            frq_offs.append(of)
            doc_frames.append(
                _encode_tail_parity(deltas[n_full:], freqs[n_full:]).tobytes())
        doc_bytes = np.frombuffer(b"".join(doc_frames), dtype=np.uint8)
        freq_bytes = np.frombuffer(b"".join(frq_frames), dtype=np.uint8)
    elif codec == "simpletext":
        doc_bytes, st_doc_offs = _encode_simpletext(deltas)
        freq_bytes, st_frq_offs = _encode_simpletext(freqs.astype(np.uint64))
    else:
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
        if codec == "for":
            blk_doc_off = np.asarray(doc_offs, dtype=np.int64)
            blk_frq_off = np.asarray(frq_offs, dtype=np.int64)
        elif codec == "simpletext":
            blk_doc_off = st_doc_offs
            blk_frq_off = st_frq_offs
        else:
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
    s1_last, s1_maxf, s1_maxn = build_skip1(blk_last, blk_maxf, blk_maxn)
    return {
        "doc_bytes": doc_bytes.tobytes(),
        "freq_bytes": freq_bytes.tobytes(),
        "pos_bytes": pos_bytes.tobytes(),
        "block_last_doc": blk_last,
        "block_doc_off": blk_doc_off,
        "block_freq_off": blk_frq_off,
        "block_max_freq": blk_maxf,
        "block_max_norm": blk_maxn,
        "skip1_last_doc": s1_last,
        "skip1_max_freq": s1_maxf,
        "skip1_max_norm": s1_maxn,
        "first_doc": int(docs[0]) if n else -1,
    }


def _unpack_for_stream(buf: np.ndarray, n_blocks: int, out: np.ndarray,
                       offs: np.ndarray | None = None) -> int:
    """Vectorized multi-frame unpack: frames grouped by width so each width
    costs ONE unpackbits pass (≤64 groups), not one numpy call per block.
    Fills out[: n_blocks*BLOCK_SIZE]; returns the byte offset after the
    last frame. Pass the chunk's block offsets (``offs``) to skip the
    sequential width-byte scan entirely."""
    if offs is not None:
        offs = np.asarray(offs[:n_blocks], dtype=np.int64)
        widths = buf[offs].astype(np.int64)
        last_w = int(widths[-1]) if n_blocks else 0
        off = (int(offs[-1]) + 1 + _frame_nbytes(last_w)) if n_blocks else 0
    else:
        widths = np.empty(n_blocks, dtype=np.int64)
        offs = np.empty(n_blocks, dtype=np.int64)
        off = 0
        for b in range(n_blocks):  # width-byte scan only — no per-block decode
            offs[b] = off
            w = int(buf[off])
            widths[b] = w
            off += 1 + _frame_nbytes(w)
    ov = out[: n_blocks * BLOCK_SIZE].reshape(n_blocks, BLOCK_SIZE)
    for w in np.unique(widths):
        w = int(w)
        sel = np.flatnonzero(widths == w)
        if w == 0:
            ov[sel] = 0
            continue
        nbytes = _frame_nbytes(w)
        take = (offs[sel][:, None] + 1 + np.arange(nbytes)).ravel()
        ov[sel] = _planes_to_vals(buf[take], len(sel), w)
    return off


def _for_deltas_freqs(doc_bytes: bytes, freq_bytes: bytes, n: int,
                      want_freqs: bool,
                      block_doc_off: np.ndarray | None = None,
                      block_freq_off: np.ndarray | None = None,
                      want_deltas: bool = True,
                      ) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Full-stream FOR decode → (deltas-or-None, freqs-or-None)."""
    db = np.frombuffer(doc_bytes, dtype=np.uint8)
    n_full_blocks = n // BLOCK_SIZE
    tail = n - n_full_blocks * BLOCK_SIZE
    deltas = np.empty(n, dtype=np.uint64) if want_deltas else None
    freqs = np.empty(n, dtype=np.uint64) if want_freqs else None
    od = 0
    if want_deltas and n_full_blocks:
        od = _unpack_for_stream(db, n_full_blocks, deltas, block_doc_off)
    elif tail and n_full_blocks:
        # only the doc TAIL is needed (parity-folded freqs): jump via offsets
        if block_doc_off is not None:
            od = int(block_doc_off[n_full_blocks])
        else:
            for _b in range(n_full_blocks):
                od += 1 + _frame_nbytes(int(db[od]))
    if want_freqs and n_full_blocks:
        fb = np.frombuffer(freq_bytes, dtype=np.uint8)
        _unpack_for_stream(fb, n_full_blocks, freqs, block_freq_off)
    if tail:
        td, tf = _decode_tail_parity(db[od:], tail)
        if want_deltas:
            deltas[n - tail :] = td
        if want_freqs:
            freqs[n - tail :] = tf
    return deltas, freqs


def decode_docs(doc_bytes: bytes, n: int, codec: str = "vint",
                block_doc_off: np.ndarray | None = None) -> np.ndarray:
    """Decode the full doc list of a chunk → int64 ascending docIDs."""
    if codec == "for":
        deltas, _ = _for_deltas_freqs(doc_bytes, b"", n, want_freqs=False,
                                      block_doc_off=block_doc_off)
    elif codec == "simpletext":
        deltas = _decode_simpletext(np.frombuffer(doc_bytes, dtype=np.uint8), n)
    else:
        deltas = read_vints(np.frombuffer(doc_bytes, dtype=np.uint8), n)
    return np.cumsum(deltas.astype(np.int64))


def decode_freqs(freq_bytes: bytes, n: int, codec: str = "vint",
                 doc_bytes: bytes = b"",
                 block_doc_off: np.ndarray | None = None,
                 block_freq_off: np.ndarray | None = None) -> np.ndarray:
    """``for`` codec needs the doc stream too: tail freqs are parity-folded
    into it (Lucene41 tail layout)."""
    if codec == "for":
        _, freqs = _for_deltas_freqs(doc_bytes, freq_bytes, n, want_freqs=True,
                                     block_doc_off=block_doc_off,
                                     block_freq_off=block_freq_off,
                                     want_deltas=False)
        return freqs.astype(np.int32)
    if codec == "simpletext":
        return _decode_simpletext(
            np.frombuffer(freq_bytes, dtype=np.uint8), n).astype(np.int32)
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
    codec: str = "vint",
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
    if codec == "for":
        if count == BLOCK_SIZE:
            deltas = _unpack_for_block(buf, start)[0].astype(np.int64)
        else:  # parity tail
            deltas = _decode_tail_parity(buf[start:], count)[0].astype(np.int64)
    elif codec == "simpletext":
        deltas = _decode_simpletext(buf[start:end], count).astype(np.int64)
    else:
        deltas = read_vints(buf[start:end], count).astype(np.int64)
    base = int(block_last_doc[block_idx - 1]) if block_idx > 0 else 0
    return base + np.cumsum(deltas)


def decode_freq_block(
    freq_bytes: bytes,
    doc_bytes: bytes,
    block_idx: int,
    n_postings: int,
    block_freq_off: np.ndarray,
    block_doc_off: np.ndarray,
    codec: str = "vint",
) -> np.ndarray:
    """Decode one 128-block of freqs (skip-in). ``for`` tail freqs come from
    the doc stream's parity fold."""
    lo = block_idx * BLOCK_SIZE
    count = min(BLOCK_SIZE, n_postings - lo)
    if codec == "for":
        if count == BLOCK_SIZE:
            fb = np.frombuffer(freq_bytes, dtype=np.uint8)
            return _unpack_for_block(fb, int(block_freq_off[block_idx]))[0].astype(np.int32)
        db = np.frombuffer(doc_bytes, dtype=np.uint8)
        return _decode_tail_parity(
            db[int(block_doc_off[block_idx]):], count)[1].astype(np.int32)
    fb = np.frombuffer(freq_bytes, dtype=np.uint8)
    start = int(block_freq_off[block_idx])
    end = (int(block_freq_off[block_idx + 1])
           if block_idx + 1 < len(block_freq_off) else fb.size)
    if codec == "simpletext":
        return _decode_simpletext(fb[start:end], count).astype(np.int32)
    return read_vints(fb[start:end], count).astype(np.int32)
