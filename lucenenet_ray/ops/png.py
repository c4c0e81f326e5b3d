"""Real PNG codec — dependency-free (stdlib ``zlib`` + numpy).

PNG (RFC 2083 / ISO 15948) is a genuinely COMPRESSED image container
(DEFLATE over per-scanline-filtered samples), so this closes part of the
"compressed-media decoders" gap left by JPEG/MP3 (whose codecs are not
in this sandbox): the multimodal actor stages can decode a real-world
format end to end, and the ``png_decode_stats`` gate proves the decode
bit-exact against a formula oracle that never touches zlib.

Subset supported (decode): 8-bit depth, color types 0 (grayscale),
2 (RGB), 3 (palette), 6 (RGBA), non-interlaced, all five scanline
filters (None/Sub/Up/Average/Paeth — the Paeth predictor per RFC 2083
§6.6). Interlaced (Adam7) and 16-bit images raise ``ValueError``.

The encoder exists for synthesis/tests: it writes color-type-2 images
and can apply ANY filter type per scanline, so round-trip tests exercise
every unfilter path against independently-filtered bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (RFC 2083 §6.6): int16 math so the
    absolute differences never wrap."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_encode(arr: np.ndarray, filters=None) -> bytes:
    """RGB uint8 HxWx3 → PNG bytes. ``filters`` is an optional per-row
    list of filter types 0-4 (default all 0) — used by tests to force
    every unfilter path."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("png_encode writes color type 2 (RGB) only")
    if filters is None:
        filters = [0] * h
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for r in range(h):
        row = arr[r].reshape(-1)
        f = int(filters[r])
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if f == 0:
            enc = row
        elif f == 1:
            enc = (row.astype(np.int16) - left).astype(np.uint8)
        elif f == 2:
            enc = (row.astype(np.int16) - prev).astype(np.uint8)
        elif f == 3:
            enc = (row.astype(np.int16)
                   - ((left.astype(np.int16) + prev.astype(np.int16)) // 2)
                   ).astype(np.uint8)
        elif f == 4:
            enc = (row.astype(np.int16)
                   - _paeth(left, prev, upleft).astype(np.int16)
                   ).astype(np.uint8)
        else:
            raise ValueError(f"filter {f}")
        raw.append(f)
        raw.extend(enc.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes → HxWx3 uint8 RGB (grayscale/palette/RGBA normalized:
    gray replicated, palette looked up, alpha dropped)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if interlace:
        raise ValueError("Adam7 interlacing unsupported")
    nchan = {0: 1, 2: 3, 3: 1, 6: 4}.get(ctype)
    if nchan is None:
        raise ValueError(f"unsupported color type {ctype}")
    bpp = nchan
    stride = w * nchan
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8,
            count=stride, offset=r * (stride + 1) + 1).copy()
        if f == 0:
            cur = row
        elif f == 2:
            cur = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f in (1, 3, 4):
            # left-dependent filters are sequential in pixels; loop over
            # PIXELS (w per row), vectorized across channels
            cur = np.zeros(stride, dtype=np.uint8)
            for x in range(w):
                sl = slice(x * bpp, (x + 1) * bpp)
                left = cur[(x - 1) * bpp:x * bpp] if x else \
                    np.zeros(bpp, np.uint8)
                up = prev[sl]
                upleft = prev[(x - 1) * bpp:x * bpp] if x else \
                    np.zeros(bpp, np.uint8)
                if f == 1:
                    pred = left.astype(np.int16)
                elif f == 3:
                    pred = (left.astype(np.int16)
                            + up.astype(np.int16)) // 2
                else:
                    pred = _paeth(left, up, upleft).astype(np.int16)
                cur[sl] = (row[sl].astype(np.int16) + pred).astype(np.uint8)
        else:
            raise ValueError(f"bad filter byte {f}")
        out[r] = cur
        prev = cur
    img = out.reshape(h, w, nchan)
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 2:
        return img
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte[img[:, :, 0]]
    return img[:, :, :3]  # RGBA → drop alpha
