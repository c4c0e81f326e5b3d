"""Lucene SmallFloat 3-mantissa-bit / zero-exp-15 byte float codec.

Semantics match ``Lucene.Net.Util.SmallSingle.SingleToByte315`` /
``SByte315ToSingle`` (reference ``src/Lucene.Net/Util/SmallSingle.cs``):
the float32 bit pattern is truncated to its top 11 bits (sign+exp+3
mantissa bits incl. the hidden bit's 2 explicit bits), biased by
``(63-15)<<3``.  Lucene uses this to quantize the per-document field
length norm ``1/sqrt(len)`` into one byte; BM25 decodes it through a
256-entry table (``BM25Similarity.cs:149-160``).

Everything is vectorized over numpy arrays — this runs inside
``map_batches`` on every document.
"""

from __future__ import annotations

import numpy as np

_SHIFT = 24 - 3  # mantissaBits=3
_BIAS = (63 - 15) << 3  # zeroExp=15


def float_to_byte315(f: np.ndarray) -> np.ndarray:
    """Vectorized SingleToByte315. ``f`` is float32; returns uint8."""
    f = np.asarray(f, dtype=np.float32)
    bits = f.view(np.int32)
    smallfloat = bits >> _SHIFT
    out = (smallfloat - _BIAS).astype(np.int64)
    # underflow: values <= smallest encodable -> 0 for f<=0 else 1
    under = smallfloat <= _BIAS
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow -> 255 (sbyte -1)
    out = np.where(smallfloat >= _BIAS + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray) -> np.ndarray:
    """Vectorized SByte315ToSingle. ``b`` is uint8; returns float32."""
    b = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (b << _SHIFT) + ((63 - 15) << 24)
    f = bits.astype(np.int32).view(np.float32)
    return np.where(b == 0, np.float32(0.0), f).astype(np.float32)


# NORM_TABLE[b] = 1/(f*f), f = byte315_to_float(b)  (BM25Similarity.cs:151-160).
# Index 0 decodes to +inf in Lucene's table (1/0); keep that.
def _load_norm_table() -> np.ndarray:
    b = np.arange(256, dtype=np.uint8)
    f = byte315_to_float(b)
    with np.errstate(divide="ignore"):
        return (np.float32(1.0) / (f * f)).astype(np.float32)


NORM_TABLE: np.ndarray = _load_norm_table()

# TFIDFSimilarity decodes the raw SmallFloat value itself (DecodeNormValue =
# SByte315ToSingle — DefaultSimilarity.cs), not 1/f² like BM25's table.
CLASSIC_NORM_TABLE: np.ndarray = byte315_to_float(np.arange(256, dtype=np.uint8))


def encode_norm(field_lengths: np.ndarray,
                boost: "float | np.ndarray" = 1.0) -> np.ndarray:
    """Norm byte per document: SingleToByte315(boost / sqrt(fieldLength)).

    Matches ``BM25Similarity.EncodeNormValue`` (BM25Similarity.cs:110-113):
    the sqrt is computed in double then the division in float32. ``boost``
    is the index-time field boost — ``FieldInvertState.Boost``, i.e.
    ``Document.Field.Boost`` baked into the norm byte at index time
    (Index/FieldInvertState.cs:180-196); a scalar or a per-doc array.
    Documents with length 0 get norm byte of boost/0 -> +inf -> 255
    (Lucene never indexes a 0-length field norm this way, but be total).
    """
    lens = np.asarray(field_lengths, dtype=np.float64)
    b32 = np.asarray(boost, dtype=np.float32)
    with np.errstate(divide="ignore"):
        f = (b32 / np.sqrt(lens).astype(np.float32)).astype(np.float32)
    return float_to_byte315(f)
