"""Numeric trie terms — the NumericField / NumericRangeQuery path.

Lucene 4.8 indexes numerics as *prefix-coded trie terms*: the 64-bit value is
made unsigned-sortable (flip the sign bit), split into 7-bit groups (so the
byte form sorts like the value even under UTF-8 term order), and indexed once
per precision level — shift 0 (full precision), shift ``precisionStep``,
``2*precisionStep``, ... Each encoding is prefixed by one byte
``SHIFT_START_INT64 + shift`` so different precision levels occupy disjoint
regions of the term dictionary.  A range query then recursively splits
``[min, max]`` so the *middle* of the range is matched by a handful of
low-precision terms while only the boundaries need full-precision scans.

Reference (semantics re-expressed, not translated):
- ``src/Lucene.Net/Util/NumericUtils.cs:75`` (PRECISION_STEP_DEFAULT = 4),
  ``:150-174`` (Int64ToPrefixCodedBytes), ``:253-268`` (PrefixCodedToInt64),
  ``:404-441`` (SplitRange/AddRange), ``:528-543`` (DoubleToSortableInt64).
- ``src/Lucene.Net/Analysis/NumericTokenStream.cs`` (one token per shift).
- ``src/Lucene.Net/Search/NumericRangeQuery.cs:340-379`` (bound
  normalization: null = open, exclusive bounds step in by one, empty on
  overflow).

All encodings here are ASCII-safe (bytes 0x00..0x7f), so trie terms live in
the engine's parquet string term dictionary with byte order == value order
per shift level (SURVEY §2.5 sorted-term row groups prune range scans).
"""

from __future__ import annotations

import struct

import numpy as np

PRECISION_STEP_DEFAULT = 4  # NumericUtils.cs:75
SHIFT_START_INT64 = 0x20  # NumericUtils.cs:83
_SIGN_FLIP = np.uint64(0x8000000000000000)

INT64_MIN = -(1 << 63)
INT64_MAX = (1 << 63) - 1


def int64_to_prefix_coded(val: int, shift: int) -> str:
    """Prefix-coded term for ``val`` with ``shift`` low bits stripped
    (NumericUtils.cs:150-174). Returns an ASCII-safe str (1 shift byte +
    ceil((64-shift)/7) payload bytes, each 7 significant bits)."""
    if shift < 0 or shift > 63:
        raise ValueError("shift must be 0..63")
    n_chars = ((63 - shift) * 37 >> 8) + 1  # == (63-shift)//7 + 1
    sortable = ((val & 0xFFFFFFFFFFFFFFFF) ^ 0x8000000000000000) >> shift
    out = bytearray(n_chars + 1)
    out[0] = SHIFT_START_INT64 + shift
    i = n_chars
    while i > 0:
        out[i] = sortable & 0x7F
        sortable >>= 7
        i -= 1
    return out.decode("ascii")


def prefix_coded_shift(term: str) -> int:
    shift = ord(term[0]) - SHIFT_START_INT64
    if shift < 0 or shift > 63:
        raise ValueError(f"not a prefix-coded int64 term (shift {shift})")
    return shift


def prefix_coded_to_int64(term: str) -> int:
    """Decode a trie term back to its (precision-reduced) value
    (NumericUtils.cs:253-268); low ``shift`` bits come back zero."""
    shift = prefix_coded_shift(term)
    sortable = 0
    for ch in term[1:]:
        sortable = (sortable << 7) | (ord(ch) & 0x7F)
    u = (sortable << shift) & 0xFFFFFFFFFFFFFFFF
    u ^= 0x8000000000000000
    return u - (1 << 64) if u >= (1 << 63) else u


def int64_array_to_prefix_coded(vals: np.ndarray, shift: int) -> list[str]:
    """Vectorized :func:`int64_to_prefix_coded` over an int64 array: builds
    the (n, n_chars+1) byte matrix with numpy shifts, decodes once."""
    if shift < 0 or shift > 63:
        raise ValueError("shift must be 0..63")
    n_chars = ((63 - shift) * 37 >> 8) + 1
    v = vals.astype(np.int64).view(np.uint64) ^ _SIGN_FLIP
    v = v >> np.uint64(shift)
    mat = np.empty((len(vals), n_chars + 1), dtype=np.uint8)
    mat[:, 0] = SHIFT_START_INT64 + shift
    for k in range(n_chars):
        mat[:, n_chars - k] = (v & np.uint64(0x7F)).astype(np.uint8)
        v = v >> np.uint64(7)
    flat = mat.tobytes().decode("ascii")
    w = n_chars + 1
    return [flat[i * w : (i + 1) * w] for i in range(len(vals))]


def trie_shifts(precision_step: int = PRECISION_STEP_DEFAULT) -> list[int]:
    """Shifts a NumericTokenStream emits for one value: 0, ps, 2ps, ... < 64
    (NumericTokenStream.cs IncrementToken: valSize - shift > 0)."""
    if precision_step < 1:
        raise ValueError("precisionStep must be >= 1")
    return list(range(0, 64, precision_step))


def trie_tokens_int64(val: int, precision_step: int = PRECISION_STEP_DEFAULT
                      ) -> list[str]:
    """All trie terms one value indexes under (NumericTokenStream analog)."""
    return [int64_to_prefix_coded(val, s) for s in trie_shifts(precision_step)]


def split_int64_range(precision_step: int, min_bound: int, max_bound: int
                      ) -> list[tuple[int, int, int]]:
    """NumericUtils.SplitRange (NumericUtils.cs:404-441): decompose
    ``[min_bound, max_bound]`` (inclusive, already-normalized int64 bounds)
    into ``(min, max, shift)`` sub-ranges such that the prefix-coded terms at
    each shift level, scanned ``[encode(min,shift), encode(max,shift)]``,
    cover every in-range value exactly once. Empty if min > max."""
    if precision_step < 1:
        raise ValueError("precisionStep must be >= 1")
    out: list[tuple[int, int, int]] = []
    if min_bound > max_bound:
        return out

    def add(lo: int, hi: int, shift: int) -> None:
        # set the stripped low bits on the max bound (AddRange comment: the
        # prefix encoding removes them; keeps sub-ranges reconstructible)
        hi |= (1 << shift) - 1
        out.append((lo, hi, shift))

    def to_i64(u: int) -> int:
        """Wrap to signed 64-bit (C# long arithmetic wraps; Python doesn't)."""
        u &= 0xFFFFFFFFFFFFFFFF
        return u - (1 << 64) if u >= (1 << 63) else u

    shift = 0
    while True:
        diff = 1 << (shift + precision_step)
        mask = ((1 << precision_step) - 1) << shift
        has_lower = (min_bound & mask) != 0
        has_upper = (max_bound & mask) != mask
        next_min = to_i64((min_bound + diff if has_lower else min_bound) & ~mask)
        next_max = to_i64((max_bound - diff if has_upper else max_bound) & ~mask)
        lower_wrapped = next_min < min_bound
        upper_wrapped = next_max > max_bound
        if (shift + precision_step >= 64 or next_min > next_max
                or lower_wrapped or upper_wrapped):
            add(min_bound, max_bound, shift)
            break
        if has_lower:
            add(min_bound, min_bound | mask, shift)
        if has_upper:
            add(max_bound & ~mask, max_bound, shift)
        min_bound, max_bound = next_min, next_max
        shift += precision_step
    return out


def normalize_bounds(lower: int | None, upper: int | None,
                     include_lower: bool, include_upper: bool
                     ) -> tuple[int, int] | None:
    """NumericRangeQuery bound normalization (NumericRangeQuery.cs:340-376):
    None = open end; exclusive bounds step inward by one; returns None for
    a provably-empty range (exclusive bound at the domain edge)."""
    lo = INT64_MIN if lower is None else int(lower)
    if not include_lower and lower is not None:
        if lo == INT64_MAX:
            return None
        lo += 1
    hi = INT64_MAX if upper is None else int(upper)
    if not include_upper and upper is not None:
        if hi == INT64_MIN:
            return None
        hi -= 1
    return (lo, hi)


def double_to_sortable_int64(val: float) -> int:
    """IEEE-754 bits with the negative half reflected so long order == double
    order (NumericUtils.cs:528-543; NaN sorts above +inf)."""
    (f,) = struct.unpack("<q", struct.pack("<d", val))
    if f < 0:
        f ^= 0x7FFFFFFFFFFFFFFF
    return f


def sortable_int64_to_double(val: int) -> float:
    if val < 0:
        val ^= 0x7FFFFFFFFFFFFFFF
    (d,) = struct.unpack("<d", struct.pack("<q", val))
    return d
