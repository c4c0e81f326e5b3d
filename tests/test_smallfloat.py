"""SmallFloat byte315 codec — golden values from Lucene's SmallSingle docs."""

import numpy as np

from lucenenet_ray.util.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)


def test_known_values():
    # SmallSingle.cs docs: smallest nonzero 5.820766E-10, largest 7.5161928E9
    assert byte315_to_float(np.array([1], np.uint8))[0] == np.float32(5.820766e-10)
    assert byte315_to_float(np.array([255], np.uint8))[0] == np.float32(7.5161928e9)
    assert byte315_to_float(np.array([0], np.uint8))[0] == 0.0
    # 1.0f encodes to 124 and decodes back exactly
    assert float_to_byte315(np.array([1.0], np.float32))[0] == 124
    assert byte315_to_float(np.array([124], np.uint8))[0] == 1.0


def test_roundtrip_monotone():
    b = np.arange(256, dtype=np.uint8)
    f = byte315_to_float(b)
    # decode is strictly increasing over bytes (positive range)
    assert np.all(np.diff(f) > 0)
    # encode(decode(b)) == b
    assert np.array_equal(float_to_byte315(f[1:]), b[1:])


def test_quantization_idempotent():
    rng = np.random.default_rng(7)
    f = rng.uniform(1e-9, 1e9, size=4096).astype(np.float32)
    b1 = float_to_byte315(f)
    f2 = byte315_to_float(b1)
    assert np.array_equal(float_to_byte315(f2), b1)
    # decoded value never exceeds source (truncating quantizer)
    assert np.all(f2 <= f)


def test_norm_table_and_encode():
    assert NORM_TABLE[124] == np.float32(1.0)
    assert np.isinf(NORM_TABLE[0])
    assert np.array_equal(encode_norm(np.array([1, 4, 100])), [124, 120, 110])
    # zero-length doc → +inf → byte 255
    assert encode_norm(np.array([0]))[0] == 255


def test_overflow_underflow():
    assert float_to_byte315(np.array([0.0], np.float32))[0] == 0
    assert float_to_byte315(np.array([-1.0], np.float32))[0] == 0
    assert float_to_byte315(np.array([1e-12], np.float32))[0] == 1
    assert float_to_byte315(np.array([1e12], np.float32))[0] == 255
