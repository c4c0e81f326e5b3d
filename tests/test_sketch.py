"""HyperLogLog + Count-Min sketches (ops/sketch.py)."""

import numpy as np
import pyarrow as pa
import pytest

from lucenenet_ray.ops.sketch import (CMS_D, CMS_W, HLL_M, HLL_W,
                                      cms_buckets, cms_estimate,
                                      cms_heavy_hitters, hll_estimate,
                                      hll_idx_rho, hll_invariants)


def _registers(values):
    reg = np.zeros(HLL_M, dtype=np.int64)
    idx, rho = hll_idx_rho(values)
    np.maximum.at(reg, idx, rho)
    return reg


def test_hll_registers_are_set_union_of_value_maxima():
    """Merge property: sketch(A ∪ B) = max(sketch(A), sketch(B)) — the
    lossless-merge law that makes shard sketches combinable."""
    a = [f"k{i}" for i in range(500)]
    b = [f"k{i}" for i in range(250, 900)]
    merged = np.maximum(_registers(a), _registers(b))
    assert np.array_equal(merged, _registers(sorted(set(a) | set(b))))


def test_hll_duplicates_do_not_move_registers():
    a = [f"v{i}" for i in range(300)]
    assert np.array_equal(_registers(a), _registers(a * 7))


def test_hll_estimate_accuracy():
    """HLL standard error is 1.04/sqrt(m) ≈ 3.3% at m=1024; allow 4 sigma."""
    n = 20000
    est = hll_estimate(_registers([f"item-{i}" for i in range(n)]))
    assert abs(est - n) / n < 0.13


def test_hll_rho_definition():
    """rho = leading zeros of the 40-bit suffix + 1, capped at 41."""
    import hashlib

    vals = [f"x{i}" for i in range(50)]
    idx, rho = hll_idx_rho(vals)
    for s, i, r in zip(vals, idx, rho):
        h = hashlib.md5(s.encode()).hexdigest()
        assert i == int(h[:4], 16) % HLL_M
        v = int(h[4:14], 16)
        expect = HLL_W + 1 if v == 0 else HLL_W - v.bit_length() + 1
        assert r == expect
        assert 1 <= r <= HLL_W + 1


def test_hll_invariants_consistent():
    reg = _registers([f"q{i}" for i in range(100)])
    inv = hll_invariants(reg)
    assert inv["m"] == HLL_M
    assert inv["n_zero"] == int((reg == 0).sum())
    assert inv["harmonic_s"] == sum(1 << (41 - int(r)) for r in reg)
    # small-range correction must kick in at 100 << 2.5*m
    est = hll_estimate(reg)
    assert abs(est - 100) / 100 < 0.2


def _sketch_of(counts: dict[str, int]) -> np.ndarray:
    s = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for t, n in counts.items():
        for r, b in enumerate(cms_buckets(t)):
            s[r, b] += n
    return s


def test_cms_never_underestimates():
    counts = {f"t{i}": (i % 17) + 1 for i in range(3000)}  # force collisions
    s = _sketch_of(counts)
    terms = sorted(counts)
    est = cms_estimate(s, terms)
    for t, e in zip(terms, est):
        assert e >= counts[t]


def test_cms_exact_without_collisions():
    counts = {"alpha": 5, "beta": 9, "gamma": 2}
    s = _sketch_of(counts)
    est = cms_estimate(s, ["alpha", "beta", "gamma"])
    assert est.tolist() == [5, 9, 2]


def test_cms_heavy_hitters_includes_all_true_heavies():
    counts = {f"w{i}": 1 for i in range(500)}
    counts["whale"] = 400
    counts["shark"] = 300
    s = _sketch_of(counts)
    out = cms_heavy_hitters(s, sorted(counts), threshold=250)
    got = out.column("term").to_pylist()
    assert "whale" in got and "shark" in got
    # one-sided error: everything reported really clears the threshold
    # as an OVERestimate, so est >= 250 for every row
    assert all(e >= 250 for e in out.column("est").to_pylist())


def test_cms_sketch_combine_is_addition():
    a = _sketch_of({"x": 3, "y": 1})
    b = _sketch_of({"x": 2, "z": 8})
    assert np.array_equal(a + b, _sketch_of({"x": 5, "y": 1, "z": 8}))
