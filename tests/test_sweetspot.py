"""SweetSpotSimilarity curves (search/sweetspot.py vs
Misc/SweetSpotSimilarity.cs formulas) + defaults-reduce-to-classic."""

import numpy as np

from lucenenet_ray.search.sweetspot import SweetSpotSimilarity


def test_length_norm_plateau():
    sim = SweetSpotSimilarity(ln_min=3, ln_max=8, ln_steep=0.5)
    # inside the plateau the norm is exactly 1.0
    assert np.all(sim.compute_length_norm(np.arange(3, 9)) == np.float32(1.0))
    # outside it falls off: 1/sqrt(0.5*2*d + 1) at distance d
    assert sim.compute_length_norm(np.array([10]))[0] == np.float32(
        1.0 / np.sqrt(np.float64(np.float32(0.5) * np.float32(4)
                                 + np.float32(1.0))))
    assert sim.compute_length_norm(np.array([1]))[0] == \
        sim.compute_length_norm(np.array([10]))[0]  # symmetric at d=2


def test_baseline_tf():
    sim = SweetSpotSimilarity(tf_base=1.5, tf_min=2.0)
    out = sim.baseline_tf(np.array([0.0, 1.0, 2.0, 3.0, 6.0]))
    assert out[0] == np.float32(0.0)
    assert out[1] == np.float32(1.5) and out[2] == np.float32(1.5)
    assert out[3] == np.float32(np.sqrt(np.float64(
        np.float32(np.float32(3.0) + np.float32(2.25)) - np.float32(2.0))))
    assert out[4] == np.float32(np.sqrt(np.float64(6.25)))


def test_defaults_reduce_to_classic_sqrt_tf():
    sim = SweetSpotSimilarity()  # base=0, min=0 → sqrt(freq)
    f = np.array([1.0, 2.0, 5.0, 9.0])
    assert np.array_equal(sim.baseline_tf(f),
                          np.sqrt(f.astype(np.float64)).astype(np.float32))
    # ln_min = ln_max = 1, steep 0.5: L=1 → 1.0
    assert sim.compute_length_norm(np.array([1]))[0] == np.float32(1.0)


def test_hyperbolic_tf_asymptotes():
    sim = SweetSpotSimilarity(hyper_min=3.3, hyper_max=7.7,
                              hyper_base=np.e, hyper_xoffset=10.0)
    out = sim.hyperbolic_tf(np.array([0.0, 10.0, 1000.0]))
    assert out[0] == np.float32(0.0)
    # at x = xoffset the tanh term is 0 → midpoint
    mid = np.float32(3.3) + np.float32(
        float(np.float32(np.float32(7.7) - np.float32(3.3))) / 2.0 * 1.0)
    assert out[1] == mid
    assert abs(float(out[2]) - 7.7) < 1e-4  # saturates to max
