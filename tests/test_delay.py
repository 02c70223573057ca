"""Delay-estimator oracles: the reference's roll-offset sweep and bounds
(test_effex.py:92-121) plus edge-case coverage for the OOB fix."""

import jax.numpy as jnp
import numpy as np
import pytest

from fxtpu.ops import estimate_delay, estimate_delay_gaussian
from fxtpu.sources.synthetic import complex_noise, fractional_delay

OFFSETS = [-2000, -1001, -1, 0, 1, 999, 2000]  # test_effex.py:94


@pytest.mark.parametrize("num_samp", [3 + 2**12, 2**18])
@pytest.mark.parametrize("rate", [2.4e6])
@pytest.mark.parametrize("samp_offset_int", OFFSETS)
def test_estimate_delay_gaussian(rng, num_samp, rate, samp_offset_int):
    iq_0 = complex_noise(rng, num_samp)
    iq_1 = np.roll(iq_0, samp_offset_int)
    est = float(estimate_delay_gaussian(jnp.asarray(iq_0), jnp.asarray(iq_1),
                                        rate))
    assert abs(samp_offset_int - est * rate) < 0.5  # test_effex.py:99,106


@pytest.mark.parametrize("num_samp", [3 + 2**12, 2**18])
@pytest.mark.parametrize("rate", [2.4e6])
@pytest.mark.parametrize("samp_offset_int", OFFSETS)
def test_estimate_delay_wrapper(rng, num_samp, rate, samp_offset_int):
    iq_0 = complex_noise(rng, num_samp)
    iq_1 = np.roll(iq_0, samp_offset_int)
    est = float(estimate_delay(jnp.asarray(iq_0), jnp.asarray(iq_1), rate))
    assert abs(samp_offset_int / rate - est) < 1e-6  # test_effex.py:114,121


@pytest.mark.parametrize("frac", [-1200.5, -0.25, 0.5, 333.3])
def test_fractional_delay_recovery(rng, frac):
    """Sub-sample delays stay below the reference's 0.5-sample bound.

    (The 3-point Gaussian estimator has a known ~0.15-sample bias on the
    sinc-shaped white-noise correlation peak at quarter-sample lags.)"""
    rate = 2.4e6
    iq_0 = complex_noise(rng, 2**16)
    iq_1 = fractional_delay(iq_0, frac)
    est = float(estimate_delay_gaussian(jnp.asarray(iq_0), jnp.asarray(iq_1),
                                        rate))
    assert abs(frac - est * rate) < 0.3


def test_peak_at_edge_clamps_and_stays_accurate(rng):
    """An argmax at the LAST xcorr bin (index 2n-1) must clamp the
    3-point stencil into the interior instead of reading OOB (reference
    TODO at effex.py:619-622).  Impulses at opposite ends genuinely put
    the peak on the edge (verified: argmax == 2n-1); the old
    ``roll(x, n)`` construction was the identity, whose peak lands at
    the exact CENTER, so it never exercised this path.  jnp's clamped
    gather makes the OOB read non-crashing either way — the assertion
    is that the clamped stencil still recovers the true -(n-1) lag to
    within a few samples."""
    n = 256
    iq_0 = np.zeros(n, np.complex64)
    iq_1 = np.zeros(n, np.complex64)
    iq_0[n - 1] = 1.0   # iq_1 LEADS by n-1 samples -> lag -(n-1),
    iq_1[0] = 1.0       # fftshifted xcorr index 2n-1 (the edge)
    rate = 2.4e6
    est = float(estimate_delay_gaussian(jnp.asarray(iq_0), jnp.asarray(iq_1),
                                        rate))
    assert np.isfinite(est)
    assert abs(est * rate - (-(n - 1))) < 2.5


def test_test_mode_offset_subtraction(rng):
    iq = complex_noise(rng, 4096)
    base = float(estimate_delay(jnp.asarray(iq), jnp.asarray(iq), 2.4e6))
    off = float(estimate_delay(jnp.asarray(iq), jnp.asarray(iq), 2.4e6,
                               test_offset=1e-6))
    np.testing.assert_allclose(base - off, 1e-6, rtol=1e-6)


def test_mismatched_lengths_raise(rng):
    with pytest.raises(ValueError):
        estimate_delay_gaussian(jnp.zeros(8, jnp.complex64),
                                jnp.zeros(9, jnp.complex64), 1.0)
