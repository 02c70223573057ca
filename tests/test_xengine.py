"""X-stage unit oracles: FSTC phase-ramp math (effex.py:516-521 contract),
baseline maps, continuum reduction, and the delay->phase closure loop."""

import jax.numpy as jnp
import numpy as np
import pytest

from fxtpu.ops import (baseline_pairs, continuum_reduce, fstc_rotate,
                       rf_freqs, spectrometer_poly, pfb_window,
                       xcorr_baselines, xcorr_pair)
from fxtpu.sources.synthetic import complex_noise, fractional_delay


def test_rf_freqs_matches_reference_formula():
    bw, fc, nbins = 2.4e6, 1.4204e9, 512
    got = np.asarray(rf_freqs(nbins, bw, fc))
    want = np.fft.fftfreq(nbins, d=1 / bw) + fc  # effex.py:516
    # float32 in-graph: ~1 ULP of the RF frequency (~128 Hz at L-band)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fstc_reduces_to_reference_expression(rng):
    """G0 conj(G1) with per-channel delays [0, d] equals the reference's
    f0 * conj(f1 * rot) with rot = exp(-2j pi f (-d)) (effex.py:519-520)."""
    bw, fc, nbins, s = 2.4e6, 1.4204e9, 64, 3
    d = 4.2e-7
    f = (rng.normal(size=(2, s, nbins)) + 1j * rng.normal(size=(2, s, nbins))
         ).astype(np.complex64)
    g = np.asarray(fstc_rotate(jnp.asarray(f), jnp.asarray([0.0, d]), bw, fc))
    ours = (g[0] * np.conj(g[1])).mean(axis=0)
    freqs = np.fft.fftfreq(nbins, d=1 / bw) + fc
    rot = np.exp(-2j * np.pi * freqs * (-d))
    ref = (f[0] * np.conj(f[1] * rot)).mean(axis=0)
    # float32 phase at ~3.7e3 rad carries ~1e-3 rad rounding
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=5e-3 * scale)


def test_xcorr_pair_is_fftshifted_mean(rng):
    s, nbins = 4, 16
    f0 = jnp.asarray((rng.normal(size=(s, nbins))
                      + 1j * rng.normal(size=(s, nbins))).astype(np.complex64))
    f1 = jnp.asarray((rng.normal(size=(s, nbins))
                      + 1j * rng.normal(size=(s, nbins))).astype(np.complex64))
    got = np.asarray(xcorr_pair(f0, f1))
    want = np.fft.fftshift((np.asarray(f0) * np.conj(np.asarray(f1))
                            ).mean(axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_baseline_pairs_counts():
    assert baseline_pairs(2).tolist() == [[0, 1]]
    p8 = baseline_pairs(8)
    assert p8.shape == (28, 2)                    # 8 inputs -> 28 cross
    p8a = baseline_pairs(8, include_autos=True)
    assert p8a.shape == (36, 2)                   # 36 with autos
    assert all(p < q for p, q in p8.tolist())


def test_xcorr_baselines_matches_pairwise(rng):
    nch, s, nbins = 4, 3, 32
    spec = jnp.asarray((rng.normal(size=(nch, s, nbins))
                        + 1j * rng.normal(size=(nch, s, nbins))
                        ).astype(np.complex64))
    pairs = baseline_pairs(nch, include_autos=True)
    vis = np.asarray(xcorr_baselines(spec, pairs))
    for l, (p, q) in enumerate(pairs.tolist()):
        want = np.asarray(xcorr_pair(spec[p], spec[q]))
        np.testing.assert_allclose(vis[l], want, rtol=1e-5)


def test_continuum_reduce_matches_reference(rng):
    bw = 2.4e6
    vis = jnp.asarray((rng.normal(size=(3, 64))
                       + 1j * rng.normal(size=(3, 64))).astype(np.complex64))
    got = np.asarray(continuum_reduce(vis, bw))
    want = np.asarray(vis).mean(axis=-1) / bw     # effex.py:523-524
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_delay_phase_closure(rng):
    """End-to-end F+X physics: a true inter-channel delay, once calibrated
    into the FSTC ramp, flattens the cross-spectrum phase."""
    bw, fc, nbins, ntaps = 2.4e6, 1.4204e9, 256, 4
    d_true = 3.0 / bw  # 3 samples
    x = complex_noise(rng, 2**14, scale=1.0)
    iq = np.stack([x, fractional_delay(x, d_true * bw)])
    window = jnp.asarray(pfb_window(ntaps, nbins))
    spec = spectrometer_poly(jnp.asarray(iq), window, nbins)

    # Uncorrected: steep phase slope across the band.
    raw = np.asarray(xcorr_pair(spec[0], spec[1]))
    # Corrected with the true delay: phase ~ flat at the residual RF term.
    rot = fstc_rotate(spec, jnp.asarray([0.0, d_true]), bw, fc)
    cor = np.asarray(xcorr_pair(rot[0], rot[1]))
    inner = slice(nbins // 4, 3 * nbins // 4)  # avoid filter band edges
    raw_spread = np.std(np.angle(raw[inner] * np.conj(raw[inner][0])))
    cor_spread = np.std(np.angle(cor[inner] * np.conj(cor[inner][0])))
    assert cor_spread < 0.15
    assert cor_spread < raw_spread / 5
