"""F-stage oracles.  The tone-location sweep reproduces the reference's
parametrization and acceptance bound exactly (test_effex.py:62-89: peak PSD
bin within 1% of the injected tone frequency), plus streaming-continuity
coverage the reference has no analog for."""

import jax.numpy as jnp
import numpy as np
import pytest

from fxtpu.ops import (frame_blocks, pfb_fir, pfb_window, spectrometer_poly,
                       spectrometer_poly_stream, zero_history)
from fxtpu.sources.synthetic import complex_sinusoid


def _tone(num_samp, rate, freq):
    # reference generator uses linspace(0, T, num) (test_effex.py:31-41)
    t = np.linspace(0, num_samp / rate, num=num_samp)
    return (np.cos(2 * np.pi * freq * t)
            + 1j * np.sin(2 * np.pi * freq * t)).astype(np.complex64)


@pytest.mark.parametrize("num_samp", [3 + 2**12, 2**18])
@pytest.mark.parametrize("rate", [1e6, 2.4e6])
@pytest.mark.parametrize("freq", [2e4, 1e5])
@pytest.mark.parametrize("taps", [4, 32])
@pytest.mark.parametrize("branches", [2048, 4096])
def test_spectrometer_tone_location(num_samp, rate, freq, taps, branches):
    iq = jnp.asarray(_tone(num_samp, rate, freq))
    window = jnp.asarray(pfb_window(taps, branches))
    spec = np.asarray(spectrometer_poly(iq, window, branches))
    psd = np.real(spec * np.conj(spec)).mean(axis=0)
    freqs = np.fft.fftshift(np.fft.fftfreq(len(psd), d=1 / rate))
    psd = np.fft.fftshift(psd)
    freq_err_pct = 100.0 * abs(freqs[np.argmax(psd)] - freq) / freq
    assert freq_err_pct < 1.0  # test_effex.py:83-84


def test_framing_counts_and_tail_drop():
    nbins, ntaps = 16, 4
    x = jnp.arange(16 * 5 + 3, dtype=jnp.complex64)  # non-multiple length
    xp, hist = frame_blocks(x, nbins, ntaps)
    assert xp.shape == (5 + ntaps - 1, nbins)       # 5 rows + 3 history rows
    assert hist.shape == (ntaps - 1, nbins)
    # history rows are zeros at stream start
    np.testing.assert_array_equal(np.asarray(xp[:ntaps - 1]), 0)
    # frames-per-block matches the reference channelizer count num_samp//nbins
    spec = spectrometer_poly(x, jnp.asarray(pfb_window(ntaps, nbins)), nbins)
    assert spec.shape == ((16 * 5 + 3) // nbins, nbins)


def test_pfb_fir_matches_direct_sum(rng):
    nbins, ntaps, s = 8, 4, 6
    xp = jnp.asarray(rng.normal(size=(s + ntaps - 1, nbins))
                     + 1j * rng.normal(size=(s + ntaps - 1, nbins))
                     ).astype(jnp.complex64)
    w = jnp.asarray(rng.normal(size=(ntaps, nbins)).astype(np.float32))
    got = np.asarray(pfb_fir(xp, w))
    want = sum(np.asarray(w)[t] * np.asarray(xp)[t:t + s] for t in range(ntaps))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_streaming_matches_contiguous(rng):
    """Two streamed blocks with carried history produce exactly the frames
    of the contiguous signal (the reference loses tap history at every
    chunk boundary; we must not)."""
    nbins, ntaps = 64, 4
    window = jnp.asarray(pfb_window(ntaps, nbins))
    x = jnp.asarray((rng.normal(size=4096) + 1j * rng.normal(size=4096))
                    .astype(np.complex64))
    full, _ = spectrometer_poly_stream(x, window, nbins)
    half = 2048
    a, hist = spectrometer_poly_stream(x[:half], window, nbins)
    b, _ = spectrometer_poly_stream(x[half:], window, nbins, history=hist)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([a, b])),
                               np.asarray(full), rtol=1e-4, atol=1e-6)


def test_batched_channels(rng):
    """Leading batch (channel) dims flow through the spectrometer."""
    nbins, ntaps = 32, 4
    window = jnp.asarray(pfb_window(ntaps, nbins))
    x = jnp.asarray((rng.normal(size=(3, 2, 1024))
                     + 1j * rng.normal(size=(3, 2, 1024))).astype(np.complex64))
    spec = spectrometer_poly(x, window, nbins)
    assert spec.shape == (3, 2, 1024 // nbins, nbins)
    one = spectrometer_poly(x[1, 0], window, nbins)
    np.testing.assert_allclose(np.asarray(spec[1, 0]), np.asarray(one),
                               rtol=1e-5)


def test_phase_continuous_tone_source():
    """The synthetic sinusoid source is phase-continuous across blocks."""
    a = complex_sinusoid(64, 1e6, 1.23e4, t0=0.0)
    b = complex_sinusoid(64, 1e6, 1.23e4, t0=64 / 1e6)
    c = complex_sinusoid(128, 1e6, 1.23e4, t0=0.0)
    np.testing.assert_allclose(np.concatenate([a, b]), c, atol=1e-5)
