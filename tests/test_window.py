"""Window/FIR design parity against scipy.signal (the reference consumed
these from cuSignal, which is scipy-compatible — effex.py:126-127)."""

import numpy as np
import pytest
import scipy.signal as ss

from fxtpu.ops import window as W


@pytest.mark.parametrize("name", ["hamming", "hann", "blackman",
                                  "blackmanharris", "boxcar"])
@pytest.mark.parametrize("n", [7, 64, 4096])
def test_get_window_matches_scipy(name, n):
    ours = W.get_window(name, n)
    theirs = ss.get_window(name, n)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


@pytest.mark.parametrize("numtaps,cutoff", [
    (16384, 1 / 4096),   # reference defaults: 4 taps x 4096 bins
    (8192, 1 / 2048),
    (131072, 1 / 4096),  # 32 taps x 4096 bins (reference test sweep)
    (101, 0.3),
])
def test_firwin_matches_scipy(numtaps, cutoff):
    ours = W.firwin(numtaps, cutoff, window="rectangular")
    theirs = ss.firwin(numtaps, cutoff, window="rectangular")
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_pfb_window_is_reference_composite():
    # effex.py:126-127: hamming window times rectangular-windowed sinc.
    w = W.pfb_window(4, 4096)
    expected = (ss.get_window("hamming", 16384)
                * ss.firwin(16384, cutoff=1 / 4096, window="rectangular"))
    np.testing.assert_allclose(w, expected, atol=1e-15)


def test_firwin_validates():
    with pytest.raises(ValueError):
        W.firwin(64, 0.0)
    with pytest.raises(ValueError):
        W.firwin(64, 1.5)
    with pytest.raises(ValueError):
        W.get_window("nosuch", 8)
