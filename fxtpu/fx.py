"""The fused per-block FX step and in-graph calibrator.

This is the device-side hot path: everything the reference does per chunk on
the GPU (``/root/reference/effex/effex.py:391-410,497-527``) fused into ONE
jitted XLA program — DC-spike removal, PFB F-stage, FSTC phase rotation,
X-stage conjugate multiply, and visibility integration.  The calibrated
delays enter as a *traced* vector argument, so recalibration (and the
TEST-mode delay sweep) never triggers a recompile (SURVEY.md "hard parts").

``make_fx_step`` returns the single-device step; pass a mesh to get the
shard_map'ed multi-device step from :mod:`fxtpu.parallel.sharded` with the
same call signature.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fxtpu.config import CorrelatorConfig
from fxtpu.ops.pfb import pfb_fir, zero_history
from fxtpu.ops.window import pfb_window
from fxtpu.ops.xengine import (baseline_pairs, continuum_reduce, fstc_rotate)
from fxtpu.ops.delay import estimate_delay_gaussian

__all__ = ["make_fx_step", "make_calibrator", "dc_remove", "FxEngine"]


def dc_remove(iq):
    """DC-spike removal: subtract the per-channel complex mean
    (``effex.py:393-395`` subtracts real/imag means separately — the same
    operation)."""
    return iq - jnp.mean(iq, axis=-1, keepdims=True)


def make_fx_step(*, mode: str, nbins: int, window2d: np.ndarray,
                 pairs: np.ndarray, bandwidth: float, frequency: float,
                 num_samp: int, dtype=jnp.complex64,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 fir_impl: str = "xla"):
    """Build the jitted per-block step:

        step(iq [nch, num_samp], delays [nch], history [nch, ntaps-1, nbins])
            -> (vis, new_history)

    ``vis``: ``[nbl, nbins]`` fftshifted cross-power spectra (SPECTRUM) or
    ``[nbl]`` scalars (CONTINUUM/TEST), matching ``Correlator._pfb_xcorr``
    (``effex.py:497-527``) for nchan=2.
    """
    if mesh is not None and np.prod(list(mesh.shape.values())) > 1:
        from fxtpu.parallel.sharded import make_sharded_fx_step
        return make_sharded_fx_step(
            mode=mode, nbins=nbins, window2d=window2d, pairs=pairs,
            bandwidth=bandwidth, frequency=frequency, mesh=mesh,
            num_samp=num_samp, dtype=dtype)

    ntaps = int(window2d.shape[0])
    s_rows = num_samp // nbins
    w2d = jnp.asarray(window2d, dtype=jnp.float32)
    pairs_a = jnp.asarray(pairs)
    continuum = mode in ("CONTINUUM", "TEST")
    if fir_impl == "pallas":
        from fxtpu.ops.pfb_pallas import pfb_fir_pallas
        fir_fn = pfb_fir_pallas
    else:
        fir_fn = pfb_fir

    @jax.jit
    def step(iq, delays, history):
        iq = dc_remove(iq.astype(dtype))
        rows = iq[:, : s_rows * nbins].reshape(iq.shape[0], s_rows, nbins)
        if ntaps > 1:
            xp = jnp.concatenate([history.astype(dtype), rows], axis=1)
            new_hist = xp[:, -(ntaps - 1):, :]
        else:
            xp, new_hist = rows, history
        fir = fir_fn(xp, w2d)
        spec = jnp.fft.fft(fir, axis=-1)
        spec = fstc_rotate(spec, delays, bandwidth, frequency)
        gp = jnp.take(spec, pairs_a[:, 0], axis=0)
        gq = jnp.take(spec, pairs_a[:, 1], axis=0)
        vis = jnp.fft.fftshift(jnp.mean(gp * jnp.conj(gq), axis=1), axes=-1)
        if continuum:
            vis = continuum_reduce(vis, bandwidth)
        return vis, new_hist

    return step


def make_calibrator(*, bandwidth: float, dtype=jnp.complex64):
    """Jitted all-channel delay calibration against channel 0.

    Returns ``cal(iq [nch, num_samp]) -> delays [nch]`` seconds, with
    ``delays[0] == 0``.  Channel blocks are DC-removed first, as the
    reference calibrates on the DC-removed pinned buffers
    (``effex.py:391-395`` then ``:484``).
    """

    @jax.jit
    def cal(iq):
        iq = dc_remove(iq.astype(dtype))
        ref = iq[0]
        est = jax.vmap(lambda x: estimate_delay_gaussian(ref, x, bandwidth))(
            iq[1:])
        return jnp.concatenate([jnp.zeros((1,), est.dtype), est])

    return cal


class FxEngine:
    """Convenience bundle: window + pairs + step + calibrator for a config.

    The flagship object benchmarks and __graft_entry__ use; the Correlator
    state machine drives one of these.
    """

    def __init__(self, cfg: CorrelatorConfig,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 fir_impl: str = "xla"):
        self.cfg = cfg
        self.mesh = mesh
        self.window = pfb_window(cfg.ntaps, cfg.nbins, cfg.window)
        self.window2d = self.window.reshape(cfg.ntaps, cfg.nbins)
        self.pairs = baseline_pairs(cfg.nchan, cfg.include_autos)
        self.dtype = jnp.complex64 if cfg.dtype == "complex64" else jnp.complex128
        self.step = make_fx_step(
            mode=cfg.mode, nbins=cfg.nbins, window2d=self.window2d,
            pairs=self.pairs, bandwidth=cfg.bandwidth, frequency=cfg.frequency,
            num_samp=cfg.num_samp, dtype=self.dtype, mesh=mesh,
            fir_impl=fir_impl)
        self.calibrate = make_calibrator(bandwidth=cfg.bandwidth,
                                         dtype=self.dtype)

    def fresh_history(self):
        return zero_history((self.cfg.nchan,), self.cfg.nbins, self.cfg.ntaps,
                            self.dtype)

    def example_inputs(self, seed: int = 0):
        """Representative (iq, delays, history) inputs for compile checks."""
        rng = np.random.default_rng(seed)
        iq = (rng.normal(size=(self.cfg.nchan, self.cfg.num_samp))
              + 1j * rng.normal(size=(self.cfg.nchan, self.cfg.num_samp))
              ).astype(np.complex64)
        delays = np.zeros(self.cfg.nchan, dtype=np.float32)
        return jnp.asarray(iq), jnp.asarray(delays), self.fresh_history()
