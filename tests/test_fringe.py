"""Automated TEST-mode physics oracle.

The reference validates TEST mode by eye (manual sinc-envelope fit —
SURVEY.md §4 flags this as a gap).  Here the full fringe sweep runs through
the real engine and the recovered envelope parameters are asserted:

  * the fringe peak lands at the sweep-zero block,
  * the fitted envelope bandwidth matches the configured bandwidth <2%,
  * the fitted delay offset tau0 is < a sweep step,
  * the reference-parity fit function also converges (parity check).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fxtpu.config import CorrelatorConfig
from fxtpu.fx import FxEngine
from fxtpu.ops.cplx import to_complex
from fxtpu.post_process import (fit_fringe_envelope, fit_interferometer_model,
                                fringe_envelope, post_process)
from fxtpu.sources import NoiseSource


@pytest.fixture(scope="module")
def sweep():
    bw = 2.4e6
    cfg = CorrelatorConfig(
        mode="TEST", num_samp=2**14, nbins=256, bandwidth=bw,
        clamp_num_samp=False,
        test_sweep_step=(1 / bw) / 50, test_offset_steps=100)
    eng = FxEngine(cfg)
    src = NoiseSource(nchan=2, sample_rate=bw, snr=100, seed=3)
    hist = eng.fresh_history()
    # calibrate-on-start consumes the first block (effex.py:351-353),
    # then TEST subtracts the artificial offset (effex.py:578-579)
    blk = src.read_block(cfg.num_samp)
    d = np.asarray(eng.calibrate(eng.prepare_block(blk)), dtype=np.float64)
    # the true inter-channel delay is 0, so d[1] IS the calibration
    # residual — the sweep's expected center offset (tau0 oracle below)
    cal_err = float(d[1])
    d[1:] -= cfg.test_delay_offset
    vis = []
    for _ in range(200):
        d[1:] += cfg.test_delay_sweep_step  # effex.py:403-404
        blk = src.read_block(cfg.num_samp)
        v, hist = eng.step(eng.prepare_block(blk),
                           jnp.asarray(d, dtype=np.float32), hist)
        vis.append(complex(to_complex(v)[0]))
    return cfg, np.asarray(vis), cal_err


def test_fringe_peak_at_sweep_zero(sweep):
    cfg, vis, _ = sweep
    amp = np.abs(vis)
    assert abs(int(np.argmax(amp)) - (cfg.test_offset_steps - 1)) <= 2


def test_fringe_envelope_recovers_bandwidth(sweep):
    cfg, vis, cal_err = sweep
    pfit, _ = fit_fringe_envelope(vis, cfg.test_delay_sweep_step,
                                  cfg.bandwidth,
                                  offset_steps=cfg.test_offset_steps)
    amp_fit, tau0, dnu = pfit
    assert abs(dnu - cfg.bandwidth) / cfg.bandwidth < 0.02
    # tau0 is the sweep center's offset = the calibration residual on a
    # zero-true-delay source: assert the fit RECOVERS it (a stronger
    # oracle than a loose |tau0| bound, which only held for noise
    # realizations whose cal residual was < 1 step by luck)
    assert abs(tau0 - cal_err) < cfg.test_delay_sweep_step
    assert abs(tau0) < 3 * cfg.test_delay_sweep_step
    # fitted envelope explains the data: residual below 10% of peak
    tau = (np.arange(len(vis)) + 1 - cfg.test_offset_steps) \
        * cfg.test_delay_sweep_step
    resid = np.abs(vis) - fringe_envelope(tau, *pfit)
    assert np.max(np.abs(resid)) < 0.1 * np.abs(vis).max()


def test_first_null_position(sweep):
    cfg, vis, _ = sweep
    amp = np.abs(vis)
    k0 = int(np.argmax(amp))
    null_steps = int(round((1 / cfg.bandwidth) / cfg.test_delay_sweep_step))
    window = amp[k0 + null_steps - 3: k0 + null_steps + 4]
    assert window.min() < 0.05 * amp[k0]


def test_reference_parity_fit_converges(sweep):
    cfg, vis, _ = sweep
    pfit, _ = fit_interferometer_model(vis, cfg.test_delay_sweep_step,
                                       cfg.bandwidth, cfg.frequency,
                                       tau0_seed=0.0, show=False)
    assert np.all(np.isfinite(pfit))


def test_post_process_driver_test_mode(sweep, tmp_path):
    cfg, vis, _ = sweep
    pfit = post_process(vis, cfg.bandwidth, cfg.frequency, cfg.nbins, "test",
                        omit_plot=False, test_delay_sweep_step=cfg.test_delay_sweep_step,
                        save=str(tmp_path / "fig.png"), show=False)
    assert pfit is not None
    assert (tmp_path / "fig.png").exists()
    assert (tmp_path / "fig_fit.png").exists()
