"""TPU micro-breakdown: where does the fused step's time go, and do the
TPU numerics (HIGH-precision matmul FFT) match a float64 numpy oracle.

Run on the real chip:  python scripts/tpu_breakdown.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fxtpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

from fxtpu.config import CorrelatorConfig
from fxtpu.fx import FxEngine
from fxtpu.ops import cfft
from fxtpu.ops import planes as pl_ops
from fxtpu.ops.cplx import Cplx, from_complex, to_complex
from fxtpu.ops.window import pfb_window

NCH, POW, NBINS, NTAPS = 2, 22, 4096, 4
NS = 2 ** POW
ITERS = 20


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS


def main():
    print("device:", jax.devices()[0])
    cfg = CorrelatorConfig(nchan=NCH, num_samp=NS, nbins=NBINS, ntaps=NTAPS,
                           clamp_num_samp=False)
    eng = FxEngine(cfg)
    iq, delays, hist = eng.example_inputs(0)
    w2d = jnp.asarray(eng.window2d, jnp.float32)

    # --- numerics: full step vs float64 numpy oracle --------------------
    vis, _ = eng.step(iq, delays, hist)
    v = to_complex(vis)[0]
    iqn = (np.asarray(iq.re) + 1j * np.asarray(iq.im)).astype(np.complex128)
    iqn -= iqn.mean(axis=-1, keepdims=True)
    s = NS // NBINS
    rows = iqn.reshape(NCH, s, NBINS)
    w = np.asarray(eng.window2d, np.float64)
    xp = np.concatenate([np.zeros((NCH, NTAPS - 1, NBINS)), rows], axis=1)
    fir = sum(w[t] * xp[:, t:t + s] for t in range(NTAPS))
    spec = np.fft.fft(fir, axis=-1)
    freqs = np.fft.fftfreq(NBINS, 1 / cfg.bandwidth) + cfg.frequency
    want = np.fft.fftshift((spec[0] * np.conj(spec[1])).mean(axis=0))
    scale = np.abs(want).max()
    print(f"numerics: max rel err vs f64 oracle = "
          f"{np.abs(v - want).max() / scale:.3e}")

    # --- stage timings ----------------------------------------------------
    t_full = timeit(eng.step, iq, delays, hist)

    fir_only = jax.jit(lambda x: pl_ops.pfb_fir_planes(
        Cplx(jnp.concatenate([jnp.zeros((NCH, NTAPS - 1, NBINS)),
                              x.re.reshape(NCH, s, NBINS)], axis=1),
             jnp.concatenate([jnp.zeros((NCH, NTAPS - 1, NBINS)),
                              x.im.reshape(NCH, s, NBINS)], axis=1)), w2d))
    t_fir = timeit(fir_only, iq)

    fir_in = fir_only(iq)
    fft_only = jax.jit(cfft.fft)
    t_fft = timeit(fft_only, fir_in)

    spec_in = fft_only(fir_in)
    rot_x = jax.jit(lambda sp, d: pl_ops.xcorr_baselines_planes(
        pl_ops.fstc_rotate_planes(sp, d, cfg.bandwidth, cfg.frequency),
        eng.pairs))
    t_rx = timeit(rot_x, spec_in, delays)

    dc = jax.jit(pl_ops.dc_remove_planes)
    t_dc = timeit(dc, iq)

    agg = NCH * NS
    print(f"full step : {t_full*1e3:8.3f} ms  "
          f"({agg / t_full / 1e9:.2f} Gsamp/s)")
    print(f"  dc      : {t_dc*1e3:8.3f} ms")
    print(f"  fir     : {t_fir*1e3:8.3f} ms")
    print(f"  fft     : {t_fft*1e3:8.3f} ms")
    print(f"  rot+x   : {t_rx*1e3:8.3f} ms")
    print(f"  sum     : {(t_dc+t_fir+t_fft+t_rx)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
