"""TPU numerics + timing breakdown for the production FX step.

Checks the fused Pallas kernel and the unfused XLA path against a float64
numpy oracle at the flagship shape, and times both with the scalar-readback
sync this backend requires (jax.block_until_ready does NOT synchronize
Pallas outputs through the remote-device tunnel).

Run on the real chip:  python scripts/tpu_breakdown.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fxtpu_xla"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree

from fxtpu.config import CorrelatorConfig
from fxtpu.fx import FxEngine
from fxtpu.ops.cplx import to_complex
from fxtpu.ops.planes import pack_delays

NCH, POW, NBINS, NTAPS, K = 2, 21, 4096, 4, 64
NS = 2 ** POW
ITERS = 20
DELAY = 4.2e-7  # ~600 carrier cycles: exercises the packed-phase path


def oracle(blk, delays, cfg):
    """float64 reference visibility for one block from zero history."""
    iqn = blk.astype(np.complex128)
    iqn -= iqn.mean(axis=-1, keepdims=True)
    s = NS // NBINS
    rows = iqn.reshape(NCH, s, NBINS)
    w = np.asarray(FxEngine(cfg).window2d, np.float64)
    xp = np.concatenate([np.zeros((NCH, NTAPS - 1, NBINS)), rows], axis=1)
    fir = sum(w[t] * xp[:, t:t + s] for t in range(NTAPS))
    spec = np.fft.fft(fir, axis=-1)
    f = np.fft.fftfreq(NBINS, 1 / cfg.bandwidth) + cfg.frequency
    rot = np.exp(2j * np.pi * np.outer(np.asarray(delays, np.float64), f))
    spec = spec * rot[:, None, :]
    return np.fft.fftshift((spec[0] * np.conj(spec[1])).mean(axis=0))


def main():
    print("device:", jax.devices()[0])
    cfg = CorrelatorConfig(nchan=NCH, num_samp=NS, nbins=NBINS, ntaps=NTAPS,
                           clamp_num_samp=False)
    rng = np.random.default_rng(0)
    blk = (rng.normal(size=(NCH, NS)).astype(np.float32)
           + 1j * rng.normal(size=(NCH, NS)).astype(np.float32))
    delays = np.array([0.0, DELAY])
    packed = jnp.asarray(pack_delays(delays, cfg.frequency))
    want = oracle(blk, delays, cfg)
    scale = np.abs(want).max()

    for fused in (False, True):
        eng = FxEngine(cfg, fused=fused)
        iq = eng.prepare_block(blk)
        vis, _ = eng.step(iq, packed, eng.fresh_history())
        got = to_complex(vis)[0]
        err = np.abs(got - want)
        # the fused kernel's post-hoc DC correction cancels catastrophically
        # ONLY at the (degenerate) DC bin — report it separately
        dc = NBINS // 2
        err_nodc = np.delete(err, range(dc - 2, dc + 3))
        print(f"fused={fused}: max rel err vs f64 oracle "
              f"{err.max() / scale:.2e} (excl. DC bin: "
              f"{err_nodc.max() / scale:.2e})")

        # K-block multi-step throughput, readback-synced.  Stage through
        # prepare_batch: fused engines take the MERGED [nch, K, S, lanes]
        # layout, not a [K, nch, ...] stack.
        iqk = eng.prepare_batch([blk] * K)
        dk = jnp.asarray(pack_delays(np.stack([delays] * K), cfg.frequency))
        hist = eng.fresh_history()
        visk, h = eng.multi_step(iqk, dk, hist)
        float(jnp.sum(visk.re))
        t0 = time.perf_counter()
        h = hist
        for _ in range(ITERS):
            visk, h = eng.multi_step(iqk, dk, h)
        float(jnp.sum(visk.re))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"  multi_step K={K}: {dt / K * 1e3:.3f} ms/block "
              f"({NCH * NS * K / dt / 1e9:.2f} GS/s)")


if __name__ == "__main__":
    main()
