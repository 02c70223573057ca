"""Benchmark: steady-state FX-correlator throughput on one chip.

Measures aggregate samples/s through the fused PFB + FFT + X-engine step on
the flagship 2-channel 4096-bin configuration (the BASELINE.json headline
metric).  vs_baseline compares against the reference's implied sustained
real-time rate: 2 ch x 2.4 MS/s = 4.8 Msamples/s aggregate on its design
platform (BASELINE.md: defaults at effex.py:47,713-718).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: first compile through the remote-compile
# tunnel is minutes; cached recompiles are seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fxtpu_xla"))


REFERENCE_AGGREGATE_SAMPLES_PER_S = 4.8e6  # BASELINE.md implied real-time rate


def bench(block_pow: int = 22, nbins: int = 4096, nchan: int = 2,
          iters: int = 30, warmup: int = 5, mode: str = "SPECTRUM"):
    import jax
    import jax.numpy as jnp

    from fxtpu.config import CorrelatorConfig
    from fxtpu.fx import FxEngine

    num_samp = 2 ** block_pow
    cfg = CorrelatorConfig(mode=mode, nchan=nchan, num_samp=num_samp,
                           nbins=nbins, clamp_num_samp=False)
    eng = FxEngine(cfg)
    rng = np.random.default_rng(0)
    iq = eng.prepare_block(
        (rng.normal(size=(nchan, num_samp)).astype(np.float32)
         + 1j * rng.normal(size=(nchan, num_samp)).astype(np.float32)))
    delays = jnp.asarray([0.0] * nchan, dtype=jnp.float32)
    history = eng.fresh_history()

    # warmup / compile
    vis, history = eng.step(iq, delays, history)
    jax.block_until_ready(vis)
    for _ in range(warmup):
        vis, history = eng.step(iq, delays, history)
    jax.block_until_ready(vis)

    t0 = time.perf_counter()
    for _ in range(iters):
        vis, history = eng.step(iq, delays, history)
    jax.block_until_ready(vis)
    dt = time.perf_counter() - t0

    agg_samples = nchan * num_samp * iters
    samples_per_s = agg_samples / dt
    frames = num_samp // nbins
    spectra_per_s = frames * iters / dt
    return {
        "samples_per_s": samples_per_s,
        "spectra_per_s": spectra_per_s,
        "block_seconds": dt / iters,
        "num_samp": num_samp,
        "nbins": nbins,
        "nchan": nchan,
    }


def main():
    import jax
    res = bench()
    out = {
        "metric": "2ch_4096bin_pfb_fft_x_aggregate_throughput",
        "value": round(res["samples_per_s"], 1),
        "unit": "samples/s",
        "vs_baseline": round(
            res["samples_per_s"] / REFERENCE_AGGREGATE_SAMPLES_PER_S, 3),
        "spectra_per_s": round(res["spectra_per_s"], 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
