"""Standalone TPU probe: the flagship lane->sublane RETILE, by lowering.

The fused kernel's biggest remaining flagship compute term (~7.9
ps/sample, design.md §8i) is the [tile, nbins] -> [tile*n1, n2] retile
between the FIR output and FFT stage 1.  The pretiled slab family
deleted it but halved the input DMA rate (§8i verdict).  This probe
asks a narrower question: does the SAME dataflow cost less under a
different Mosaic lowering?

  reshape  (production): x.reshape(tile*n1, n2), then per-frame
           contiguous [n1, n2] slices — a stride-n1 sublane SCATTER of
           every (8,128) vreg tile.
  stack    lane-slice + stack to j1-major [n1, tile, n2] — a pure
           (8,128)-TILE permutation (each lane-tile moves whole) — then
           per-frame [:, f, :] STRIDED-sublane slices feed the dots.
  gather   no materialized retile: per frame, concat the n1 single-row
           lane-slices x[f:f+1, j*n2:(j+1)*n2] directly.
  control  input arrives pre-tiled [tile*n1, n2]: the same dots with
           NO retile — the floor; formulation minus control = the
           retile's cost under that lowering.

Each leg runs the same per-frame [n1, n1] @ [n1, n2] bf16 dot chain
(stage-1 shaped, single plane / 1-pass — the retile cost sits on x, so
a cheaper dot only makes the difference MORE visible).  Grid walks NT
tile-slots per rep with rotating source rows; timed by the SLOPE
method (REPS=lo vs hi inside one launch) so the tunnel's ~25 ms fixed
launch+readback overhead cancels (§8h/§8i probe lessons).

Run: python scripts/retile_probe.py   (prints one JSON line per leg)
"""
import functools
import json
import os
import time

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fxtpu_xla"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBINS = 4096
TILE = 16
N1, N2 = 32, 128          # _kernel_factor(4096)
NT = 32                   # tile-slots walked per rep
NSRC = 8                  # rotating source rows (defeat address reuse)


def make_fn(form: str, reps: int):
    def kernel(x_ref, xt_ref, m_ref, out_ref):
        rep = pl.program_id(0)
        t = pl.program_id(1)
        g = rep * NT + t
        src = jax.lax.rem(g, NSRC)

        if form == "control":
            f2 = xt_ref[pl.ds(src * TILE * N1, TILE * N1)]
        elif form == "reshape":
            x = x_ref[pl.ds(src * TILE, TILE)]
            f2 = x.reshape(TILE * N1, N2)
        elif form == "stack":
            x = x_ref[pl.ds(src * TILE, TILE)]
            s = jnp.stack([x[:, j * N2:(j + 1) * N2] for j in range(N1)],
                          axis=0)              # [n1, tile, n2] j1-major
        elif form == "gather":
            x = x_ref[pl.ds(src * TILE, TILE)]
        else:
            raise ValueError(form)

        acc = jnp.zeros((N1, N2), jnp.float32)
        kw = dict(preferred_element_type=jnp.float32)
        for f in range(TILE):
            if form == "stack":
                x2 = s[:, f, :]
            elif form == "gather":
                x2 = jnp.concatenate(
                    [x[f:f + 1, j * N2:(j + 1) * N2] for j in range(N1)],
                    axis=0)
            else:
                x2 = f2[f * N1:(f + 1) * N1]
            acc = acc + jnp.dot(m_ref[:], x2.astype(jnp.bfloat16), **kw)

        @pl.when(g == 0)
        def _():
            out_ref[...] = acc

        @pl.when(g != 0)
        def _():
            out_ref[...] += acc

    interpret = os.environ.get("RETILE_PROBE_INTERPRET", "") == "1"

    @jax.jit
    def fn(x, xt, m):
        return pl.pallas_call(
            kernel,
            grid=(reps, NT),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N1, N2), jnp.float32),
            interpret=interpret,
        )(x, xt, m)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(NSRC * TILE, NBINS)).astype(np.float32))
    # pre-tiled copy of the same values (control consumes identical data)
    xt = jnp.asarray(np.asarray(x).reshape(NSRC * TILE * N1, N2))
    m = jnp.asarray(rng.normal(size=(N1, N1)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    return fn, (x, xt, m)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} (slope method; per-tile = "
          f"retile of {TILE}x{NBINS} f32 + {TILE} [32,32]@[32,128] dots)",
          flush=True)
    lo, hi = 8, 64
    base_ps = None
    for form in ("control", "reshape", "stack", "gather"):
        times = {}
        for reps in (lo, hi):
            fn, args = make_fn(form, reps)
            float(jnp.sum(fn(*args)))          # compile + warm (real sync)
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                float(jnp.sum(fn(*args)))
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        dt = times[hi] - times[lo]
        per_tile_us = dt / ((hi - lo) * NT) * 1e6
        # flagship ps/sample equivalent: 2 planes x 2 channels share the
        # retile per tile of tile*nbins samples per channel
        ps_per_sample = dt / ((hi - lo) * NT) / (TILE * NBINS) * 1e12 * 2
        if form == "control":
            base_ps = ps_per_sample
        print(json.dumps({
            "form": form,
            "ms_lo": round(times[lo] * 1e3, 3),
            "ms_hi": round(times[hi] * 1e3, 3),
            "us_per_tile": round(per_tile_us, 3),
            "ps_per_sample_2pl": round(ps_per_sample, 2),
            "retile_ps_vs_control": round(ps_per_sample - base_ps, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
