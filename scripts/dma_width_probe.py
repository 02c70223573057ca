"""Standalone TPU probe: HBM->VMEM DMA rate vs DESTINATION ROW WIDTH.

Motivated by docs/design.md §8i: the pretiled [R*n1, n2=128] slab (same
HBM bytes as the legacy [R, nbins=4096] layout — a row-major
reinterpret) measured its input DMA at ~266 GB/s vs the legacy slab's
567 GB/s on the SAME copy.  The only difference is the shape metadata
the copy walks: 128-lane rows (512 B) vs 4096-lane rows (16 KB).

This probe sweeps the aspect ratio r — src/dst shaped [2ch, R*r, W/r],
identical bytes for every r — through the production copy structure
(double-buffered slab, 2-D grid, per-tile [2, 24*r, W/r] copies).  Each
grid walks its tiles REPS times inside ONE launch so the measured time
dwarfs the ~1.4-2 ms tunnel dispatch floor (§8h probe-bisect lesson:
per-launch timing of sub-ms kernels measures only the floor).

If the rate holds to r=8 ([*, 512]-lane rows, 2 KB), an intermediate
pretiled layout can DMA at the wide rate and pay only a 4-way
lane->sublane retile instead of the legacy 32-way (the measured 7.9
ps/sample flagship VPU wall, §8i).

Run: python scripts/dma_width_probe.py   (prints one JSON line per r)
"""
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

W = 4096          # flagship nbins (f32 lanes at r=1)
TILE = 16         # flagship tile rows
PAD = 8           # flagship halo pad rows
ROWS = TILE + PAD
KB, NTILE = 32, 4   # blocks x tiles walked per rep
NT = KB * NTILE
REPS = 8            # in-launch re-walks (beats the dispatch floor)


def make_fn(r):
    rows_total = NT * TILE * r          # merged stream rows at aspect r
    lanes = W // r

    def kernel(xa_ref, out_ref, slab, sems):
        rep = pl.program_id(0)
        t = pl.program_id(1)
        g = rep * NT + t
        buf = jax.lax.rem(g, 2)

        def copies(gg, slot):
            # walk all NT tiles per rep (cold addresses within a rep);
            # clamp the halo-backed start like production's g==0 path
            tt = jax.lax.rem(gg, NT)
            start = pl.multiple_of(
                jnp.maximum(tt * TILE - PAD, 0) * r, 8)
            return [pltpu.make_async_copy(
                xa_ref.at[:, pl.ds(start, ROWS * r)],
                slab.at[slot], sems.at[slot])]

        # revolver: tile g's copy was started at g-1 (g==0 starts its own);
        # start g+1's transfer into the other slot, then wait this one
        @pl.when(g == 0)
        def _():
            for cp in copies(0, 0):
                cp.start()

        @pl.when(g + 1 < REPS * NT)
        def _():
            for cp in copies(g + 1, jax.lax.rem(g + 1, 2)):
                cp.start()

        for cp in copies(g, buf):
            cp.wait()

        # touch one vreg so the slab is live
        s = jnp.sum(slab[buf, 0, :8].astype(jnp.float32))

        @pl.when(t == 0)
        def _():
            out_ref[0] = jnp.full((8, 128), s, jnp.float32)

        @pl.when(t != 0)
        def _():
            out_ref[0] += jnp.full((8, 128), s, jnp.float32)

    interpret = os.environ.get("DMA_PROBE_INTERPRET", "") == "1"

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel,
            grid=(REPS, NT),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda rep, t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 2, ROWS * r, lanes), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(x)

    x = jnp.zeros((2, rows_total, lanes), jnp.float32)
    return fn, x


def main():
    # SLOPE method: the tunnel's fixed launch+readback overhead (~25 ms,
    # it swamped the first version of this probe — every r measured a
    # flat ~30 GB/s) cancels in the time DIFFERENCE between a REPS=lo
    # and a REPS=hi launch of the same kernel; the slope is the pure
    # per-rep copy time.
    global REPS
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} (slope method)", flush=True)
    lo, hi = 16, 256
    for r in (1, 2, 4, 8, 16, 32):
        times = {}
        for reps in (lo, hi):
            REPS = reps
            fn, x = make_fn(r)
            fn(x).block_until_ready()      # compile + warm
            best = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                float(jnp.sum(fn(x)))      # scalar readback = real sync
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        dt = times[hi] - times[lo]
        bytes_per_rep = NT * 2 * ROWS * W * 4        # r-independent
        print(json.dumps({
            "r": r, "lanes": W // r, "row_bytes": W // r * 4,
            "ms_lo": round(times[lo] * 1e3, 3),
            "ms_hi": round(times[hi] * 1e3, 3),
            "gbps": round(bytes_per_rep * (hi - lo) / dt / 1e9, 1)
            if dt > 0 else None}), flush=True)


if __name__ == "__main__":
    main()
