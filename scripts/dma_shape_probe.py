"""Standalone TPU probe: HBM->VMEM DMA rate vs copy indexing shape.

Motivated docs/design.md section 8c (merged-rows layout): production's
per-(block, tile) strided descriptors ran ~4x under the contiguous rate.

Differences probed (int32, pure-DMA chain, 2-D grid like production):
  chan     3-D src [2, R, L], contiguous dst slab[slot, 0]    (fast probe)
  prodsrc  4-D src [K, 2, R, L] dynamic kk, contiguous dst
  proddst  3-D src, STRIDED dst slab[slot, :, 0] (planes dim between)
  prod     4-D src dynamic kk + strided dst  == production structure
ROWS=96 (tile 64 + pad 32, the wideband shape), L=2048 int32 words.
"""
import os
import time

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fxtpu_xla"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 96        # tile 64 + pad 32 (wideband int8 copy height)
L = 2048         # packed int32 words per row (nbins 8192 / 4)
KB, NTILE = 32, 4   # production wideband grid shape per 8-block batch x4
NT = KB * NTILE


def make_kernel(mode):
    def kernel(xa_ref, xb_ref, out_ref, slab, sems):
        k = pl.program_id(0)
        t = pl.program_id(1)
        g = k * NTILE + t
        buf = jax.lax.rem(g, 2)

        def copies(kk, tt, slot):
            if mode in ("prodsrc", "prod"):
                # per-block 4-D source: tile offset within block kk
                start = pl.multiple_of(tt * 64, 8)
            else:
                # single merged source: walk ALL NT tiles so every mode
                # touches the same (cold) address range — offsetting by
                # tt alone would re-read one hot 288-row region 32x and
                # bias the comparison toward the 3-D modes
                start = pl.multiple_of((kk * NTILE + tt) * 64, 8)
            if mode == "chan":
                return [
                    pltpu.make_async_copy(
                        xa_ref.at[:, pl.ds(start, ROWS)],
                        slab.at[slot, 0], sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        xb_ref.at[:, pl.ds(start, ROWS)],
                        slab.at[slot, 1], sems.at[slot, 1]),
                ]
            if mode == "prodsrc":
                return [
                    pltpu.make_async_copy(
                        xa_ref.at[kk, :, pl.ds(start, ROWS)],
                        slab.at[slot, 0], sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        xb_ref.at[kk, :, pl.ds(start, ROWS)],
                        slab.at[slot, 1], sems.at[slot, 1]),
                ]
            if mode == "proddst":
                return [
                    pltpu.make_async_copy(
                        xa_ref.at[:, pl.ds(start, ROWS)],
                        slab.at[slot, :, 0], sems.at[slot, 0]),
                    pltpu.make_async_copy(
                        xb_ref.at[:, pl.ds(start, ROWS)],
                        slab.at[slot, :, 1], sems.at[slot, 1]),
                ]
            # prod: dynamic 4-D source + strided dest
            return [
                pltpu.make_async_copy(
                    xa_ref.at[kk, :, pl.ds(start, ROWS)],
                    slab.at[slot, :, 0], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    xb_ref.at[kk, :, pl.ds(start, ROWS)],
                    slab.at[slot, :, 1], sems.at[slot, 1]),
            ]

        @pl.when(g == 0)
        def _():
            for cp in copies(0, 0, 0):
                cp.start()

        nk = k + (t + 1) // NTILE
        nt = jax.lax.rem(t + 1, NTILE)

        @pl.when(g + 1 < NT)
        def _():
            for cp in copies(nk, nt, jax.lax.rem(g + 1, 2)):
                cp.start()

        for cp in copies(k, t, buf):
            cp.wait()

        @pl.when(g == NT - 1)
        def _():
            out_ref[...] = slab[0, 0, 0, :8, :128].astype(jnp.float32)

    return kernel


def run_mode(mode):
    rng = np.random.default_rng(0)
    if mode in ("prodsrc", "prod"):
        shape = (KB, 2, NTILE * 64 + 32, L)
    else:
        shape = (2, NT * 64 + 32, L)
    xa = jnp.asarray(rng.integers(-2**30, 2**30, size=shape,
                                  dtype=np.int64).astype(np.int32))
    xb = jnp.asarray(rng.integers(-2**30, 2**30, size=shape,
                                  dtype=np.int64).astype(np.int32))
    # [slot, plane, ch, rows, lanes] (proddst/prod read it [slot, ch,
    # plane, ...] — same shape, the stride pattern is what differs)
    slab_shape = (2, 2, 2, ROWS, L)
    call = pl.pallas_call(
        make_kernel(mode),
        interpret=jax.default_backend() != "tpu",
        grid=(KB, NTILE),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )

    @jax.jit
    def run(xa, xb):
        return call(xa, xb)

    out = run(xa, xb)
    float(jnp.sum(out))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(xa, xb)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    nbytes = NT * 2 * 2 * ROWS * L * 4
    print(f"MODE={mode}: {dt*1e3:.3f} ms  ({nbytes/dt/1e9:.0f} GB/s)",
          flush=True)


if __name__ == "__main__":
    for mode in ("chan", "prodsrc", "proddst", "prod"):
        run_mode(mode)
