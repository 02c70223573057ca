"""Standalone TPU probe: does DMA overlap compute in the fused kernel's
double-buffer pattern (ops/pfb_pallas._fx_kernel)?

Four kernels over the SAME merged-layout copies ([2, 96, 2048] int32
per plane from [nch, R, L]) on a 1-D grid of NT tiles:

  dma      pure DMA chain (no compute)            -> T_dma
  comp     pure compute (no DMA)                  -> T_comp
  dyn      production pattern: dynamic slot = g%2 -> T_dyn
  static   slot specialized by pl.when(g%2==0/1) with CONSTANT indices
           (Mosaic can prove copy/compute disjointness) -> T_static

If T_dyn ~= T_dma + T_comp but T_static ~= max(T_dma, T_comp), the
dynamic slab indexing is serializing the pipeline and the production
kernel should specialize slots.  Compute = CH chained [128,512]x[512,512]
bf16 matmuls per tile to emulate ~the FFT/conv MXU load.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fxtpu_xla"))
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, L = 96, 2048
NT = int(os.environ.get("NT", "64"))
CH = int(os.environ.get("CHAIN", "24"))   # matmuls per tile
VCH = int(os.environ.get("VCHAIN", "12"))  # VPU passes per tile (vcomp/vdyn)


def vpu_block(slab_block, out_acc):
    # VPU/VMEM-port-heavy compute: elementwise passes over the slab
    # block (every operand is a VMEM load, every result a VMEM store) —
    # the contention profile of the production kernel's accumulator and
    # plane machinery, as opposed to compute_block's MXU chain.
    x = slab_block[0].astype(jnp.float32)
    y = slab_block[1].astype(jnp.float32)
    for _ in range(VCH):
        x = x * 1.0000001 + y
        y = y * 0.9999999 + x
    return out_acc + jnp.sum(x[:8, :128])


def compute_block(slab_block, m_ref, out_acc):
    # slab_block [2, ROWS, L] int32 -> bf16 [128, 512] seed, then a chain
    # of MXU matmuls long enough to emulate the per-tile FFT load
    seed = slab_block[0, :64].astype(jnp.bfloat16).reshape(128, 1024)
    # MXU accumulators must be 32-bit on hardware: accumulate f32, cast
    # the chain value back to bf16 between links (same MXU load).
    x = jnp.dot(seed[:, :512], m_ref[:],
                preferred_element_type=jnp.float32)
    for _ in range(CH - 1):
        x = jnp.dot(x.astype(jnp.bfloat16), m_ref[:],
                    preferred_element_type=jnp.float32)
    return out_acc + jnp.sum(x)


def make_kernel(mode):
    def kernel(xa_ref, xb_ref, m_ref, out_ref, slab, acc, sems):
        g = pl.program_id(0)

        def copies(tt, slot):
            start = pl.multiple_of(tt * ROWS, 8)
            return [
                pltpu.make_async_copy(xa_ref.at[:, pl.ds(start, ROWS)],
                                      slab.at[slot, 0], sems.at[slot, 0]),
                pltpu.make_async_copy(xb_ref.at[:, pl.ds(start, ROWS)],
                                      slab.at[slot, 1], sems.at[slot, 1]),
            ]

        @pl.when(g == 0)
        def _():
            acc[0, 0] = 0.0
            if mode != "comp":
                for cp in copies(0, 0):
                    cp.start()

        if mode == "comp":
            acc[0, 0] = compute_block(slab[0, 0], m_ref, acc[0, 0])
        elif mode == "vcomp":
            acc[0, 0] = vpu_block(slab[0, 0], acc[0, 0])
        elif mode == "vdyn":
            buf = jax.lax.rem(g, 2)
            for cp in copies(g, buf):
                cp.wait()

            @pl.when(g + 1 < NT)
            def _():
                for cp in copies(g + 1, jax.lax.rem(g + 1, 2)):
                    cp.start()
            acc[0, 0] = vpu_block(slab[buf, 0], acc[0, 0])
        elif mode == "dma":
            @pl.when(g + 1 < NT)
            def _():
                for cp in copies(g + 1, jax.lax.rem(g + 1, 2)):
                    cp.start()
            for cp in copies(g, jax.lax.rem(g, 2)):
                cp.wait()
        elif mode == "dyn":
            buf = jax.lax.rem(g, 2)
            for cp in copies(g, buf):
                cp.wait()

            @pl.when(g + 1 < NT)
            def _():
                for cp in copies(g + 1, jax.lax.rem(g + 1, 2)):
                    cp.start()
            acc[0, 0] = compute_block(slab[buf, 0], m_ref, acc[0, 0])
        else:  # static: constant slot indices inside parity branches
            @pl.when(jax.lax.rem(g, 2) == 0)
            def _():
                for cp in copies(g, 0):
                    cp.wait()

                @pl.when(g + 1 < NT)
                def _():
                    for cp in copies(g + 1, 1):
                        cp.start()
                acc[0, 0] = compute_block(slab[0, 0], m_ref, acc[0, 0])

            @pl.when(jax.lax.rem(g, 2) == 1)
            def _():
                for cp in copies(g, 1):
                    cp.wait()

                @pl.when(g + 1 < NT)
                def _():
                    for cp in copies(g + 1, 0):
                        cp.start()
                acc[0, 0] = compute_block(slab[1, 0], m_ref, acc[0, 0])

        @pl.when(g == NT - 1)
        def _():
            out_ref[...] = jnp.full((8, 128), acc[0, 0], jnp.float32)

    return kernel


def run_mode(mode):
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.integers(-2**30, 2**30, size=(2, NT * ROWS, L),
                                  dtype=np.int64).astype(np.int32))
    xb = jnp.asarray(rng.integers(-2**30, 2**30, size=(2, NT * ROWS, L),
                                  dtype=np.int64).astype(np.int32))
    m = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32) * 0.01,
                    jnp.bfloat16)
    call = pl.pallas_call(
        make_kernel(mode),
        grid=(NT,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2, ROWS, L), jnp.int32),
            # scalar accumulator must live in SMEM: Mosaic rejects scalar
            # stores to VMEM on hardware (interpret mode doesn't enforce it)
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def run(xa, xb, m):
        return call(xa, xb, m)

    out = run(xa, xb, m)
    float(jnp.sum(out))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(xa, xb, m)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    nbytes = NT * 2 * 2 * ROWS * L * 4
    print(f"MODE={mode}: {dt*1e3:.3f} ms ({nbytes/dt/1e9:.0f} GB/s-equiv)",
          flush=True)
    return dt


if __name__ == "__main__":
    ts = {}
    for mode in ("dma", "comp", "dyn", "static", "vcomp", "vdyn"):
        ts[mode] = run_mode(mode)
    print(f"MXU chain: sum(dma,comp)={1e3*(ts['dma']+ts['comp']):.3f} ms  "
          f"max={1e3*max(ts['dma'], ts['comp']):.3f} ms  "
          f"dyn={1e3*ts['dyn']:.3f} ms", flush=True)
    print(f"VPU chain: sum(dma,vcomp)={1e3*(ts['dma']+ts['vcomp']):.3f} ms  "
          f"max={1e3*max(ts['dma'], ts['vcomp']):.3f} ms  "
          f"vdyn={1e3*ts['vdyn']:.3f} ms", flush=True)
    print("(vdyn ~= sum -> DMA VMEM writes contend with VPU operand "
          "traffic on the VMEM port; vdyn ~= max -> they overlap like "
          "the MXU chain)", flush=True)
