"""Standalone TPU probe: does DMA overlap compute in the fused kernel's
double-buffer pattern (ops/pfb_pallas._fx_kernel)?

Kernels over the SAME merged-layout copies ([2, 96, 2048] int32
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

VMEM-port legs (r4 §8g hypothesis — DMA VMEM writes vs VPU operand
traffic):

  vcomp    pure VPU/VMEM elementwise passes (no DMA)   -> T_vcomp
  vdyn     dyn pattern with the VPU body               -> T_vdyn

Structural-bisect legs (if BOTH chains overlap in isolation, what in
the production kernel serializes it?):

  dyn2d    dyn MXU body on a 2-D grid (KB, NT/KB) with a block-mapped
           VMEM output window accumulated ``+=`` every tile and swapped
           every KB steps — the production out_ref machinery
  dynmix   dyn with the production-shaped body: VPU tap/sum passes over
           the slab AND the MXU chain AND vreg-scale elementwise between
           dots (FIR + FFT + X in miniature)
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
# In-kernel repeat factor: the 1-chip tunnel costs ~1.4-2 ms PER DISPATCH
# (design.md §3), which swamps a ~0.4 ms kernel — every pre-r4 run of this
# probe (including the §8d 'dyn overlaps' readings) measured dispatch
# latency, not the kernel.  REPS re-walks the same NT tiles in one launch
# so kernel time ~= REPS * NT * tile_time >> the dispatch floor.
REPS = int(os.environ.get("REPS", "16"))


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


def mixed_block(slab_block, m_ref, out_acc):
    # Production-shaped body in miniature: FIR-like shifted VPU passes
    # over the slab + per-plane sum + the MXU chain with elementwise
    # (twiddle-like) ops between dots.
    x = slab_block[0].astype(jnp.float32)   # [ROWS, L]
    y = slab_block[1].astype(jnp.float32)
    fir = x[0:ROWS - 8] * 0.25
    for t in range(1, 4):
        fir = fir + x[t:ROWS - 8 + t] * (0.25 + 0.01 * t)
    s = jnp.sum(y[8:])
    seed = fir[:64].astype(jnp.bfloat16).reshape(128, 1024)
    z = jnp.dot(seed[:, :512], m_ref[:], preferred_element_type=jnp.float32)
    for _ in range(CH // 2 - 1):
        z = z * 1.0000001 + 0.0000001          # twiddle-like vreg pass
        z = jnp.dot(z.astype(jnp.bfloat16), m_ref[:],
                    preferred_element_type=jnp.float32)
    return out_acc + jnp.sum(z) + s


def make_2d_kernel():
    # dyn MXU body on a 2-D (KB, 4) grid with a block-mapped VMEM output
    # window accumulated += every tile and swapped every 4 tiles — the
    # production out_ref cadence (n_tiles = 4 at the flagship shape)
    nt2 = 4
    KB = NT * REPS // nt2

    def kernel(xa_ref, xb_ref, m_ref, out_ref, slab, acc, sems):
        k = pl.program_id(0)
        t = pl.program_id(1)
        g = k * nt2 + t
        total = NT * REPS

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
            for cp in copies(0, 0):
                cp.start()

        buf = jax.lax.rem(g, 2)
        for cp in copies(jax.lax.rem(g, NT), buf):
            cp.wait()

        @pl.when(g + 1 < total)
        def _():
            for cp in copies(jax.lax.rem(g + 1, NT), jax.lax.rem(g + 1, 2)):
                cp.start()
        acc[0, 0] = compute_block(slab[buf, 0], m_ref, acc[0, 0])
        part = jnp.full((8, 128), acc[0, 0], jnp.float32)

        @pl.when(t == 0)
        def _():
            out_ref[0] = part

        @pl.when(t != 0)
        def _():
            out_ref[0] += part

    return kernel, KB, nt2


def make_kernel(mode):
    def kernel(xa_ref, xb_ref, m_ref, out_ref, slab, acc, sems):
        g = pl.program_id(0)
        total = NT * REPS
        ta = jax.lax.rem(g, NT)      # this tile's data address
        na = jax.lax.rem(g + 1, NT)  # lookahead tile's address

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
            # pure-compute modes must not start copies: nothing ever waits
            # on them, and an outstanding DMA at kernel end is a hardware
            # error (vcomp crashed exactly this way on the first run)
            if mode not in ("comp", "vcomp", "mix"):
                for cp in copies(0, 0):
                    cp.start()

        if mode == "comp":
            acc[0, 0] = compute_block(slab[0, 0], m_ref, acc[0, 0])
        elif mode == "vcomp":
            acc[0, 0] = vpu_block(slab[0, 0], acc[0, 0])
        elif mode == "vdyn":
            buf = jax.lax.rem(g, 2)
            for cp in copies(ta, buf):
                cp.wait()

            @pl.when(g + 1 < total)
            def _():
                for cp in copies(na, jax.lax.rem(g + 1, 2)):
                    cp.start()
            acc[0, 0] = vpu_block(slab[buf, 0], acc[0, 0])
        elif mode == "dma":
            @pl.when(g + 1 < total)
            def _():
                for cp in copies(na, jax.lax.rem(g + 1, 2)):
                    cp.start()
            for cp in copies(ta, jax.lax.rem(g, 2)):
                cp.wait()
        elif mode == "dyn":
            buf = jax.lax.rem(g, 2)
            for cp in copies(ta, buf):
                cp.wait()

            @pl.when(g + 1 < total)
            def _():
                for cp in copies(na, jax.lax.rem(g + 1, 2)):
                    cp.start()
            acc[0, 0] = compute_block(slab[buf, 0], m_ref, acc[0, 0])
        elif mode == "mix":
            acc[0, 0] = mixed_block(slab[0, 0], m_ref, acc[0, 0])
        elif mode == "dynmix":
            buf = jax.lax.rem(g, 2)
            for cp in copies(ta, buf):
                cp.wait()

            @pl.when(g + 1 < total)
            def _():
                for cp in copies(na, jax.lax.rem(g + 1, 2)):
                    cp.start()
            acc[0, 0] = mixed_block(slab[buf, 0], m_ref, acc[0, 0])
        else:  # static: constant slot indices inside parity branches
            @pl.when(jax.lax.rem(g, 2) == 0)
            def _():
                for cp in copies(ta, 0):
                    cp.wait()

                @pl.when(g + 1 < total)
                def _():
                    for cp in copies(na, 1):
                        cp.start()
                acc[0, 0] = compute_block(slab[0, 0], m_ref, acc[0, 0])

            @pl.when(jax.lax.rem(g, 2) == 1)
            def _():
                for cp in copies(ta, 1):
                    cp.wait()

                @pl.when(g + 1 < total)
                def _():
                    for cp in copies(na, 0):
                        cp.start()
                acc[0, 0] = compute_block(slab[1, 0], m_ref, acc[0, 0])

        @pl.when(g == total - 1)
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
    scratch = [
        pltpu.VMEM((2, 2, 2, ROWS, L), jnp.int32),
        # scalar accumulator must live in SMEM: Mosaic rejects scalar
        # stores to VMEM on hardware (interpret mode doesn't enforce it)
        pltpu.SMEM((1, 1), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    interp = jax.default_backend() != "tpu"
    if mode == "dyn2d":
        kernel, KB, nt2 = make_2d_kernel()
        call = pl.pallas_call(
            kernel,
            grid=(KB, nt2),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 128), lambda k, t: (k, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((KB, 8, 128), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interp,
        )
    else:
        call = pl.pallas_call(
            make_kernel(mode),
            grid=(NT * REPS,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interp,
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
    nbytes = NT * REPS * 2 * 2 * ROWS * L * 4
    print(f"MODE={mode}: {dt*1e3:.3f} ms ({nbytes/dt/1e9:.0f} GB/s-equiv)",
          flush=True)
    return dt


if __name__ == "__main__":
    import sys
    modes = (sys.argv[1].split(",") if len(sys.argv) > 1 else
             ("dma", "comp", "dyn", "static", "vcomp", "vdyn",
              "mix", "dynmix", "dyn2d"))
    ts = {}
    for mode in modes:
        ts[mode] = run_mode(mode)

    def line(name, comp_key, dyn_key):
        if comp_key in ts and dyn_key in ts and "dma" in ts:
            print(f"{name}: sum(dma,{comp_key})="
                  f"{1e3*(ts['dma']+ts[comp_key]):.3f} ms  "
                  f"max={1e3*max(ts['dma'], ts[comp_key]):.3f} ms  "
                  f"{dyn_key}={1e3*ts[dyn_key]:.3f} ms", flush=True)

    line("MXU chain", "comp", "dyn")
    line("VPU chain", "vcomp", "vdyn")
    line("mixed body", "mix", "dynmix")
    if "dyn2d" in ts and "dyn" in ts:
        print(f"2-D grid + out window: dyn2d={1e3*ts['dyn2d']:.3f} ms "
              f"vs dyn={1e3*ts['dyn']:.3f} ms", flush=True)
    print("(X ~= sum -> that leg's compute serializes against the DMA; "
          "X ~= max -> overlaps)", flush=True)
