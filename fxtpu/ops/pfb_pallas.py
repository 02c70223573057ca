"""Fused F-stage Pallas kernel: DC-subtract + PFB FIR + 2-stage MXU FFT.

The XLA path (fxtpu.ops.planes.spectrometer_planes) round-trips HBM between
DC removal, the tap FIR, each FFT matmul stage, and the output transpose —
~6 passes over the block.  This kernel keeps a tile of PFB frames resident
in VMEM and does all of it in ONE read + ONE write of HBM:

  grid (batch, frame-tiles); per program:
    1. the input row slab [2(planes), tile+pad, nbins] arrives by async
       copy, double-buffered across grid steps (tile t's compute overlaps
       tile t+1's DMA); rows before the block start come from the carried
       tap history,
    2. subtract the per-channel mean (DC spike, reference behavior at
       /root/reference/effex/effex.py:393-395),
    3. windowed FIR across taps (VPU),
    4. FFT as two balanced DFT-matrix stages on the MXU (nbins = n1*n2,
       n1 ~ n2 ~ sqrt(nbins), both plain 2-D matmuls at HIGH precision)
       with in-VMEM twiddle and transposes,
    5. write the spectra tile.

Contract matches dc_remove_planes + spectrometer_planes exactly: carried
history is the DC-corrected input tail (zeros at stream start).

Measured on the one real TPU v5e (2ch x 2^22 x 4096 bins, 8-block scan):
this kernel reaches 2.75 Gsamp/s vs 6.23 Gsamp/s for the unfused XLA path
— Mosaic's HIGHEST-precision (6-pass) dots on the small stage-1 matmuls
dominate, and XLA's own fusion already keeps the elementwise stages cheap.
It therefore ships OPT-IN (FxEngine(fused=True)); the engine default is the
XLA path.  Kept because (a) it is the template for future fused F-stage
work (bf16 split-precision stage matmuls would roughly double it) and
(b) backends with cheaper f32 MXU passes will flip the comparison.

Mosaic constraints honored: DMA row-slices are 8-aligned (sizes and
starts), and no shape cast collapses a non-128-lane trailing dim (the
final [S, n2, n1] -> [S, nbins] reshape happens outside the kernel, where
it is a free row-major relabel).

Only valid for smooth nbins (n1, n2 <= 128) and ntaps >= 2 with
tile >= halo; the engine falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fxtpu.ops.cfft import _dft_mats, _twiddle
from fxtpu.ops.cplx import Cplx

# Mosaic supports only DEFAULT (1-pass bf16) or HIGHEST (6-pass, ~f32)
# dot precision in-kernel; numerics need better than bf16.
_MM = dict(preferred_element_type=jnp.float32,
           precision=jax.lax.Precision.HIGHEST)


def _kernel_factor(n: int):
    """Factor pair (n1, n2=128): Mosaic in-kernel reshapes must keep a
    128-lane minor dim, so the stage-2 length is pinned to one full lane
    tile and stage 1 takes the rest (must itself be <= 128)."""
    if n % 128 == 0 and 2 <= n // 128 <= 128:
        return n // 128, 128
    return None


def supported(nbins: int, ntaps: int, s_rows: int) -> bool:
    """True when the fused kernel can handle this shape."""
    if ntaps < 2:
        return False
    if _kernel_factor(nbins) is None:
        return False
    return _pick_tile(s_rows, ntaps) is not None


def _halo_pad(ntaps: int) -> int:
    """History rows padded up to the 8-row sublane tiling so every DMA
    slice is tile-aligned."""
    return ((ntaps - 1 + 7) // 8) * 8


def _pick_tile(s_rows: int, ntaps: int, want: int = 16):
    """Largest 8-multiple tile <= want dividing s_rows with
    tile >= halo_pad (so tile t>0 can read its full context slab).
    want=16 keeps the double-buffered slab + HIGHEST-precision matmul
    intermediates inside the 16 MB VMEM budget at nbins=4096; deep-tap
    PFBs raise it to the halo size."""
    pad = _halo_pad(ntaps)
    want = max(want, pad)
    for tile in range(min(want, s_rows), 0, -1):
        if s_rows % tile == 0 and tile % 8 == 0 and tile >= pad:
            return tile
    return None


def _kernel(x_ref, hist_ref, mean_ref, w_ref, c1_ref, s1_ref, twc_ref,
            tws_ref, c2_ref, s2_ref, out_ref, slab, sems,
            *, tile: int, ntaps: int, nbins: int, n1: int, n2: int,
            n_tiles: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    halo = ntaps - 1
    pad = _halo_pad(ntaps)   # 8-aligned history region at the slab front
    buf = jax.lax.rem(t, 2)

    def tile_copy(tt, slot):
        """The (aligned) slab copy for tile tt>0 into buffer `slot`."""
        start = pl.multiple_of(tt * tile - pad, 8)
        return pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(start, pad + tile)], slab.at[slot],
            sems.at[slot])

    # ---- 1. slab DMA, double-buffered across grid iterations -------------
    @pl.when(t == 0)
    def _():
        # first tile: synchronous history + head rows into buffer 0
        cp = pltpu.make_async_copy(hist_ref.at[b], slab.at[0, :, :pad],
                                   sems.at[0])
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(x_ref.at[b, :, pl.ds(0, tile)],
                                    slab.at[0, :, pad:], sems.at[0])
        cp2.start()
        cp2.wait()

    if n_tiles > 1:
        @pl.when(t + 1 < n_tiles)
        def _():
            # prefetch the NEXT tile's slab while this tile computes
            tile_copy(t + 1, jax.lax.rem(t + 1, 2)).start()

        @pl.when(t != 0)
        def _():
            tile_copy(t, buf).wait()

    # ---- 2. DC-spike subtraction (scalar means from SMEM) -----------------
    # Current-block rows get the mean removed.  The first tile's pad rows
    # are carried history, which is already in corrected form (zeros at
    # stream start) — exempt those; later tiles' pad rows are raw data.
    m_re = mean_ref[b, 0]
    m_im = mean_ref[b, 1]
    row_is_data = (jax.lax.broadcasted_iota(
        jnp.int32, (tile + pad, 1), 0) >= pad).astype(jnp.float32)
    correct = jnp.where(t == 0, row_is_data, jnp.ones_like(row_is_data))
    plane_re = slab[buf, 0] - m_re * correct   # [tile+pad, nbins]
    plane_im = slab[buf, 1] - m_im * correct

    # ---- 3. windowed FIR across taps (VPU) ---------------------------------
    # frame f consumes slab rows [pad-halo+f .. pad-halo+f+ntaps-1]
    off = pad - halo
    fir_re = w_ref[0] * plane_re[off:off + tile]
    fir_im = w_ref[0] * plane_im[off:off + tile]
    for tap in range(1, ntaps):
        fir_re = fir_re + w_ref[tap] * plane_re[off + tap:off + tap + tile]
        fir_im = fir_im + w_ref[tap] * plane_im[off + tap:off + tap + tile]

    # ---- 4. FFT: i = i1*n2 + i2; stage1 contracts i1, stage2 i2 ----------
    # [tile, n1, n2] -> [tile, n2, n1]: put the contraction on the lanes
    xr = jnp.swapaxes(fir_re.reshape(tile, n1, n2), 1, 2).reshape(
        tile * n2, n1)
    xi = jnp.swapaxes(fir_im.reshape(tile, n1, n2), 1, 2).reshape(
        tile * n2, n1)
    c1 = c1_ref[:]
    s1 = s1_ref[:]
    # DFT matrices are symmetric, so x @ C is the stage-1 DFT over i1
    ar = jnp.dot(xr, c1, **_MM) - jnp.dot(xi, s1, **_MM)   # [tile*n2, k1]
    ai = jnp.dot(xr, s1, **_MM) + jnp.dot(xi, c1, **_MM)
    # twiddle W_N^{k1*i2}, arranged [i2, k1]
    ar3 = ar.reshape(tile, n2, n1)
    ai3 = ai.reshape(tile, n2, n1)
    br = ar3 * twc_ref[:] - ai3 * tws_ref[:]
    bi = ar3 * tws_ref[:] + ai3 * twc_ref[:]
    # stage2 contracts i2: [tile, i2, k1] -> [tile, k1, i2]
    br = jnp.swapaxes(br, 1, 2).reshape(tile * n1, n2)
    bi = jnp.swapaxes(bi, 1, 2).reshape(tile * n1, n2)
    c2 = c2_ref[:]
    s2 = s2_ref[:]
    cr = jnp.dot(br, c2, **_MM) - jnp.dot(bi, s2, **_MM)   # [tile*n1, k2]
    ci = jnp.dot(br, s2, **_MM) + jnp.dot(bi, c2, **_MM)
    # X[k2*n1 + k1] = c[k1, k2]: emit [tile, k2, k1]; the final collapse to
    # [tile, nbins] is a free row-major reshape done outside the kernel
    # (Mosaic cannot shape-cast a non-128-lane trailing dim into nbins).
    out_ref[0, 0] = jnp.swapaxes(cr.reshape(tile, n1, n2), 1, 2)
    out_ref[0, 1] = jnp.swapaxes(ci.reshape(tile, n1, n2), 1, 2)


@functools.partial(jax.jit, static_argnames=("nbins", "tile"))
def _pfb_fft_call(x_stacked, hist_stacked, means, w2d, nbins: int,
                  tile: int):
    # interpret mode on CPU so the whole suite stays hardware-free
    interpret = jax.default_backend() != "tpu"
    batch, _, s_rows, _ = x_stacked.shape
    ntaps = w2d.shape[0]
    n1, n2 = _kernel_factor(nbins)
    c1, s1 = _dft_mats(n1, False)
    c2, s2 = _dft_mats(n2, False)
    twc, tws = _twiddle(n1, n2, False)   # [n1(k1), n2(i2)]
    grid = (batch, s_rows // tile)

    return pl.pallas_call(
        functools.partial(_kernel, tile=tile, ntaps=ntaps, nbins=nbins,
                          n1=n1, n2=n2, n_tiles=s_rows // tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),    # history (manual DMA)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # means [batch, 2]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # window [ntaps, nbins]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c1 [n1, n1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # twiddle cos [n2, n1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # twiddle sin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # c2 [n2, n2]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # s2
        ],
        out_specs=pl.BlockSpec(
            (1, 2, tile, n2, n1), lambda b, t: (b, 0, t, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 2, s_rows, n2, n1),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 2, tile + _halo_pad(ntaps), nbins), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_stacked, hist_stacked, means, w2d,
      jnp.asarray(c1), jnp.asarray(s1),
      jnp.asarray(np.ascontiguousarray(twc.T)),
      jnp.asarray(np.ascontiguousarray(tws.T)),
      jnp.asarray(c2), jnp.asarray(s2))


def spectrometer_pallas(x: Cplx, w2d, nbins: int, history: Cplx):
    """Fused dc_remove + spectrometer: ``x [nch, nsamp]`` ->
    (spectra [nch, S, nbins], new_history).  ``history`` is the previous
    block's DC-corrected tail, identical to the unfused planes path."""
    nch, nsamp = x.shape
    ntaps = int(w2d.shape[0])
    s_rows = nsamp // nbins
    tile = _pick_tile(s_rows, ntaps)
    if tile is None:
        raise ValueError(f"unsupported shape: S={s_rows}, ntaps={ntaps}")
    means = jnp.stack([jnp.mean(x.re, axis=-1),
                       jnp.mean(x.im, axis=-1)], axis=-1)  # [nch, 2]
    rows_re = x.re[:, : s_rows * nbins].reshape(nch, s_rows, nbins)
    rows_im = x.im[:, : s_rows * nbins].reshape(nch, s_rows, nbins)
    x_stacked = jnp.stack([rows_re, rows_im], axis=1)  # [nch, 2, S, nbins]
    # history padded to the 8-aligned slab front: [nch, 2, pad, nbins]
    pad = _halo_pad(ntaps)
    hist = jnp.stack([history.re, history.im], axis=1).astype(jnp.float32)
    hist = jnp.pad(hist, ((0, 0), (0, 0), (pad - (ntaps - 1), 0), (0, 0)))
    out = _pfb_fft_call(x_stacked.astype(jnp.float32), hist,
                        means.astype(jnp.float32),
                        jnp.asarray(w2d, jnp.float32), nbins, tile)
    # [nch, 2, S, n2, n1] -> [nch, 2, S, nbins]: contiguous, free reshape
    out = out.reshape(nch, 2, s_rows, nbins)
    spec = Cplx(out[:, 0], out[:, 1])
    # history carried forward is the DC-corrected tail (planes-path parity)
    new_hist = Cplx(rows_re[:, -(ntaps - 1):] - means[:, None, None, 0],
                    rows_im[:, -(ntaps - 1):] - means[:, None, None, 1])
    return spec, new_hist
