"""Fused Pallas kernels for the FX hot path.

Two kernels live here:

* **fx (production, engine default on TPU)** — `fx_pallas_raw_multi` /
  `_fx_kernel`: the ENTIRE per-block device pipeline (DC-subtract, PFB
  FIR, 2-stage MXU FFT, X-stage cross-power accumulation) for a whole
  K-block dispatch in ONE kernel launch, grid (K, frame-tiles).  Spectra
  never touch HBM; the tap history crosses block boundaries through VMEM
  scratch; total HBM traffic ~= reading the input once (+ the mean pass).
  Measured on TPU v5e at the flagship 2ch/4096-bin shape: **18.6 GS/s**
  through the full engine step vs 10.2 GS/s for the unfused XLA path.
  The design points that got it there (each measured, see docs/design.md):

    1. FSTC rotation COMMUTES with frame integration
       (sum_f (rot_p s_p)(rot_q s_q)* = rot_p rot_q* sum_f s_p s_q*),
       so the kernel accumulates RAW cross power and rotation/fftshift/
       continuum — and the post-hoc DC correction — act on the tiny
       [nbl, nbins] visibility outside;
    2. Mosaic dots are DEFAULT (1-pass bf16) or HIGHEST (6-pass) only —
       every f32 matmul here is a manual 3-pass bf16 SPLIT
       (x ~ hi + lo; x@M ~ hi@Mh + hi@Ml + lo@Mh, f32 accumulation),
       numerically ~ XLA HIGH (3.5e-5 vs unfused on-chip) at half the
       HIGHEST cost;
    3. the FFT stages are TRANSPOSE-FREE: stage 1 contracts the major
       digit with per-frame LEFT matmuls ([[C,-S],[S,C]] @ [xr; xi],
       [2n1,2n1]@[2n1,n2]) and stage 2 contracts the lanes with one
       combined RIGHT matmul ([br | bi] @ [[C,S],[-S,C]]); the resulting
       bin permutation (b = k1 + n1*k2) is undone on the tiny output
       (in-kernel [tile, n1, n2] transposes were ~45% of kernel time);
    4. K lives in the GRID, not a lax.scan — a scan's per-iteration input
       dynamic-slice costs a full HBM copy of each block;
    5. inputs arrive PRE-FRAMED [K, nch, S, nbins]: reframing a
       device-resident sample axis is a tiled-layout change costing a
       full HBM round trip, while the host reshape before upload is free.

  NOTE (this backend): jax.block_until_ready does NOT synchronize Pallas
  outputs through the remote-device tunnel — benchmarks must force a
  readback (see bench.py).

* **spectrometer (legacy, opt-in research kernel)** — `spectrometer_pallas`
  / `_kernel`: the earlier F-stage-only fusion (DC+FIR+FFT, spectra
  written to HBM) with HIGHEST-precision dots and in-kernel transposes.
  Measured SLOWER than the XLA path (2.75 vs 6.23 GS/s at 2^22/8-scan);
  kept as the stepping stone and CPU-interpret test target.

Contract matches dc_remove_planes + spectrometer_planes exactly: carried
history is the DC-corrected input tail (zeros at stream start).  Mosaic
constraints honored: DMA row-slices are 8-aligned, and no shape cast
collapses a non-128-lane trailing dim.  Only valid for nbins = n1*128
(n1 <= 128) and ntaps >= 2 with tile >= halo_pad; the engine falls back
to the XLA path otherwise (`supported`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fxtpu.ops.cfft import _dft_mats, _twiddle
from fxtpu.ops.cplx import Cplx, cmul, cmulconj, conj as cconj

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


#: The fused kernel packs per-channel re/im sample sums 2-per-channel into
#: the 128 lanes of its `sout` accumulator (see _fx_kernel), so it can
#: serve at most 64 channels.
MAX_FUSED_NCHAN = 64


def supported(nbins: int, ntaps: int, s_rows: int, nch: int = 2) -> bool:
    """True when the fused kernel can handle this shape."""
    if ntaps < 2:
        return False
    if nch > MAX_FUSED_NCHAN:
        return False
    if _kernel_factor(nbins) is None:
        return False
    return _pick_tile(s_rows, ntaps) is not None


def _halo_pad(ntaps: int) -> int:
    """History rows padded up to the 8-row sublane tiling so every DMA
    slice is tile-aligned."""
    return ((ntaps - 1 + 7) // 8) * 8


def _pick_tile(s_rows: int, ntaps: int, want: int = 16,
               int8: bool = False):
    """Largest 8-multiple tile <= want dividing s_rows with
    tile >= halo_pad (so tile t>0 can read its full context slab).
    want=16 keeps the double-buffered slab + HIGHEST-precision matmul
    intermediates inside the 16 MB VMEM budget at nbins=4096 (the r4
    TPU sweep confirmed it optimal at the flagship shape: tile 16/32/64
    = 23.43/22.62/19.70 GS/s — bigger tiles LOSE to VMEM pressure
    despite fewer descriptors).  Deep-tap PFBs raise it — every tile
    re-reads `pad` halo rows, so tile=2*pad is 1.5x HBM read
    amplification, 4*pad is 1.25x.  The f32 slab can only afford 2*pad;
    the int8 slab (bytes /4) takes 4*pad, measured +5.7% at
    wideband_int8 (13.19 -> 13.94 GS/s, r4 FXTPU_FUSED_TILE sweep)."""
    pad = _halo_pad(ntaps)
    if pad > 16:
        want = max(want, (4 if int8 else 2) * pad)
    else:
        want = max(want, pad)
    import os as _os
    want = int(_os.environ.get("FXTPU_FUSED_TILE", "0")) or want
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
        # (ntaps == 1 has no history region: pad == 0, skip the 0-row copy)
        if pad:
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
            pl.BlockSpec(memory_space=pl.ANY),    # x (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),    # history (manual DMA)
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


# ===========================================================================
# Full fused FX step kernel: DC + FIR + 2-stage FFT + X-accumulate in VMEM
# ===========================================================================
#
# Two ideas make this faster than both the XLA path and the F-stage-only
# kernel above:
#
#   1. The FSTC phase rotation is constant across the PFB frames of a
#      block, so it COMMUTES with the frame integration:
#        sum_f (rot_p spec_p) conj(rot_q spec_q)
#          = rot_p conj(rot_q) * sum_f spec_p conj(spec_q).
#      The kernel therefore accumulates RAW cross power and never writes
#      spectra to HBM at all — the rotation, bin unpermute, fftshift and
#      continuum reduce all act on the tiny [nbl, nbins] visibility
#      outside.  HBM traffic ~= reading the input once (plus the separate
#      mean pass), vs ~10 passes for the XLA path (see docs/design.md §3).
#
#   2. Mosaic dots support only DEFAULT (1-pass bf16) or HIGHEST (6-pass)
#      precision — HIGHEST is what made the F-stage kernel lose.  Here
#      every f32 matmul is a manual 3-pass bf16 SPLIT (x ~ hi + lo;
#      x@M ~ hi@Mh + hi@Ml + lo@Mh, f32 accumulation), numerically
#      equivalent to XLA's HIGH — the same precision the unfused path
#      runs at — at half the HIGHEST cost.


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x (3-pass dot splitting)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# ---------------------------------------------------------------------------
# Deep-tap FIR as a banded MXU matmul (the wideband fix).
#
# Measured on v5e at the 32-tap/8192-bin wideband shape, the in-kernel FIR
# tap loop ALONE runs at 4.9 GS/s — slower than the whole unfused XLA path
# (7.3) — because every tap is a sublane-misaligned [tile, nbins] VMEM
# slice (32 shifted reads + rotates per plane).  But the PFB window matrix
# w[ntaps, nbins] is a SMOOTH windowed-sinc sampled on a grid, so its SVD
# collapses: rank 8 reproduces the 32-tap/8192-bin window to 2.3e-8 and
# rank 12 to 1.6e-13 (machine precision).  Writing w = sum_k u_k v_k^T:
#
#   fir[f, b] = sum_t w[t, b] x[f+t, b]
#             = sum_k v_k[b] * (sum_t u_k[t] x[f+t, b])
#
# and each inner term is a convolution with SCALAR taps u_k — expressible
# as ONE banded matmul B @ slab with B[k*tile+f, off+f+t] = u_k[t]:
# [r*tile, tile+pad] @ [tile+pad, nbins] on the MXU, reading the slab
# aligned exactly once, followed by r pointwise v_k multiply-adds on the
# VPU.  The 2*ntaps VPU ops/sample/plane become ~2r ops + MXU flops that
# are a rounding error against the FFT stages.
# ---------------------------------------------------------------------------

#: Use the SVD form at or above this many taps ('auto'); below it the
#: direct tap loop is cheap and exact.  Threshold measured on v5e at
#: 16 taps: SVD 9.06 vs direct 7.83 GS/s at 8192 bins (decisive win),
#: 10.27 vs 10.39 at 4096 bins (a wash) — 16 is the right cutover.
SVD_FIR_MIN_TAPS = 16

#: Keep singular vectors down to this relative magnitude.  1e-5 keeps
#: rank 6 at 32 taps/8192 bins with the window perturbation ~6x UNDER
#: the pipeline's measured 3.1e-5 precision floor (HIGH mode), i.e.
#: invisible end to end — and the conv cost is linear in rank.  The r4
#: TPU A/B made it the default: wideband f32 9.29 -> 11.10 GS/s
#: (FXTPU_SVD_TOL=1e-7 restores the old two-decades-margin tier, 0
#: keeps full rank).
_SVD_TOL = 1e-5

#: Precision-tier threshold for the per-rank conv pass count
#: (FXTPU_SVD_TIER, default on).  The banded conv's cost is
#: rows x passes, and each rank's 3-pass split corrects bf16 rounding
#: of a term whose magnitude is sigma_k — so a TAIL rank with
#: sigma_k/sigma_1 < 2e-3 can run a SINGLE bf16 dot while its rounding
#: contribution (~sigma_k/sigma_1 * 2^-8 ~= 8e-6 at the threshold)
#: stays under the pipeline's 3.1e-5 precision floor.  At the
#: production wideband window (32 taps, rank 6: ratios 1, 0.52, 0.108,
#: 1.7e-2, 1.3e-3, 1.4e-4) this keeps ranks 1-4 at 3-pass and drops
#: ranks 5-6 to 1-pass: conv row-passes 144 -> 112 f32, 96 -> 80 int8.
_SVD_TIER_THRESH = 2e-3


def _svd_fir_factors(w_key, nbins: int, tol: float = _SVD_TOL):
    """(u [ntaps, r], v [r, nbins], ratios [r]) f64 with u @ v ~= w to
    ``tol`` (ratios = sigma_k/sigma_1, for the precision tiering), or
    None when the factorization wouldn't beat the direct loop.

    The default tol (see _SVD_TOL) keeps the window perturbation below
    the f32 pipeline's 3.1e-5 precision floor.  The int8-native path
    shares it: its accuracy floor is the 8-bit quantization itself
    (~1e-3 SNR-dependent), so a 1e-5 window perturbation is invisible
    there.

    FXTPU_FUSED_BANDED=1 (trace-time A/B knob) skips the min-taps and
    full-rank gates so SHALLOW windows route through the banded MXU
    conv at full rank (exact): the direct tap loop's shifted VPU slab
    reads are the flagship compute wall (design.md §8h), and the band
    moves them onto the MXU."""
    import os as _os
    return _svd_fir_factors_cached(
        w_key, nbins, tol,
        _os.environ.get("FXTPU_FUSED_BANDED", "") == "1")


@functools.lru_cache(maxsize=32)
def _svd_fir_factors_cached(w_key, nbins: int, tol: float, force: bool):
    w2d = np.asarray(w_key, np.float64).reshape(-1, nbins)
    ntaps = w2d.shape[0]
    if ntaps < SVD_FIR_MIN_TAPS and not force:
        return None
    uu, ss, vt = np.linalg.svd(w2d, full_matrices=False)
    r = max(int(np.sum(ss > tol * ss[0])), 1)
    if r >= ntaps and not force:
        return None  # full rank: nothing to gain
    r = min(r, ntaps)
    return uu[:, :r] * ss[:r], vt[:r], tuple((ss[:r] / ss[0]).tolist())


def _stage1_group(n1: int, tile: int) -> int:
    """Frames batched per stage-1 left matmul.  n1 <= 32 (flagship):
    per-frame dots are already efficient and the lane concats cost more
    than they save -> 1.  n1 >= 64 (wideband): the [2n1, 2n1] dots are
    latency-bound at n2=128 lanes, so group frames onto the lanes."""
    if n1 < 64:
        return 1
    for g in (8, 4, 2):
        if tile % g == 0:
            return g
    return 1


#: Output rows per banded-matmul chunk.  Chunking at the 8-row sublane
#: tile keeps the contraction K = pad + 8 (vs tile + pad for a monolithic
#: band — 1.6x fewer flops at tile=32/ntaps=32 since the band is only
#: ntaps wide), every slab window slice 8-aligned, and the live conv
#: output at [r*8, nbins] instead of [r*tile, nbins].
_SVD_SUB = 8


def _svd_fir_band(u: np.ndarray, pad: int, ntaps: int,
                  sub: int = _SVD_SUB):
    """The stacked banded matrix B [r*sub, pad+sub] (f32): row k*sub+f
    convolves window rows [f+off, f+off+ntaps) with u[:, k] — the SAME
    matrix serves every 8-row chunk of every tile."""
    r = u.shape[1]
    off = pad - (ntaps - 1)
    band = np.zeros((r * sub, pad + sub), np.float32)
    for k in range(r):
        for f in range(sub):
            band[k * sub + f, off + f: off + f + ntaps] = u[:, k]
    return band


def _unpack_i8(words, dtype):
    """Packed int32 words -> the int8 plane they carry, [rows, 4*nb4].

    Word L of a packed row holds bins {k*nb4 + L : k in 0..3} in its 4
    bytes (byte k = bin-quarter k; see pack_int8_planes).  DMA cost on
    this hardware scales with ELEMENT count, not bytes (measured v5e:
    f32 218 GB/s vs int8 51 GB/s at identical element counts), so int8
    planes travel as 4x fewer int32 words and unpack here on the VPU:
    two shifts sign-extend each byte, and a lane-concat of the four
    contiguous bin-quarters rebuilds natural bin order."""
    qs = [jax.lax.shift_right_arithmetic(
        jnp.left_shift(words, 24 - 8 * k), 24).astype(dtype)
        for k in range(4)]
    return jnp.concatenate(qs, axis=-1)


def pack_int8_planes(a: np.ndarray) -> np.ndarray:
    """HOST-side pack: int8 ``[..., nbins]`` -> int32 ``[..., nbins//4]``
    with word L byte k = bin ``k*(nbins//4) + L`` (little-endian view, so
    byte 0 is the low byte — matching _unpack_i8's shift order)."""
    nb = a.shape[-1]
    assert nb % 4 == 0, nb
    q = a.reshape(*a.shape[:-1], 4, nb // 4)
    q = np.ascontiguousarray(np.moveaxis(q, -2, -1))   # [..., nb4, 4]
    return q.view(np.int32)[..., 0]


def _dot3(x_hi, x_lo, m_hi, m_lo):
    """x @ m at ~HIGH precision from bf16 splits, f32 accumulation."""
    kw = dict(preferred_element_type=jnp.float32)
    return (jnp.dot(x_hi, m_hi, **kw) + jnp.dot(x_hi, m_lo, **kw)
            + jnp.dot(x_lo, m_hi, **kw))


def _cdot3(xr, xi, mc_hi, mc_lo, ms_hi, ms_lo):
    """Complex (xr + j xi) @ (C + j S) via split dots -> (re, im) f32."""
    xr_hi, xr_lo = _split_bf16(xr)
    xi_hi, xi_lo = _split_bf16(xi)
    out_re = _dot3(xr_hi, xr_lo, mc_hi, mc_lo) \
        - _dot3(xi_hi, xi_lo, ms_hi, ms_lo)
    out_im = _dot3(xr_hi, xr_lo, ms_hi, ms_lo) \
        + _dot3(xi_hi, xi_lo, mc_hi, mc_lo)
    return out_re, out_im
def _fx_kernel(xre_ref, xim_ref, hist_ref, w_ref, m1h_ref,
               m1l_ref, twc_ref, tws_ref, m2h_ref, m2l_ref,
               dare_ref, daim_ref,
               *rest,
               tile: int, ntaps: int, n1: int, n2: int,
               n_tiles: int, nch: int, k_blocks: int, pairs,
               svd_r: int = 0, svd_lead: int = 0, g1: int = 1,
               int8_in: bool = False, retile_stack: bool = False,
               nbuf: int = 2, split_dma: bool = False,
               static_slot: bool = False, one_pass: bool = False,
               xtra: int = 0, local_halo: bool = False, rs: int = 1):
    """Grid (K, n_tiles), sequential.  Per program: DMA one slab of PFB
    rows (double-buffered, prefetching the NEXT program's slab), FIR,
    transpose-free 2-stage split-bf16 FFT, and accumulate per block.

    Input layout: the x planes arrive MERGED over blocks —
    ``[nch, k_blocks * s_rows, lanes]`` — so every tile (including each
    block's first) is ONE uniform contiguous async copy per plane
    spanning ``pad + tile`` rows: block k's halo rows ARE the preceding
    rows of the merged stream (measured on v5e: the per-(k, tile)
    strided descriptors of the old ``[K, nch, S, L]`` layout ran the
    input DMA ~4x under the contiguous-copy rate).  Only the global
    first tile (g == 0) differs: its front comes from the stream
    history.  The slab is ``[slot, plane, ch, rows, lanes]`` — plane
    outermost keeps each copy's DESTINATION contiguous too.

    Per block the kernel accumulates:

      * raw cross power per baseline           (out_ref  [1, nbl, 2, n1, n2])
      * per-channel spectral sums over frames  (tout_ref [1, nch, 2, n1, n2])
      * the first-halo frames' spectra CONTRACTED against the dA window
        constants: GJ_c = sum_j spec_c[j] * conj(dA[j])
        (uout_ref [1, nch, 2, n1, n2], captured at t==0 — emitting the
        contraction instead of the raw [halo, nbins] frames keeps this
        output halo-times smaller and deletes the multi-MB XLA post-pass
        that used to consume it; dare/daim are conj-ready planes in the
        kernel's permuted [halo, n1, n2] layout)
      * per-channel raw sample sums            (sout_ref [1, 8, 128]:
        row 0, lane 2c / 2c+1 = re / im sum)

    which is EVERYTHING the caller needs to apply the DC-spike correction
    post-hoc (see _dc_correct) — so the block mean no longer gates the
    kernel and the input is read exactly once.  Tap history crosses block
    boundaries through the `hist_s` VMEM scratch (the RAW tail; corrected
    outside before it leaves as the step's history output) — no HBM round
    trip and no lax.scan (whose per-iteration input dynamic-slice costs a
    full HBM copy of the block).

    ``svd_r > 0`` switches the FIR from the direct tap loop to the
    rank-``svd_r`` banded-matmul form (see the SVD-FIR block comment
    above): three extra refs (band hi/lo, v) precede the outputs.

    ``int8_in`` (requires svd_r) is the int8-NATIVE mode: the slab and
    the x/hist refs are int8 (DMA bytes / 4, VMEM / 4), the conv runs
    2-pass (int8 is bf16-exact, so the data needs no lo split; the
    dequant step folds into v), and the history contract changes to the
    RAW previous-block tail: block k's first tile loads block k-1's raw
    tail rows straight from HBM (stream start loads hist_ref), and the
    mean correction for those rows happens post-hoc via the mu_prev
    terms of _dc_correct.  hist_s / hout and the last-tile correction
    are unused (the caller slices the raw tail from its own input).

    ``static_slot`` (FXTPU_FUSED_STATIC_SLOT=1) replaces the dynamic
    ``g % nbuf`` slab indexing with one specialized branch per slot (see
    the dispatch at the bottom) — an A/B knob for probing whether Mosaic
    serializes the DMA/compute overlap on dynamically-indexed slots.

    Debug-only: FXTPU_FUSED_ABLATE (read at trace time; comma-separable)
    truncates the per-tile pipeline for localizing kernel time on
    hardware (results are wrong by design):

      dmapure   true DMA floor — wait the slab copies, touch one vreg
                per plane, skip EVERY downstream stage (the old 'dma'
                bucket still ran the sample sums + accumulators + X on
                the raw planes, so it overstated the DMA share)
      dma       raw planes through the accumulate/X machinery (no
                FIR/FFT); dma0 additionally skips the int8 unpack
      fir/fft1  truncate after that compute stage
      nox       composable: skip the X-stage products (the per-pair
                multiply+reduce) while tout keeps every frame's FFT
                live — 'full minus nox' exposes the X cost; 'dma,nox'
                exposes the accumulator machinery without X
      dmax2     composable IN-SITU overlap test: each tile DMAs tile
                extra rows (2x the input DMA) while compute is
                unchanged — if the step time stays ~flat the input DMA
                was overlapping compute; if it grows by the extra DMA
                time, the production pipeline is serial."""
    import os as _os
    _abl = frozenset(filter(None,
                            _os.environ.get("FXTPU_FUSED_ABLATE",
                                            "").split(",")))
    if svd_r:
        (bh_ref, bl_ref, v_ref, out_ref, tout_ref, uout_ref, sout_ref,
         hout_ref, slab, hist_s, sums_s, tail_s, sems) = rest
    else:
        (out_ref, tout_ref, uout_ref, sout_ref, hout_ref,
         slab, hist_s, sums_s, tail_s, sems) = rest
    k = pl.program_id(0)
    t = pl.program_id(1)
    g = k * n_tiles + t
    total = k_blocks * n_tiles
    halo = ntaps - 1
    pad = _halo_pad(ntaps)
    buf = jax.lax.rem(g, nbuf)
    s_rows = n_tiles * tile
    # xtra > 0 = the dmax2 in-situ overlap test: DMA `tile` extra rows
    # per tile (slab sized to match in _fx_call); compute reads only the
    # normal window

    def tile_copies(kk, tt, slot):
        # rows [kk*s_rows + tt*tile - pad, +(pad+tile)) of the MERGED
        # [nch, K*S, lanes] stream -> the whole slab slot: one contiguous
        # copy per plane, halo included (a block's halo rows are simply
        # the preceding merged rows — the previous block's raw tail at
        # tt == 0).  Valid for every g > 0 (tile >= pad guarantees a
        # non-negative start); g == 0's front comes from hist instead.
        # split_dma issues one DMA per (channel, plane): more descriptors
        # in flight for shapes where one stream can't reach HBM bandwidth.
        # FXTPU_FUSED_LOCAL_HALO=1: DMA only the tile's own data rows
        # (into the slab data region); the pad front is filled from the
        # carried tail scratch instead of re-reading those rows from HBM
        # (1.5x read amplification at tile = 2*pad)
        head = 0 if local_halo else pad
        raw = kk * s_rows + tt * tile - head
        if xtra:
            # clamp so the widened read stays in bounds (timing-only)
            raw = jnp.minimum(raw, k_blocks * s_rows - (head + tile + xtra))
        # rs > 1 = PRETILED layout: every sample row is rs physical
        # [*, nbins/rs] sub-rows (same HBM bytes — see _fx_call); row
        # indices scale, contiguity is untouched
        start = pl.multiple_of(raw * rs, 8)
        span = (head + tile + xtra) * rs
        dst0 = (pad - head) * rs
        if split_dma:
            return [
                pltpu.make_async_copy(
                    (xre_ref if p == 0 else xim_ref
                     ).at[c, pl.ds(start, span)],
                    slab.at[slot, p, c, pl.ds(dst0, span)],
                    sems.at[slot, 2 * c + p])
                for c in range(nch) for p in range(2)
            ]
        return [
            pltpu.make_async_copy(
                xre_ref.at[:, pl.ds(start, span)],
                slab.at[slot, 0, :, pl.ds(dst0, span)],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                xim_ref.at[:, pl.ds(start, span)],
                slab.at[slot, 1, :, pl.ds(dst0, span)],
                sems.at[slot, 1]),
        ]

    def g0_data_copies(slot):
        # global first tile: rows [0, tile) -> slab data region only (the
        # front pad rows come from the stream history)
        if split_dma:
            return [
                pltpu.make_async_copy(
                    (xre_ref if p == 0 else xim_ref
                     ).at[c, pl.ds(0, tile * rs)],
                    slab.at[slot, p, c, pl.ds(pad * rs, tile * rs)],
                    sems.at[slot, 2 * c + p])
                for c in range(nch) for p in range(2)
            ]
        return [
            pltpu.make_async_copy(
                xre_ref.at[:, pl.ds(0, tile * rs)],
                slab.at[slot, 0, :, pl.ds(pad * rs, tile * rs)],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                xim_ref.at[:, pl.ds(0, tile * rs)],
                slab.at[slot, 1, :, pl.ds(pad * rs, tile * rs)],
                sems.at[slot, 1]),
        ]

    # ---- DMA: wait for this program's slab; prefetch the next one --------
    @pl.when(g == 0)
    def _():
        if int8_in:
            # stream history: raw packed tail straight into the slab front
            # (hist arrives [2, nch, pad, lanes] — plane-outermost, same
            # as the slab)
            cph = pltpu.make_async_copy(hist_ref, slab.at[0, :, :, :pad * rs],
                                        sems.at[0, 2 * nch])
        else:
            cph = pltpu.make_async_copy(hist_ref, hist_s,
                                        sems.at[0, 2 * nch])
        cph.start()
        cph.wait()
        for cp in g0_data_copies(0):
            cp.start()
        # warm the pipeline: with nbuf slabs, tiles 1..nbuf-2 start now
        # so that nbuf-1 transfers are always in flight (one DMA stream
        # can't reach HBM bandwidth at every shape; concurrency can)
        for d in range(1, nbuf - 1):
            if d >= total:
                break
            for cp in tile_copies(d // n_tiles, d % n_tiles, d % nbuf):
                cp.start()
        for cp in g0_data_copies(0):
            cp.wait()

    la = nbuf - 1                       # lookahead distance
    nk = k + (t + la) // n_tiles
    nt = jax.lax.rem(t + la, n_tiles)

    def dma_step(slot, nxt_slot):
        """Wait for THIS tile's slab transfer into `slot`, then start the
        lookahead tile's transfer into `nxt_slot` (slots may be Python
        ints under static_slot — every slab/semaphore index constant).
        Only traced when total > 1: with one global tile, tile_copies'
        pad+tile-row slice would exceed the rows_total == tile input."""
        @pl.when(g > 0)
        def _():
            for cp in tile_copies(k, t, slot):
                cp.wait()

        @pl.when(g + la < total)
        def _():
            for cp in tile_copies(nk, nt, nxt_slot):
                cp.start()

    def _tile_tail(buf):
        # Everything downstream of the slab DMA for this tile; `buf` is
        # dynamic (g % nbuf) normally, a Python int under static_slot.

        if "dmapure" in _abl:
            # true DMA floor: the slab copies stay live through one tiny
            # per-plane reduction; every downstream stage is skipped and
            # the output windows get constant writes at t == 0 only
            # touch the DATA region only — the g == 0 tile's front pad
            # rows are never written (uninitialized VMEM is NaN under
            # interpret mode, and the smoke test asserts finiteness)
            ts0 = jnp.sum(slab[buf, 0, 0][pad * rs:pad * rs + 8]
                          .astype(jnp.float32))
            ts1 = jnp.sum(slab[buf, 1, 0][pad * rs:pad * rs + 8]
                          .astype(jnp.float32))
            zero = jnp.zeros((n1, n2), jnp.float32)

            @pl.when(t == 0)
            def _():
                sout_ref[0] = jnp.full((8, 128), ts0 + ts1, jnp.float32)
                for ib in range(len(pairs)):
                    out_ref[0, ib, 0] = zero
                    out_ref[0, ib, 1] = zero
                for c in range(nch):
                    tout_ref[0, c, 0] = zero
                    tout_ref[0, c, 1] = zero
                    uout_ref[0, c, 0] = zero
                    uout_ref[0, c, 1] = zero

            @pl.when((k == k_blocks - 1) & (t == n_tiles - 1))
            def _():
                hout_ref[...] = jnp.zeros(hout_ref.shape, jnp.float32)
            return

        # ---- t == 0: slab front <- carried history (f32 corrected-tail mode;
        # int8 mode's raw front rows arrived with the uniform copy — at k > 0
        # they ARE the previous block's raw tail, the int8 history contract)
        if local_halo:
            # the DMA brought only the data rows; the pad front comes
            # from the carried raw tail (tail_s), except where the
            # existing history contracts own it: f32 t == 0 uses the
            # CORRECTED hist_s tail; int8 g == 0 front arrived via the
            # history DMA
            if int8_in:
                @pl.when(g > 0)
                def _():
                    for c in range(nch):
                        slab[buf, 0, c, :pad * rs] = tail_s[c, 0]
                        slab[buf, 1, c, :pad * rs] = tail_s[c, 1]
            else:
                @pl.when(t == 0)
                def _():
                    for c in range(nch):
                        slab[buf, 0, c, :pad * rs] = hist_s[c, 0]
                        slab[buf, 1, c, :pad * rs] = hist_s[c, 1]

                @pl.when(t != 0)
                def _():
                    for c in range(nch):
                        slab[buf, 0, c, :pad * rs] = tail_s[c, 0]
                        slab[buf, 1, c, :pad * rs] = tail_s[c, 1]
            # save THIS tile's raw tail for the next tile's front (reads
            # the just-DMA'd data region, so any position in the tile
            # works; doing it here keeps the carry obviously ordered)
            for c in range(nch):
                tail_s[c, 0] = slab[buf, 0, c, tile * rs:(tile + pad) * rs]
                tail_s[c, 1] = slab[buf, 1, c, tile * rs:(tile + pad) * rs]
        elif not int8_in:
            @pl.when(t == 0)
            def _():
                for c in range(nch):
                    slab[buf, 0, c, :pad * rs] = hist_s[c, 0]
                    slab[buf, 1, c, :pad * rs] = hist_s[c, 1]

        # ---- FIR + FFT per channel (raw — DC handled post-hoc) ----------------
        off = pad - halo
        kw = dict(preferred_element_type=jnp.float32)
        spec = []
        ssum = jnp.zeros((8, 128), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        for c in range(nch):
            if int8_in and "dma0" in _abl:
                # raw packed-DMA floor: touch the slab words, skip the
                # unpack.  Lane-level zero-pad (packed words are nbins/4
                # lanes) keeps the spec shape for ANY n1, including the
                # small test shapes where n1 < 4
                q = slab[buf, 0, c][:tile].astype(jnp.float32)
                nb = n1 * n2  # nbins; packed words carry nbins/4 lanes
                flat = q.reshape(tile, nb // 4)
                z = jnp.zeros((tile, nb - nb // 4), jnp.float32)
                spec.append((
                    jnp.concatenate([flat, z], 1).reshape(tile * n1, n2),
                    jnp.concatenate([z, flat], 1).reshape(tile * n1, n2)))
                continue
            if int8_in:
                # packed int32 words (4 bins each): one unpack per plane.
                # bf16 holds int8 exactly, which the SVD conv consumes
                # directly; the direct tap loop wants f32 operands.
                udt = jnp.bfloat16 if svd_r else jnp.float32
                plane_re = _unpack_i8(slab[buf, 0, c], udt)
                plane_im = _unpack_i8(slab[buf, 1, c], udt)
            else:
                plane_re = slab[buf, 0, c]
                plane_im = slab[buf, 1, c]
            if "nosum" not in _abl:
                # raw sample sums over THIS tile's own data rows only
                sr = jnp.sum(plane_re[pad * rs:(pad + tile) * rs]
                             .astype(jnp.float32))
                si = jnp.sum(plane_im[pad * rs:(pad + tile) * rs]
                             .astype(jnp.float32))
                ssum = ssum + jnp.where(lane == 2 * c, sr, 0.0) \
                    + jnp.where(lane == 2 * c + 1, si, 0.0)
            if "dma" in _abl:
                spec.append((
                    plane_re[:tile * rs].astype(jnp.float32
                                                ).reshape(tile * n1, n2),
                    plane_im[:tile * rs].astype(jnp.float32
                                                ).reshape(tile * n1, n2)))
                continue
            if svd_r:
                # banded MXU matmul + r pointwise v-combines (SVD-FIR), in
                # 8-row chunks: each chunk's slab window starts sublane-
                # aligned and is read exactly once — no per-tap rotated
                # slices, and the conv intermediate stays [r*8, nbins]
                kw3 = dict(preferred_element_type=jnp.float32)
                sub = _SVD_SUB
                win = pad + sub

                # Precision-tiered split passes (FXTPU_SVD_TIER): only
                # the leading svd_lead ranks' rows get the correction
                # dots — bl_ref holds ONLY those rows, and the x-lo pass
                # contracts bh[:ls].  Tail ranks run the single bf16
                # dot: their sigma_k/sigma_1 < _SVD_TIER_THRESH puts the
                # dropped corrections (~ratio * 2^-8) under the 3.1e-5
                # pipeline floor.  ls is a multiple of sub=8, so both
                # the static row slices and the concat stay
                # sublane-aligned.
                ls = svd_lead * sub

                def conv_chunk(plane, c0):
                    if int8_in:
                        # int8 samples are bf16-EXACT: no data split — 2
                        # passes (band hi+lo) at HIGH, 1 at DEFAULT
                        hi = plane[c0:c0 + win]
                        if one_pass:
                            return jnp.dot(bh_ref[:], hi, **kw3)
                        full = jnp.dot(bh_ref[:], hi, **kw3)
                        corr = jnp.dot(bl_ref[:], hi, **kw3)
                        if svd_lead < svd_r:
                            return jnp.concatenate(
                                [full[:ls] + corr, full[ls:]], axis=0)
                        return full + corr
                    if one_pass:
                        return jnp.dot(
                            bh_ref[:],
                            plane[c0:c0 + win].astype(jnp.bfloat16), **kw3)
                    hi, lo = _split_bf16(plane[c0:c0 + win])
                    full = jnp.dot(bh_ref[:], hi, **kw3)
                    if svd_lead < svd_r:
                        corr = (jnp.dot(bl_ref[:], hi, **kw3)
                                + jnp.dot(bh_ref[:ls], lo, **kw3))
                        return jnp.concatenate(
                            [full[:ls] + corr, full[ls:]], axis=0)
                    return (full + jnp.dot(bl_ref[:], hi, **kw3)
                            + jnp.dot(bh_ref[:], lo, **kw3))  # [r*sub, nbins]

                def fir_chunks(plane):
                    out = []
                    for cc in range(tile // sub):
                        cv = conv_chunk(plane, cc * sub)
                        acc = v_ref[0] * cv[0:sub]
                        for kk2 in range(1, svd_r):
                            acc = acc + v_ref[kk2] * cv[kk2 * sub:
                                                        (kk2 + 1) * sub]
                        out.append(acc)
                    return jnp.concatenate(out, axis=0)

                fir_re = fir_chunks(plane_re)
                fir_im = fir_chunks(plane_im)
            else:
                # direct tap loop.  int8 mode: the plane arrives unpacked as
                # exact f32 (dequant scale pre-folded into w_ref), then the
                # identical loop.
                # rs > 1 (pretiled): every tap slice starts at a multiple
                # of rs >= 8 sublanes — aligned, no per-tap rotates — and
                # w_ref arrives pre-tiled [ntaps, tile*rs, nbins/rs] so
                # the multiply needs no broadcast relayout either
                fir_re = w_ref[0] * plane_re[off * rs:(off + tile) * rs]
                fir_im = w_ref[0] * plane_im[off * rs:(off + tile) * rs]
                for tap in range(1, ntaps):
                    o = (off + tap) * rs
                    fir_re = fir_re + w_ref[tap] * plane_re[o:o + tile * rs]
                    fir_im = fir_im + w_ref[tap] * plane_im[o:o + tile * rs]
            # stage 1 contracts the major digit i1 over the row axis with a
            # LEFT matmul per FRAME GROUP — NO transposes anywhere:
            #   [re(k1); im(k1)] = [[C1,-S1],[S1,C1]] @ [xr(i1); xi(i1)]
            # one [2*n1, 2*n1] @ [2*n1, g1*n2] product per group per split
            # pass.  g1 is shape-dependent (static, from _stage1_group): at
            # the flagship n1=32 the concats cost more than the saved
            # dispatches (21.8 vs 22.9 GS/s at G=4) so g1=1; at wideband
            # n1=64 the per-frame [128,128]@[128,128] dots are latency-bound
            # and grouping frames onto the lanes wins.
            if "firflat" in _abl:
                # FIR live WITHOUT the [tile, nbins] -> [tile, n1, n2]
                # retile: consume fir through a flat reduction and skip
                # every downstream stage for this channel (broadcast_to
                # does not lower on hardware Mosaic).  Interpreted with
                # dmapure: firflat - dmapure ~= the FIR cost alone;
                # fir - firflat ~= retile + accumulate/X machinery.
                ssum = ssum + jnp.where(
                    lane == 2 * c, jnp.sum(fir_re), 0.0) + jnp.where(
                    lane == 2 * c + 1, jnp.sum(fir_im), 0.0)
                spec.append(None)
                continue
            if "fir" in _abl:
                spec.append((fir_re.reshape(tile * n1, n2),
                             fir_im.reshape(tile * n1, n2)))
                continue
            # frame-major [tile*n1, n2] working layout for both FFT
            # stages.  rs == n1 (full pretile): fir_re ALREADY has this
            # shape — the reshape is a no-op and the old [tile, nbins] ->
            # [tile, n1, n2] lane->sublane retile (the measured flagship
            # VPU wall, design.md §8i) never happens.  8 <= rs < n1
            # (FXTPU_FUSED_RS): an n1/rs-way split, proportionally
            # cheaper than the legacy n1-way; rs == 1 pays the full
            # retile here exactly as before.
            #
            # retile_stack (FXTPU_FUSED_RETILE=stack, rs == 1 only):
            # the SAME dataflow under a different lowering — lane-slice
            # stack to j1-major [n1, tile, n2] (whole (8,128) tiles
            # move, no stride-n1 sublane scatter), stage 1 reading
            # per-frame [:, f, :] strided slices.
            if retile_stack:
                sre = jnp.stack(
                    [fir_re[:, j * n2:(j + 1) * n2] for j in range(n1)],
                    axis=0)                  # [n1, tile, n2] j1-major
                sim = jnp.stack(
                    [fir_im[:, j * n2:(j + 1) * n2] for j in range(n1)],
                    axis=0)
                frame = lambda f: (sre[:, f], sim[:, f])
            else:
                f2r = fir_re.reshape(tile * n1, n2)
                f2i = fir_im.reshape(tile * n1, n2)
                frame = lambda f: (f2r[f * n1:(f + 1) * n1],
                                   f2i[f * n1:(f + 1) * n1])
            brs, bis = [], []
            for base in range(0, tile, g1):
                if g1 == 1:
                    x2 = jnp.concatenate(frame(base), axis=0)
                else:
                    x2 = jnp.concatenate(
                        [jnp.concatenate(frame(base + fg), axis=0)
                         for fg in range(g1)],
                        axis=1)                       # [2n1, g1*n2]
                if one_pass:
                    a = jnp.dot(m1h_ref[:], x2.astype(jnp.bfloat16), **kw)
                else:
                    hi, lo = _split_bf16(x2)
                    a = (jnp.dot(m1h_ref[:], hi, **kw)
                         + jnp.dot(m1l_ref[:], hi, **kw)
                         + jnp.dot(m1h_ref[:], lo, **kw))
                for fg in range(g1):
                    ar = a[:n1, fg * n2:(fg + 1) * n2]
                    ai = a[n1:, fg * n2:(fg + 1) * n2]
                    # twiddle W_N^{i2*k1}, arranged [k1, i2] (natural layout)
                    brs.append(ar * twc_ref[:] - ai * tws_ref[:])
                    bis.append(ar * tws_ref[:] + ai * twc_ref[:])
            # stage 2 contracts i2 over the LANES via the GAUSS 3-mult
            # complex product (re = br C2 - bi S2, im = br S2 + bi C2):
            #   k1 = (br+bi) @ C2, k2 = bi @ (C2+S2), k3 = br @ (S2-C2)
            #   re = k1 - k2, im = k1 + k3
            # — 3 [n2, n2] dots instead of the combined [2n2, 2n2] block
            # matmul's 4-dot equivalent.  Stage 2 is MXU-saturated (r4
            # decomposition: 13.7 of 42.6 ps/sample at the flagship
            # shape, ~peak bf16 rate), so the 25% flop cut is real time;
            # the extra VPU add/subs ride under the MXU.  m2h/m2l arrive
            # stacked [3, n2, n2] (hi/lo splits of C2, C2+S2, S2-C2).
            if "fft1" in _abl:
                spec.append((jnp.concatenate(brs, 0),
                             jnp.concatenate(bis, 0)))
                continue
            br2 = jnp.concatenate(brs, axis=0)   # [tile*n1 (k1-rows), n2 (i2)]
            bi2 = jnp.concatenate(bis, axis=0)
            bs2 = br2 + bi2
            if one_pass:
                k1 = jnp.dot(bs2.astype(jnp.bfloat16), m2h_ref[0], **kw)
                k2 = jnp.dot(bi2.astype(jnp.bfloat16), m2h_ref[1], **kw)
                k3 = jnp.dot(br2.astype(jnp.bfloat16), m2h_ref[2], **kw)
            else:
                sh, sl = _split_bf16(bs2)
                bih, bil = _split_bf16(bi2)
                brh, brl = _split_bf16(br2)
                k1 = _dot3(sh, sl, m2h_ref[0], m2l_ref[0])
                k2 = _dot3(bih, bil, m2h_ref[1], m2l_ref[1])
                k3 = _dot3(brh, brl, m2h_ref[2], m2l_ref[2])
            cr = k1 - k2
            ci = k1 + k3
            # spectra [tile*n1(k1-major), n2(k2)]; bin = k1 + n1*k2
            # (permuted — the tiny integrated visibility is gathered to
            # natural order outside)
            spec.append((cr, ci))

        # ---- per-channel accumulators for the post-hoc DC correction ----------
        for c in range(nch):
            if spec[c] is None:
                # firflat: the FIR result was consumed through the flat
                # reduction into ssum above; zero the spectral windows at
                # t == 0 so outputs stay finite and skip the accumulate/X
                # machinery (that cost is exactly what firflat isolates)
                zero = jnp.zeros((n1, n2), jnp.float32)

                @pl.when(t == 0)
                def _(c=c):
                    tout_ref[0, c, 0] = zero
                    tout_ref[0, c, 1] = zero
                    uout_ref[0, c, 0] = zero
                    uout_ref[0, c, 1] = zero
                continue
            cr, ci = spec[c]
            # frame reduce: [tile*n1, n2] -> [tile, n1, n2] is a sublane
            # SPLIT (lane dim untouched) — free, unlike the old retile
            t_re = jnp.sum(cr.reshape(tile, n1, n2), axis=0)
            t_im = jnp.sum(ci.reshape(tile, n1, n2), axis=0)

            @pl.when(t == 0)
            def _(c=c, t_re=t_re, t_im=t_im, cr=cr, ci=ci):
                tout_ref[0, c, 0] = t_re
                tout_ref[0, c, 1] = t_im
                # first ntaps-1 frames (the only ones whose FIR reaches into
                # the stream history), contracted against conj(dA) in place:
                # GJ = sum_j (cr_j + i ci_j)(dAre_j - i dAim_j)
                # (dare/daim arrive flattened [halo*n1, n2])
                uout_ref[0, c, 0] = jnp.sum(
                    (cr[:halo * n1] * dare_ref[:] + ci[:halo * n1]
                     * daim_ref[:]).reshape(halo, n1, n2), axis=0)
                uout_ref[0, c, 1] = jnp.sum(
                    (ci[:halo * n1] * dare_ref[:] - cr[:halo * n1]
                     * daim_ref[:]).reshape(halo, n1, n2), axis=0)

            @pl.when(t != 0)
            def _(c=c, t_re=t_re, t_im=t_im):
                tout_ref[0, c, 0] += t_re
                tout_ref[0, c, 1] += t_im

        @pl.when(t == 0)
        def _():
            sums_s[...] = ssum

        @pl.when(t != 0)
        def _():
            sums_s[...] += ssum

        # ---- at the block's last tile: emit the sums and save the tail --------
        # f32 mode: the tail is DC-CORRECTED here with the block's own mean
        # (the full sample sums are complete by now), preserving the
        # corrected-tail history invariant the next block's post-hoc algebra
        # assumes.  int8 mode: the raw tail stays in HBM (next block DMAs it;
        # the caller slices its own input for the carried history) — only the
        # sums leave the kernel.
        if int8_in:
            @pl.when(t == n_tiles - 1)
            def _():
                sout_ref[0] = sums_s[...]
        else:
            @pl.when(t == n_tiles - 1)
            def _():
                sout_ref[0] = sums_s[...]
                lane2 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                inv_n = 1.0 / (8.0 * n_tiles * tile * (n1 * n2))
                for c in range(nch):
                    mu_re = jnp.sum(jnp.where(lane2 == 2 * c, sums_s[...], 0.0)
                                    ) * inv_n
                    mu_im = jnp.sum(jnp.where(lane2 == 2 * c + 1,
                                              sums_s[...], 0.0)) * inv_n
                    hist_s[c, 0, (pad - halo) * rs:] = (
                        slab[buf, 0, c,
                             (pad + tile - halo) * rs:(pad + tile) * rs]
                        - mu_re)
                    hist_s[c, 1, (pad - halo) * rs:] = (
                        slab[buf, 1, c,
                             (pad + tile - halo) * rs:(pad + tile) * rs]
                        - mu_im)

            @pl.when((k == k_blocks - 1) & (t == n_tiles - 1))
            def _():
                hout_ref[...] = hist_s[...]

        # ---- X-stage: accumulate raw cross power over this tile's frames ------
        for ib, (p, q) in enumerate(pairs):
            if "nox" in _abl or spec[p] is None:
                # skip the per-pair products/reduces; tout above already
                # keeps every frame's FFT live, so 'full - nox' exposes
                # exactly the X-stage cost
                @pl.when(t == 0)
                def _(ib=ib):
                    out_ref[0, ib, 0] = jnp.zeros((n1, n2), jnp.float32)
                    out_ref[0, ib, 1] = jnp.zeros((n1, n2), jnp.float32)
                continue
            pr, pi = spec[p]
            qr, qi = spec[q]
            acc_re = jnp.sum((pr * qr + pi * qi).reshape(tile, n1, n2),
                             axis=0)                      # [n1, n2]
            if p == q:
                # auto-correlation: the imaginary part is identically
                # zero (pi*qr - pr*qi with q == p) — skip its products
                # and accumulates (8 of 36 pairs at nchan8; the X stage
                # is 11.4 of 58 ps/sample there, §8j)
                @pl.when(t == 0)
                def _(ib=ib, acc_re=acc_re):
                    out_ref[0, ib, 0] = acc_re
                    out_ref[0, ib, 1] = jnp.zeros((n1, n2), jnp.float32)

                @pl.when(t != 0)
                def _(ib=ib, acc_re=acc_re):
                    out_ref[0, ib, 0] += acc_re
                continue
            acc_im = jnp.sum((pi * qr - pr * qi).reshape(tile, n1, n2),
                             axis=0)

            @pl.when(t == 0)
            def _(ib=ib, acc_re=acc_re, acc_im=acc_im):
                out_ref[0, ib, 0] = acc_re
                out_ref[0, ib, 1] = acc_im

            @pl.when(t != 0)
            def _(ib=ib, acc_re=acc_re, acc_im=acc_im):
                out_ref[0, ib, 0] += acc_re
                out_ref[0, ib, 1] += acc_im

    if static_slot and total > 1:
        # Slot-specialized pipeline: one branch per slab slot, selected by
        # g % nbuf, with CONSTANT slot indices in every copy wait, prefetch
        # start, and compute read — so Mosaic can prove the in-flight DMA's
        # destination slot disjoint from the slot compute reads and overlap
        # them.  Costs nbuf copies of the compute body (code size/compile
        # time); enabled by FXTPU_FUSED_STATIC_SLOT=1 for hardware A/B.
        # g == 0 takes the s == 0 branch: its wait is skipped (the g == 0
        # block above already awaited slot 0) and its lookahead start
        # completes the warm pipeline exactly as the dynamic path does.
        for s in range(nbuf):
            @pl.when(jax.lax.rem(g, nbuf) == s)
            def _(s=s):
                dma_step(s, (s + la) % nbuf)
                _tile_tail(s)
    else:
        if total > 1:
            dma_step(buf, jax.lax.rem(g + la, nbuf))
        _tile_tail(buf)


def _default_nbuf() -> int:
    """DMA slab-ring depth.  2 = classic double buffering (one transfer
    in flight) — the v5e sweep found deeper rings bought nothing at the
    production shapes; FXTPU_FUSED_NBUF overrides for probing."""
    return 2


def _trace_env() -> tuple:
    """Hashable snapshot of the trace-time kernel knobs: (nbuf, split_dma,
    static_slot, fft_precision, svd_tol).  Passed as a STATIC argument of
    _fx_call so its module-level jit cache splits on the env — without it,
    flipping an env var and building a fresh engine would hit a stale
    executable while fx._STEP_CACHE (keyed on the same env vars) pretends
    the change took effect (r2 review finding)."""
    import os as _os
    from fxtpu.ops import cfft
    raw = _os.environ.get("FXTPU_SVD_TOL", "")
    try:
        svd = float(raw) if raw else None
    except ValueError:
        raise ValueError(
            f"FXTPU_SVD_TOL={raw!r} is not a float (e.g. 1e-5; 0 keeps "
            "full rank, routing deep taps to the direct tap loop)") from None
    return (int(_os.environ.get("FXTPU_FUSED_NBUF", "0")) or _default_nbuf(),
            _os.environ.get("FXTPU_FUSED_SPLITDMA", "") == "1",
            _os.environ.get("FXTPU_FUSED_STATIC_SLOT", "") == "1",
            cfft.precision_name(),
            svd,
            _os.environ.get("FXTPU_FUSED_LOCAL_HALO", "") == "1",
            _os.environ.get("FXTPU_FUSED_BANDED", "") == "1",
            # pretiled slab layout: default OFF — the same-session r5
            # A/B measured the narrow-row slab DMA at ~half the wide
            # rate and the step 21% slower at EVERY aspect (rs 8/16/n1),
            # so the legacy [rows, nbins]-lane layout stays the
            # production default; "1" forces pretiled for A/Bs
            # (design.md §8i)
            _os.environ.get("FXTPU_FUSED_PRETILED", "") == "1",
            # pretile ASPECT: rows per sample row (8 <= rs <= n1, rs | n1).
            # 0 = full pretile (rs = n1, lanes = n2).  Intermediate values
            # trade DMA row width against retile depth: the full pretile's
            # 128-lane rows DMA at ~half the wide-slab rate (§8i), while
            # rs = 8 keeps 512-lane rows and pays only an n1/8-way
            # lane->sublane split before the FFT stages
            int(_os.environ.get("FXTPU_FUSED_RS", "0") or 0),
            # precision-tiered SVD conv (default ON): tail ranks with
            # sigma_k/sigma_1 < _SVD_TIER_THRESH run 1-pass bf16 dots
            # (their rounding rides under the 3.1e-5 pipeline floor);
            # "0" keeps every rank at the full split-pass count
            _os.environ.get("FXTPU_SVD_TIER", "1") != "0",
            # retile lowering A/B (legacy rs==1 layout only):
            # "stack" replaces the [tile, nbins] -> [tile*n1, n2]
            # reshape (a stride-n1 sublane scatter) with a lane-slice
            # stack to j1-major [n1, tile, n2] (a pure (8,128)-tile
            # permutation) consumed by strided per-frame slices —
            # same dataflow, different Mosaic lowering (scripts/
            # retile_probe.py measures the isolated difference)
            _os.environ.get("FXTPU_FUSED_RETILE", ""))


def svd_tol_active(int8: bool) -> float:
    """The SVD tolerance the kernel build will ACTUALLY factorize at —
    the FXTPU_SVD_TOL override, else the default.  Routing decisions
    (fx._deep_svd_applies / 'auto') must call this, not read the
    defaults: an env override that changes whether the window
    factorizes must change the route with it.  (``int8`` is kept in the
    signature for call-site symmetry; since r4 both ingest widths share
    the 1e-5 default.)"""
    del int8
    env = _trace_env()[4]
    return _SVD_TOL if env is None else env


@functools.partial(jax.jit,
                   static_argnames=("nbins", "tile", "k_blocks", "pairs_t",
                                    "w_key", "quant_step", "env_key"))
def _fx_call(x_re, x_im, hist_stacked, w2d, nbins: int, tile: int,
             k_blocks: int, pairs_t, w_key=None, quant_step: float = 1.0,
             env_key: tuple = None):
    """x_re/x_im arrive MERGED over blocks: [nch, k_blocks*s_rows, lanes]
    (see _fx_kernel's layout note; fx_pallas_parts does the relayout)."""
    interpret = jax.default_backend() != "tpu"
    if x_re.dtype == jnp.int8:
        raise ValueError(
            "int8-native fused input must arrive PACKED as int32 words "
            "(4 bins each) — see pack_int8_planes; raw int8 DMA runs at "
            "1/4 the element rate on this hardware")
    int8_in = x_re.dtype == jnp.int32
    nch, rows_total, _ = x_re.shape
    s_rows = rows_total // k_blocks
    ntaps = w2d.shape[0]
    halo = ntaps - 1
    n1, n2 = _kernel_factor(nbins)
    c1, s1 = _dft_mats(n1, False)
    c2, s2 = _dft_mats(n2, False)
    twc, tws = _twiddle(n1, n2, False)   # [n1(k1), n2(i2)]

    def split_np(m):
        m = m.astype(np.float32)
        hi = m.astype(jnp.bfloat16)
        lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return jnp.asarray(hi), jnp.asarray(lo)

    def big(c, s):
        n = c.shape[0]
        m = np.zeros((2 * n, 2 * n), np.float32)
        m[:n, :n] = c
        m[:n, n:] = s
        m[n:, :n] = -s
        m[n:, n:] = c
        return m

    # stage 1 is a LEFT multiply: [[C,-S],[S,C]] = big(C,S).T (C,S symmetric)
    m1h, m1l = split_np(big(c1, s1).T)
    # stage 2 runs the Gauss 3-mult complex product in-kernel: stacked
    # [3, n2, n2] = (C2, C2+S2, S2-C2) instead of the [2n2, 2n2] block
    # matrix (25% fewer MXU flops at the same split precision)
    m2h, m2l = split_np(np.stack([c2, c2 + s2, s2 - c2]))
    nbl = len(pairs_t)
    pad = _halo_pad(ntaps)

    # dA = A_j - Abar window constants for the in-kernel first-halo
    # contraction (see _dc_constants), in the kernel's permuted
    # [halo, n1(k1), n2(k2)] layout: natural bin = k1 + n1*k2
    w2d64 = np.asarray(
        w_key if w_key is not None
        else np.asarray(w2d, np.float64).ravel(), np.float64
    ).reshape(ntaps, nbins)
    abar_np = np.fft.fft(w2d64.sum(axis=0))
    a_j_np = np.stack([np.fft.fft(w2d64[ntaps - 1 - j:].sum(axis=0))
                       for j in range(halo)])
    da_np = (a_j_np - abar_np).reshape(halo, n2, n1).transpose(0, 2, 1)
    # flattened frame-major [halo*n1, n2] — the kernel's uniform 2-D
    # working layout (see _fx_kernel's spec representation)
    da_np = np.ascontiguousarray(da_np).reshape(halo * n1, n2)
    dare = jnp.asarray(np.ascontiguousarray(da_np.real.astype(np.float32)))
    daim = jnp.asarray(np.ascontiguousarray(da_np.imag.astype(np.float32)))

    # Trace-time kernel knobs: part of _fx_call's STATIC cache key (see
    # _trace_env — a bare env read here would let the module-level jit
    # cache serve a stale executable after an env flip, r2 review).
    (nbuf, split_dma, static_slot, prec, svd_tol,
     local_halo, _banded, pretiled_ok, rs_env,
     svd_tier, retile_form) = env_key or _trace_env()

    # Deep-tap FIR: rank factorization -> banded-matmul inputs (see the
    # SVD-FIR block comment).  w_key is the static window fingerprint.
    # FXTPU_SVD_TOL (trace-time, part of env_key) overrides the default:
    # stage-1 conv cost is LINEAR in the retained rank.  The 1e-5
    # default keeps rank 6 instead of 8 at 32 taps with the window error
    # still 6x below the f32 pipeline's 3.1e-5 floor (r4 TPU A/B:
    # wideband f32 9.29 -> 11.10 GS/s); 1e-7 restores the strict tier,
    # 0 keeps full rank (factorization declined -> direct tap loop).
    tol = _SVD_TOL if svd_tol is None else svd_tol
    fac = (_svd_fir_factors(w_key, nbins, tol)
           if w_key is not None else None)
    g1 = _stage1_group(n1, tile)
    svd_r = 0
    svd_lead = 0
    svd_inputs = []
    if fac is not None:
        u, v, ratios = fac
        svd_r = u.shape[1]
        # Precision tier (FXTPU_SVD_TIER, default on): the LEADING
        # svd_lead ranks keep the full split-pass count; the tail runs
        # 1-pass bf16 (see _SVD_TIER_THRESH).  The band rows are stacked
        # rank-major, so the tier is a static row split of the same
        # matmul: bl shrinks to the leading rows and the x-lo pass
        # (f32 mode) contracts bh[:lead*sub] only.
        svd_lead = (max(1, sum(1 for s in ratios if s >= _SVD_TIER_THRESH))
                    if svd_tier else svd_r)
        band = _svd_fir_band(u, pad, ntaps)
        bh, bl = split_np(band)
        bl = bl[: svd_lead * _SVD_SUB]
        # int8-native: the dequant scale folds into the v-combine, so the
        # kernel's spectra leave in REAL units with zero extra work
        v_eff = v * quant_step if int8_in else v
        svd_inputs = [bh, bl, jnp.asarray(v_eff.astype(np.float32))]
    # int8 + direct tap loop: the dequant scale folds into the window
    w_in = w2d * quant_step if (int8_in and not svd_r) else w2d

    # PRETILED layout (direct-tap f32 shapes with n1 a sublane multiple):
    # reinterpret every sample row as its n1 x n2 frame tile.
    # [R, nbins] row-major IS [R*n1, n2] row-major, so the reshapes
    # below are free bitcasts — but inside the kernel the FIR tap slices
    # become n1-aligned and the [tile, nbins] -> [tile, n1, n2]
    # lane->sublane retile (the measured flagship VPU wall — r5
    # firflat/dmapure ablation, design.md §8i) disappears: the FIR
    # output is ALREADY in the FFT stages' frame-major [tile*n1, n2]
    # working layout.  int8 stays on the legacy layout: its packed
    # words interleave bin-QUARTERS across the whole sample row
    # (pack_int8_planes), which a row reinterpret would scramble.
    pretiled = pretiled_ok and svd_r == 0 and not int8_in and n1 % 8 == 0
    rs = n1 if pretiled else 1
    if pretiled and rs_env:
        # intermediate aspect (FXTPU_FUSED_RS): wider DMA rows, with the
        # remaining n1/rs-way lane->sublane split paid at the FFT-input
        # reshape inside the kernel instead of the full legacy retile
        if rs_env % 8 or n1 % rs_env:
            raise ValueError(
                f"FXTPU_FUSED_RS={rs_env} must be a multiple of 8 "
                f"dividing n1={n1} (nbins={nbins})")
        rs = rs_env
    if pretiled:
        x_re = x_re.reshape(nch, rows_total * rs, nbins // rs)
        x_im = x_im.reshape(nch, rows_total * rs, nbins // rs)
        hist_stacked = hist_stacked.reshape(nch, 2, pad * rs, nbins // rs)
        # window pre-tiled per frame -> the FIR multiply needs no
        # broadcast relayout (one tiny device tile per traced call)
        w_in = jnp.tile(w_in.reshape(ntaps, 1, rs, nbins // rs),
                        (1, tile, 1, 1)).reshape(ntaps, tile * rs,
                                                 nbins // rs)

    slab_dtype = jnp.int32 if int8_in else jnp.float32
    # int8 mode: the slab holds PACKED words — 4x fewer lanes
    nb_lanes = (nbins // rs if pretiled
                else (nbins // 4 if int8_in else nbins))
    # int8 mode never touches hist_s / hout: dummy-sized to keep the
    # kernel's positional ref plumbing uniform
    hist_shape = ((1, 1, 8, 128) if int8_in
                  else (nch, 2, pad * rs, nb_lanes))

    # (env knobs unpacked above, before the SVD routing)
    # The fused kernel honors the SAME precision knob as the XLA path
    # (ops/cfft.py): DEFAULT = 1-pass bf16 dots (conv + both FFT stages),
    # HIGH (default) = the manual 3-pass split-bf16 (2-pass where the
    # input is bf16-exact).  HIGHEST is not implementable at MXU speed in
    # this kernel — fx._resolve_fused keeps 'auto' on the XLA path there;
    # a FORCED fused engine falls back to HIGH with a warning.
    # dmax2 (debug ablate): widen every tile copy by `tile` rows when the
    # merged input is big enough (the in-situ DMA-overlap test)
    xtra = (tile if "dmax2" in os.environ.get(
        "FXTPU_FUSED_ABLATE", "").split(",")
        and rows_total >= 2 * tile + pad else 0)
    one_pass = prec == "default"
    if prec == "highest":
        import warnings
        warnings.warn(
            "FXTPU_FFT_PRECISION=highest: the fused kernel caps at HIGH "
            "(3-pass split-bf16); use fused=False for the 6-pass XLA path",
            stacklevel=2)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_fx_kernel, tile=tile, ntaps=ntaps,
                          n1=n1, n2=n2, n_tiles=s_rows // tile, nch=nch,
                          k_blocks=k_blocks, pairs=pairs_t, svd_r=svd_r,
                          svd_lead=svd_lead,
                          g1=g1, int8_in=int8_in,
                          retile_stack=(retile_form == "stack" and rs == 1),
                          nbuf=nbuf,
                          split_dma=split_dma, static_slot=static_slot,
                          one_pass=one_pass, xtra=xtra,
                          local_halo=local_halo, rs=rs),
        grid=(k_blocks, s_rows // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x re (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),    # x im (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),    # history0 (manual DMA)
            vmem,                                    # window [ntaps, nbins]
            vmem, vmem,                              # stage-1 mat hi/lo
            vmem, vmem,                              # twiddle cos/sin f32
            vmem, vmem,                              # stage-2 mat hi/lo
            vmem, vmem,                              # dA re/im [halo, n1, n2]
        ] + [vmem] * len(svd_inputs),                # SVD band hi/lo + v
        out_specs=(
            pl.BlockSpec((1, nbl, 2, n1, n2), lambda k, t: (k, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # raw cross power
            pl.BlockSpec((1, nch, 2, n1, n2), lambda k, t: (k, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # spectral sums T
            pl.BlockSpec((1, nch, 2, n1, n2),
                         lambda k, t: (k, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # first-frames GJ
            pl.BlockSpec((1, 8, 128), lambda k, t: (k, 0, 0),
                         memory_space=pltpu.VMEM),   # raw sample sums
            pl.BlockSpec(hist_shape, lambda k, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # final tail (f32 mode)
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k_blocks, nbl, 2, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((k_blocks, nch, 2, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((k_blocks, nch, 2, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((k_blocks, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct(hist_shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, 2, nch,
                        (tile + _halo_pad(ntaps) + xtra) * rs,
                        nb_lanes), slab_dtype),
            pltpu.VMEM(hist_shape, jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            # raw interior tail carry (FXTPU_FUSED_LOCAL_HALO); tiny
            pltpu.VMEM((nch, 2, pad * rs, nb_lanes), slab_dtype),
            pltpu.SemaphoreType.DMA((nbuf, 2 * nch + 2)),
        ],
        # deep-tap/wideband shapes need a bigger slab than the 16 MB
        # default scoped-VMEM budget (v5e has 128 MB of VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_re, x_im, hist_stacked, w_in, m1h, m1l,
      jnp.asarray(np.ascontiguousarray(twc)),
      jnp.asarray(np.ascontiguousarray(tws)), m2h, m2l, dare, daim,
      *svd_inputs)
    if pretiled:
        # restore the caller-visible [nch, 2, pad, nbins] history layout
        # (a free bitcast — same bytes, see the pretiled note above)
        out, tsum, ufr, ssum, hist_out = outs
        return out, tsum, ufr, ssum, hist_out.reshape(nch, 2, pad, nbins)
    return outs


def _fx_perm(nbins: int) -> np.ndarray:
    """inv[natural_bin] = flat position in the kernel's [k1, n2-minor]
    output layout (bin = k1 + n1*k2 at position k1*n2 + k2)."""
    n1, n2 = _kernel_factor(nbins)
    b = np.arange(nbins)
    return (b % n1) * n2 + b // n1


@functools.lru_cache(maxsize=32)
def _dc_constants(w_key, nbins: int, s_rows: int):
    """Host f64 constants for the post-hoc DC correction.

    DC removal perturbs each corrected FIR frame by mu * A[f] where
    A[f] = FFT(W_hi[f]) and W_hi[f][b] = sum of window taps whose input
    row lies in the CURRENT block — the full column sum W-bar for interior
    frames (f >= ntaps-1), partial for the first ntaps-1 frames (their
    remaining taps read the carried history).  Returns
    (Abar [nbins] c64-as-planes, dA [halo, nbins] = A_j - Abar,
     Cs [nbins] real = sum_f |A[f]|^2,
     Cab [nbins] complex = sum_j A_j (Abar - A_j)*,
     Cbb [nbins] real = sum_j |Abar - A_j|^2), natural bin order, f32.

    Cs serves the corrected-tail history contract (history rows already
    mean-free, only the mu*A_j terms remain).  Cab/Cbb additionally serve
    the RAW-tail contract (int8-native kernel): there the first-halo
    frames also carry a mu_prev*(Abar - A_j) perturbation from the
    previous block's uncorrected rows (see _dc_correct ``mu_prev``).
    """
    w2d = np.asarray(w_key, np.float64).reshape(-1, nbins)
    ntaps = w2d.shape[0]
    halo = ntaps - 1
    wbar = w2d.sum(axis=0)
    abar = np.fft.fft(wbar)
    a_j = np.stack([np.fft.fft(w2d[ntaps - 1 - j:].sum(axis=0))
                    for j in range(halo)])      # [halo, nbins]
    cs = (s_rows - halo) * np.abs(abar) ** 2 + (np.abs(a_j) ** 2).sum(0)
    da = a_j - abar
    b_j = abar - a_j                            # raw-history weights
    cab = (a_j * np.conj(b_j)).sum(0)
    cbb = (np.abs(b_j) ** 2).sum(0)
    # return HOST numpy (the lru_cache must never hold traced values)
    f32 = lambda a: np.ascontiguousarray(a.astype(np.float32))
    return (Cplx(f32(abar.real), f32(abar.imag)),
            Cplx(f32(da.real), f32(da.imag)),
            f32(cs),
            Cplx(f32(cab.real), f32(cab.imag)),
            f32(cbb))


def _dc_correct(xp: Cplx, T: Cplx, GJ: Cplx, mu: Cplx, pairs_np,
                consts, s_rows: int, mu_prev: Cplx = None) -> Cplx:
    """Apply the DC-spike correction to the raw frame-summed cross power.

    ``GJ`` [K, nch, nbins] arrives pre-contracted from the kernel:
    GJ_c = sum_j spec_c[j] (A_j - Abar)*.

    Corrected-tail history contract (``mu_prev=None``), with
    s'_c[f] = s_c[f] - mu_c A[f]:
      sum_f s'_p s'_q* = xp - mu_q* G_p - mu_p conj(G_q) + mu_p mu_q* Cs,
      G_c = Abar* T_c + GJ_c.

    RAW-tail contract (int8-native kernel; ``mu_prev`` = each block's
    PREVIOUS block mean): the first-halo frames additionally carry the
    previous block's uncorrected rows, s'_c[f] = s_c[f] - mu_c A[f]
    - mu_prev_c B[f] with B_j = Abar - A_j (0 interior):
      ... - mu_prev_q* H_p - mu_prev_p conj(H_q)
      + mu_p mu_prev_q* Cab + mu_prev_p mu_q* conj(Cab)
      + mu_prev_p mu_prev_q* Cbb,
      H_c = sum_j U_c[j] B_j* = Abar* T_c - G_c.

    All arrays are tiny ([K, ..., nbins], natural order)."""
    abar, _, cs, cab, cbb = consts
    # G_c = conj(Abar) * T_c + GJ_c   [K, nch, nbins]
    ta = cmulconj(T, Cplx(abar.re[None, None], abar.im[None, None]))
    g = Cplx(ta.re + GJ.re, ta.im + GJ.im)
    p_idx = pairs_np[:, 0]
    q_idx = pairs_np[:, 1]

    def sel(x, idx):
        return Cplx(x.re[:, idx], x.im[:, idx])

    def selc(x, idx):
        return Cplx(x.re[:, idx, None], x.im[:, idx, None])

    mu_p, mu_q = selc(mu, p_idx), selc(mu, q_idx)
    g_p, g_q = sel(g, p_idx), sel(g, q_idx)
    t2 = cmulconj(g_p, mu_q)               # mu_q* G_p
    t3 = cconj(cmulconj(g_q, mu_p))        # mu_p conj(G_q)
    t4 = cmulconj(mu_p, mu_q)              # mu_p mu_q*
    out = Cplx(xp.re - t2.re - t3.re + t4.re * cs[None, None],
               xp.im - t2.im - t3.im + t4.im * cs[None, None])
    if mu_prev is None:
        return out
    # raw-tail extension: H_c = Abar* T_c - G_c (free from existing parts)
    h = Cplx(ta.re - g.re, ta.im - g.im)
    h_p, h_q = sel(h, p_idx), sel(h, q_idx)
    mpv_p, mpv_q = selc(mu_prev, p_idx), selc(mu_prev, q_idx)
    u2 = cmulconj(h_p, mpv_q)              # mu_prev_q* H_p
    u3 = cconj(cmulconj(h_q, mpv_p))       # mu_prev_p conj(H_q)
    cabx = Cplx(cab.re[None, None], cab.im[None, None])
    q4a = cmul(cmulconj(mu_p, mpv_q), cabx)            # mu_p mu_prev_q* Cab
    q4b = cmul(cmulconj(mpv_p, mu_q), cconj(cabx))     # mu_prev_p mu_q* Cab*
    q4c = cmulconj(mpv_p, mpv_q)                       # mu_prev_p mu_prev_q*
    return Cplx(out.re - u2.re - u3.re + q4a.re + q4b.re
                + q4c.re * cbb[None, None],
                out.im - u2.im - u3.im + q4a.im + q4b.im
                + q4c.im * cbb[None, None])


def fx_pallas_parts(x: Cplx, w2d, nbins: int, history: Cplx, pairs,
                    quant_step: float = 1.0, merged: bool = False):
    """Run the fused kernel and return its RAW accumulators in natural bin
    order (pre-DC-correction) — the building block shared by the
    single-device wrapper and the sharded path (which must psum the parts
    across shards BEFORE correcting):

      (xp_raw [K, nbl, nbins], T [K, nch, nbins],
       GJ [K, nch, nbins] = sum_j spec[j] conj(dA[j]) (the first-halo
       frames' spectra pre-contracted in-kernel against the dA window
       constants — all _dc_correct ever needs from them),
       mu [K, nch] complex means, tail [nch, ntaps-1, nbins] — already
       DC-corrected with the last block's own mean in-kernel)

    int8-NATIVE mode (x planes int8, requires the SVD-FIR window):
    ``history`` is the previous block's RAW int8 tail, the kernel runs on
    the int8 slab (bytes / 4, 2-pass conv), T/U/xp leave in real units
    (dequant folded into v), mu leaves in QUANT units (scale by
    quant_step), and ``tail`` returns None — the caller slices the raw
    tail from its own input and must correct with _dc_correct(mu_prev=).
    """
    ntaps = int(w2d.shape[0])
    halo = ntaps - 1
    int8_in = x.re.dtype in (jnp.int8, jnp.int32)
    legacy = not merged
    if merged:
        # [nch, K, S, lanes] — the kernel's native layout, pre-staged
        # host-side by FxEngine.prepare_batch: the K->rows merge below is
        # a free reshape, no device transpose
        nch, k_blocks, s_rows, _ = x.re.shape
        rows_re, rows_im = x.re, x.im
    elif x.re.ndim == 4:
        k_blocks, nch, s_rows, _ = x.re.shape
        rows_re, rows_im = x.re, x.im
    else:
        if int8_in:
            raise ValueError("int8-native planes must arrive pre-framed "
                             "[K, nch, S, nbins//4] (packed int32)")
        k_blocks, nch, nsamp = x.shape
        s_rows = nsamp // nbins
        rows_re = x.re[..., : s_rows * nbins].reshape(
            k_blocks, nch, s_rows, nbins)
        rows_im = x.im[..., : s_rows * nbins].reshape(
            k_blocks, nch, s_rows, nbins)
    nch_pairs = int(np.asarray(pairs).max()) + 1
    if nch != nch_pairs:
        raise ValueError(
            f"channel axis mismatch: x implies nch={nch} but pairs imply "
            f"{nch_pairs} — merged inputs are [nch, K, S, lanes], legacy "
            f"stacks [K, nch, ...] (a swap silently transposes the kernel)")
    tile = _pick_tile(s_rows, ntaps, int8=int8_in)
    if tile is None:
        raise ValueError(f"unsupported shape: S={s_rows}, ntaps={ntaps}")
    if nch > MAX_FUSED_NCHAN:
        raise ValueError(
            f"fused kernel supports at most {MAX_FUSED_NCHAN} channels "
            f"(2 lanes per channel in the sample-sum accumulator), got {nch}")
    pad = _halo_pad(ntaps)
    hist_dtype = jnp.int32 if int8_in else jnp.float32
    # int8 mode's stream history DMAs straight into the slab front, so it
    # travels plane-outermost ([2, nch, pad, lanes]) to match the slab;
    # f32 mode's lands in hist_s, which keeps the [nch, 2, pad, nbins]
    # layout the in-kernel fill/tail-save index.
    hist = jnp.stack([history.re, history.im],
                     axis=0 if int8_in else 1).astype(hist_dtype)
    hist = jnp.pad(hist, ((0, 0), (0, 0), (pad - halo, 0), (0, 0)))
    pairs_t = tuple((int(p), int(q)) for p, q in np.asarray(pairs))
    w_key = tuple(np.asarray(w2d, np.float64).ravel())
    if not int8_in:
        rows_re = rows_re.astype(jnp.float32)
        rows_im = rows_im.astype(jnp.float32)
    # merged-rows relayout -> [nch, K*S, L].  Pre-merged inputs reshape
    # for free; legacy [K, nch, S, L] stacks pay one XLA transpose (free
    # bitcast at K=1 — the streaming Correlator step), repaid ~20x by the
    # uniform contiguous DMA.
    lanes = rows_re.shape[-1]
    if legacy:
        rows_re = rows_re.transpose(1, 0, 2, 3)
        rows_im = rows_im.transpose(1, 0, 2, 3)
    rows_re = rows_re.reshape(nch, -1, lanes)
    rows_im = rows_im.reshape(nch, -1, lanes)
    out, tsum, ufr, ssum, hist_out = _fx_call(
        rows_re, rows_im, hist,
        jnp.asarray(w2d, jnp.float32), nbins, tile, k_blocks, pairs_t,
        w_key=w_key, quant_step=quant_step if int8_in else 1.0,
        env_key=_trace_env())
    inv = jnp.asarray(_fx_perm(nbins))
    nbl = out.shape[1]

    def nat(a, lead):
        flat = a.reshape(*lead, 2, nbins)
        taken = jnp.take(flat, inv, axis=-1)
        return Cplx(taken[..., 0, :], taken[..., 1, :])

    xp = nat(out, (k_blocks, nbl))
    T = nat(tsum, (k_blocks, nch))
    # GJ = sum_j spec[j] * conj(dA[j]) — contracted IN-KERNEL (halo-times
    # smaller than shipping the raw first-halo frames)
    GJ = nat(ufr, (k_blocks, nch))
    scale = 1.0 / (s_rows * nbins)
    lanes = ssum[:, 0]  # [K, 128]: lane 2c/2c+1 = re/im sum for channel c
    mu = Cplx(lanes[:, 0:2 * nch:2] * scale,
              lanes[:, 1:2 * nch + 1:2] * scale)   # [K, nch]
    tail = (None if int8_in else
            Cplx(hist_out[:, 0, pad - halo:], hist_out[:, 1, pad - halo:]))
    return xp, T, GJ, mu, tail, s_rows


def fx_pallas_raw_multi(x: Cplx, w2d, nbins: int, history, pairs,
                        quant_step: float = 1.0, merged: bool = False):
    """Fused DC + PFB + FFT + X for a STACK of blocks in one kernel launch:
    ``x [K, nch, nsamp]`` (or pre-framed ``[K, nch, S, nbins]`` — STRONGLY
    preferred for device inputs; a device reframe is a tiled-layout HBM
    round trip) -> (xpower [K, nbl, nbins] SUM over frames, natural bin
    order, DC-corrected, new_history).

    ``merged=True``: x is the kernel-native MERGED layout
    ``[nch, K, S, lanes]`` (FxEngine.prepare_batch) — skips the device
    transpose the [K, nch, ...] stack pays on its way into the kernel.

    The DC-spike removal is applied POST-HOC from accumulators the kernel
    gathers in its single pass (see _fx_kernel/_dc_correct), so the input
    is read exactly once — no separate mean pass.  'xpower' has no FSTC
    rotation / frame-mean normalization / fftshift: the caller applies
    ``rot_p conj(rot_q) / n_frames`` per block and the shift on these tiny
    arrays (rotation commutes with the frame sum; see module notes).

    History contract: f32 mode in/out is the DC-corrected previous-block
    tail (Cplx).  int8-NATIVE mode (x planes PACKED int32 words via
    pack_int8_planes — 4 bins/word, 4x fewer DMA elements): history is a
    dict ``{"tail": Cplx packed-int32 raw tail [nch, halo, nbins//4],
    "mu_prev": Cplx [nch] previous-block means (real units)}`` — the
    kernel consumes the raw tail directly and the previous-block mean
    correction runs post-hoc (the mu_prev terms of _dc_correct)."""
    pairs_np = np.asarray(pairs)
    int8_native = (isinstance(history, dict)
                   or (x.re.dtype in (jnp.int8, jnp.int32)))
    consts = _dc_constants(tuple(np.asarray(w2d, np.float64).ravel()),
                           nbins, x.re.shape[-2] if x.re.ndim == 4
                           else x.re.shape[-1] // nbins)
    if not int8_native:
        xp, T, U, mu, tail, s_rows = fx_pallas_parts(x, w2d, nbins,
                                                     history, pairs,
                                                     merged=merged)
        xp = _dc_correct(xp, T, U, mu, pairs_np, consts, s_rows)
        return xp, tail  # tail already DC-corrected in-kernel

    xp, T, U, mu_q, _, s_rows = fx_pallas_parts(
        x, w2d, nbins, history["tail"], pairs, quant_step=quant_step,
        merged=merged)
    # kernel sums are in quant units; spectra left in real units via v
    mu = Cplx(mu_q.re * quant_step, mu_q.im * quant_step)   # [K, nch]
    # each block's raw front rows came from the PREVIOUS block: its mean
    mu_prev = Cplx(
        jnp.concatenate([history["mu_prev"].re[None], mu.re[:-1]]),
        jnp.concatenate([history["mu_prev"].im[None], mu.im[:-1]]))
    xp = _dc_correct(xp, T, U, mu, pairs_np, consts, s_rows,
                     mu_prev=mu_prev)
    halo = int(w2d.shape[0]) - 1
    if merged:
        # [nch, K, S, lanes]: the raw packed tail is the last block's
        # last halo rows
        new_tail = Cplx(x.re[:, -1, -halo:], x.im[:, -1, -halo:])
    else:
        rows = x if x.re.ndim == 4 else Cplx(
            x.re[..., : s_rows * nbins].reshape(*x.re.shape[:2],
                                                s_rows, nbins),
            x.im[..., : s_rows * nbins].reshape(*x.im.shape[:2],
                                                s_rows, nbins))
        new_tail = Cplx(rows.re[-1, :, -halo:], rows.im[-1, :, -halo:])
    new_hist = {
        "tail": new_tail,
        "mu_prev": Cplx(mu.re[-1], mu.im[-1]),
    }
    return xp, new_hist


def fx_pallas_raw(x: Cplx, w2d, nbins: int, history, pairs,
                  quant_step: float = 1.0):
    """Single-block wrapper over :func:`fx_pallas_raw_multi` (2-D
    ``[nch, nsamp]`` or pre-framed 3-D ``[nch, S, nbins]`` planes)."""
    xk = Cplx(x.re[None], x.im[None])
    xp, new_hist = fx_pallas_raw_multi(xk, w2d, nbins, history, pairs,
                                       quant_step=quant_step)
    return Cplx(xp.re[0], xp.im[0]), new_hist


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
    # ntaps == 1: no history region (pad == 0) — the kernel skips the
    # hist copy, but pallas rejects 0-size ref dims, so ship 8 dummy rows
    hpad = pad if pad else 8
    hist = jnp.stack([history.re, history.im], axis=1).astype(jnp.float32)
    hist = jnp.pad(hist, ((0, 0), (0, 0), (hpad - (ntaps - 1), 0), (0, 0)))
    out = _pfb_fft_call(x_stacked.astype(jnp.float32), hist,
                        means.astype(jnp.float32),
                        jnp.asarray(w2d, jnp.float32), nbins, tile)
    # [nch, 2, S, n2, n1] -> [nch, 2, S, nbins]: contiguous, free reshape
    out = out.reshape(nch, 2, s_rows, nbins)
    spec = Cplx(out[:, 0], out[:, 1])
    # history carried forward is the DC-corrected tail (planes-path
    # parity).  Slice from the front: ``-(ntaps - 1):`` at ntaps == 1 is
    # ``-0:`` — the WHOLE block, not an empty tail.
    tail = s_rows - (ntaps - 1)
    new_hist = Cplx(rows_re[:, tail:] - means[:, None, None, 0],
                    rows_im[:, tail:] - means[:, None, None, 1])
    return spec, new_hist
