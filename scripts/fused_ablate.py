"""Ablate the fused FX kernel stage by stage on the real TPU.

STAGE=dma|fir|fft1|fft2|full python scripts/fused_ablate.py
Measures ms/block at the flagship shape to localize kernel time.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/fxtpu_xla"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fxtpu.ops.cfft import _dft_mats, _twiddle
from fxtpu.ops.pfb_pallas import _halo_pad, _split_bf16, _cdot3

STAGE = os.environ.get("STAGE", "full")
CMM = int(os.environ.get("CMM", "0"))  # 1=combined matmul, 2=transpose-free
SPLITDMA = os.environ.get("SPLITDMA", "0") == "1"
GRIDK = os.environ.get("GRIDK", "0") == "1"  # K in the pallas grid, no scan
ALT = os.environ.get("ALT", "0") == "1"      # two-shape head/full DMA (the
                                             # old production copy structure)
TWOIN = os.environ.get("TWOIN", "0") == "1"  # separate re/im input arrays
HOUT = os.environ.get("HOUT", "0") == "1"    # second (history) output

# the kernel's ref unpacking only implements these combinations
if TWOIN and not GRIDK:
    raise SystemExit("TWOIN=1 requires GRIDK=1")
if HOUT and not (TWOIN and GRIDK):
    raise SystemExit("HOUT=1 requires TWOIN=1 GRIDK=1")

from fxtpu.ops.pfb_pallas import _dot3  # the production contraction


def _cdot3_cmm(xr, xi, m_hi, m_lo, n):
    """(xr + j xi) @ (C + jS) as ONE real matmul per split pass:
    [xr | xi] [M, 2n] @ [[C, S], [-S, C]] [2n, 2n] = [re | im]."""
    x2 = jnp.concatenate([xr, xi], axis=1)
    hi, lo = _split_bf16(x2)
    out = _dot3(hi, lo, m_hi, m_lo)
    return out[:, :n], out[:, n:]
NBINS = int(os.environ.get("NBINS", "4096"))
N1, N2 = NBINS // 128, 128
NTAPS = int(os.environ.get("NTAPS", "4"))
TILE = int(os.environ.get("TILE", "16"))
NCH = 2
S = int(os.environ.get("S", str(2 ** 21 // NBINS)))  # 2^21-sample blocks
K = int(os.environ.get("K", "64"))  # scan length


def kernel(*refs):
    if TWOIN and HOUT:
        (xre_ref, xim_ref, w_ref, c1h, c1l, s1h, s1l, twc, tws, c2h, c2l,
         s2h, s2l, out_ref, hout_ref, slab, hist_s, sems) = refs
        x_ref = None
    elif TWOIN:
        (xre_ref, xim_ref, w_ref, c1h, c1l, s1h, s1l, twc, tws, c2h, c2l,
         s2h, s2l, out_ref, slab, sems) = refs
        x_ref = None
    else:
        (x_ref, w_ref, c1h, c1l, s1h, s1l, twc, tws, c2h, c2l, s2h, s2l,
         out_ref, slab, sems) = refs
    if GRIDK:
        kk = pl.program_id(0)
        t = pl.program_id(1)
    else:
        kk = 0
        t = pl.program_id(0)
    pad = _halo_pad(NTAPS)
    n_tiles = S // TILE
    g = kk * n_tiles + t
    buf = jax.lax.rem(g, 2)

    def tile_copies(tt, slot, kk=kk):
        start = pl.multiple_of(jnp.maximum(tt * TILE - pad, 0), 8)
        if TWOIN:
            return [
                pltpu.make_async_copy(
                    xre_ref.at[kk, :, pl.ds(start, pad + TILE)],
                    slab.at[slot, :, 0], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    xim_ref.at[kk, :, pl.ds(start, pad + TILE)],
                    slab.at[slot, :, 1], sems.at[slot, 1]),
            ]
        if GRIDK:
            if not SPLITDMA:
                return [pltpu.make_async_copy(
                    x_ref.at[kk, :, :, pl.ds(start, pad + TILE)],
                    slab.at[slot], sems.at[slot, 0])]
            return [pltpu.make_async_copy(
                x_ref.at[kk, c, p, pl.ds(start, pad + TILE)],
                slab.at[slot, c, p], sems.at[slot, c * 2 + p])
                for c in range(NCH) for p in range(2)]
        if not SPLITDMA:
            return [pltpu.make_async_copy(
                x_ref.at[:, :, pl.ds(start, pad + TILE)], slab.at[slot],
                sems.at[slot, 0])]
        cps = []
        for c in range(NCH):
            for p in range(2):
                cps.append(pltpu.make_async_copy(
                    x_ref.at[c, p, pl.ds(start, pad + TILE)],
                    slab.at[slot, c, p], sems.at[slot, c * 2 + p]))
        return cps

    total = (K if GRIDK else 1) * n_tiles

    def head_copies(kk, slot):
        return [pltpu.make_async_copy(
            x_ref.at[kk, :, :, pl.ds(0, TILE)],
            slab.at[slot, :, :, pl.ds(pad, TILE)], sems.at[slot, 0])]

    nk = kk + (t + 1) // n_tiles
    nt = jax.lax.rem(t + 1, n_tiles)

    if ALT and GRIDK:
        # replicate the production kernel's two-shape DMA structure
        @pl.when(g == 0)
        def _():
            for cp in head_copies(0, 0):
                cp.start()
            for cp in head_copies(0, 0):
                cp.wait()

        @pl.when((g > 0) & (t != 0))
        def _():
            for cp in tile_copies(t, buf, kk):
                cp.wait()

        @pl.when((g > 0) & (t == 0))
        def _():
            for cp in head_copies(kk, buf):
                cp.wait()

        @pl.when((g + 1 < total) & (nt != 0))
        def _():
            for cp in tile_copies(nt, jax.lax.rem(g + 1, 2), nk):
                cp.start()

        @pl.when((g + 1 < total) & (nt == 0))
        def _():
            for cp in head_copies(nk, jax.lax.rem(g + 1, 2)):
                cp.start()
    else:
        @pl.when(g == 0)
        def _():
            for cp in tile_copies(0, 0, 0):
                cp.start()
            for cp in tile_copies(0, 0, 0):
                cp.wait()

        @pl.when(g + 1 < total)
        def _():
            for cp in tile_copies(nt, jax.lax.rem(g + 1, 2), nk):
                cp.start()

        @pl.when(g != 0)
        def _():
            for cp in tile_copies(t, buf, kk):
                cp.wait()

    halo = NTAPS - 1
    off = pad - halo
    acc_re = jnp.zeros((N1, N2), jnp.float32)
    acc_im = jnp.zeros((N1, N2), jnp.float32)
    spec = []
    for c in range(NCH if STAGE != "dma" else 0):
        plane_re = slab[buf, c, 0]
        plane_im = slab[buf, c, 1]
        fir_re = w_ref[0] * plane_re[off:off + TILE]
        fir_im = w_ref[0] * plane_im[off:off + TILE]
        for tap in range(1, NTAPS):
            fir_re = fir_re + w_ref[tap] * plane_re[off + tap:off + tap + TILE]
            fir_im = fir_im + w_ref[tap] * plane_im[off + tap:off + tap + TILE]
        if STAGE == "fir":
            spec.append((fir_re.reshape(TILE, N1, N2),
                         fir_im.reshape(TILE, N1, N2)))
            continue
        if CMM == 2:
            # transpose-free: per row-group LEFT matmul
            # [re; im](k1) = [[C,-S],[S,C]] @ [xr; xi](i1)  — [64,64]@[64,128]
            f3r = fir_re.reshape(TILE, N1, N2)
            f3i = fir_im.reshape(TILE, N1, N2)
            kw = dict(preferred_element_type=jnp.float32)
            brs, bis = [], []
            # NB: do not shadow the grid-global `g` — the HOUT epilogue's
            # pl.when(g == total - 1) must see the traced index
            for fr in range(TILE):
                x2 = jnp.concatenate([f3r[fr], f3i[fr]], axis=0)  # [2N1, N2]
                hi, lo = _split_bf16(x2)
                a = (jnp.dot(c1h[:], hi, **kw) + jnp.dot(c1l[:], hi, **kw)
                     + jnp.dot(c1h[:], lo, **kw))
                ar_g, ai_g = a[:N1], a[N1:]
                # twiddle W_N^{i2 k1} arranged [k1, i2] = twc/tws natural
                brs.append(ar_g * twc[:] - ai_g * tws[:])
                bis.append(ar_g * tws[:] + ai_g * twc[:])
            br2 = jnp.concatenate(brs, axis=0)   # [TILE*N1(k1), N2(i2)]
            bi2 = jnp.concatenate(bis, axis=0)
            cr, ci = _cdot3_cmm(br2, bi2, c2h[:], c2l[:], N2)
            # bin = k1 + N1*k2 (permuted — consistent for X + final gather)
            spec.append((cr.reshape(TILE, N1, N2), ci.reshape(TILE, N1, N2)))
            continue
        xr = jnp.swapaxes(fir_re.reshape(TILE, N1, N2), 1, 2).reshape(
            TILE * N2, N1)
        xi = jnp.swapaxes(fir_im.reshape(TILE, N1, N2), 1, 2).reshape(
            TILE * N2, N1)
        if CMM:
            ar, ai = _cdot3_cmm(xr, xi, c1h[:], c1l[:], N1)
        else:
            ar, ai = _cdot3(xr, xi, c1h[:], c1l[:], s1h[:], s1l[:])
        ar3 = ar.reshape(TILE, N2, N1)
        ai3 = ai.reshape(TILE, N2, N1)
        br = ar3 * twc[:] - ai3 * tws[:]
        bi = ar3 * tws[:] + ai3 * twc[:]
        if STAGE == "fft1":
            spec.append((jnp.swapaxes(br, 1, 2), jnp.swapaxes(bi, 1, 2)))
            continue
        br2 = jnp.swapaxes(br, 1, 2).reshape(TILE * N1, N2)
        bi2 = jnp.swapaxes(bi, 1, 2).reshape(TILE * N1, N2)
        if CMM:
            cr, ci = _cdot3_cmm(br2, bi2, c2h[:], c2l[:], N2)
        else:
            cr, ci = _cdot3(br2, bi2, c2h[:], c2l[:], s2h[:], s2l[:])
        spec.append((cr.reshape(TILE, N1, N2), ci.reshape(TILE, N1, N2)))

    if STAGE == "dma":
        acc_re = jnp.zeros((N1, N2), jnp.float32) \
            + slab[buf, 0, 0, 0, :N2][None, :]
        acc_im = jnp.zeros((N1, N2), jnp.float32) \
            + slab[buf, 0, 1, 0, :N2][None, :]
    else:
        (pr, pi), (qr, qi) = spec[0], spec[1]
        acc_re = jnp.sum(pr * qr + pi * qi, axis=0)
        acc_im = jnp.sum(pi * qr - pr * qi, axis=0)

    if HOUT:
        @pl.when(t == n_tiles - 1)
        def _():
            for c in range(NCH):
                hist_s[c, 0, pad - (NTAPS - 1):] = \
                    slab[buf, c, 0, pad + TILE - (NTAPS - 1):]
                hist_s[c, 1, pad - (NTAPS - 1):] = \
                    slab[buf, c, 1, pad + TILE - (NTAPS - 1):]

        @pl.when((g == total - 1))
        def _():
            hout_ref[...] = hist_s[...]

    if GRIDK:
        @pl.when(t == 0)
        def _():
            out_ref[0, 0] = acc_re
            out_ref[0, 1] = acc_im

        @pl.when(t != 0)
        def _():
            out_ref[0, 0] += acc_re
            out_ref[0, 1] += acc_im
    else:
        @pl.when(t == 0)
        def _():
            out_ref[0] = acc_re
            out_ref[1] = acc_im

        @pl.when(t != 0)
        def _():
            out_ref[0] += acc_re
            out_ref[1] += acc_im


def build():
    c1, s1 = _dft_mats(N1, False)
    c2, s2 = _dft_mats(N2, False)
    twc, tws = _twiddle(N1, N2, False)

    def split_np(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m.astype(np.float32) - np.asarray(hi, np.float32)
              ).astype(jnp.bfloat16)
        return jnp.asarray(hi), jnp.asarray(lo)

    if CMM:
        def big(c, s):
            n = c.shape[0]
            m = np.zeros((2 * n, 2 * n), np.float32)
            m[:n, :n] = c
            m[:n, n:] = s
            m[n:, :n] = -s
            m[n:, n:] = c
            return m
        # CMM=2 stage 1 is a LEFT multiply: [[C,-S],[S,C]] = big(C,S).T
        c1m = big(c1, s1).T if CMM == 2 else big(c1, s1)
        c1h, c1l = split_np(c1m)
        s1h, s1l = split_np(s1)  # unused
        c2h, c2l = split_np(big(c2, s2))
        s2h, s2l = split_np(s2)  # unused
    else:
        c1h, c1l = split_np(c1)
        s1h, s1l = split_np(s1)
        c2h, c2l = split_np(c2)
        s2h, s2l = split_np(s2)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    pad = _halo_pad(NTAPS)
    if GRIDK:
        n_in = 2 if TWOIN else 1
        out_specs = pl.BlockSpec((1, 2, N1, N2), lambda k, t: (k, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((K, 2, N1, N2), jnp.float32)
        scratch = [
            pltpu.VMEM((2, NCH, 2, TILE + pad, NBINS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2 * NCH)),
        ]
        if HOUT:
            out_specs = (out_specs,
                         pl.BlockSpec((NCH, 2, pad, NBINS),
                                      lambda k, t: (0, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((NCH, 2, pad, NBINS),
                                              jnp.float32))
            scratch.insert(1, pltpu.VMEM((NCH, 2, pad, NBINS), jnp.float32))
        call = pl.pallas_call(
            kernel,
            interpret=jax.default_backend() != "tpu",
            grid=(K, S // TILE),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in
            + [vmem] * 11,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
    else:
        call = pl.pallas_call(
            kernel,
            interpret=jax.default_backend() != "tpu",
            grid=(S // TILE,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 11,
            out_specs=pl.BlockSpec((2, N1, N2), lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, N1, N2), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, NCH, 2, TILE + _halo_pad(NTAPS), NBINS),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2 * NCH)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
    w = jnp.ones((NTAPS, NBINS), jnp.float32)
    consts = (w, c1h, c1l, s1h, s1l,
              jnp.asarray(np.ascontiguousarray(twc if CMM == 2 else twc.T)),
              jnp.asarray(np.ascontiguousarray(tws if CMM == 2 else tws.T)),
              c2h, c2l, s2h, s2l)

    if GRIDK and TWOIN:
        @jax.jit
        def multi(xre, xim):
            return call(xre, xim, *consts)
        return multi

    if GRIDK:
        @jax.jit
        def multi(x):
            return call(x, *consts)
        return multi

    @jax.jit
    def multi(x):
        def body(carry, xb):
            return carry, call(xb, *consts)
        _, outs = jax.lax.scan(body, 0, x)
        return outs

    return multi


def main():
    rng = np.random.default_rng(0)
    if GRIDK and TWOIN:
        args = (jnp.asarray(rng.normal(
                    size=(K, NCH, S + _halo_pad(NTAPS), NBINS)
                    ).astype(np.float32)),
                jnp.asarray(rng.normal(
                    size=(K, NCH, S + _halo_pad(NTAPS), NBINS)
                    ).astype(np.float32)))
    else:
        args = (jnp.asarray(rng.normal(
            size=(K, NCH, 2, S + _halo_pad(NTAPS), NBINS)
            ).astype(np.float32)),)
    multi = build()

    def sync(o):
        # block_until_ready does NOT synchronize Pallas outputs through
        # the remote-device tunnel — force a scalar readback or the
        # numbers are enqueue rates, not execution (see CLAUDE.md)
        return float(jnp.sum(jax.tree.leaves(o)[0]))

    out = multi(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = multi(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / 5 / K
    gs = NCH * S * NBINS / dt / 1e9
    print(f"STAGE={STAGE}: {dt*1e3:.3f} ms/block  ({gs:.2f} GS/s)")


if __name__ == "__main__":
    main()
