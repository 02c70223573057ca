"""Mesh-sharded FX correlator step (shard_map + XLA collectives).

The distributed decomposition (nothing like it exists in the reference — its
only transport is pickled arrays over multiprocessing queues on one host,
``/root/reference/effex/effex.py:105-106``; this is the SURVEY.md §5.8
TPU-native equivalent):

  1. **F-stage, frame-sharded.**  The input block ``[nch, num_samp]`` is
     viewed as ``S = num_samp/nbins`` PFB rows and split across the
     linearized (time, freq) mesh.  Each device runs the windowed-FIR + FFT
     on its local rows.
  2. **Halo exchange.**  Frame ``k`` needs rows ``k-ntaps+1..k``, so each
     device sends its trailing ``ntaps-1`` rows to its right neighbor
     (``lax.ppermute`` over the linearized shard index — (ntaps-1)*nbins
     samples per channel, tiny vs. the data).  Shard 0 consumes the tap
     history carried from the previous block, preserving streaming
     continuity across both block and shard boundaries.
  3. **Corner turn.**  ``lax.all_to_all`` over the 'freq' axis converts the
     spectra from frame-sharded to bin-sharded layout — the canonical FX
     corner turn, riding ICI.
  4. **X-stage, bin-sharded.**  Each device multiply-accumulates its bins
     for every baseline over its local frames; ``lax.pmean`` over 'time'
     completes the visibility integration.

Output: visibilities ``[nbl, nbins]`` bin-sharded over 'freq' (fftshift and
the continuum reduction happen outside the shard_map on the global array),
plus the new tap history for the next block.

Default impl is 'planes' (dual-plane reals — the only representation this
TPU backend executes); collectives move a single stacked ``[2, ...]`` array
so each exchange is one transfer.  The 'complex' impl is kept for CPU
cross-checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from fxtpu.ops import cfft
from fxtpu.ops import planes as pl_ops
from fxtpu.ops.cplx import Cplx, cfftshift, stack, unstack
from fxtpu.ops.pfb import pfb_fir
from fxtpu.ops.xengine import fstc_rotate, continuum_reduce
from fxtpu.parallel.mesh import FREQ_AXIS, TIME_AXIS, validate_shapes

AXES = (TIME_AXIS, FREQ_AXIS)


def _replicate_out(mesh, tree_):
    """Multi-process: force outputs fully replicated (an in-graph
    all_gather) so every host can read them (np.asarray on a
    non-addressable sharded Array raises in multi-controller runs)."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda a: lax.with_sharding_constraint(a, rep), tree_)


def _make_fused_sharded_step(*, mode: str, nbins: int, w2d, pairs,
                             bandwidth: float, frequency: float,
                             mesh: jax.sharding.Mesh, num_samp: int,
                             ntaps: int, quant_step: float = 1.0 / 32,
                             int8_native: bool = False):
    """Sharded step around the fused full-step Pallas kernel: every shard
    runs FIR+FFT+X on its local frames (kernel ``history`` input = the
    ppermute'd RAW halo), the kernel's post-hoc DC accumulators are
    psum'd across the mesh, and the correction + rotation act on the tiny
    global arrays — no corner turn (see make_sharded_fx_step docstring).

    DC classes under sharding: a shard s>0's first frames mix the left
    neighbor's RAW rows — every tap carries the CURRENT block's mean, so
    they are interior-class; only shard 0's first ``ntaps-1`` frames (the
    ones reaching into the corrected stream history) are special, hence
    the U accumulator is masked to shard 0 before the psum.

    ``int8_native``: the samples stay 8-bit END-TO-END through the mesh
    (VERDICT r2 missing #2 — previously the sharded step dequantized
    int8 to f32 planes in-graph, losing the kernel-side 4x DMA saving).
    The step then takes PACKED int32 words ``[nch, S, nbins//4]``
    frame-sharded (parallel.ingest.put_packed) and a dict history
    ``{"tail": packed raw tail, "mu_prev": Cplx [nch]}`` — the
    single-device RAW-tail contract (ops/pfb_pallas.py:1289-1295)
    generalized: the ppermute'd halo is the neighbor's RAW packed rows,
    each shard's kernel runs on its int8 slab, and the psum'd T/U/xp
    accumulators feed one post-hoc ``_dc_correct(mu_prev=)`` on the
    global arrays.  Shard masking is unchanged — a shard s>0's front
    frames read same-block raw rows (mean = the current block's mu,
    and A_j + B_j = Abar), so they are interior-class exactly as in the
    f32 contract; only shard 0's frames reach into the PREVIOUS block's
    raw tail and carry the mu_prev perturbation."""
    from fxtpu.fx import _finish_fused
    from fxtpu.ops.pfb_pallas import (_dc_constants, _dc_correct,
                                      fx_pallas_parts)

    t_sz = mesh.shape[TIME_AXIS]
    f_sz = mesh.shape[FREQ_AXIS]
    n_shards = t_sz * f_sz
    s_rows = num_samp // nbins
    halo = ntaps - 1
    pairs_np = np.asarray(pairs)
    continuum = mode in ("CONTINUUM", "TEST")
    w2dj = jnp.asarray(w2d, jnp.float32)
    consts = _dc_constants(tuple(np.asarray(w2d, np.float64).ravel()),
                           nbins, s_rows)
    multihost = jax.process_count() > 1

    if int8_native:
        def local_fx_i8(rows: Cplx, tail_prev: Cplx):
            # rows: [nch, S_loc, nbins//4] PACKED int32 planes (this
            # shard's frames); tail_prev: the previous BLOCK's raw packed
            # tail (consumed by shard 0 only)
            tail_raw = Cplx(rows.re[:, -halo:], rows.im[:, -halo:])
            if n_shards > 1:
                idx = lax.axis_index(AXES)
                prev = unstack(lax.ppermute(
                    stack(tail_raw), AXES,
                    [(i, i + 1) for i in range(n_shards - 1)]))
                prev = Cplx(jnp.where(idx == 0, tail_prev.re, prev.re),
                            jnp.where(idx == 0, tail_prev.im, prev.im))
            else:
                idx = 0
                prev = tail_prev
            xk = Cplx(rows.re[None], rows.im[None])
            xp, T, U, mu_q, _, _ = fx_pallas_parts(
                xk, w2dj, nbins, prev, pairs_np, quant_step=quant_step)
            mask0 = (idx == 0).astype(jnp.float32) if n_shards > 1 else 1.0
            xp_g = unstack(lax.psum(stack(xp), AXES))
            T_g = unstack(lax.psum(stack(T), AXES))
            U_g = unstack(lax.psum(stack(U) * mask0, AXES))
            # kernel means are over this shard's equal-sized frame span
            # (QUANT units — real scaling happens on the global array)
            mu_g = Cplx(lax.psum(mu_q.re, AXES) / n_shards,
                        lax.psum(mu_q.im, AXES) / n_shards)
            if n_shards > 1:
                tail_g = unstack(lax.psum(
                    jnp.where(idx == n_shards - 1, stack(tail_raw),
                              jnp.zeros_like(stack(tail_raw))), AXES))
            else:
                tail_g = tail_raw
            return xp_g, T_g, U_g, mu_g, tail_g

        sharded_i8 = jax.shard_map(
            local_fx_i8, mesh=mesh,
            in_specs=(P(None, AXES, None), P()),
            out_specs=(P(), P(), P(), P(), P()),
            check_vma=False,
        )

        @jax.jit
        def step_i8(iq: Cplx, delays, history: dict):
            rows = jax.tree.map(
                lambda a: lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P(None, AXES, None))), iq)
            xp, T, U, mu_q, tail_raw = sharded_i8(rows, history["tail"])
            mu = Cplx(mu_q.re * quant_step, mu_q.im * quant_step)
            mu_prev = Cplx(history["mu_prev"].re[None],
                           history["mu_prev"].im[None])
            xp = _dc_correct(xp, T, U, mu, pairs_np, consts, s_rows,
                             mu_prev=mu_prev)
            vis = _finish_fused(xp, jnp.asarray(delays)[None], pairs_np,
                                nbins, s_rows, bandwidth, frequency,
                                continuum)
            new_hist = {"tail": tail_raw,
                        "mu_prev": Cplx(mu.re[0], mu.im[0])}
            if multihost:
                vis, new_hist = _replicate_out(mesh, (vis, new_hist))
            return vis[0], new_hist

        step_i8.fused_kernel = True
        step_i8.int8_native = True  # FxEngine keys history/ingest off this
        return step_i8

    def local_fx(rows: Cplx, history: Cplx):
        # rows: [nch, S_loc, nbins] framed planes (this shard's frames)
        tail_raw = Cplx(rows.re[:, -halo:], rows.im[:, -halo:])
        if n_shards > 1:
            idx = lax.axis_index(AXES)
            prev = unstack(lax.ppermute(
                stack(tail_raw), AXES,
                [(i, i + 1) for i in range(n_shards - 1)]))
            prev = Cplx(jnp.where(idx == 0, history.re, prev.re),
                        jnp.where(idx == 0, history.im, prev.im))
        else:
            idx = 0
            prev = history
        xk = Cplx(rows.re[None], rows.im[None])
        xp, T, U, mu, _, _ = fx_pallas_parts(xk, w2dj, nbins, prev,
                                             pairs_np)
        # global accumulators: psum everything; U masked to shard 0 (the
        # only special-class frames); stream tail from the last shard
        mask0 = (idx == 0).astype(jnp.float32) if n_shards > 1 else 1.0
        xp_g = unstack(lax.psum(stack(xp), AXES))
        T_g = unstack(lax.psum(stack(T), AXES))
        U_g = unstack(lax.psum(stack(U) * mask0, AXES))
        # local means are over equal-sized shards: global mean = pmean
        mu_g = Cplx(lax.psum(mu.re, AXES) / n_shards,
                    lax.psum(mu.im, AXES) / n_shards)
        if n_shards > 1:
            tail_g = unstack(lax.psum(
                jnp.where(idx == n_shards - 1, stack(tail_raw),
                          jnp.zeros_like(stack(tail_raw))), AXES))
        else:
            tail_g = tail_raw
        return xp_g, T_g, U_g, mu_g, tail_g

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the shard_map checker requires otherwise
    sharded = jax.shard_map(
        local_fx, mesh=mesh,
        in_specs=(P(None, AXES, None), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(iq: Cplx, delays, history: Cplx):
        from fxtpu.fx import _dequant
        iq = _dequant(iq, quant_step)
        if iq.re.ndim == 2:
            rows = Cplx(
                iq.re[:, : s_rows * nbins].reshape(-1, s_rows, nbins),
                iq.im[:, : s_rows * nbins].reshape(-1, s_rows, nbins))
        else:
            rows = iq
        rows = jax.tree.map(
            lambda a: lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(None, AXES, None))), rows)
        xp, T, U, mu, tail_raw = sharded(rows, history)
        xp = _dc_correct(xp, T, U, mu, pairs_np, consts, s_rows)
        # xp carries a leading K=1 axis; give delays one too so the
        # plain-vs-packed shape detection in _finish_fused lines up
        vis = _finish_fused(xp, jnp.asarray(delays)[None], pairs_np, nbins,
                            s_rows, bandwidth, frequency, continuum)
        new_hist = Cplx(tail_raw.re - mu.re[0][:, None, None],
                        tail_raw.im - mu.im[0][:, None, None])
        if multihost:
            vis, new_hist = _replicate_out(mesh, (vis, new_hist))
        return vis[0], new_hist

    step.fused_kernel = True  # introspectable (tests assert the path taken)
    return step


def _make_fused_sharded_multi(*, mode: str, nbins: int, w2d, pairs,
                              bandwidth: float, frequency: float,
                              mesh: jax.sharding.Mesh, num_samp: int,
                              ntaps: int, quant_step: float,
                              int8_native: bool):
    """K-blocks-per-dispatch sharded step, BLOCK-data-parallel: the K axis
    is sharded over the linearized (time, freq) mesh and every shard runs
    the single-device fused multi-block kernel (fx_pallas_raw_multi) on
    its K/n whole, stream-contiguous blocks.

    Why this beats frame-sharding the blocks: each block's X-stage is
    entirely local to one shard, so the per-block psums (xp/T/U/mu —
    0.56 MB/block at the flagship shape, design.md §7a) VANISH.  Per
    dispatch the only collectives are one halo ppermute of each shard's
    boundary tail + mean (the kernel history contract precomputed from
    the RAW input, so no shard waits on its neighbor's kernel) and the
    psum that replicates the last shard's carried history — O(nch*halo*
    nbins) per K blocks instead of per block.  This is also what lets
    mesh runs amortize the ~1.4 ms/dispatch tunnel latency K-fold, the
    wall single-device K-batching removed (design.md §3; r3 VERDICT
    missing #2).

    Requires K divisible by the shard count (FxEngine.dispatch_batch_for
    rounds the configured batch down to a multiple).  History contract
    and outputs match K sequential sharded single steps (asserted in
    tests/test_sharded.py)."""
    from fxtpu.fx import _finish_fused
    from fxtpu.ops.pfb_pallas import _unpack_i8, fx_pallas_raw_multi

    t_sz = mesh.shape[TIME_AXIS]
    f_sz = mesh.shape[FREQ_AXIS]
    n_shards = t_sz * f_sz
    s_rows = num_samp // nbins
    halo = ntaps - 1
    pairs_np = np.asarray(pairs)
    continuum = mode in ("CONTINUUM", "TEST")
    w2dj = jnp.asarray(w2d, jnp.float32)
    multihost = jax.process_count() > 1

    def boundary_history(iq: Cplx):
        """The history my RIGHT neighbor's first block needs, computed
        from my raw input alone: the last local block's (corrected) tail
        and mean — exactly what the kernel would return after that block,
        so no shard waits on another's kernel."""
        if int8_native:
            tail = Cplx(iq.re[:, -1, -halo:], iq.im[:, -1, -halo:])
            lastf = Cplx(_unpack_i8(iq.re[:, -1], jnp.float32),
                         _unpack_i8(iq.im[:, -1], jnp.float32))
            mu = Cplx(
                jnp.mean(lastf.re, axis=(-2, -1)) * quant_step,
                jnp.mean(lastf.im, axis=(-2, -1)) * quant_step)
            return {"tail": tail, "mu_prev": mu}
        mu_re = jnp.mean(iq.re[:, -1], axis=(-2, -1))
        mu_im = jnp.mean(iq.im[:, -1], axis=(-2, -1))
        return Cplx(iq.re[:, -1, -halo:] - mu_re[:, None, None],
                    iq.im[:, -1, -halo:] - mu_im[:, None, None])

    def local_multi(iq: Cplx, delays, history):
        # iq: [nch, K_loc, S, lanes] merged planes (this shard's WHOLE
        # blocks); delays [K_loc, nch(, 2)]; history = the dispatch-
        # carried stream history (replicated; shard 0 consumes it)
        if n_shards > 1:
            idx = lax.axis_index(AXES)
            bound = boundary_history(iq)
            perm = [(i, i + 1) for i in range(n_shards - 1)]
            recv = jax.tree.map(lambda a: lax.ppermute(a, AXES, perm),
                                bound)
            prev = jax.tree.map(
                lambda h, r: jnp.where(idx == 0, h.astype(r.dtype), r),
                history, recv)
        else:
            idx = 0
            prev = history
        xp, my_hist = fx_pallas_raw_multi(iq, w2dj, nbins, prev, pairs_np,
                                          quant_step=quant_step,
                                          merged=True)
        vis = _finish_fused(xp, delays, pairs_np, nbins, s_rows,
                            bandwidth, frequency, continuum)
        # the dispatch's carried history = the LAST shard's kernel output
        if n_shards > 1:
            new_hist = jax.tree.map(
                lambda a: lax.psum(
                    jnp.where(idx == n_shards - 1, a, jnp.zeros_like(a)),
                    AXES),
                my_hist)
        else:
            new_hist = my_hist
        return vis, new_hist

    sharded_multi = jax.shard_map(
        local_multi, mesh=mesh,
        in_specs=(P(None, AXES), P(AXES), P()),
        out_specs=(P(AXES), P()),
        check_vma=False,
    )

    @jax.jit
    def multi(iq: Cplx, delays, history):
        from fxtpu.fx import _dequant
        k = iq.re.shape[1]
        if k % n_shards != 0:
            raise ValueError(
                f"sharded multi_step needs K % {n_shards} == 0, got K={k} "
                "(FxEngine.dispatch_batch_for rounds the batch down)")
        if not int8_native:
            iq = _dequant(iq, quant_step)
        iq = jax.tree.map(
            lambda a: lax.with_sharding_constraint(
                a, NamedSharding(mesh, P(None, AXES, None, None))), iq)
        vis, new_hist = sharded_multi(iq, jnp.asarray(delays), history)
        if multihost:
            vis, new_hist = _replicate_out(mesh, (vis, new_hist))
        return vis, new_hist

    multi.fused_kernel = True
    multi.int8_native = int8_native
    multi.merged_input = True  # FxEngine.prepare_batch stages merged
    return multi


def make_sharded_fx_multi_step(*, mode: str, nbins: int,
                               window2d: np.ndarray, pairs: np.ndarray,
                               bandwidth: float, frequency: float,
                               mesh: jax.sharding.Mesh, num_samp: int,
                               impl: str = "planes", fused="auto",
                               quant_step: float = 1.0 / 32,
                               int8_ingest: bool = False):
    """K-blocks-per-dispatch sharded step (r3 VERDICT missing #2: mesh
    runs previously paid the ~1.4 ms dispatch latency per block).

        multi(iq, delays [K, nch(,2)], history) -> (vis [K, ...], new_hist)

    Fused engines get the block-data-parallel kernel dispatch
    (:func:`_make_fused_sharded_multi`; iq is the MERGED ``[nch, K, S,
    lanes]`` layout from FxEngine.prepare_batch, K-sharded).  The XLA
    path wraps the per-block sharded step in a ``lax.scan`` (iq stacked
    ``[K, nch, num_samp]``): same executables, the K-fold dispatch
    amortization, no layout change.  History formats match the per-block
    sharded step's, so full batches and remainder single steps mix freely
    in one run (the Correlator does exactly that)."""
    if impl != "planes":
        raise ValueError("sharded multi_step: planes impl only")
    ntaps = int(window2d.shape[0])
    validate_shapes(num_samp, nbins, mesh, ntaps)
    s_rows = num_samp // nbins
    nch = int(np.asarray(pairs).max()) + 1

    # the history format MUST match the per-block sharded step's (full
    # batches and remainder single steps share one carried history), so
    # the multi path follows the step's fused decision
    step = make_sharded_fx_step(
        mode=mode, nbins=nbins, window2d=window2d, pairs=pairs,
        bandwidth=bandwidth, frequency=frequency, mesh=mesh,
        num_samp=num_samp, impl=impl, fused=fused,
        quant_step=quant_step, int8_ingest=int8_ingest)
    step_fused = bool(getattr(step, "fused_kernel", False))

    if step_fused:
        from fxtpu.fx import _deep_svd_applies, _resolve_fused
        # block-DP shards see WHOLE blocks (full s_rows), unlike the
        # frame-sharded per-block step (s_rows/n): re-check support at
        # this path's actual shape (a superset in practice — the tile
        # divides s_rows whenever it divides s_rows/n)
        if not _resolve_fused(
                fused, nbins, ntaps, s_rows, nch,
                deep_svd=_deep_svd_applies(window2d, nbins,
                                           int8=int8_ingest)):
            return None  # no batched dispatch for this shape
        return _make_fused_sharded_multi(
            mode=mode, nbins=nbins, w2d=window2d, pairs=pairs,
            bandwidth=bandwidth, frequency=frequency, mesh=mesh,
            num_samp=num_samp, ntaps=ntaps, quant_step=quant_step,
            int8_native=int8_ingest)

    @jax.jit
    def multi(iq, delays, history):
        def body(hist, xs):
            blk, d = xs
            vis, hist = step(blk, d, hist)
            return hist, vis

        new_hist, vis = jax.lax.scan(body, history,
                                     (iq, jnp.asarray(delays)))
        return vis, new_hist

    multi.fused_kernel = False
    multi.merged_input = False
    return multi


def make_sharded_fx_step(*, mode: str, nbins: int, window2d: np.ndarray,
                         pairs: np.ndarray, bandwidth: float, frequency: float,
                         mesh: jax.sharding.Mesh, num_samp: int,
                         impl: str = "planes", fused="auto",
                         quant_step: float = 1.0 / 32,
                         int8_ingest: bool = False):
    """Build a jitted sharded step: ``(iq [nch, num_samp], delays [nch],
    history [nch, ntaps-1, nbins]) -> (vis, new_history)``.

    ``vis`` is ``[nbl, nbins]`` (SPECTRUM) or ``[nbl]`` (CONTINUUM/TEST),
    fftshifted, matching the single-device path up to float reduction order.

    ``fused='auto'``: on TPU, supported shallow-tap shapes run the fused
    full-step Pallas kernel per shard — and because the kernel fuses the
    X-stage (spectra never materialize), the classic frame->bin corner
    turn (``all_to_all``) disappears entirely: every shard correlates its
    local frames and ONE tiny ``psum`` of the [nbl, nbins] raw cross power
    completes the integration.  Collective traffic per block drops from
    O(num_samp) (corner turn) to O(nbl*nbins) + the (ntaps-1)-row halo.
    """
    ntaps = int(window2d.shape[0])
    if window2d.shape[1] != nbins:
        raise ValueError("window2d must be [ntaps, nbins]")
    t_sz = mesh.shape[TIME_AXIS]
    f_sz = mesh.shape[FREQ_AXIS]
    n_shards = t_sz * f_sz
    validate_shapes(num_samp, nbins, mesh, ntaps)
    s_rows = num_samp // nbins
    w2d = jnp.asarray(window2d, dtype=jnp.float32)
    pairs_a = jnp.asarray(pairs)
    continuum = mode in ("CONTINUUM", "TEST")

    def _exchange_halo(rows_stacked, hist_stacked):
        """rows/hist as single stacked arrays [2|1, nch, S_loc|ntaps-1, nbins]
        (planes stack both components; complex impl passes [1, ...])."""
        tail = rows_stacked[:, :, -(ntaps - 1):, :]
        if n_shards > 1:
            idx = lax.axis_index(AXES)
            prev = lax.ppermute(
                tail, AXES, [(i, i + 1) for i in range(n_shards - 1)])
            prev = jnp.where(idx == 0, hist_stacked.astype(tail.dtype), prev)
            new_hist = lax.psum(
                jnp.where(idx == n_shards - 1, tail, jnp.zeros_like(tail)),
                AXES)
        else:
            prev = hist_stacked.astype(tail.dtype)
            new_hist = tail
        return prev, new_hist

    # ------------------------------------------------------------------
    if impl == "planes":
        from fxtpu.fx import _deep_svd_applies, _resolve_fused
        s_loc = s_rows // n_shards
        nch = int(np.asarray(pairs).max()) + 1
        use_fused = _resolve_fused(
            fused, nbins, ntaps, s_loc, nch,
            deep_svd=_deep_svd_applies(w2d, nbins, int8=int8_ingest))
        if use_fused:
            return _make_fused_sharded_step(
                mode=mode, nbins=nbins, w2d=w2d, pairs=pairs_a,
                bandwidth=bandwidth, frequency=frequency, mesh=mesh,
                num_samp=num_samp, ntaps=ntaps, quant_step=quant_step,
                int8_native=int8_ingest)

        def local_fx(rows: Cplx, delays, history: Cplx):
            # rows: [nch, S_loc, nbins] planes; history: [nch, ntaps-1, nbins]
            if ntaps > 1:
                prev, new_hist = _exchange_halo(stack(rows), stack(history))
                xp = Cplx(
                    jnp.concatenate([prev[0], rows.re], axis=1),
                    jnp.concatenate([prev[1], rows.im], axis=1))
                new_hist = unstack(new_hist)
            else:
                xp, new_hist = rows, history
            fir = pl_ops.pfb_fir_planes(xp, w2d)
            spec = cfft.fft(fir)
            spec = pl_ops.fstc_rotate_planes(spec, delays, bandwidth,
                                             frequency)
            if f_sz > 1:
                # corner turn on one stacked array:
                # [2, nch, S_loc, nbins] -> [2, nch, S_loc*F, nbins/F]
                spec = unstack(lax.all_to_all(stack(spec), FREQ_AXIS,
                                              split_axis=3, concat_axis=2,
                                              tiled=True))
            # per-pair or Gram-matmul X-stage (pl_ops picks by nbl)
            acc = pl_ops.xcorr_baselines_planes(spec, pairs_a, shift=False)
            acc = unstack(lax.pmean(stack(acc), TIME_AXIS))
            return acc, new_hist

        sharded = jax.shard_map(
            local_fx, mesh=mesh,
            in_specs=(P(None, AXES, None), P(), P()),
            out_specs=(P(None, FREQ_AXIS), P()),
        )

        multihost = jax.process_count() > 1

        @jax.jit
        def step(iq: Cplx, delays, history: Cplx):
            from fxtpu.fx import _dequant
            iq = jax.tree.map(
                lambda a: lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P(None, AXES))), iq)
            iq = pl_ops.dc_remove_planes(_dequant(iq, quant_step))
            rows = jax.tree.map(
                lambda a: lax.with_sharding_constraint(
                    a[:, : s_rows * nbins].reshape(a.shape[0], s_rows, nbins),
                    NamedSharding(mesh, P(None, AXES, None))), iq)
            vis, new_hist = sharded(rows, jnp.asarray(delays), history)
            vis = cfftshift(vis, axes=-1)
            if continuum:
                vis = Cplx(jnp.mean(vis.re, axis=-1) / bandwidth,
                           jnp.mean(vis.im, axis=-1) / bandwidth)
            if multihost:
                vis, new_hist = _replicate_out(mesh, (vis, new_hist))
            return vis, new_hist

        return step

    # ------------------------------------------------------------------
    if impl != "complex":
        raise ValueError(f"unknown impl {impl}")

    def local_fx_c(rows, delays, history):
        if ntaps > 1:
            prev, new_hist = _exchange_halo(rows[None], history[None])
            xp = jnp.concatenate([prev[0], rows], axis=1)
            new_hist = new_hist[0]
        else:
            xp, new_hist = rows, history
        fir = pfb_fir(xp, w2d)
        spec = jnp.fft.fft(fir, axis=-1)
        spec = fstc_rotate(spec, delays, bandwidth, frequency)
        if f_sz > 1:
            spec = lax.all_to_all(spec, FREQ_AXIS, split_axis=2,
                                  concat_axis=1, tiled=True)
        gp = jnp.take(spec, pairs_a[:, 0], axis=0)
        gq = jnp.take(spec, pairs_a[:, 1], axis=0)
        acc = jnp.mean(gp * jnp.conj(gq), axis=1)
        acc = lax.pmean(acc, TIME_AXIS)
        return acc, new_hist

    sharded_c = jax.shard_map(
        local_fx_c, mesh=mesh,
        in_specs=(P(None, AXES, None), P(), P()),
        out_specs=(P(None, FREQ_AXIS), P()),
    )

    multihost = jax.process_count() > 1

    @jax.jit
    def step_c(iq, delays, history):
        iq = iq.astype(jnp.complex64)
        iq = lax.with_sharding_constraint(
            iq, NamedSharding(mesh, P(None, AXES)))
        iq = iq - jnp.mean(iq, axis=-1, keepdims=True)
        rows = iq[:, : s_rows * nbins].reshape(iq.shape[0], s_rows, nbins)
        rows = lax.with_sharding_constraint(
            rows, NamedSharding(mesh, P(None, AXES, None)))
        vis, new_hist = sharded_c(rows, jnp.asarray(delays), history)
        vis = jnp.fft.fftshift(vis, axes=-1)
        if continuum:
            vis = continuum_reduce(vis, bandwidth)
        if multihost:
            vis, new_hist = _replicate_out(mesh, (vis, new_hist))
        return vis, new_hist

    return step_c
