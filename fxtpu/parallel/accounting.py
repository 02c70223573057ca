"""Per-block ICI collective-volume accounting for the sharded FX step.

The ≥85% scaling target (BASELINE.md) cannot be measured on a one-chip
rig, but the thing that predicts it can be PROVEN: the bytes each block
moves over ICI.  This module gives both sides of that proof:

  * :func:`predicted_volume` — the analytic per-block payload model from
    the sharded-step design (`parallel/sharded.py`):

      - halo ``ppermute``: the stacked ``[2, nch, ntaps-1, nbins]`` tail
        (packed ``/4`` for int8-native),
      - psums: the fused path reduces the raw cross-power ``[nbl, nbins]``
        + the DC accumulators T/GJ ``[nch, nbins]`` + the stream tail;
        the XLA path reduces the integrated ``[nbl, nbins/F]`` + tail,
      - corner turn ``all_to_all`` (XLA path only, F>1): the full local
        spectra ``[2, nch, S/n, nbins]`` — O(num_samp) per device and the
        reason the fused no-corner-turn design wins at scale.

  * :func:`measured_volume` — the same numbers read back from the ACTUAL
    compiled executable: lower + compile the jitted step, parse every
    collective op (all-reduce / collective-permute / all-to-all /
    all-gather / reduce-scatter, sync or async-start form) and sum each
    op's result payload bytes.

`tests/test_accounting.py` asserts they agree, so the design claim
("collective traffic per block drops from O(num_samp) to O(nbl·nbins) +
the halo", sharded.py:263-265) is checked against what XLA actually
emits, not just stated.  The reference has no distributed execution at
all (its transport is single-host multiprocessing queues,
``/root/reference/effex/effex.py:105-106``).

Payload convention: bytes of each collective's RESULT array(s) — the
per-device payload the transfer delivers (compiled HLO text carries
shapes only on results; operands print as bare %names).  Async forms
count once: `-done` lines never match (no '(' directly after the op
token), and the `-start` result tuples of collective-permute/all-to-all
— `(operand-alias, result, u32[] contexts...)` — are halved after
dropping the scalar context tokens, per their documented HLO shape.
Not wire bytes — those depend on ring-vs-tree choices XLA makes per
topology.
"""

from __future__ import annotations

import re
from typing import Dict

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_OPS = ("all-reduce", "collective-permute", "all-to-all", "all-gather",
        "reduce-scatter")

# the op token in instruction position, sync or async-start ('-done('
# fails the trailing-paren match, so completions never double-count)
_LINE_RE = re.compile(r"\s(" + "|".join(_OPS) + r")(-start)?\(")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _DTYPE_BYTES:
            continue  # replica_groups=[..], layout annotations, etc.
        if not dims:
            continue  # u32[] context tokens on async ops, not payload
        n = 1
        for d in dims.split(","):
            n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def measured_volume(step, *example_args) -> Dict[str, int]:
    """Compile ``step`` (a jitted callable) on its example args and return
    per-collective-op result-payload bytes, summed over the program."""
    hlo = step.lower(*example_args).compile().as_text()
    out = {op: 0 for op in _OPS}
    for line in hlo.splitlines():
        m = _LINE_RE.search(line)
        if not m or " = " not in line[: m.start() + 1]:
            continue
        # the result shape(s): between ' = ' and the op token.  Dtype-
        # prefixed brackets only — layout tiles T(8,128), replica_groups
        # =[1,8] and u32[] context tokens all fail _shape_bytes's filter
        seg = line[: m.start()].split(" = ", 1)[1]
        nbytes = _shape_bytes(seg)
        if m.group(2):
            if m.group(1) in ("collective-permute", "all-to-all"):
                # async-start tuple = (operand alias, result, ..) with
                # operand size == result size for these two ops — halve
                nbytes //= 2
            else:
                # all-gather/reduce-scatter/all-reduce -start tuples mix
                # DIFFERENT operand and result sizes; halving would be
                # silently wrong, so fail loudly if XLA ever emits them
                # for these programs (r3 advisor finding)
                raise NotImplementedError(
                    f"async {m.group(1)}-start in compiled HLO: the "
                    "operand/result tuple sizes differ for this op — "
                    "extend measured_volume to subtract the operand "
                    "alias instead of halving")
        out[m.group(1)] += nbytes
    return out


def predicted_volume(*, nch: int, nbl: int, nbins: int, num_samp: int,
                     ntaps: int, mesh_time: int, mesh_freq: int,
                     fused: bool, int8_native: bool = False,
                     continuum: bool = False) -> Dict[str, int]:
    """Analytic per-block collective payload (bytes) of the sharded step.

    Mirrors `parallel/sharded.py` op by op; see the test for the
    measured-equals-predicted assertion."""
    n = mesh_time * mesh_freq
    halo = ntaps - 1
    s_rows = num_samp // nbins
    f32 = 4
    out = {op: 0 for op in _OPS}
    if n == 1:
        return out
    # stacked-planes tail [2, nch, halo, nbins]; int8-native moves PACKED
    # int32 words (4 bins per lane) — the 4x the mesh now preserves
    tail = 2 * nch * halo * (nbins // 4 if int8_native else nbins) * f32
    out["collective-permute"] = tail if ntaps > 1 else 0
    if fused:
        # psums: xp [2,1,nbl,nbins] + T [2,1,nch,nbins] + GJ(U) same
        # + mu [2(re,im),1,nch] + the stream tail handoff
        out["all-reduce"] = (2 * nbl * nbins * f32
                             + 2 * 2 * nch * nbins * f32
                             + 2 * nch * f32
                             + tail)
        # the fused kernel's X-stage never materializes frame-sharded
        # spectra, so there is NO corner turn
        out["all-to-all"] = 0
    else:
        # DC-removal mean over the sample-sharded block [2, nch]
        # + pmean of the integrated product [2, nbl, nbins/F]
        # + the stream-tail handoff psum
        out["all-reduce"] = (2 * nch * f32
                             + (2 * nbl * (nbins // mesh_freq) * f32
                                if mesh_time > 1 else 0)
                             + (tail if ntaps > 1 else 0))
        if mesh_freq > 1:
            # corner turn: each device's FULL local spectra block
            # [2, nch, s_rows/n, nbins] — O(num_samp), the scaling wall
            out["all-to-all"] = 2 * nch * (s_rows // n) * nbins * f32
            # fftshift of the bin-sharded output: a halves swap across
            # the freq axis [2, nbl, nbins/F] (SPECTRUM products only)
            if not continuum:
                out["collective-permute"] += (
                    2 * nbl * (nbins // mesh_freq) * f32)
    return out
