"""Recorded-IQ replay source (BASELINE.json config 3).

Plays back captured IQ (e.g. from RTL-SDRs) as aligned multi-channel blocks.
Formats:
  * ``.npy`` — a ``[nchan, nsamp]`` (or ``[nsamp]`` single-channel) complex array,
  * ``.c64`` / ``.bin`` / ``.raw`` — raw interleaved complex64 (one channel per
    file; pass a list of paths, one per channel).

Also provides :func:`save_recording` so any :class:`~fxtpu.sources.base.Source`
(including the live SDR plugin) can be captured for later replay.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Union

import numpy as np

from fxtpu.sources.base import Source


def _load_one(path: str, mmap: bool = True) -> np.ndarray:
    """Open one recording, MEMORY-MAPPED by default: a bench-scale capture
    is GBs (60 s of 2-ch complex64 at 2.4 MS/s is already 2.3 GB; GS/s
    replays are far larger), and the feeder only ever touches one block
    at a time — read_block's copy-out pulls pages through the OS cache
    on demand instead of stalling startup on a full load.  Non-c64 .npy
    recordings fall back to an in-memory convert (a mapped array can't
    be reinterpreted in place)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        arr = np.load(path, mmap_mode="r" if mmap else None)
        if arr.dtype == np.complex64:
            return arr
    elif ext in (".c64", ".bin", ".raw"):
        if mmap:
            return np.memmap(path, dtype=np.complex64, mode="r")
        arr = np.fromfile(path, dtype=np.complex64)
    else:
        raise ValueError(f"unsupported replay format: {path}")
    return np.asarray(arr, dtype=np.complex64)


class ReplaySource(Source):
    """Sequential block replay of recorded IQ, optionally looping.

    When not looping, :meth:`read_block` returns None at end-of-data, which
    ends the feeder stream — the replay analog of the reference's
    run-time-bounded SDR stream (``effex.py:652-655``).
    """

    def __init__(self, paths: Union[str, Sequence[str]], nchan: Optional[int] = None,
                 sample_rate: float = 2.4e6, center_freq: float = 1.4204e9,
                 gain: float = 49.6, loop: bool = False, mmap: bool = True):
        if isinstance(paths, str):
            data = _load_one(paths, mmap)
            if data.ndim == 1:
                data = data[None, :]
        else:
            # per-channel files: stacking would materialize the maps, so
            # multi-file recordings load in memory (pass one .npy for the
            # mapped path)
            chans = [_load_one(p, mmap=False) for p in paths]
            n = min(len(c) for c in chans)
            data = np.stack([c[:n] for c in chans])
        if nchan is not None and data.shape[0] != nchan:
            raise ValueError(
                f"recording has {data.shape[0]} channels, expected {nchan}")
        super().__init__(data.shape[0], sample_rate, center_freq, gain)
        self._data = data
        self._pos = 0
        self.loop = loop

    @property
    def total_samples(self) -> int:
        return self._data.shape[1]

    def select_channels(self, channels: Sequence[int]) -> "ReplaySource":
        """Restrict this source to a subset of channels (zero-copy view).
        Used by per-channel parallel feeders: each feeder thread owns an
        independent single-channel ReplaySource over the same recording,
        so channel reads run concurrently (numpy copies release the GIL)."""
        channels = list(channels)
        if len(channels) == 1:
            # basic slicing keeps a memory-mapped recording mapped; a
            # fancy-index would materialize the whole channel
            c = channels[0]
            self._data = self._data[c: c + 1]
        else:
            self._data = self._data[channels]
        self.nchan = self._data.shape[0]
        return self

    def split_channels(self) -> list:
        """Independent single-channel ReplaySources over zero-copy views of
        the same recording, each starting at THIS source's current cursor
        (so a resume-restored position carries into the splits).  Channel
        reads then run concurrently — numpy copies release the GIL — and
        each split satisfies the zero-copy producer's 1-channel
        requirement (`runtime/feeder.py` reserve/commit loop)."""
        outs = []
        for c in range(self.nchan):
            s = ReplaySource.__new__(ReplaySource)
            Source.__init__(s, 1, self.sample_rate, self.center_freq,
                            self.gain)
            s._data = self._data[c: c + 1]
            s._pos = self._pos
            s.loop = self.loop
            outs.append(s)
        return outs

    def read_block(self, num_samp: int) -> Optional[np.ndarray]:
        n = self._data.shape[1]
        if self._pos + num_samp > n:
            if not self.loop:
                return None
            self._pos = 0
            if num_samp > n:
                raise ValueError("block longer than recording")
        block = self._data[:, self._pos: self._pos + num_samp]
        self._pos += num_samp
        return np.ascontiguousarray(block)

    def read_block_into(self, out: np.ndarray, num_samp: int) -> bool:
        """Zero-copy-producer read: copy the next block of a SINGLE-channel
        replay straight into ``out`` (a ring slot view, shape
        ``[num_samp]``) — one pass instead of read_block's
        ascontiguousarray staging copy + put memcpy.  False = exhausted."""
        if self.nchan != 1:
            raise ValueError("read_block_into requires a 1-channel source")
        n = self._data.shape[1]
        if self._pos + num_samp > n:
            if not self.loop:
                return False
            self._pos = 0
            if num_samp > n:
                raise ValueError("block longer than recording")
        np.copyto(out, self._data[0, self._pos: self._pos + num_samp])
        self._pos += num_samp
        return True

    def snapshot_state(self) -> dict:
        return {"pos": self._pos}

    def restore_state(self, state: dict) -> None:
        self._pos = int(state["pos"])

    def read_block_span(self, num_samp: int, start: int,
                        stop: int) -> Optional[np.ndarray]:
        """Random-access span read: materializes only [start, stop) of the
        next block (each multi-host process touches only the samples its
        devices own) while the stream position still advances by the full
        block."""
        n = self._data.shape[1]
        if self._pos + num_samp > n:
            if not self.loop:
                return None
            self._pos = 0
            if num_samp > n:
                raise ValueError("block longer than recording")
        block = self._data[:, self._pos + start: self._pos + stop]
        self._pos += num_samp
        return np.ascontiguousarray(block)


def save_recording(source: Source, path: str, num_samp: int, nblocks: int):
    """Capture ``nblocks`` aligned blocks from any source into a replayable
    ``.npy`` file."""
    blocks = []
    for _ in range(nblocks):
        b = source.read_block(num_samp)
        if b is None:
            break
        blocks.append(b)
    if not blocks:
        raise ValueError("source produced no data")
    np.save(path, np.concatenate(blocks, axis=1))
    return path
