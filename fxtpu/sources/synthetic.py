"""Synthetic IQ sources: correlated noise and tones with injectable delay.

Replaces the live USB receivers for development, testing, and benchmarking
(BASELINE.json config 1).  The generators mirror the reference test-suite's
synthetic signals (``/root/reference/tests/test_effex.py:31-49``) and add the
one thing the reference never had: a *correlated* multi-channel source with a
known, injectable inter-channel delay — the ground truth the calibration and
TEST-mode fringe oracles check against.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from fxtpu.sources.base import Source


def complex_noise(rng: np.random.Generator, num_samp: int,
                  scale: float = 0.1) -> np.ndarray:
    """Complex Gaussian noise (``test_effex.py:44-49``)."""
    return (rng.normal(size=num_samp, scale=scale)
            + 1j * rng.normal(size=num_samp, scale=scale)).astype(np.complex64)


def complex_sinusoid(num_samp: int, rate: float, freq: float,
                     phase: float = 0.0, t0: float = 0.0) -> np.ndarray:
    """Complex tone (``test_effex.py:31-41``), with a start-time offset so
    consecutive blocks are phase-continuous."""
    t = t0 + np.arange(num_samp) / rate
    ph = 2.0 * np.pi * freq * t + phase
    return (np.cos(ph) + 1j * np.sin(ph)).astype(np.complex64)


def fractional_delay(x: np.ndarray, delay_samples: float) -> np.ndarray:
    """Apply a (possibly fractional) circular delay via an FFT phase ramp.

    Positive delay shifts the signal later in time (``roll(x, +k)`` for
    integer k), the same convention the reference tests use
    (``test_effex.py:101``).
    """
    if delay_samples == 0:
        return x
    n = len(x)
    f = np.fft.fftfreq(n)
    return np.fft.ifft(np.fft.fft(x)
                       * np.exp(-2j * np.pi * f * delay_samples)).astype(x.dtype)


class NoiseSource(Source):
    """Correlated wideband noise across N channels.

    Each channel sees a common flat-PSD noise signal (the reference's
    calibration assumes exactly this input — ``effex.py:480-481``) delayed by
    ``delays[c]`` seconds, plus independent per-channel noise at
    ``1/snr`` of the common power.
    """

    def __init__(self, nchan: int = 2, sample_rate: float = 2.4e6,
                 center_freq: float = 1.4204e9, gain: float = 49.6,
                 delays: Optional[Sequence[float]] = None,
                 snr: float = 10.0, seed: int = 77777, scale: float = 0.1):
        super().__init__(nchan, sample_rate, center_freq, gain)
        self.delays = np.zeros(nchan) if delays is None else np.asarray(
            delays, dtype=np.float64)
        if len(self.delays) != nchan:
            raise ValueError("need one delay per channel")
        self.snr = float(snr)
        self.scale = float(scale)
        self._rng = np.random.default_rng(seed)

    def read_block(self, num_samp: int) -> np.ndarray:
        common = complex_noise(self._rng, num_samp, self.scale)
        noise_scale = self.scale / np.sqrt(self.snr)
        out = np.empty((self.nchan, num_samp), dtype=np.complex64)
        for c in range(self.nchan):
            d_samp = self.delays[c] * self.sample_rate
            sig = fractional_delay(common, d_samp)
            out[c] = sig + complex_noise(self._rng, num_samp, noise_scale)
        return out

    def snapshot_state(self) -> dict:
        # bit_generator.state is a plain nested dict of ints/strs — the
        # full generator position, so a resumed run regenerates the SAME
        # noise an uninterrupted run would have (SURVEY §5.4)
        return {"rng": self._rng.bit_generator.state}

    def restore_state(self, state: dict) -> None:
        self._rng.bit_generator.state = state["rng"]


class SinusoidSource(Source):
    """Correlated complex tone across N channels (phase-continuous between
    blocks), with optional additive noise — the spectrometer oracle input."""

    def __init__(self, nchan: int = 2, sample_rate: float = 2.4e6,
                 center_freq: float = 1.4204e9, gain: float = 49.6,
                 tone_freq: float = 1e5, delays: Optional[Sequence[float]] = None,
                 noise_scale: float = 0.0, seed: int = 77777):
        super().__init__(nchan, sample_rate, center_freq, gain)
        self.tone_freq = float(tone_freq)
        self.delays = np.zeros(nchan) if delays is None else np.asarray(
            delays, dtype=np.float64)
        self.noise_scale = float(noise_scale)
        self._rng = np.random.default_rng(seed)
        self._t0 = 0.0

    def read_block(self, num_samp: int) -> np.ndarray:
        out = np.empty((self.nchan, num_samp), dtype=np.complex64)
        for c in range(self.nchan):
            out[c] = complex_sinusoid(num_samp, self.sample_rate,
                                      self.tone_freq,
                                      t0=self._t0 - self.delays[c])
            if self.noise_scale:
                out[c] += complex_noise(self._rng, num_samp, self.noise_scale)
        self._t0 += num_samp / self.sample_rate
        return out

    def snapshot_state(self) -> dict:
        return {"rng": self._rng.bit_generator.state, "t0": self._t0}

    def restore_state(self, state: dict) -> None:
        self._rng.bit_generator.state = state["rng"]
        self._t0 = float(state["t0"])


class FaultInjectingSource(Source):
    """Wraps another source and injects faults (dropped or short blocks) on
    a schedule — the fault-injection hook SURVEY.md §5.3 calls for.

    A drop is a REAL stream gap: the skipped block's sequence number is
    skipped too (the feeder reads :meth:`take_dropped` and advances its
    seq counter), so downstream ring blocks carry the gap exactly like a
    live radio losing a USB transfer.  ``drop_channel`` confines the drop
    schedule to one channel — via :meth:`split_channels`, so it requires
    per-channel feeders — which is what actually exercises the
    :class:`~fxtpu.runtime.feeder.BlockAligner`'s seq-realign path end to
    end (an all-channel drop stays aligned)."""

    def __init__(self, inner: Source, drop_every: int = 0,
                 short_every: int = 0, fail_at: int = -1,
                 drop_channel: Optional[int] = None):
        super().__init__(inner.nchan, inner.sample_rate, inner.center_freq,
                         inner.gain)
        self.inner = inner
        self.drop_every = drop_every
        self.short_every = short_every
        self.fail_at = fail_at
        self.drop_channel = drop_channel
        self._count = 0
        self._dropped = 0
        # transparent wrapper: keep the inner source's feeder discipline
        # (realtime drop-vs-backpressure) and bandwidth ceiling, like
        # QuantizedSource
        self.realtime = getattr(inner, "realtime", False)
        self.max_stable_bandwidth = inner.max_stable_bandwidth

    def read_block(self, num_samp: int) -> Optional[np.ndarray]:
        self._count += 1
        if self._count == self.fail_at:
            raise RuntimeError(f"injected source failure at block {self._count}")
        if self.drop_channel is not None and self.nchan > 1:
            # a multi-channel read cannot represent a one-channel gap —
            # the schedule only takes effect through split_channels()
            # (per-channel feeders); reading unsplit would silently
            # inject NOTHING, vacuously passing whatever test used it
            raise RuntimeError(
                "drop_channel requires per-channel feeders: this source "
                "must be consumed via split_channels() (Correlator default"
                " channel_feeders=True with a splittable inner source)")
        block = self.inner.read_block(num_samp)
        if block is None:
            return None
        if self.drop_every and self._count % self.drop_every == 0:
            block = self.inner.read_block(num_samp)  # skip one (a drop)
            self._dropped += 1
        if self.short_every and self._count % self.short_every == 0 and block is not None:
            block = block[:, : num_samp // 2]  # short read
        return block

    def take_dropped(self) -> int:
        """Number of blocks lost since the last call (feeder protocol:
        the feeder advances its seq counter by this, turning the loss
        into a ring-level sequence gap)."""
        n = self._dropped
        self._dropped = 0
        return n

    def split_channels(self):
        """Split the wrapped source; the drop schedule rides ONLY
        ``drop_channel``'s split (every split when drop_channel is None),
        so one channel's feeder sees stream gaps its siblings don't.
        EVERY split keeps the FaultInjectingSource wrapper — snapshots
        taken from any per-channel feeder then carry the same state
        schema this (parent) source restores."""
        inners = self.inner.split_channels()
        if inners is None:
            return None
        outs = [
            FaultInjectingSource(
                s,
                drop_every=(self.drop_every
                            if self.drop_channel in (None, c) else 0),
                short_every=self.short_every, fail_at=self.fail_at)
            for c, s in enumerate(inners)]
        for w in outs:
            # a resumed (restore_state'd) parent splits mid-schedule
            w._count = self._count
            if self.drop_channel is not None:
                w._divergent = True  # see snapshot_state
        return outs

    #: True on splits of a drop_channel source: the channels' stream
    #: positions diverge, so no single cursor can reproduce the run.
    _divergent = False

    def snapshot_state(self):
        if self.drop_channel is not None or self._divergent:
            # resume must refuse (no stream state in the snapshot) rather
            # than restore one channel's cursor over diverged siblings
            return None
        inner = self.inner.snapshot_state()
        if inner is None:
            return None
        return {"inner": inner, "count": self._count}

    def restore_state(self, state: dict) -> None:
        self.inner.restore_state(state["inner"])
        self._count = int(state["count"])

    def stop(self):
        super().stop()
        self.inner.stop()

    def close(self):
        super().close()
        self.inner.close()
