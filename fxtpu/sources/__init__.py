"""fxtpu.sources — pluggable IQ signal sources (the reference's L1 layer)."""

from fxtpu.sources.base import LimitedSource, QuantizedSource, Source
from fxtpu.sources.synthetic import (
    NoiseSource,
    SinusoidSource,
    FaultInjectingSource,
    complex_noise,
    complex_sinusoid,
    fractional_delay,
)
from fxtpu.sources.replay import (RTL_U8_EXTS, ReplaySource,
                                  RtlU8ReplaySource, save_recording)


def make_source(cfg, delays=None):
    """Build a source from a :class:`~fxtpu.config.CorrelatorConfig`."""
    common = dict(nchan=cfg.nchan, sample_rate=cfg.bandwidth,
                  center_freq=cfg.frequency, gain=cfg.gain)
    if cfg.source == "synthetic":
        if delays is None:
            delays = [0.0] + [cfg.synthetic_delay] * (cfg.nchan - 1)
        return _maybe_quantize(
            NoiseSource(delays=delays, snr=cfg.synthetic_snr,
                        seed=cfg.seed, **common), cfg)
    if cfg.source == "replay":
        if not cfg.replay_file:
            raise ValueError("replay source requires replay_file")
        paths = (cfg.replay_file.split(",") if "," in cfg.replay_file
                 else cfg.replay_file)
        first = paths[0] if isinstance(paths, list) else paths
        if first.lower().endswith(RTL_U8_EXTS):
            # native rtl_sdr capture (raw interleaved u8 I,Q): already
            # 8-bit — emits int8 blocks directly under int8 ingest (no
            # QuantizedSource, no float detour), dequantizes host-side
            # for complex64 runs
            return RtlU8ReplaySource(
                paths, as_complex=cfg.ingest_dtype != "int8",
                quant_step=cfg.quant_step, **common)
        return _maybe_quantize(ReplaySource(paths, **common), cfg)
    if cfg.source == "rtlsdr":
        from fxtpu.sources.rtlsdr import RtlSdrSource
        return _maybe_quantize(RtlSdrSource(**common), cfg)
    raise ValueError(f"unknown source kind: {cfg.source}")


def _maybe_quantize(src, cfg):
    if getattr(cfg, "ingest_dtype", "complex64") == "int8":
        from fxtpu.sources.base import QuantizedSource
        return QuantizedSource(src, cfg.quant_step)
    return src


__all__ = [
    "Source", "NoiseSource", "SinusoidSource", "FaultInjectingSource",
    "LimitedSource", "QuantizedSource",
    "ReplaySource", "RtlU8ReplaySource", "save_recording", "make_source",
    "complex_noise", "complex_sinusoid", "fractional_delay",
]
