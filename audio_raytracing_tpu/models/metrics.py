"""Room-acoustics metrics from traced impulse responses.

The reference reduces its acoustics to a single reverb-coupling scalar
(0.5*atan(100*capped_mean_dist), main.zig:785-786); a production framework
wants the standard ISO-3382 style analysis of the energy decay the IR
tracer measures directly:

  * schroeder_decay — reverse-integrated energy decay curve (Schroeder
    backward integration), in dB;
  * rt60 — reverberation time, extrapolated from the T20/T30 linear fit
    of the decay curve (least squares over [-5, -25]/[-5, -35] dB);
  * edt — early decay time (fit over [0, -10] dB, x6);
  * clarity (C50/C80) — early/late energy ratio in dB at a split time
    AFTER the direct-sound onset (ISO 3382 windows are onset-relative);
  * definition (D50) — early fraction of total energy, onset-relative;
  * drr — direct-to-reverberant ratio (direct window vs the rest);
  * ts — center time (first moment of the energy histogram, measured from
    the onset so source distance doesn't inflate it).

All operate on ImpulseResponse energy histograms (per band or band-mean),
pure jnp, and jit-friendly (fixed shapes, no data-dependent control flow),
so they can run on-device right after a trace — e.g. driving adaptive ray
budgets or live room-size estimation.

Validated against the Sabine/Eyring predictions for a box room in
tests/test_metrics.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT_CONFIG


def _band_energy(ir_energy, band: int | None):
    e = jnp.asarray(ir_energy)
    if e.ndim == 2:
        e = e[band] if band is not None else jnp.mean(e, axis=0)
    return e  # (n_bins,)


def schroeder_decay(ir_energy, band: int | None = None, eps: float = 1e-30):
    """Backward-integrated decay curve in dB, normalized to 0 dB at t=0.

    ir_energy: (n_bins,) or (n_bands, n_bins) energy histogram (band=None
    averages bands). Returns (n_bins,) dB values (<= 0, monotone down).
    """
    e = _band_energy(ir_energy, band)
    # reverse cumulative sum without dynamic shapes
    tail = jnp.cumsum(e[::-1])[::-1]
    total = jnp.maximum(tail[0], eps)
    return 10.0 * jnp.log10(jnp.maximum(tail, eps) / total)


def _fit_decay_seconds(decay_db, lo_db: float, hi_db: float,
                       cfg: Config, bins_per_second: float | None = None):
    """Least-squares slope of the decay between lo_db and hi_db (both < 0),
    masked (jit-friendly); returns the time to fall 60 dB at that slope."""
    d = jnp.asarray(decay_db)
    n = d.shape[0]
    bps = bins_per_second or (cfg.sample_rate * cfg.ir_bins_per_sample)
    t = jnp.arange(n, dtype=jnp.float32) / bps
    m = ((d <= lo_db) & (d >= hi_db)).astype(jnp.float32)
    cnt = jnp.maximum(m.sum(), 2.0)
    tm = (m * t).sum() / cnt
    dm = (m * d).sum() / cnt
    cov = (m * (t - tm) * (d - dm)).sum()
    var = jnp.maximum((m * (t - tm) ** 2).sum(), 1e-20)
    slope = cov / var  # dB per second (negative)
    return jnp.where(slope < -1e-6, -60.0 / slope, jnp.inf)


def rt60(ir_energy, band: int | None = None, cfg: Config = DEFAULT_CONFIG,
         method: str = "t30"):
    """Reverberation time in seconds from the Schroeder decay: the T20
    ([-5, -25] dB) or T30 ([-5, -35] dB) linear fit extrapolated to 60 dB.
    """
    d = schroeder_decay(ir_energy, band)
    if method == "t30":
        return _fit_decay_seconds(d, -5.0, -35.0, cfg)
    if method == "t20":
        return _fit_decay_seconds(d, -5.0, -25.0, cfg)
    raise ValueError(f"unknown method {method!r}")


def edt(ir_energy, band: int | None = None, cfg: Config = DEFAULT_CONFIG):
    """Early decay time: the [0, -10] dB fit, x6 (ISO 3382)."""
    d = schroeder_decay(ir_energy, band)
    return _fit_decay_seconds(d, -0.0, -10.0, cfg)


def _split_bin(ms: float, cfg: Config) -> int:
    return int(round(ms * 1e-3 * cfg.sample_rate * cfg.ir_bins_per_sample))


def _onset(e, rel_db: float = 20.0):
    """First bin within rel_db of the peak — the direct-sound arrival
    (source-listener propagation delay precedes it in the histogram)."""
    peak = jnp.max(e)
    return jnp.argmax(e >= peak * 10.0 ** (-rel_db / 10.0))


def clarity(ir_energy, split_ms: float = 80.0, band: int | None = None,
            cfg: Config = DEFAULT_CONFIG, eps: float = 1e-30):
    """C{split_ms}: 10 log10(early energy / late energy) dB, with the split
    measured from the direct-sound onset (ISO 3382). C80 (music) by
    default; split_ms=50 gives C50 (speech)."""
    e = _band_energy(ir_energy, band)
    k = _onset(e) + _split_bin(split_ms, cfg)
    idx = jnp.arange(e.shape[0])
    early = jnp.where(idx < k, e, 0.0).sum()
    late = jnp.where(idx >= k, e, 0.0).sum()
    return 10.0 * jnp.log10(jnp.maximum(early, eps) / jnp.maximum(late, eps))


def definition(ir_energy, split_ms: float = 50.0, band: int | None = None,
               cfg: Config = DEFAULT_CONFIG, eps: float = 1e-30):
    """D{split_ms}: early / total energy fraction in [0, 1], onset-relative
    split (ISO 3382)."""
    e = _band_energy(ir_energy, band)
    k = _onset(e) + _split_bin(split_ms, cfg)
    idx = jnp.arange(e.shape[0])
    return jnp.where(idx < k, e, 0.0).sum() / jnp.maximum(e.sum(), eps)


def drr(ir_energy, direct_ms: float = 2.5, band: int | None = None,
        cfg: Config = DEFAULT_CONFIG, eps: float = 1e-30):
    """Direct-to-reverberant ratio in dB: energy within direct_ms of the
    first arrival vs everything after. The first arrival is the energy-
    histogram argmax's onset (first bin within 20 dB of the peak)."""
    e = _band_energy(ir_energy, band)
    onset = _onset(e)
    w = _split_bin(direct_ms, cfg)
    idx = jnp.arange(e.shape[0])
    direct = jnp.where((idx >= onset) & (idx < onset + w), e, 0.0).sum()
    reverb = jnp.where(idx >= onset + w, e, 0.0).sum()
    return 10.0 * jnp.log10(jnp.maximum(direct, eps) / jnp.maximum(reverb, eps))


def center_time(ir_energy, band: int | None = None,
                cfg: Config = DEFAULT_CONFIG, eps: float = 1e-30):
    """Ts: first moment of the energy histogram in seconds, measured from
    the direct-sound onset (propagation delay excluded, ISO 3382)."""
    e = _band_energy(ir_energy, band)
    bps = cfg.sample_rate * cfg.ir_bins_per_sample
    t0 = _onset(e).astype(jnp.float32) / bps
    t = jnp.arange(e.shape[0], dtype=jnp.float32) / bps - t0
    return (e * jnp.maximum(t, 0.0)).sum() / jnp.maximum(e.sum(), eps)


def sabine_rt60(volume: float, surface_area: float, absorption: float,
                speed_of_sound: float = 350.0) -> float:
    """Sabine's formula with the classic 0.161 coefficient rescaled to the
    framework's speed of sound (0.161 assumes c=343): RT60 = (24 ln10 / c)
    * V / (S * a). Host-side oracle for tests/sanity checks."""
    k = 24.0 * np.log(10.0) / speed_of_sound
    return float(k * volume / (surface_area * absorption))


def eyring_rt60(volume: float, surface_area: float, absorption: float,
                speed_of_sound: float = 350.0) -> float:
    """Eyring's formula (better at high absorption): uses -ln(1 - a)."""
    k = 24.0 * np.log(10.0) / speed_of_sound
    return float(k * volume / (-surface_area * np.log(1.0 - absorption)))
