"""Atmospheric absorption models.

The reference's air-absorption law is the linear clamp
clamp(1 - 1e-5 * d * f, 0, 1) per band (sound_system.zig:229-234) — a
stylized curve that hits EXACTLY ZERO at d = 1e5/f meters (the top band
~4.6 kHz goes silent at ~21 m), which is fine for its one small room and
wrong for anything bigger. This module adds the physical alternative:
ISO 9613-1 pure-tone atmospheric absorption (temperature, humidity,
pressure -> dB/m per band), giving the exponential decay
amplitude = 10^(-alpha d / 20) that never collapses to zero.

Selection is Config.air_model ("reference" | "iso9613") with
air_temperature_c / air_humidity_pct / air_pressure_kpa; every IR-model
family (tracer, ISM, diffraction, moving renderer, the fused kernel)
reads it through models/ir._air_amplitude. The per-sample engine DSP
(engine/voices.py) deliberately KEEPS the reference law — it is the
reference's audible EQ behavior and part of the parity surface.

ISO 9613-1 formulas (the standard's Annex; also Bass et al. 1995):
relaxation frequencies of O2 and N2 from the molar water-vapor
concentration, plus the classical term.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

T0 = 293.15  # reference temperature, K
T01 = 273.16  # triple point, K
PR = 101.325  # reference pressure, kPa


@lru_cache(maxsize=None)
def iso9613_alpha(
    freqs_hz: tuple, temp_c: float = 20.0, humidity_pct: float = 50.0,
    pressure_kpa: float = PR,
) -> tuple:
    """Pure-tone atmospheric attenuation alpha (dB/m) per frequency.

    freqs_hz: tuple of frequencies (hashable for the cache). Returns a
    tuple of dB/m values. Valid over the standard's stated range
    (-20..50 C, h in [0.05%, 5%], f/p in [4e-4, 10] Hz/Pa).
    """
    f = np.asarray(freqs_hz, np.float64)
    T = temp_c + 273.15
    p_rel = pressure_kpa / PR
    t_rel = T / T0
    # molar concentration of water vapor (%): ISO 9613-1 eq. (B.1)-(B.3)
    c_sat = -6.8346 * (T01 / T) ** 1.261 + 4.6151
    h = humidity_pct * (10.0 ** c_sat) / p_rel
    # relaxation frequencies (Hz): eq. (3), (4)
    fr_o = p_rel * (24.0 + 4.04e4 * h * (0.02 + h) / (0.391 + h))
    fr_n = (
        p_rel
        * t_rel ** -0.5
        * (9.0 + 280.0 * h * np.exp(-4.170 * (t_rel ** (-1.0 / 3.0) - 1.0)))
    )
    # attenuation coefficient (dB/m): eq. (5), with 8.686 = 20 log10(e)
    alpha = (
        8.686
        * f
        * f
        * (
            1.84e-11 * (1.0 / p_rel) * np.sqrt(t_rel)
            + t_rel ** -2.5
            * (
                0.01275 * np.exp(-2239.1 / T) / (fr_o + f * f / fr_o)
                + 0.1068 * np.exp(-3352.0 / T) / (fr_n + f * f / fr_n)
            )
        )
    )
    return tuple(float(a) for a in alpha)


def amplitude_decay_per_meter(
    freqs_hz, temp_c: float = 20.0, humidity_pct: float = 50.0,
    pressure_kpa: float = PR,
):
    """Per-band NATURAL-log amplitude decay rate k (1/m, negative):
    amplitude(d) = exp(k * d). k = -alpha * ln(10) / 20."""
    alpha = iso9613_alpha(tuple(float(f) for f in freqs_hz), float(temp_c),
                          float(humidity_pct), float(pressure_kpa))
    return tuple(-a * np.log(10.0) / 20.0 for a in alpha)
