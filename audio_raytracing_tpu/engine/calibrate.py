"""Physically-calibrated reverb coupling: traced IR -> FDN parameters.

The reference couples its per-voice FDN reverb to the scene through one
heuristic scalar — feedback_gain = wet = 0.5*atan(100*capped_mean_dist)
(main.zig:785-786), where capped_mean_dist comes from 14 probe rays. This
module closes the loop properly: trace a real impulse response, measure
its reverberation time (models/metrics.py, ISO-3382 T30), and solve for
the FDN feedback gain whose decay MATCHES it, plus a wet level from the
IR's direct/reverberant energy split.

The gain<->T60 law is calibrated against this framework's own FDN
(ops/reverb.py: Signalsmith-style topology, feedback delays
{6427, 2153, 5153, 2879} at 44.1 kHz, in-loop one-pole damping
alpha=0.2, Householder mix). Classical FDN theory says
T60 = 3*d/(fs*log10(1/g)) per delay line; with shared g, unequal lines
and in-loop damping the effective k(g) = T60*log10(1/g) is not constant
— measured over g in [0.2, 0.95] (8 s impulse simulations, Schroeder T30
of the broadband energy) it is quadratic in g (k RISES again at low g:
the decay floors near ~0.4 s because energy cannot drain faster than a
few passes through the 6427-sample line):

    k(g) = 0.39450 - 0.73410 g + 0.61126 g^2   (max residual 4.7%)

so T60(g) = k(g)/log10(1/g) — verified monotone over [0.05, 0.98] —
inverted by bisection. Re-derive K0/K1/K2 with measure_fdn_rt60 after
any change to ops/reverb.py tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config, DEFAULT_CONFIG
from ..models.metrics import _fit_decay_seconds, _onset, _split_bin, rt60, schroeder_decay

# measured on ops/reverb.py's FDN (module docstring); NOT free parameters
_K0 = 0.39450454
_K1 = -0.73410355
_K2 = 0.61125584
_G_MIN, _G_MAX = 0.05, 0.98


def fdn_t60_of_gain(g):
    """Predicted broadband T60 (s) of the engine FDN at feedback gain g."""
    g = jnp.clip(g, _G_MIN, _G_MAX)
    return (_K0 + _K1 * g + _K2 * g * g) / jnp.log10(1.0 / g)


def fdn_gain_for_t60(t60_seconds):
    """Feedback gain whose FDN decay matches the target T60 (s).

    Bisection on the monotone fdn_t60_of_gain (jit-friendly, 40 fixed
    steps); targets outside [T60(0.05) ~ 0.28 s, T60(0.98) ~ 30 s] clamp
    to the endpoints (the FDN physically cannot decay much faster than
    ~0.4 s — see the module docstring).
    """
    t = jnp.asarray(t60_seconds, jnp.float32)
    lo = jnp.full_like(t, _G_MIN)
    hi = jnp.full_like(t, _G_MAX)
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        below = fdn_t60_of_gain(mid) < t
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    return 0.5 * (lo + hi)


_ALPHA_MIN = 0.02


def fdn_lowpass_gain(alpha, f_hz, sample_rate: float = 44100.0):
    """Per-pass magnitude of the FDN's in-loop one-pole
    y[n] = a x[n] + (1-a) y[n-1] at frequency f_hz:
    |H| = a / sqrt(1 - 2(1-a)cos(w) + (1-a)^2)."""
    a = jnp.asarray(alpha, jnp.float32)
    w = 2.0 * jnp.pi * jnp.asarray(f_hz, jnp.float32) / sample_rate
    one_a = 1.0 - a
    return a * jax.lax.rsqrt(
        1.0 - 2.0 * one_a * jnp.cos(w) + one_a * one_a
    )


# per-band decay law of this FDN: T60_band = _K_BAND / log10(1/g_eff),
# g_eff = g * |H_alpha(f_edge)| evaluated at the band's LOWER EDGE — the
# least-damped in-band frequency dominates the band's Schroeder decay.
# _K_BAND measured on the real loop at alpha = 1 (no damping), where both
# bands collapse onto one constant-K classical law: K = T60 * log10(1/g)
# = 0.298-0.302 over g in [0.4, 0.9]. Grid-validated over alpha in
# [0.15, 1] x g in [0.4, 0.9]: band-1 error <= 4.5% everywhere; band-3
# error <= 22% except the (low alpha, high g) corner where the band-3
# MEASUREMENT is contaminated by low-band leakage through the LR2 filter
# skirt (the slow low band dominates the filtered Schroeder tail once
# in-band energy dies). Full table in tests/test_calibrate.py.
_K_BAND = 0.299
_BAND_EDGE_HZ = {0: 1.0, 1: 128.0, 2: 768.0, 3: 4608.0}  # LR2 crossovers


def fdn_damping_for_band_t60s(t60_low, t60_high,
                              f_low: float = _BAND_EDGE_HZ[1],
                              f_high: float = _BAND_EDGE_HZ[3],
                              sample_rate: float = 44100.0):
    """(feedback_gain, damping_alpha) matching TWO band reverberation
    times — the per-band generalization of fdn_gain_for_t60 (NEXT.md F).

    Model (measured, see _K_BAND): each band decays classically at the
    loop's effective per-pass gain g_eff = g * |H_alpha(f_edge)|, so

      g_eff(f_low)  = 10^(-K / t60_low)
      g_eff(f_high) = 10^(-K / t60_high)
      |H(f_high)| / |H(f_low)| = g_eff(f_high) / g_eff(f_low) =: rho

    rho <= 1 has a unique alpha (the |H| ratio is monotone in alpha,
    -> 1 at alpha = 1); rho > 1 (traced highs ring LONGER than lows —
    not something a lowpass loop can produce) clamps to alpha = 1, i.e.
    no in-loop damping. g then comes from the low band:
    g = g_eff(f_low) / |H_alpha(f_low)|, clamped to the valid gain range.

    The reference's fixed alpha = 0.2 (sound_system.zig:715) is what you
    get when you don't calibrate; pass the result into VoiceParams /
    reverb_apply_block(damping_alpha=...).
    """
    t_lo = jnp.maximum(jnp.asarray(t60_low, jnp.float32), 1e-3)
    t_hi = jnp.maximum(jnp.asarray(t60_high, jnp.float32), 1e-3)
    g_lo_eff = 10.0 ** (-_K_BAND / t_lo)
    g_hi_eff = 10.0 ** (-_K_BAND / t_hi)
    rho = jnp.clip(g_hi_eff / jnp.maximum(g_lo_eff, 1e-6), 0.0, 1.0)

    def ratio(a):
        return fdn_lowpass_gain(a, f_high, sample_rate) / jnp.maximum(
            fdn_lowpass_gain(a, f_low, sample_rate), 1e-9
        )

    lo = jnp.full_like(rho, _ALPHA_MIN)
    hi = jnp.ones_like(rho)
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        below = ratio(mid) < rho  # ratio rises with alpha
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
    alpha = 0.5 * (lo + hi)
    g = jnp.clip(
        g_lo_eff / fdn_lowpass_gain(alpha, f_low, sample_rate), _G_MIN, _G_MAX
    )
    return g, alpha


def measure_fdn_rt60(feedback_gain: float, cfg: Config = DEFAULT_CONFIG,
                     seconds: float = 8.0, damping_alpha: float | None = None,
                     band: int | None = None):
    """Ground truth for the laws above: simulate a unit impulse through the
    actual FDN (ops/reverb.py) and return the Schroeder T30 of its
    broadband energy — or of EQ band `band` (the LR2 filterbank from
    ops/eq.py with a one-hot band gain), for validating the per-band
    damping solve against the real loop filter. Used by tests to hold
    fdn_t60_of_gain / fdn_damping_for_band_t60s to the real filter, and
    to re-derive K0/K1 if the reverb tables ever change."""
    from ..ops.reverb import reverb_apply_block, reverb_init

    fs = cfg.sample_rate
    n = cfg.block_size
    n_blocks = int(seconds * fs) // n
    gv = jnp.asarray([feedback_gain], jnp.float32)
    av = (
        None if damping_alpha is None
        else jnp.asarray([damping_alpha], jnp.float32)
    )

    def step(state, i):
        x = jnp.zeros((1, n), jnp.float32)
        x = jax.lax.cond(i == 0, lambda q: q.at[0, 0].set(1.0), lambda q: q, x)
        out, state = reverb_apply_block(x, state, gv, av)
        return state, out[0]

    _, outs = jax.lax.scan(step, reverb_init(1), jnp.arange(n_blocks))
    y = outs.reshape(-1)
    if band is not None:
        from ..ops.eq import eq_apply_block

        gains = jnp.zeros((1, 4), jnp.float32).at[0, band].set(1.0)
        y, _ = eq_apply_block(y[None], jnp.zeros((1, 4), jnp.float32), gains)
        y = y[0]
    d = schroeder_decay(y * y)
    return _fit_decay_seconds(d, -5.0, -35.0, cfg, bins_per_second=float(fs))


def reverb_params_from_ir(ir_energy, cfg: Config = DEFAULT_CONFIG,
                          direct_ms: float = 2.5,
                          per_band_damping: bool = False):
    """(feedback_gain, wet[, damping_alpha]) matched to a traced IR.

    feedback_gain: FDN gain whose decay matches the IR's broadband T30.
    wet: sqrt of the reverberant energy fraction — energy after direct_ms
    past the onset over total (the amplitude-domain mix level that makes
    the reverb-vs-direct balance follow the room; a perceptual mapping,
    not an exact loop-gain solve — documented heuristic).

    per_band_damping=True (requires band-resolved (n_bands, bins) energy)
    additionally solves the in-loop lowpass alpha from the band-1 vs
    band-3 T30 ratio (fdn_damping_for_band_t60s at the physical band
    centers AIR_BAND_HZ) — the FDN's high bands then decay faster than
    its lows in the same proportion the traced room's do — and the
    returned gain is the per-band solve's (low-band-matched). Returns a
    3-tuple in that mode.

    All scalars (jnp); feed them into VoiceParams or
    SoundSystem.calibrate_reverb.
    """
    e2d = jnp.asarray(ir_energy)
    e = jnp.mean(e2d, axis=0) if e2d.ndim == 2 else e2d
    t60 = rt60(e, cfg=cfg)
    # an IR with no usable decay (open scene, all-absorbing) fits to inf:
    # fall back to the shortest supported tail instead of g ~ 1
    g = jnp.where(
        jnp.isfinite(t60), fdn_gain_for_t60(t60), jnp.float32(_G_MIN)
    )
    alpha = None
    if per_band_damping:
        if e2d.ndim != 2:
            raise ValueError(
                "per_band_damping needs band-resolved (n_bands, bins) energy"
            )
        from ..models.ir import AIR_BAND_HZ
        from ..ops.reverb import FB_LOWPASS_ALPHA

        t_lo = rt60(e2d[1], cfg=cfg)
        t_hi = rt60(e2d[3], cfg=cfg)
        ok = jnp.isfinite(t_lo) & jnp.isfinite(t_hi)
        g_b, alpha = fdn_damping_for_band_t60s(
            jnp.where(ok, t_lo, 1.0), jnp.where(ok, t_hi, 1.0),
            AIR_BAND_HZ[1], AIR_BAND_HZ[3], float(cfg.sample_rate),
        )
        g = jnp.where(ok, g_b, g)
        alpha = jnp.where(ok, alpha, jnp.float32(FB_LOWPASS_ALPHA))
    onset = _onset(e)
    w = _split_bin(direct_ms, cfg)
    idx = jnp.arange(e.shape[0])
    direct = jnp.where((idx >= onset) & (idx < onset + w), e, 0.0).sum()
    late = jnp.where(idx >= onset + w, e, 0.0).sum()
    wet = jnp.sqrt(late / jnp.maximum(direct + late, 1e-30))
    if per_band_damping:
        return g, wet, alpha
    return g, wet
