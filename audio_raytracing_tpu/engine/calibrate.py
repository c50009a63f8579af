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


def measure_fdn_rt60(feedback_gain: float, cfg: Config = DEFAULT_CONFIG,
                     seconds: float = 8.0):
    """Ground truth for the law above: simulate a unit impulse through the
    actual FDN (ops/reverb.py) and return the Schroeder T30 of its
    broadband energy. Used by tests to hold fdn_t60_of_gain to the real
    filter, and to re-derive K0/K1 if the reverb tables ever change."""
    from ..ops.reverb import reverb_apply_block, reverb_init

    fs = cfg.sample_rate
    n = cfg.block_size
    n_blocks = int(seconds * fs) // n
    gv = jnp.asarray([feedback_gain], jnp.float32)

    def step(state, i):
        x = jnp.zeros((1, n), jnp.float32)
        x = jax.lax.cond(i == 0, lambda q: q.at[0, 0].set(1.0), lambda q: q, x)
        out, state = reverb_apply_block(x, state, gv)
        return state, out[0]

    _, outs = jax.lax.scan(step, reverb_init(1), jnp.arange(n_blocks))
    y = outs.reshape(-1)
    d = schroeder_decay(y * y)
    return _fit_decay_seconds(d, -5.0, -35.0, cfg, bins_per_second=float(fs))


def reverb_params_from_ir(ir_energy, cfg: Config = DEFAULT_CONFIG,
                          direct_ms: float = 2.5):
    """(feedback_gain, wet) matched to a traced impulse response.

    feedback_gain: FDN gain whose decay matches the IR's broadband T30.
    wet: sqrt of the reverberant energy fraction — energy after direct_ms
    past the onset over total (the amplitude-domain mix level that makes
    the reverb-vs-direct balance follow the room; a perceptual mapping,
    not an exact loop-gain solve — documented heuristic).

    Both are scalars (jnp); feed them into VoiceParams.feedback_gain/wet
    or SoundSystem.calibrate_reverb.
    """
    e = jnp.asarray(ir_energy)
    if e.ndim == 2:
        e = jnp.mean(e, axis=0)
    t60 = rt60(e, cfg=cfg)
    # an IR with no usable decay (open scene, all-absorbing) fits to inf:
    # fall back to the shortest supported tail instead of g ~ 1
    g = jnp.where(
        jnp.isfinite(t60), fdn_gain_for_t60(t60), jnp.float32(_G_MIN)
    )
    onset = _onset(e)
    w = _split_bin(direct_ms, cfg)
    idx = jnp.arange(e.shape[0])
    direct = jnp.where((idx >= onset) & (idx < onset + w), e, 0.0).sum()
    late = jnp.where(idx >= onset + w, e, 0.0).sum()
    wet = jnp.sqrt(late / jnp.maximum(direct + late, 1e-30))
    return g, wet
