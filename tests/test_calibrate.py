"""Traced-IR reverb calibration (engine/calibrate.py).

The reference couples reverb with feedback_gain = wet =
0.5*atan(100*capped_mean_dist) (main.zig:785-786); here the FDN feedback
gain is solved so its measured decay MATCHES the traced impulse
response's T30. The closed-loop tests below drive the actual FDN
(ops/reverb.py) and the actual metrics (models/metrics.py) — nothing is
compared to its own model.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.engine.calibrate import (
    fdn_gain_for_t60,
    fdn_t60_of_gain,
    measure_fdn_rt60,
    reverb_params_from_ir,
)

CFG = DEFAULT_CONFIG


def test_gain_t60_inversion_consistency():
    """fdn_gain_for_t60 is the numeric inverse of fdn_t60_of_gain."""
    for t in (0.5, 1.0, 3.0, 10.0):
        g = float(fdn_gain_for_t60(t))
        assert 0.05 <= g <= 0.98
        np.testing.assert_allclose(float(fdn_t60_of_gain(g)), t, rtol=1e-3)
    # monotone
    gs = [float(fdn_gain_for_t60(t)) for t in (0.5, 1.0, 2.0, 4.0)]
    assert all(a < b for a, b in zip(gs, gs[1:]))
    # targets below the FDN's physical decay floor clamp to _G_MIN
    assert float(fdn_gain_for_t60(0.05)) == pytest.approx(0.05, abs=1e-3)


@pytest.mark.parametrize("target", [0.5, 1.0, 2.5])
def test_closed_loop_against_real_fdn(target):
    """Solve g for a target T60, push an impulse through the REAL FDN,
    measure: within 8% (the k(g) affine law's residual is ~2%; the
    Schroeder fit adds the rest)."""
    g = float(fdn_gain_for_t60(target))
    measured = float(measure_fdn_rt60(g, CFG, seconds=min(8.0, 4 * target)))
    assert abs(measured - target) / target < 0.08


def test_params_from_synthetic_ir():
    """A synthetic IR with a known exponential decay and direct/late
    split recovers (t60-matched gain, energy-split wet)."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    n = cfg.ir_n_bins
    bps = cfg.sample_rate * cfg.ir_bins_per_sample  # bins per second
    t60 = 0.3
    t = np.arange(n) / bps
    onset = 400
    tail = np.where(t >= t[onset], 10.0 ** (-6.0 * (t - t[onset]) / t60), 0.0)
    tail[:onset] = 0.0
    direct = np.zeros(n)
    direct[onset] = float(tail[onset:].sum())  # equal energy -> wet^2 = 0.5
    e = jnp.asarray(direct + tail, jnp.float32)
    g, wet = reverb_params_from_ir(e, cfg=cfg)
    np.testing.assert_allclose(float(fdn_t60_of_gain(g)), t60, rtol=0.05)
    # direct window captures the spike; late = the tail minus its first
    # 2.5 ms, so wet^2 is just under 0.5
    assert 0.62 < float(wet) < 0.72


def test_params_no_decay_fallback():
    """An IR with no fittable decay must not drive the gain to ~1."""
    e = jnp.zeros(2048).at[100].set(1.0)  # single spike: T30 fit = inf
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    g, wet = reverb_params_from_ir(e, cfg=cfg)
    assert float(g) <= 0.06  # the _G_MIN fallback, not g ~ 1
    assert float(wet) < 1e-3


def test_sound_system_calibration_sticky():
    """calibrate_reverb applies traced parameters, update_acoustics keeps
    them, clear=True reverts to the reference atan coupling."""
    from audio_raytracing_tpu.engine.system import SoundSystem
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192, max_voices=4)
    system = SoundSystem(scene=Scene.from_triangles(box_room(), cfg), cfg=cfg)
    sid = system.load_sound(np.ones(2048, np.float32) * 0.1)
    h = system.play_sound(sid, pos=[2.0, 0.5, 1.0], repeat=True)
    system.set_listener([-2.0, 0.0, -1.0])

    cal = system.calibrate_reverb(n_rays=4096, max_bounces=6)
    g, w = cal[h]
    assert 0.01 < g < 0.98 and 0.0 < w <= 1.0
    slot = system._handles[h]
    assert float(system.params.feedback_gain[slot]) == pytest.approx(g)

    system.update_acoustics()
    assert float(system.params.feedback_gain[slot]) == pytest.approx(g)
    assert float(system.params.wet[slot]) == pytest.approx(w)

    system.calibrate_reverb(clear=True)
    system.update_acoustics()
    # back to the reference coupling (0.5*atan(...) < pi/4, voice-specific)
    assert float(system.params.feedback_gain[slot]) != pytest.approx(g)


def test_recycled_slot_drops_calibration():
    from audio_raytracing_tpu.engine.system import SoundSystem
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192, max_voices=2)
    system = SoundSystem(scene=Scene.from_triangles(box_room(), cfg), cfg=cfg)
    sid = system.load_sound(np.ones(1024, np.float32) * 0.1)
    h = system.play_sound(sid, pos=[1.0, 0.0, 0.0], repeat=True)
    system.calibrate_reverb(handle=h, n_rays=4096, max_bounces=4)
    slot = system._handles[h]
    assert slot in system._reverb_cal
    system.stop(h)
    h2 = system.play_sound(sid, pos=[0.5, 0.0, 0.0], repeat=True)
    if system._handles[h2] == slot:
        assert slot not in system._reverb_cal


def test_lowpass_gain_matches_recurrence():
    """fdn_lowpass_gain's closed form equals the measured steady-state
    magnitude of y[n] = a x[n] + (1-a) y[n-1] driven by a sinusoid."""
    from audio_raytracing_tpu.engine.calibrate import fdn_lowpass_gain

    fs = 44100.0
    for a, f in ((0.2, 4608.0), (0.6, 128.0), (0.35, 9216.0)):
        n = np.arange(int(fs))
        x = np.sin(2 * np.pi * f * n / fs)
        y = np.zeros_like(x)
        acc = 0.0
        for i in range(len(x)):
            acc = a * x[i] + (1 - a) * acc
            y[i] = acc
        meas = np.abs(y[len(y) // 2:]).max()
        np.testing.assert_allclose(
            float(fdn_lowpass_gain(a, f, fs)), meas, rtol=2e-3
        )


@pytest.mark.slow
@pytest.mark.parametrize("target", [(1.2, 0.6), (0.8, 0.6)])
def test_per_band_damping_closed_loop(target):
    """fdn_damping_for_band_t60s against the REAL loop: simulate the FDN
    at the solved (g, alpha) and measure band-1/band-3 T30 through the
    actual LR2 filterbank. Low band within 5%, high band within 20% (its
    measurement carries low-band leakage through the filter skirt — see
    the _K_BAND derivation note)."""
    from audio_raytracing_tpu.engine.calibrate import fdn_damping_for_band_t60s

    t_lo, t_hi = target
    g, a = fdn_damping_for_band_t60s(t_lo, t_hi)
    g, a = float(g), float(a)
    assert 0.0 < a < 1.0 and 0.05 <= g <= 0.98
    m_lo = float(measure_fdn_rt60(g, damping_alpha=a, band=1))
    m_hi = float(measure_fdn_rt60(g, damping_alpha=a, band=3))
    assert abs(m_lo - t_lo) / t_lo < 0.05, (m_lo, t_lo)
    assert abs(m_hi - t_hi) / t_hi < 0.20, (m_hi, t_hi)
    # equal targets -> no damping (alpha ~ 1); inverted targets clamp there
    _, a1 = fdn_damping_for_band_t60s(1.0, 1.0)
    assert float(a1) > 0.98
    _, a2 = fdn_damping_for_band_t60s(0.5, 1.5)
    assert float(a2) > 0.98


def test_damping_alpha_parity_and_oracle():
    """damping_alpha=None == full(0.2) bit-for-bit (reference parity), and
    the block renderer matches the per-sample oracle at a non-default
    alpha."""
    from audio_raytracing_tpu.ops import reverb as rvmod

    rng = np.random.default_rng(7)
    N = 128
    x = rng.standard_normal((3 * N,)).astype(np.float32) * 0.5

    sA = rvmod.reverb_init(1)
    sB = rvmod.reverb_init(1)
    fg = jnp.asarray([0.85], jnp.float32)
    alpha02 = jnp.asarray([rvmod.FB_LOWPASS_ALPHA], jnp.float32)
    for b in range(3):
        blk = jnp.asarray(x[b * N:(b + 1) * N])[None]
        oA, sA = rvmod.reverb_apply_block(blk, sA, fg, None)
        oB, sB = rvmod.reverb_apply_block(blk, sB, fg, alpha02)
        np.testing.assert_array_equal(np.asarray(oA), np.asarray(oB))

    oracle = rvmod.ReverbOracle(damping_alpha=0.55)
    oracle.feedback_gain = 0.85
    want = np.concatenate(
        [oracle.apply(x[b * N:(b + 1) * N]) for b in range(3)]
    )
    s = rvmod.reverb_init(1)
    outs = []
    for b in range(3):
        blk = jnp.asarray(x[b * N:(b + 1) * N])[None]
        o, s = rvmod.reverb_apply_block(
            blk, s, fg, jnp.asarray([0.55], jnp.float32)
        )
        outs.append(np.asarray(o)[0])
    np.testing.assert_allclose(np.concatenate(outs), want, rtol=1e-4,
                               atol=1e-5)


def test_sound_system_per_band_calibration():
    """calibrate_reverb(per_band_damping=True) lands a per-voice alpha
    that survives update_acoustics and renders finite audio."""
    from audio_raytracing_tpu.engine.system import SoundSystem
    from audio_raytracing_tpu.models.scene import Scene, box_room
    from audio_raytracing_tpu.ops.reverb import FB_LOWPASS_ALPHA

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192, max_voices=4)
    system = SoundSystem(
        scene=Scene.from_triangles(
            box_room(), cfg, absorption=np.tile(
                np.float32([0.05, 0.1, 0.3, 0.6]), (12, 1)
            ),
        ),
        cfg=cfg,
    )
    sid = system.load_sound(np.ones(2048, np.float32) * 0.1)
    h = system.play_sound(sid, pos=[2.0, 0.5, 1.0], repeat=True)
    system.set_listener([-2.0, 0.0, -1.0])
    cal = system.calibrate_reverb(
        n_rays=4096, max_bounces=6, per_band_damping=True
    )
    g, w, a = cal[h]
    slot = system._handles[h]
    # strongly band-dependent absorption -> the solve damps the highs
    assert a < 0.9
    assert float(system.params.damping_alpha[slot]) == pytest.approx(a)
    system.update_acoustics()
    assert float(system.params.damping_alpha[slot]) == pytest.approx(a)
    out = system.render(256)
    assert np.isfinite(out).all()
    system.calibrate_reverb(clear=True)
    system.update_acoustics()
    assert float(system.params.damping_alpha[slot]) == pytest.approx(
        FB_LOWPASS_ALPHA
    )
