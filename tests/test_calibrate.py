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
