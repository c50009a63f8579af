"""End-to-end engine tests: jitted block renderer vs the per-sample oracle,
plus facade behavior (handles, lifecycle, finished sweep)."""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.engine.oracle import OracleEngine, OracleVoice
from audio_raytracing_tpu.engine.system import SoundSystem, default_hrtf
from audio_raytracing_tpu.models.scene import Scene, box_room


@pytest.fixture(scope="module")
def hrtf():
    return default_hrtf()


def make_tone(n=2000, freq=440.0, rate=44100):
    t = np.arange(n, dtype=np.float32) / rate
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _sync_oracle_params(ov, system, slot):
    ov.occlusion = float(system.params.occlusion[slot])
    ov.refl_dist = np.asarray(system.params.refl_dist[slot])
    ov.refl_lam = np.asarray(system.params.refl_lam[slot])
    ov.reverb.feedback_gain = float(system.params.feedback_gain[slot])
    ov.wet = float(system.params.wet[slot])


def test_render_matches_oracle_repeat_voice(hrtf):
    """One looping voice, static listener: engine block == oracle block."""
    hl, hr = hrtf
    tone = make_tone(1500)
    sys_ = SoundSystem(scene=None, hrtf=hrtf)
    sid = sys_.load_sound(tone)
    h = sys_.play_sound(sid, pos=[2.0, 0.5, -1.0], gain=0.8, repeat=True)
    sys_.set_listener([0.0, 0.0, 0.0], yaw=0.3, pitch=-0.1)

    o = OracleEngine(hrtf_l=hl, hrtf_r=hr)
    ov = OracleVoice(tone, [2.0, 0.5, -1.0], gain=0.8, repeat=True)
    o.voices.append(ov)
    o.listener = np.asarray(sys_.listener)
    o.orientation = np.asarray(sys_.orientation)

    got = sys_.render(256)
    want = o.render(256)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_render_matches_oracle_oneshot_with_params(hrtf):
    """One-shot voice with nontrivial occlusion/reflections/reverb params."""
    hl, hr = hrtf
    tone = make_tone(700)
    sys_ = SoundSystem(scene=None, hrtf=hrtf)
    sid = sys_.load_sound(tone)
    h = sys_.play_sound(sid, pos=[1.0, 0.0, 2.0], gain=1.0, repeat=False)
    slot = sys_._handles[h]
    sys_.set_listener([0.0, 0.0, 0.0])

    p = sys_.params
    sys_.params = p._replace(
        occlusion=p.occlusion.at[slot].set(0.7),
        refl_dist=p.refl_dist.at[slot].set(jnp.asarray([3.0, 4.0, 5.0, 6.0, 7.0, 8.0])),
        refl_lam=p.refl_lam.at[slot].set(jnp.asarray([0.5, 0.4, 0.3, 0.2, 0.1, 0.6])),
        feedback_gain=p.feedback_gain.at[slot].set(0.8),
        wet=p.wet.at[slot].set(0.4),
    )

    o = OracleEngine(hrtf_l=hl, hrtf_r=hr)
    ov = OracleVoice(tone, [1.0, 0.0, 2.0], gain=1.0, repeat=False)
    o.voices.append(ov)
    _sync_oracle_params(ov, sys_, slot)

    got = sys_.render(384)
    want = o.render(384)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_render_matches_oracle_multivoice(hrtf):
    hl, hr = hrtf
    t1, t2 = make_tone(1000, 440.0), make_tone(1300, 660.0)
    sys_ = SoundSystem(scene=None, hrtf=hrtf)
    s1, s2 = sys_.load_sound(t1), sys_.load_sound(t2)
    sys_.play_sound(s1, pos=[1.0, 0.0, 0.0], gain=0.7, repeat=True)
    sys_.play_sound(s2, pos=[-2.0, 1.0, 1.0], gain=0.5, repeat=False)
    sys_.set_listener([0.2, 0.0, -0.3], yaw=1.0)

    o = OracleEngine(hrtf_l=hl, hrtf_r=hr)
    o.voices.append(OracleVoice(t1, [1.0, 0.0, 0.0], gain=0.7, repeat=True))
    o.voices.append(OracleVoice(t2, [-2.0, 1.0, 1.0], gain=0.5, repeat=False))
    o.listener = np.asarray(sys_.listener)
    o.orientation = np.asarray(sys_.orientation)

    got = sys_.render(256)
    want = o.render(256)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-5)


def test_moving_listener_doppler_crossfade(hrtf):
    """prev_dist lerping across a multi-block render must match."""
    hl, hr = hrtf
    tone = make_tone(4000)
    sys_ = SoundSystem(scene=None, hrtf=hrtf)
    sid = sys_.load_sound(tone)
    sys_.play_sound(sid, pos=[5.0, 0.0, 0.0], gain=1.0, repeat=True)
    sys_.set_listener([0.0, 0.0, 0.0])

    o = OracleEngine(hrtf_l=hl, hrtf_r=hr)
    o.voices.append(OracleVoice(tone, [5.0, 0.0, 0.0], gain=1.0, repeat=True))

    # first render initializes prev_dist at 5
    got = sys_.render(128)
    want = o.render(128)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)
    # listener teleports closer: distance lerps 5 -> 2 across the render
    sys_.set_listener([3.0, 0.0, 0.0])
    o.listener = np.asarray([3.0, 0.0, 0.0], np.float32)
    got = sys_.render(256)
    want = o.render(256)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_oneshot_finishes_and_slot_reused():
    cfg = DEFAULT_CONFIG
    sys_ = SoundSystem(scene=None)
    sid = sys_.load_sound(np.ones(100, np.float32))
    h = sys_.play_sound(sid, pos=[0.0, 0.0, 0.0], repeat=False)
    assert sys_.is_playing(h)
    # needs 100 + 65536 cursor: render enough blocks
    n = ((100 + cfg.finish_grace_samples) // cfg.block_size + 2) * cfg.block_size
    sys_.render(n)
    assert not sys_.is_playing(h)
    # slot is free again
    h2 = sys_.play_sound(sid, pos=[0.0, 0.0, 0.0])
    assert sys_.is_playing(h2)


def test_full_pipeline_with_scene(hrtf):
    """Scene-driven params end to end: trace -> params -> render, silent
    nothing, nonzero something, no NaNs."""
    scene = Scene.from_triangles(box_room(size=(8.0, 3.0, 6.0)))
    sys_ = SoundSystem(scene=scene, hrtf=hrtf)
    sid = sys_.load_sound(make_tone(3000))
    sys_.play_sound(sid, pos=[2.0, 0.0, 1.0], gain=0.5, repeat=True)
    sys_.set_listener([0.0, 0.0, 0.0], yaw=0.5)
    params = sys_.update_acoustics()
    assert float(params.wet[0]) > 0.0  # room coupling traced
    out = sys_.render(512)
    assert out.shape == (512, 2)
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 0.0


def test_golden_engine_wav():
    """End-to-end golden WAV: the full engine pipeline (trace -> voice DSP
    -> ambisonic -> HRTF) on a deterministic scenario must reproduce the
    committed waveform (regenerate deliberately via
    tests/golden/regenerate.py when semantics change)."""
    import importlib.util as ilu
    from pathlib import Path

    golden_dir = Path(__file__).parent / "golden"
    spec = ilu.spec_from_file_location("regen", golden_dir / "regenerate.py")
    regen = ilu.module_from_spec(spec)
    spec.loader.exec_module(regen)

    from audio_raytracing_tpu.engine.renderer import render_engine_offline

    cfg, scene, sounds, events, track = regen.golden_engine_scene()
    out = render_engine_offline(
        scene, sounds, events, track, duration_s=0.5, cfg=cfg,
        updates_per_second=10.0,
    )
    with np.load(golden_dir / "engine_wav.npz") as z:
        want = z["stereo"]
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_golden_offline_render():
    """Golden fixture for the offline IR-render path (the CLI's engine):
    materials-mapped world.obj, two sources, rotated listener."""
    import importlib.util as ilu
    from pathlib import Path

    golden_dir = Path(__file__).parent / "golden"
    spec = ilu.spec_from_file_location("regen2", golden_dir / "regenerate.py")
    regen = ilu.module_from_spec(spec)
    spec.loader.exec_module(regen)

    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    cfg, scene, sources = regen.golden_offline_scene()
    out = render_ir_offline(
        scene, sources, (0.0, 0.0, 0.0), listener_yaw=0.3, cfg=cfg,
        n_rays=512, max_bounces=3,
    )
    with np.load(golden_dir / "offline_wav.npz") as z:
        want = z["stereo"]
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, atol=1e-5)
