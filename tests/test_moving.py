"""Moving-source offline renderer: direct-path doppler + keyframed tails."""

import dataclasses

import numpy as np

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.engine.moving import render_ir_moving_offline
from audio_raytracing_tpu.engine.renderer import render_ir_offline
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG = dataclasses.replace(
    DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_bounces=3
)


def test_static_track_matches_offline():
    """A constant track must reproduce render_ir_offline (the split
    direct/tail render degenerates to the static pipeline)."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )
    n = 2048
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    # distance 1.0 m = exactly 126 samples of delay: the static pipeline
    # quantizes the direct arrival to a bin; an integer-sample distance
    # makes the fractional-delay path land on the same sample
    pos = [1.0, 0.0, 0.0]
    lst = [0.0, 0.0, 0.0]

    got = render_ir_moving_offline(
        scene, [{"samples": dry, "pos": pos}], lst, listener_yaw=0.3, cfg=CFG
    )
    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos}], lst, listener_yaw=0.3, cfg=CFG
    )
    assert got.shape == want.shape
    # the only inherent divergence: energy that lands in the direct
    # arrival's bin adds as sqrt(e_d + e_r) offline vs sqrt(e_d) + sqrt(e_r)
    # split — tiny for a traced room
    np.testing.assert_allclose(got, want, atol=2e-3)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.02 * scale


def test_doppler_pitch_shift_approaching():
    """A source approaching at v shifts the direct path up by 1 + v/c
    (c = 350 m/s, the reference's constant)."""
    # fully absorbing room: no reflections, pure direct path
    scene = Scene.from_triangles(
        box_room(size=(60.0, 6.0, 6.0)), CFG,
        absorption=np.ones(12, np.float32),
    )
    sr = 44100
    dur = 0.5
    v = 35.0  # m/s -> 10% shift
    f0 = 440.0
    n = int(sr * dur)
    dry = np.sin(2 * np.pi * f0 * np.arange(n) / sr).astype(np.float32)

    def track(t):
        return np.asarray([25.0 - v * min(t, dur), 0.0, 0.0], np.float32)

    out = render_ir_moving_offline(
        scene, [{"samples": dry, "track": track}], [0.0, 0.0, 0.0], cfg=CFG
    )
    x = out[:, 0]
    # steady window well after arrival (25 m = 3150 samples) and before end
    w = x[8000:20000]
    assert np.abs(w).max() > 1e-4
    crossings = np.sum(np.diff(np.signbit(w)))
    f_meas = crossings / 2 / (len(w) / sr)
    f_want = f0 * (1.0 + v / 350.0)
    assert abs(f_meas - f_want) / f_want < 0.02, (f_meas, f_want)
    # and a receding source shifts down
    def track_away(t):
        return np.asarray([7.5 + v * min(t, dur), 0.0, 0.0], np.float32)

    out2 = render_ir_moving_offline(
        scene, [{"samples": dry, "track": track_away}], [0.0, 0.0, 0.0], cfg=CFG
    )
    w2 = out2[8000:20000, 0]
    crossings2 = np.sum(np.diff(np.signbit(w2)))
    f_meas2 = crossings2 / 2 / (len(w2) / sr)
    f_want2 = f0 * (1.0 - v / 350.0)
    assert abs(f_meas2 - f_want2) / f_want2 < 0.02, (f_meas2, f_want2)


def test_moving_source_keyframed_tail_reacts():
    """In a reflective room a moving source produces a finite stream whose
    reverberant energy follows the source (early vs late halves differ),
    and keyframe swaps do not glitch the output."""
    scene = Scene.from_triangles(
        box_room(size=(10.0, 4.0, 8.0)), CFG,
        absorption=np.full(12, 0.2, np.float32),
    )
    sr = 44100
    n = 8192
    dry = (0.4 * np.sin(2 * np.pi * 220 * np.arange(n) / sr)).astype(np.float32)

    def track(t):
        # sweep from near (+x wall) to near (-x wall)
        return np.asarray([4.0 - 8.0 * min(t * 4.0, 1.0), 0.5, 0.0], np.float32)

    out = render_ir_moving_offline(
        scene, [{"samples": dry, "track": track}], [0.0, 0.0, 0.0],
        cfg=CFG, updates_per_second=20.0,
    )
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-4
    # no spectral-swap glitches: largest sample-to-sample jump bounded by
    # the signal's own variation
    jumps = np.abs(np.diff(out[:, 0]))
    assert jumps.max() < 12 * np.percentile(jumps, 99) + 1e-4


def test_moving_listener_doppler_and_rotation():
    """A listener moving toward a static source gets the same 1 + v/c
    pitch shift (total-path fetch law); a rotating listener pans the
    source across the stereo image."""
    scene = Scene.from_triangles(
        box_room(size=(60.0, 6.0, 6.0)), CFG,
        absorption=np.ones(12, np.float32),
    )
    sr = 44100
    dur = 0.5
    v = 35.0
    f0 = 440.0
    n = int(sr * dur)
    dry = np.sin(2 * np.pi * f0 * np.arange(n) / sr).astype(np.float32)

    def lst_track(t):
        return (np.asarray([-25.0 + v * min(t, dur), 0.0, 0.0], np.float32),
                0.0, 0.0)

    out = render_ir_moving_offline(
        scene, [{"samples": dry, "pos": [0.0, 0.0, 0.0]}],
        cfg=CFG, listener_track=lst_track,
    )
    w = out[8000:20000, 0]
    assert np.abs(w).max() > 1e-4
    crossings = np.sum(np.diff(np.signbit(w)))
    f_meas = crossings / 2 / (len(w) / sr)
    f_want = f0 * (1.0 + v / 350.0)
    assert abs(f_meas - f_want) / f_want < 0.02, (f_meas, f_want)

    # rotation: source ahead (+x); yaw sweeping pi/2 moves it across the
    # image — the L/R energy balance of the first and last quarters differ
    def rot_track(t):
        return (np.asarray([-3.0, 0.0, 0.0], np.float32),
                min(t, dur) * np.pi, 0.0)

    out2 = render_ir_moving_offline(
        scene, [{"samples": dry, "pos": [0.0, 0.0, 0.0]}],
        cfg=CFG, listener_track=rot_track,
    )
    assert np.isfinite(out2).all()
    q = len(out2) // 4

    def balance(x):
        el = float(np.sum(x[:, 0] ** 2))
        er = float(np.sum(x[:, 1] ** 2))
        return (el - er) / (el + er + 1e-12)

    b_first = balance(out2[500 : q])
    b_last = balance(out2[3 * q : 4 * q - 200])
    assert abs(b_first - b_last) > 0.1, (b_first, b_last)


def test_moving_listener_static_track_matches_static_args():
    """A constant listener_track must equal the listener_pos/yaw path."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )
    n = 2048
    dry = (0.4 * np.sin(2 * np.pi * 330 * np.arange(n) / 44100)).astype(np.float32)
    a = render_ir_moving_offline(
        scene, [{"samples": dry, "pos": [1.0, 0.0, 0.0]}], [0.1, 0.0, -0.2],
        listener_yaw=0.4, cfg=CFG,
    )
    b = render_ir_moving_offline(
        scene, [{"samples": dry, "pos": [1.0, 0.0, 0.0]}],
        listener_track=lambda t: (np.float32([0.1, 0.0, -0.2]), 0.4, 0.0),
        cfg=CFG,
    )
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_static_directivity_matches_offline():
    """A constant track + static pattern reproduces render_ir_offline
    with the same per-source directivity."""
    from audio_raytracing_tpu.models.directivity import Directivity

    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )
    n = 2048
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [1.0, 0.0, 0.0]
    lst = [0.0, 0.0, 0.0]
    d = Directivity(axis=(-1.0, 0.0, 0.2), alpha=0.5)

    got = render_ir_moving_offline(
        scene, [{"samples": dry, "pos": pos, "directivity": d}], lst,
        listener_yaw=0.3, cfg=CFG,
    )
    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos, "directivity": d}], lst,
        listener_yaw=0.3, cfg=CFG,
    )
    lo = min(len(got), len(want))
    scale = np.abs(want[:lo]).max()
    np.testing.assert_allclose(got[:lo], want[:lo], atol=0.02 * scale)


def test_rotating_source_sweeps_level():
    """A sharp cardioid spinning from facing the listener to facing away
    fades the received level over the file."""
    from audio_raytracing_tpu.models.directivity import Directivity

    scene = Scene.from_triangles(
        box_room(size=(12.0, 6.0, 10.0)), CFG,
        absorption=np.full(12, 0.8, np.float32),  # dead room: direct dominates
    )
    n = 8192
    rng = np.random.default_rng(0)
    dry = (0.3 * rng.standard_normal(n)).astype(np.float32)
    pos = [2.0, 0.0, 0.0]
    lst = [-2.0, 0.0, 0.0]
    dur = n / 44100.0

    def axis(t):
        # rotate pi over the file: toward (-1,0,0) at t=0, away at t=dur
        ang = np.pi * min(t / dur, 1.0)
        return np.float32([-np.cos(ang), 0.0, np.sin(ang)])

    out = render_ir_moving_offline(
        scene,
        [{
            "samples": dry, "pos": pos,
            "directivity": Directivity(alpha=0.5, order=2.0),
            "orientation_track": axis,
        }],
        lst, cfg=CFG,
    )
    head = float(np.sqrt(np.mean(out[500:2500] ** 2)))
    tail = float(np.sqrt(np.mean(out[6000:8000] ** 2)))
    assert head > 4.0 * tail  # facing -> away collapses the level


def test_moving_direct_transmits_through_curtain():
    """The moving renderer's direct bed uses the transmission law (not
    hard-blocking): a static track behind a transmissive screen matches
    render_ir_offline on the same scene."""
    from audio_raytracing_tpu.models.scene import Scene as _S

    screen = np.float32([
        [[0.5, -2.0, -4.0], [0.5, 2.0, -4.0], [0.5, 2.0, 4.0]],
        [[0.5, -2.0, -4.0], [0.5, 2.0, 4.0], [0.5, -2.0, 4.0]],
    ])
    tris = np.concatenate([box_room(size=(8.0, 3.0, 6.0)), screen])
    trans = np.concatenate([
        np.zeros((12, 4), np.float32),
        np.tile(np.float32([0.25, 0.16, 0.09, 0.04]), (2, 1)),
    ])
    scene = _S.from_triangles(
        tris, CFG, absorption=np.full(14, 0.3, np.float32),
        transmission=trans,
    )
    n = 2048
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [2.0, 0.0, 0.0]   # source behind the screen from the listener
    lst = [-2.0, 0.0, 0.0]
    got = render_ir_moving_offline(
        scene, [{"samples": dry, "pos": pos}], lst, cfg=CFG
    )
    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos}], lst, cfg=CFG
    )
    lo = min(len(got), len(want))
    scale = np.abs(want[:lo]).max()
    assert scale > 1e-5  # the transmitted direct sound is audible at all
    np.testing.assert_allclose(got[:lo], want[:lo], atol=0.03 * scale)


def test_orientation_track_without_directivity_raises():
    import pytest

    from audio_raytracing_tpu.models.scene import Scene as _S

    scene = _S.from_triangles(box_room(), CFG)
    with pytest.raises(ValueError, match="orientation_track"):
        render_ir_moving_offline(
            scene,
            [{"samples": np.zeros(256, np.float32), "pos": [1.0, 0, 0],
              "orientation_track": lambda t: np.float32([1, 0, 0])}],
            [0.0, 0.0, 0.0], cfg=CFG,
        )
