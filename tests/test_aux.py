"""Auxiliary subsystems: Space parity API, software rasterizer, profiling
spans, engine checkpoint/resume."""

import numpy as np

from audio_raytracing_tpu.app.camera import Camera
from audio_raytracing_tpu.app.render import render_frame, write_ppm
from audio_raytracing_tpu.engine.system import SoundSystem
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.models.space import Space, SpaceBuilder
from audio_raytracing_tpu.utils import profiling


def test_space_builder_parity(rng):
    b = SpaceBuilder()
    boxes = []
    for i in range(60):
        c = (rng.random(3, dtype=np.float32) - 0.5) * 20
        d = rng.random(3, dtype=np.float32) * 5 + 0.01
        b.add(c - d, c + d, i)
        boxes.append((c - d, c + d))
    space = b.finish()
    assert space.depth() >= 2
    vals, dists = space.raycast([0, 0, 0], [1, 0.2, -0.1], capacity=128)
    assert np.all(np.diff(dists) >= 0)
    # every reported candidate's slab distance checks out against its box
    from audio_raytracing_tpu.models.bih import slab_entry_distances

    d = np.float32([1, 0.2, -0.1])
    d /= np.linalg.norm(d)
    for v, t in zip(vals, dists):
        low, high = boxes[int(v)]
        got = slab_entry_distances(low[None], high[None], np.zeros(3, np.float32), d)
        np.testing.assert_allclose(t, got[0], rtol=1e-5)


def test_space_save_load(tmp_path):
    b = SpaceBuilder()
    b.add([0, 0, 0], [1, 1, 1], 0)
    b.add([2, 0, 0], [3, 1, 1], 1)
    s = b.finish()
    s.save(tmp_path / "space.npz")
    s2 = Space.load(tmp_path / "space.npz")
    v1, d1 = s.raycast([-1, 0.5, 0.5], [1, 0, 0])
    v2, d2 = s2.raycast([-1, 0.5, 0.5], [1, 0, 0])
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(d1, d2)


def test_render_frame(tmp_path):
    scene = Scene.from_triangles(box_room(size=(8.0, 3.0, 6.0)))
    cam = Camera()
    cam.pos = np.float32([0.0, 0.0, 0.0])
    cam.prev_pos = cam.pos
    img = render_frame(scene, cam, width=160, height=120, markers=[[2.0, 0.0, 0.5]])
    assert img.shape == (120, 160, 3)
    # something was drawn over the clear color
    assert (img != np.asarray([24, 26, 32], np.uint8)).any(axis=-1).mean() > 0.2
    write_ppm(tmp_path / "frame.ppm", img)
    raw = (tmp_path / "frame.ppm").read_bytes()
    assert raw.startswith(b"P6\n160 120\n255\n")


def test_profiling_spans():
    profiling.reset()
    with profiling.span("unit"):
        x = sum(range(1000))
    s = profiling.stats("unit")
    assert s["count"] == 1 and s["mean_ms"] >= 0
    rep = profiling.report()
    assert "unit" in rep
    profiling.reset()
    assert profiling.stats("unit")["count"] == 0


def test_engine_checkpoint_roundtrip(tmp_path):
    tone = (0.5 * np.sin(np.arange(3000) * 0.1)).astype(np.float32)
    a = SoundSystem(scene=None)
    sid = a.load_sound(tone)
    h = a.play_sound(sid, pos=[1.0, 0.0, 0.0], gain=0.7, repeat=True)
    a.set_listener([0.2, 0.0, 0.1], yaw=0.3)
    a.render(256)  # advance state
    a.save_state(tmp_path / "ckpt.npz")
    next_a = a.render(256)

    b = SoundSystem(scene=None)
    b.load_sound(tone)
    b.set_listener([0.2, 0.0, 0.1], yaw=0.3)
    b.load_state(tmp_path / "ckpt.npz")
    assert b.is_playing(h)
    next_b = b.render(256)
    np.testing.assert_allclose(next_b, next_a, atol=1e-7)


def test_master_gain_and_limiter():
    import dataclasses

    import numpy as np

    from audio_raytracing_tpu.config import DEFAULT_CONFIG

    tone = (2.0 * np.sin(np.arange(2000) * 0.2)).astype(np.float32)  # hot
    base = SoundSystem(scene=None)
    sid = base.load_sound(tone)
    base.play_sound(sid, pos=[0.1, 0.0, 0.0], gain=3.0, repeat=True)
    loud = base.render(256)

    cfg = dataclasses.replace(DEFAULT_CONFIG, master_gain=0.5, limiter=True)
    lim = SoundSystem(scene=None, cfg=cfg)
    sid = lim.load_sound(tone)
    lim.play_sound(sid, pos=[0.1, 0.0, 0.0], gain=3.0, repeat=True)
    safe = lim.render(256)
    assert np.abs(safe).max() <= 1.0
    np.testing.assert_allclose(safe, np.tanh(loud * 0.5), atol=1e-6)


def test_wav_extensible_subformat(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE must read the SubFormat GUID (32-bit int PCM
    vs float32 disambiguation)."""
    import struct

    from audio_raytracing_tpu.utils.wav import read_wav

    samples = (np.sin(np.arange(200) * 0.1) * 2**30).astype("<i4")
    raw = samples.tobytes()
    # extensible fmt chunk: tag 0xFFFE, 32-bit, SubFormat = PCM (1)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 44100, 44100 * 4, 4, 32)
    fmt += struct.pack("<HHI", 32, 0, 0)  # cbSize, valid bits, channel mask (abridged)
    fmt += struct.pack("<H", 1) + b"\x00" * 14  # SubFormat GUID: PCM
    p = tmp_path / "ext.wav"
    with open(p, "wb") as f:
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(raw)) + raw
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    x, rate = read_wav(p)
    assert rate == 44100
    np.testing.assert_allclose(
        x[:, 0], samples.astype(np.float32) / 2**31, atol=1e-6
    )


def test_obj_rejects_relative_indices():
    import pytest

    from audio_raytracing_tpu.utils.obj import parse_obj

    with pytest.raises(ValueError, match="relative"):
        parse_obj("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nf -3/-1 -2/-1 -1/-1\n")


def test_render_frame_textured(world_obj_path, tmp_path):
    from audio_raytracing_tpu.app.render import render_frame
    from audio_raytracing_tpu.utils.obj import load_obj

    mesh = load_obj(world_obj_path)
    scene = Scene.from_mesh(mesh)
    cam = Camera()
    cam.pos = np.float32([0.0, 0.0, 0.0])
    cam.prev_pos = cam.pos
    img = render_frame(scene, cam, width=160, height=120, uvs=mesh.uvs,
                       markers=[[2.0, 0.0, 0.5]])
    assert img.shape == (120, 160, 3)
    drawn = (img != np.asarray([24, 26, 32], np.uint8)).any(axis=-1)
    assert drawn.mean() > 0.3
    # texturing produces more than a handful of distinct colors
    colors = np.unique(img[drawn].reshape(-1, 3), axis=0)
    assert len(colors) > 16
    # an OBJ-loaded scene carries its texture coordinates, and render_frame
    # picks them up without the caller passing uvs (same pixels)
    assert scene.uvs is not None and len(scene.uvs) == 3 * scene.n_triangles
    img_auto = render_frame(scene, cam, width=160, height=120,
                            markers=[[2.0, 0.0, 0.5]])
    np.testing.assert_array_equal(img_auto, img)
