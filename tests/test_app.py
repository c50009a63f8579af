"""App layer tests: input mapping semantics, camera parity, demo driver,
offline renderers."""

import math

import numpy as np
import pytest

from audio_raytracing_tpu.app.camera import Camera
from audio_raytracing_tpu.app.input import GameInput, Input
from audio_raytracing_tpu.config import DEFAULT_CONFIG


def test_input_edges_and_decay():
    inp = Input()
    inp.bind_key("w", GameInput.FORWARD)
    inp.bind_mouse("left", GameInput.FIRE)
    inp.accumulate({"type": "key_down", "code": "w"})
    s = inp.peek(GameInput.FORWARD)
    assert s.held and s.pressed and not s.released
    inp.decay()
    s = inp.peek(GameInput.FORWARD)
    assert s.held and not s.pressed  # edges cleared, held persists
    inp.accumulate({"type": "key_up", "code": "w"})
    s = inp.peek(GameInput.FORWARD)
    assert not s.held and s.released
    # unmapped events ignored
    inp.accumulate({"type": "key_down", "code": "q"})
    # mouse motion accumulates delta until decay
    inp.accumulate({"type": "mouse_motion", "pos": (5, 5), "rel": (2.0, 1.0)})
    inp.accumulate({"type": "mouse_motion", "pos": (7, 6), "rel": (2.0, 1.0)})
    np.testing.assert_allclose(inp.mouse_delta, [4.0, 2.0])
    inp.decay()
    np.testing.assert_allclose(inp.mouse_delta, [0.0, 0.0])


def test_camera_movement_and_clamp():
    cfg = DEFAULT_CONFIG
    inp = Input()
    inp.bind_key("w", GameInput.FORWARD)
    cam = Camera()
    inp.accumulate({"type": "key_down", "code": "w"})
    for _ in range(cfg.ticks_per_second):  # 1 second forward
        cam.update(inp, cfg)
    # speed 2 m/s along +x at yaw 0 (main.zig:976, 988-993)
    np.testing.assert_allclose(cam.pos, [2.0, 0.0, 0.0], atol=0.02)
    # pitch clamp at +-0.49 pi
    inp.accumulate({"type": "mouse_motion", "pos": (0, 0), "rel": (0.0, -1e6)})
    cam.update(inp, cfg)
    assert abs(cam.pitch - 0.49 * math.pi) < 1e-6


def test_camera_vp_finite():
    cam = Camera()
    cam.pos = np.float32([1.0, 2.0, 3.0])
    cam.yaw, cam.pitch = 0.7, -0.2
    cam.prev_pos, cam.prev_yaw, cam.prev_pitch = cam.pos, cam.yaw, cam.pitch
    m = cam.vp(alpha=1.0)
    assert m.shape == (4, 4) and np.isfinite(m).all()


def test_demo_runs_and_produces_audio():
    import dataclasses

    from audio_raytracing_tpu.app.demo import Demo, default_script

    cfg = dataclasses.replace(DEFAULT_CONFIG, max_voices=8)
    demo = Demo(cfg=cfg)
    audio = demo.run(0.6, script=default_script)
    assert audio.shape[1] == 2
    assert audio.shape[0] >= int(0.5 * cfg.sample_rate)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() > 1e-6  # music is audible
    # the scripted walk moved the camera
    assert np.linalg.norm(demo.camera.pos) > 0.5


def test_render_ir_offline():
    import dataclasses

    from audio_raytracing_tpu.engine.renderer import render_ir_offline
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_bounces=3)
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), cfg)
    t = np.arange(2000) / cfg.sample_rate
    dry = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = render_ir_offline(
        scene,
        [{"samples": dry, "pos": [1.5, 0.5, 1.0], "gain": 1.0}],
        listener_pos=[-1.0, 0.0, -1.0],
        listener_yaw=0.4,
        cfg=cfg,
    )
    assert out.shape[1] == 2 and np.isfinite(out).all()
    assert np.abs(out).max() > 1e-6


def test_render_engine_offline():
    import dataclasses

    from audio_raytracing_tpu.engine.renderer import render_engine_offline
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cfg = dataclasses.replace(DEFAULT_CONFIG, max_voices=4)
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), cfg)
    tone = (0.5 * np.sin(2 * np.pi * 330 * np.arange(4000) / cfg.sample_rate)).astype(np.float32)

    def track(t):
        return np.float32([t * 0.5, 0.0, 0.0]), 0.1 * t, 0.0

    out = render_engine_offline(
        scene,
        [tone],
        [{"t": 0.0, "sound": 0, "pos": [2.0, 0.0, 1.0], "gain": 0.8, "repeat": True}],
        track,
        duration_s=0.5,
        cfg=cfg,
    )
    assert out.shape == (int(0.5 * cfg.sample_rate), 2)
    assert np.isfinite(out).all() and np.abs(out).max() > 1e-6


def test_offline_cli_models(tmp_path):
    """The offline IR-render CLI end to end for each model family."""
    import numpy as np
    from pathlib import Path

    from audio_raytracing_tpu.app.offline import main as offline_main
    from audio_raytracing_tpu.utils.wav import read_wav, write_wav

    dry = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2000) / 44100)).astype(np.float32)
    src_wav = tmp_path / "dry.wav"
    write_wav(src_wav, dry, 44100)

    common = [
        str(Path(__file__).resolve().parent.parent / "data" / "world.obj"),
        "--source", str(src_wav), "2,0.5,1",
        "--listener", "0,0,0", "--yaw", "0.3",
        "--rays", "256", "--bounces", "2", "--ir-length", "2048",
        "--material", "Material=brick",
    ]
    for model, extra in [
        ("trace", []),
        ("trace", ["--sh-order", "2"]),
        ("trace", ["--speakers", "8"]),
        ("ism", ["--ism-order", "1"]),
        ("ism", ["--ism-order", "2", "--ism-planes"]),
        ("hybrid", ["--ism-order", "1"]),
        ("full", ["--ism-order", "1", "--diffraction-order", "2"]),
        ("full", ["--ism-order", "1", "--diffraction-order", "3"]),
        ("trace", ["--directivity", "cardioid@1,0,0"]),
    ]:
        out = tmp_path / f"out_{model}_{len(extra)}.wav"
        msg = offline_main([common[0], str(out)] + common[1:] +
                           ["--model", model] + extra)
        assert "wrote" in msg
        audio, rate = read_wav(out)
        assert rate == 44100 and np.isfinite(audio).all()
        assert np.abs(audio).max() > 0
        if "--speakers" in extra:
            assert audio.shape[1] == 8
        else:
            assert audio.shape[1] == 2


@pytest.mark.slow
def test_offline_cli_pallas_tail(tmp_path):
    """--tail pallas must not pass a threefry key into hybrid_ir (r1
    ADVICE: the CLI passed key=PRNGKey alongside tail_backend='pallas',
    which hybrid_ir rejects — every such invocation died). Runs the fused
    kernel in interpret mode on the CPU suite via the hidden
    --tail-interpret flag."""
    import numpy as np
    from pathlib import Path

    from audio_raytracing_tpu.app.offline import main as offline_main
    from audio_raytracing_tpu.utils.wav import read_wav, write_wav

    dry = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2000) / 44100)).astype(
        np.float32
    )
    src_wav = tmp_path / "dry.wav"
    write_wav(src_wav, dry, 44100)
    out = tmp_path / "out_pallas_tail.wav"
    msg = offline_main([
        str(Path(__file__).resolve().parent.parent / "data" / "world.obj"),
        str(out),
        "--source", str(src_wav), "2,0.5,1",
        "--listener", "0,0,0",
        "--rays", "1024", "--bounces", "2", "--ir-length", "2048",
        "--model", "hybrid", "--ism-order", "1",
        "--tail", "pallas", "--tail-interpret",
    ])
    assert "wrote" in msg
    audio, rate = read_wav(out)
    assert rate == 44100 and np.isfinite(audio).all()
    assert np.abs(audio).max() > 0 and audio.shape[1] == 2


@pytest.mark.slow
def test_golden_offline_cli(tmp_path):
    """Golden WAVs for the offline CLI, one per acoustic model family
    (trace / ism / hybrid): the full CLI surface — arg plumbing, model
    dispatch, decode chain, WAV writer — must reproduce the committed
    waveforms (regenerate deliberately via tests/golden/regenerate.py)."""
    import importlib.util as ilu
    from pathlib import Path

    import numpy as np

    from audio_raytracing_tpu.app.offline import main as cli_main
    from audio_raytracing_tpu.utils.wav import read_wav

    golden_dir = Path(__file__).parent / "golden"
    spec = ilu.spec_from_file_location("regen_cli", golden_dir / "regenerate.py")
    regen = ilu.module_from_spec(spec)
    spec.loader.exec_module(regen)

    argv, cases = regen.golden_cli_case(tmp_path)
    with np.load(golden_dir / "offline_cli_wavs.npz") as z:
        want = {k: z[k] for k in z.files}
    assert set(cases) == set(want)
    for name, extra in cases.items():
        wav = tmp_path / f"{name}.wav"
        msg = cli_main(argv(wav, extra))
        model = extra[extra.index("--model") + 1] if "--model" in extra else "trace"
        assert f"model={model}" in msg
        got, sr = read_wav(wav)
        assert sr == 44100
        assert got.shape == want[name].shape
        np.testing.assert_allclose(got, want[name], atol=1e-5)
