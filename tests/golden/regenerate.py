#!/usr/bin/env python
"""Regenerate the golden fixtures in this directory — run DELIBERATELY
(from the repo root, CPU backend) when acoustic or DSP semantics change:

    python tests/golden/regenerate.py

world_ir.npz    — trace_ir histograms on world.obj (guards the acoustic
                  tracing semantics; see tests/test_ir.py::test_golden_ir_world)
engine_wav.npz  — a short deterministic end-to-end engine render: synthetic
                  sources, moving listener, full DSP chain to stereo (guards
                  the whole reference-parity pipeline; see
                  tests/test_engine.py::test_golden_engine_wav)
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from audio_raytracing_tpu.config import DEFAULT_CONFIG  # noqa: E402
from audio_raytracing_tpu.models.ir import trace_ir  # noqa: E402
from audio_raytracing_tpu.models.scene import Scene  # noqa: E402

HERE = Path(__file__).parent


def world_ir():
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096,
                              rays_per_source=4096, max_bounces=4)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    ir = trace_ir(scene.device_arrays(), jnp.asarray([2.0, 0.5, 1.0]),
                  jnp.asarray([0.0, 0.0, 0.0]), cfg=cfg)
    np.savez(HERE / "world_ir.npz", energy=np.asarray(ir.energy),
             dir_sum=np.asarray(ir.dir_sum))
    print("wrote world_ir.npz", float(ir.energy.sum()))


def golden_engine_scene():
    """The deterministic end-to-end scenario (shared with the test)."""
    from audio_raytracing_tpu.models.scene import box_room

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_voices=4
    )
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), cfg,
        absorption=np.full(12, 0.25, np.float32),
    )
    t = np.arange(8000, dtype=np.float32) / cfg.sample_rate
    tone = (0.4 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)
    rng = np.random.default_rng(1234)
    burst = (0.3 * rng.standard_normal(4000)).astype(np.float32)
    burst *= np.exp(-np.arange(4000, dtype=np.float32) / 800.0)
    sounds = [tone, burst]
    events = [
        {"t": 0.0, "sound": 0, "pos": (2.0, 0.0, 1.0), "gain": 0.6, "repeat": True},
        {"t": 0.15, "sound": 1, "pos": (-1.5, 0.5, -1.0), "gain": 0.8},
    ]

    def listener_track(t):
        return (np.float32([0.5 * t, 0.0, -0.3 * t]), 0.8 * t, 0.1)

    return cfg, scene, sounds, events, listener_track


def engine_wav():
    from audio_raytracing_tpu.engine.renderer import render_engine_offline

    cfg, scene, sounds, events, track = golden_engine_scene()
    out = render_engine_offline(
        scene, sounds, events, track, duration_s=0.5, cfg=cfg,
        updates_per_second=10.0,
    )
    np.savez(HERE / "engine_wav.npz", stereo=out.astype(np.float32))
    print("wrote engine_wav.npz", out.shape, float(np.abs(out).max()))


def golden_offline_scene():
    """Deterministic offline IR-render scenario (shared with the test)."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_obj(
        ROOT / "data" / "world.obj", cfg, materials={"Material": "brick"}
    )
    t = np.arange(4000, dtype=np.float32) / cfg.sample_rate
    tone = (0.4 * np.sin(2 * np.pi * 523.25 * t)).astype(np.float32)
    sources = [
        {"samples": tone, "pos": (2.0, 0.5, 1.0), "gain": 0.8},
        {"samples": tone[:2000], "pos": (-1.5, 0.0, -1.0), "gain": 0.5},
    ]
    return cfg, scene, sources


def offline_wav():
    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    cfg, scene, sources = golden_offline_scene()
    out = render_ir_offline(
        scene, sources, (0.0, 0.0, 0.0), listener_yaw=0.3, cfg=cfg,
        n_rays=512, max_bounces=3,
    )
    np.savez(HERE / "offline_wav.npz", stereo=out.astype(np.float32))
    print("wrote offline_wav.npz", out.shape, float(np.abs(out).max()))


def golden_cli_case(tmp_dir):
    """Deterministic offline-CLI scenario: writes the dry WAV into tmp_dir,
    returns (argv maker, model-family extra args). Shared by
    offline_cli_wavs() and tests/test_app.py::test_golden_offline_cli."""
    from audio_raytracing_tpu.utils.wav import write_wav

    sr = DEFAULT_CONFIG.sample_rate
    t = np.arange(3000, dtype=np.float32) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t) * np.exp(-t * 8.0)).astype(
        np.float32
    )
    dry = Path(tmp_dir) / "dry.wav"
    write_wav(dry, tone[:, None], sr)

    def argv(out_path, extra):
        return [
            str(ROOT / "data" / "world.obj"), str(out_path),
            "--source", str(dry), "2,0.5,1",
            "--listener", "0,0,0", "--yaw", "0.3",
            "--ir-length", "2048", "--rays", "512", "--bounces", "3",
        ] + extra

    cases = {
        "trace": [],
        "ism": ["--model", "ism", "--ism-order", "2"],
        "hybrid": ["--model", "hybrid", "--seed", "7"],
        # new-capability surfaces (r1 continuation): full model with
        # double diffraction, source directivity, transmissive material,
        # ISO air absorption
        "full": ["--model", "full", "--ism-order", "1",
                 "--diffraction-order", "2", "--seed", "7"],
        "trace_directivity": ["--directivity", "cardioid@0,0,-1"],
        "trace_glass": ["--material", "Material=glass"],
        "trace_iso_air": ["--air", "iso9613@10,80"],
    }
    return argv, cases


def offline_cli_wavs():
    """Golden WAVs for the offline CLI, one per acoustic model family —
    guards the whole CLI surface (arg plumbing, model dispatch, decode
    chain, WAV writer)."""
    import tempfile

    from audio_raytracing_tpu.app.offline import main as cli_main
    from audio_raytracing_tpu.utils.wav import read_wav

    out = {}
    with tempfile.TemporaryDirectory() as td:
        argv, cases = golden_cli_case(td)
        for name, extra in cases.items():
            wav = Path(td) / f"{name}.wav"
            cli_main(argv(wav, extra))
            samples, sr = read_wav(wav)
            assert sr == DEFAULT_CONFIG.sample_rate
            out[name] = np.asarray(samples, np.float32)
    np.savez(HERE / "offline_cli_wavs.npz", **out)
    print("wrote offline_cli_wavs.npz",
          {k: (v.shape, round(float(np.abs(v).max()), 4)) for k, v in out.items()})


if __name__ == "__main__":
    world_ir()
    engine_wav()
    offline_wav()
    offline_cli_wavs()
