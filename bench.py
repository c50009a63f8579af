#!/usr/bin/env python
"""Benchmark harness: the repo's tracked metrics on the current backend.

Prints ONE JSON line:
  {"metric": "ray_bounce_per_sec", "value": ..., "unit": "bounces/s",
   "vs_baseline": value / 1e9, "extra": {...}}

Metrics (BASELINE.md north-star targets):
  * ray_bounce_per_sec — ray path-extension steps (nearest-hit over all of
    world.obj's triangles + listener shadow ray + specular reflection +
    histogram scatter) per second per chip. Target >= 1e9.
  * ir_build_ms — one full impulse-response build (trace_ir end to end).
  * audio_block_ms — one 128-sample spatializer block for 8 concurrent
    sources (render_block end to end). Target < 10 ms (real-time ~2.9 ms).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent


def _median_time(fn, iters=10, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.engine import voices as eng
    from audio_raytracing_tpu.engine.system import SoundSystem, default_hrtf
    from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir
    from audio_raytracing_tpu.models.scene import Scene, box_room

    backend = jax.default_backend()
    obj = ROOT / "data" / "world.obj"
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768, max_voices=8)
    scene = Scene.from_obj(obj, cfg) if obj.exists() else Scene.from_triangles(box_room(), cfg)
    arrays = scene.device_arrays()

    # --- ray-bounce throughput ---
    n_rays = 1 << 18
    bounces = 8
    dirs = jnp.asarray(fibonacci_sphere(n_rays))
    src = jnp.asarray([1.0, 0.3, 0.5])
    lst = jnp.asarray([-1.0, 0.0, -0.5])

    import jax.numpy as _jnp

    srcs = [jnp.asarray([1.0 + 0.001 * i, 0.3, 0.5]) for i in range(16)]
    it = iter(range(10**9))

    def trace_step():
        # vary the source per call: the remote execution layer caches
        # identical dispatches; block via a host transfer (block_until_ready
        # is unreliable through the relay)
        ir = trace_ir(
            arrays, srcs[next(it) % len(srcs)], lst, cfg=cfg,
            max_bounces=bounces, dirs=dirs,
            intersector="mxu", scatter="matmul",
        )
        float(_jnp.sum(ir.energy))
        return ir

    t_trace = _median_time(trace_step, iters=10, warmup=3)
    rate = n_rays * bounces / t_trace
    ir_build_ms = t_trace * 1e3

    # --- audio block render, 8 sources ---
    hrtf = default_hrtf()
    system = SoundSystem(scene=scene, cfg=cfg, hrtf=hrtf)
    rng = np.random.default_rng(0)
    tone = (0.3 * rng.standard_normal(44100)).astype(np.float32)
    sid = system.load_sound(tone)
    for i in range(8):
        system.play_sound(sid, pos=rng.uniform(-3, 3, 3), gain=0.3, repeat=True)
    system.set_listener([0.0, 0.0, 0.0], yaw=0.4)
    system.update_acoustics()

    hl, hr = (jnp.asarray(h) for h in hrtf)
    listener = jnp.asarray(system.listener)
    orient = jnp.asarray(system.orientation)

    def block_step():
        out, new_state = eng.render_block(
            system._arena, system.state, system.params, listener, orient,
            hl, hr, 0, 1, cfg=cfg,
        )
        float(out[0, 0])
        system.state = new_state

    audio_block_ms = _median_time(block_step, iters=20, warmup=3) * 1e3

    # --- acoustic param update (the reference's per-frame 'update' span) ---
    from audio_raytracing_tpu.sim.probe import acoustic_update

    vt = system.state.voices

    def update_step():
        p = acoustic_update(arrays, listener, vt.pos, vt.active, cfg=cfg)
        float(p.occlusion[0])

    update_ms = _median_time(update_step, iters=10, warmup=2) * 1e3

    result = {
        "metric": "ray_bounce_per_sec",
        "value": rate,
        "unit": "bounces/s",
        "vs_baseline": rate / 1e9,
        "extra": {
            "backend": backend,
            "n_rays": n_rays,
            "bounces": bounces,
            "triangles": scene.n_triangles,
            "ir_build_ms": ir_build_ms,
            "audio_block_ms_8src": audio_block_ms,
            "acoustic_update_ms": update_ms,
            "ray_triangle_tests_per_sec": rate * scene.v0.shape[0] * 2,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
