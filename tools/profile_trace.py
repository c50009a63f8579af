#!/usr/bin/env python
"""Capture a device profile of the hot paths (jax.profiler trace).

The reference's entire observability story is two std.debug.print timing
spans (SURVEY.md §5); this framework's equivalents are the host-side spans
in utils/profiling.py plus THIS: a real device trace viewable in
TensorBoard / Perfetto (`tensorboard --logdir <out>` -> Profile tab, or
upload the .trace.json.gz from plugins/profile/ to ui.perfetto.dev).

    python tools/profile_trace.py [outdir] [--what trace|engine|all]

Captures: the jit-compiled fused Pallas IR trace (the same kernel program
bench.py's AOT artifact serializes — compiled fresh here so any ray count
works), the XLA MXU tracer, and a 16-block audio-engine render.
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/artpu_profile")
    ap.add_argument("--what", default="all", choices=["trace", "engine", "all"])
    ap.add_argument("--rays", type=int, default=1 << 18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted, trace_ir
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768, max_voices=8)
    obj = ROOT / "data" / "world.obj"
    scene = Scene.from_obj(obj, cfg) if obj.exists() else Scene.from_triangles(box_room(), cfg)
    arrays = scene.device_arrays()
    dirs = jnp.asarray(fibonacci_sphere_sorted(args.rays))
    src = jnp.asarray([1.0, 0.3, 0.5])
    lst = jnp.asarray([-1.0, 0.0, -0.5])

    steps = []
    if args.what in ("trace", "all"):
        from audio_raytracing_tpu.ops.pallas_trace import trace_ir_pallas

        def pallas_step():
            ir = trace_ir_pallas(arrays, src, lst, cfg=cfg, max_bounces=8,
                                 dirs=dirs, fused_hist=True, flat_bands=True)
            float(jnp.sum(ir.energy))

        def xla_step():
            ir = trace_ir(arrays, src, lst, cfg=cfg, max_bounces=8, dirs=dirs,
                          intersector="mxu", scatter="matmul")
            float(jnp.sum(ir.energy))

        steps += [("pallas_trace", pallas_step), ("xla_trace", xla_step)]

    if args.what in ("engine", "all"):
        from audio_raytracing_tpu.engine import voices as eng
        from audio_raytracing_tpu.engine.system import SoundSystem, default_hrtf

        hrtf = default_hrtf()
        system = SoundSystem(scene=scene, cfg=cfg, hrtf=hrtf)
        rng = np.random.default_rng(0)
        sid = system.load_sound((0.3 * rng.standard_normal(44100)).astype(np.float32))
        for _ in range(8):
            system.play_sound(sid, pos=rng.uniform(-3, 3, 3), gain=0.3, repeat=True)
        system.set_listener([0.0, 0.0, 0.0], yaw=0.4)
        system.update_acoustics()
        hl, hr = (jnp.asarray(h) for h in hrtf)
        listener = jnp.asarray(system.listener)
        orient = jnp.asarray(system.orientation)

        def engine_step():
            out, system.state = eng.render_blocks(
                system._arena, system.state, system.params, listener, orient,
                hl, hr, 0, 17, 16, cfg=cfg,
            )
            float(out[0, 0])

        steps.append(("engine_16blocks", engine_step))

    # warm up (compile outside the profile so the trace shows steady state)
    for name, fn in steps:
        t0 = time.perf_counter()
        fn()
        print(f"warmup {name}: {time.perf_counter() - t0:.1f} s")

    out = Path(args.outdir)
    out.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out)):
        for name, fn in steps:
            with jax.profiler.TraceAnnotation(name):
                for _ in range(3):
                    fn()
    n_files = sum(1 for _ in out.rglob("*") if _.is_file())
    print(f"profile written to {out} ({n_files} files)")


if __name__ == "__main__":
    main()
