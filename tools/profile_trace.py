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


def parse_device_step_times(profile_dir, step_names=None):
    """Parse the newest .trace.json(.gz) under profile_dir: DEVICE time
    (ms) per TraceAnnotation step name.

    Measured structure of jax.profiler Chrome traces on this runtime
    (verified on both the axon TPU backend and the CPU backend):
    - TraceAnnotation("mystep") shows up ONLY as a host-lane span (an "X"
      event named exactly "mystep" on the "/host:CPU" process); nothing
      propagates into device kernel names.
    - Each device is a process named "/device:TPU:0" etc., with
      thread-name sub-lanes "XLA Modules" (one span per dispatched
      executable — no double counting) and "XLA Ops" (the kernels nested
      inside the module spans).
    - Host and device lanes share one clock, so device work belonging to
      a step is exactly the module spans inside the step span's window.

    A step's device time = sum of "XLA Modules" spans overlap-clipped to
    that step's annotation window(s). When the trace has no device
    process (pure-CPU backend), the step's host span duration (wall) is
    used instead. `step_names` restricts which host spans are treated as
    annotations; by default any bare-word host span (no parens/spaces/
    path chars — python frames all carry those) counts.

    Returns {step: ms, ..., "_device_total": ms}.
    """
    import gzip
    import json
    import re

    paths = sorted(Path(profile_dir).rglob("*.trace.json*"),
                   key=lambda q: q.stat().st_mtime)
    if not paths:
        raise FileNotFoundError(f"no .trace.json(.gz) under {profile_dir}")
    path = paths[-1]
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    dev_pids, host_pids = set(), set()
    module_lanes = set()  # (pid, tid) of "XLA Modules" threads
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            name = str(e.get("args", {}).get("name", ""))
            (dev_pids if "/device:" in name else host_pids).add(e.get("pid"))
        elif e.get("name") == "thread_name":
            if e.get("args", {}).get("name") == "XLA Modules":
                module_lanes.add((e.get("pid"), e.get("tid")))

    # step annotation spans on host lanes: [(name, t0, t1), ...]
    bare = re.compile(r"^[\w.-]+$")
    spans = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in host_pids:
            continue
        name = str(e.get("name", ""))
        if step_names is not None:
            if name not in step_names:
                continue
        elif not bare.match(name):
            continue
        t0 = float(e.get("ts", 0.0))
        spans.append((name, t0, t0 + float(e.get("dur", 0.0))))

    totals = {name: 0.0 for name, _, _ in spans}
    lane_total = 0.0
    dev_events = [e for e in events
                  if e.get("ph") == "X" and e.get("pid") in dev_pids
                  and ((e.get("pid"), e.get("tid")) in module_lanes
                       or not module_lanes)]
    if dev_events:
        for e in dev_events:
            t0 = float(e.get("ts", 0.0))
            t1 = t0 + float(e.get("dur", 0.0))
            lane_total += (t1 - t0) / 1000.0
            for name, s0, s1 in spans:
                ov = min(t1, s1) - max(t0, s0)
                if ov > 0:
                    totals[name] += ov / 1000.0
    else:
        # CPU backend: no device process — budget against host span wall
        for name, s0, s1 in spans:
            totals[name] += (s1 - s0) / 1000.0
        lane_total = sum(totals.values())
    totals["_device_total"] = lane_total
    return totals


def assert_budgets(step_ms: dict, budgets: dict) -> list:
    """Compare parsed per-step device times against budget bounds (ms).
    Returns a list of violation strings (empty = within budget).
    Non-numeric entries (e.g. a "_comment" key) are ignored."""
    bad = []
    for step, limit in budgets.items():
        if not isinstance(limit, (int, float)):
            continue
        got = step_ms.get(step)
        if got is None:
            bad.append(f"{step}: absent from profile (budget {limit} ms)")
        elif got > float(limit):
            bad.append(f"{step}: {got:.2f} ms > budget {limit} ms")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/artpu_profile")
    ap.add_argument("--what", default="all",
                    choices=["trace", "engine", "serving", "all"])
    ap.add_argument("--rays", type=int, default=1 << 18)
    ap.add_argument("--assert-budgets", default=None, metavar="JSON",
                    help="after capture, parse device kernel time per step "
                         "and fail (exit 1) if any exceeds its budget in "
                         "ms — {\"pallas_trace\": 250, ...} or "
                         "{\"_device_total\": 1000}")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audio_raytracing_tpu.utils.compile_cache import enable as _cc

    _cc(ROOT / "benchmarks" / ".jax_compile_cache")

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

    if args.what in ("serving", "all"):
        # the serving round's device work: the L=16 in-kernel
        # multi-listener NEE trace + the vmapped ambisonic conversion,
        # at bench_serving's production config (2^15 rays x 6 bounces,
        # world.obj) — regression-gates the 16/24/48-stream claims
        # (benchmarks/RESULTS.md "render pump") the way engine_16blocks
        # gates the audio block
        from audio_raytracing_tpu.models.ir import ImpulseResponse, ambisonic_ir
        from audio_raytracing_tpu.ops.pallas_trace import (
            trace_irs_pallas_multi_listener_nee,
        )

        sdirs = jnp.asarray(fibonacci_sphere_sorted(1 << 15))
        rng_l = np.random.default_rng(7)
        listeners = jnp.asarray(rng_l.uniform(-2.5, 2.5, (16, 3)),
                                dtype=jnp.float32)
        amb_of = jax.jit(jax.vmap(lambda e, d: ambisonic_ir(ImpulseResponse(e, d))))

        def serving_step():
            ir = trace_irs_pallas_multi_listener_nee(
                arrays, src, listeners, cfg=cfg, max_bounces=6, dirs=sdirs)
            amb = amb_of(ir.energy, ir.dir_sum)
            float(jnp.sum(amb))

        steps.append(("serving_round", serving_step))

        # the render pump's device work at the measured serving scale:
        # ONE dispatch renders every lane's next 64-block chunk
        # (L=48 lanes, s16 wire PCM — engine/serving.py render_pump).
        # Device time only: the wall-clock tick is dominated by this
        # environment's relay PCM link (4-33 MB/s, varies ~8x between
        # windows — benchmarks/RESULTS.md r5), so the budget gate pins
        # the part a deployment keeps
        from audio_raytracing_tpu.app.walkthrough import synth_pad
        from audio_raytracing_tpu.engine.ir_stream import (
            IRStreamRenderer,
            _stream_blocks_pump,
        )
        from audio_raytracing_tpu.ops import conv_partitioned as cp

        pr = IRStreamRenderer(scene, cfg, n_rays=1 << 15, max_bounces=6)
        pr.add_source(synth_pad(cfg.sample_rate), np.zeros(3, np.float32),
                      gain=0.5)
        pr.update(np.float32([1.5, 0.0, 0.0]), yaw=0.3)
        Lp, Kp, Bp = 48, 64, cfg.block_size
        pump_spec = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (Lp,) + x.shape), pr._spectra
        )
        Pp = pr._spectra[0].shape[-2]
        pump_state = [cp.conv_init_real(
            (Lp, pr._dry_dev.shape[0], pr.n_out), Pp, Bp
        )]
        pump_i = [0]

        def pump_tick_step():
            pump_i[0] += 1
            cursors = jnp.full(
                Lp, (pump_i[0] * Kp * Bp) % 100000, jnp.int32
            )
            ys, pump_state[0] = _stream_blocks_pump(
                pr._dry_dev, pr._src_len_dev, pr._src_loop_dev,
                cursors, pump_state[0], pump_spec, pump_spec,
                jnp.zeros(Lp, bool),
                K=Kp, B=Bp, n_out=pr.n_out, out_s16=True,
            )
            np.asarray(ys)  # the real tick materializes the PCM

        steps.append(("pump_tick", pump_tick_step))

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

    if args.assert_budgets:
        import json

        step_ms = parse_device_step_times(out, step_names=[n for n, _ in steps])
        print("device kernel ms per step:",
              {k: round(v, 2) for k, v in sorted(step_ms.items())})
        spec = args.assert_budgets.strip()
        if spec.startswith("{"):
            budgets = json.loads(spec)
        elif Path(spec).exists():
            budgets = json.loads(Path(spec).read_text())
        else:
            raise SystemExit(
                f"--assert-budgets: {spec!r} is neither an existing file "
                "nor inline JSON (inline must start with '{')"
            )
        bad = assert_budgets(step_ms, budgets)
        if bad:
            print("BUDGET VIOLATIONS:\n  " + "\n  ".join(bad))
            raise SystemExit(1)
        print("all step budgets met")


if __name__ == "__main__":
    main()
