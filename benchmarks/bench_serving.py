#!/usr/bin/env python
"""Concurrent-stream serving benchmark: how many independent live
walkthrough streams can one chip sustain in real time?

Each stream is a full moving-listener walkthrough (its own
IRStreamRenderer on world.obj, its own wall-clock AudioSink) running in
its own thread; all streams share the one TPU through the relay dispatch
queue. Two update architectures:

* default: each stream owns an AsyncAcoustics tracing worker — N
  independent re-trace dispatches per acoustic round (the measured
  "throughput halves at 8 streams" configuration in RESULTS.md).
* --batched: all streams share ONE engine/serving.py::BatchedAcoustics
  worker — every acoustic round is ONE trace_ir_multi_listener dispatch
  (shared path pass, per-listener NEE) + N cheap respectras, so the
  dispatch queue cost per round is ~constant in N.

Run: python benchmarks/bench_serving.py [seconds=10] [max_streams=4]
     [--batched] [--pump] [--mxu | --kernel | --nee] [--only=N]
--pump (implies --batched) also batches the RENDER dispatches: one
render-pump thread produces every stream's next chunk in ONE dispatch
(engine/serving.py render_pump=True) and streams pop host PCM — the
per-second dispatch count stops scaling with N (the r3 24-stream wall
was exactly that scaling).
--nee runs the batched trace through the in-kernel multi-listener NEE
(trace_irs_pallas_multi_listener_nee: ONE path pass per 4-listener
chunk, VMEM-resident per-listener shadow/emission/binning — neither the
XLA route's (L, R, T) HBM temporaries nor the --kernel scan's L
repeated path passes).
--mxu runs the batched coordinator's shared-path trace through the MXU
Woop intersector (measured MIXED vs mt — RESULTS.md). --kernel runs it
through the fused Pallas kernel (a lax.scan of full traces over the
listener batch: no shared path pass, but each trace is ~3x faster than
the mt NEE lanes at wide batches; first run pays one Mosaic compile,
cached persistently after). --only=N benchmarks a single stream count
instead of the 1,2,4,...,max sweep (spares per-shape warm-up compiles).
Prints one JSON line.
"""

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np

    from audio_raytracing_tpu.utils.compile_cache import enable as _cc
    _cc(Path(__file__).resolve().parent / ".jax_compile_cache")

    from audio_raytracing_tpu.app.walkthrough import (
        circle_path,
        run_walkthrough,
    )
    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.engine.ir_stream import IRStreamRenderer
    from audio_raytracing_tpu.models.scene import Scene, box_room

    pos_args = [a for a in sys.argv[1:] if not a.startswith("--")]
    pump = "--pump" in sys.argv[1:]
    batched = "--batched" in sys.argv[1:] or pump
    isect = "mt"
    if "--mxu" in sys.argv[1:]:
        isect = "mxu"
    elif "--kernel" in sys.argv[1:]:
        isect = "pallas"
    elif "--nee" in sys.argv[1:]:
        # in-kernel multi-listener NEE: one path pass per 4-listener
        # chunk, VMEM-resident shadow/emit/binning per listener
        isect = "pallas_nee"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = int(a.split("=", 1)[1])
    seconds = float(pos_args[0]) if pos_args else 10.0
    max_streams = int(pos_args[1]) if len(pos_args) > 1 else 4
    if only is not None:
        max_streams = only
    cfg = DEFAULT_CONFIG
    obj = Path(__file__).resolve().parent.parent / "data" / "world.obj"
    scene = (Scene.from_obj(obj, cfg) if obj.exists()
             else Scene.from_triangles(box_room(), cfg))

    out = {}
    n = only or 1
    while n <= max_streams:
        stats = [None] * n
        errs = [None] * n
        renderers = [
            IRStreamRenderer(scene, cfg, n_rays=1 << 15, max_bounces=6)
            for _ in range(n)
        ]
        coord = None
        handles = [None] * n
        if batched:
            from audio_raytracing_tpu.engine.serving import BatchedAcoustics

            coord = BatchedAcoustics(
                scene.device_arrays(), [np.zeros(3, np.float32)], cfg=cfg,
                n_rays=1 << 15, max_bounces=6, intersector=isect,
                # pump chunk = the walkthrough's render chunk (64 blocks)
                render_pump=pump,
            )
            handles = [coord.stream(r) for r in renderers]
            if pump:
                # pump lanes need their dry sources BEFORE warmup (the
                # pump fixes the cohort and stacks one (S, N) arena);
                # same pad the walkthrough would add, so run_walkthrough
                # skips its own add_source
                from audio_raytracing_tpu.app.walkthrough import synth_pad

                for r in renderers:
                    r.add_source(synth_pad(cfg.sample_rate),
                                 np.zeros(3, np.float32), gain=0.5)
            coord.warmup([circle_path(1.7 * i) for i in range(n)])

        def one(i):
            # phase-offset orbits so re-traces don't all land on the same
            # relay instant; each stream owns its renderer + sink
            path = lambda t, i=i: circle_path(t + 1.7 * i)  # noqa: E731
            try:
                stats[i] = run_walkthrough(
                    seconds, scene=scene, cfg=cfg, renderer=renderers[i],
                    path=path, async_updates=True, acoustics=handles[i],
                )
            except Exception as e:  # noqa: BLE001
                errs[i] = repr(e)[:200]

        threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
        t0 = time.time()
        import contextlib

        with coord if coord is not None else contextlib.nullcontext():
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        row = {
            "underruns": [s["underruns"] if s else None for s in stats],
            "realtime_factor": [
                round(s["realtime_factor"], 2) if s else None for s in stats
            ],
            "retraces": [s["retraces"] if s else None for s in stats],
            "wall_s": round(time.time() - t0, 1),
        }
        if coord is not None:
            row["trace_rounds"] = coord.rounds
            if pump:
                row["pump_ticks"] = coord.pump_ticks
                row["pump_dropped"] = [h.pump_dropped for h in handles]
        if any(errs):
            row["errors"] = [e for e in errs if e]
        out[f"n{n}"] = row
        print(f"[serving] {n} streams: {row}", file=sys.stderr, flush=True)
        n *= 2
    ok = [
        int(k[1:]) for k, v in out.items()
        if v.get("underruns") and all(u == 0 for u in v["underruns"])
    ]
    print(json.dumps({
        "metric": "concurrent_realtime_streams",
        "value": max(ok) if ok else 0,
        "unit": "streams",
        "extra": {"batched": batched, "pump": pump, **out},
    }))


if __name__ == "__main__":
    main()
