#!/usr/bin/env python
"""Concurrent-stream serving benchmark: how many independent live
walkthrough streams can one chip sustain in real time?

Each stream is a full moving-listener walkthrough (its own
IRStreamRenderer on world.obj, its own AsyncAcoustics tracing worker,
its own wall-clock AudioSink) running in its own thread; all streams
share the one TPU through the relay dispatch queue. Reports per-N
underruns and realtime factors — the measured version of the "~4
concurrent streams per chip" headroom estimate in RESULTS.md.

Run: python benchmarks/bench_serving.py [seconds=10] [max_streams=4]
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

    from audio_raytracing_tpu.app.walkthrough import (
        circle_path,
        run_walkthrough,
    )
    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.engine.ir_stream import IRStreamRenderer
    from audio_raytracing_tpu.models.scene import Scene, box_room

    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    max_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = DEFAULT_CONFIG
    obj = Path(__file__).resolve().parent.parent / "data" / "world.obj"
    scene = (Scene.from_obj(obj, cfg) if obj.exists()
             else Scene.from_triangles(box_room(), cfg))

    out = {}
    n = 1
    while n <= max_streams:
        stats = [None] * n
        errs = [None] * n

        def one(i):
            # phase-offset orbits so re-traces don't all land on the same
            # relay instant; each stream owns its renderer + sink
            path = lambda t, i=i: circle_path(t + 1.7 * i)  # noqa: E731
            r = IRStreamRenderer(scene, cfg, n_rays=1 << 15, max_bounces=6)
            try:
                stats[i] = run_walkthrough(
                    seconds, scene=scene, cfg=cfg, renderer=r, path=path,
                    async_updates=True,
                )
            except Exception as e:  # noqa: BLE001
                errs[i] = repr(e)[:200]

        threads = [threading.Thread(target=one, args=(i,)) for i in range(n)]
        t0 = time.time()
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
        "extra": out,
    }))


if __name__ == "__main__":
    main()
