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
     [--batched] [--pump] [--pacer] [--capacity[=N]]
     [--mxu | --kernel | --nee] [--only=N]
--pump (implies --batched) also batches the RENDER dispatches: one
render-pump thread produces every stream's next chunk in ONE dispatch
(engine/serving.py render_pump=True) and streams pop host PCM — the
per-second dispatch count stops scaling with N (the r3 24-stream wall
was exactly that scaling).
--pacer (implies --pump) consolidates the HOST side too: instead of 2
threads per stream (native-sink pull + walkthrough producer — ~130
threads at 64 streams on the 1-core bench host, the r4-measured
collapse), ONE pacer thread services every lane: at each lane's
absolute chunk deadline it pops the pumped PCM if buffered (pure host
memory) or counts an underrun, and issues the lane's pose updates at
~5 Hz. Total host threads = pacer + pump + acoustic round = 3,
regardless of N — this is the configuration that measures the CHIP's
serving capacity rather than the bench host's thread ceiling.
--capacity[=N] (with --pump) runs the pump in capacity-lane mode (the
production join/leave shape netserve serves through; N defaults to the
stream count) and performs a mid-run LEAVE + JOIN: at half time one
stream closes its lane and a NEW stream joins the live pump, reusing
the freed slot (activation = conv-state reset at a chunk boundary),
and is paced like the rest — proving the serving capacity is reachable
by the production-shaped join/leave server with zero recompiles.
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
    pacer = "--pacer" in sys.argv[1:]
    pump = "--pump" in sys.argv[1:] or pacer
    batched = "--batched" in sys.argv[1:] or pump
    capacity_opt = None  # None = exact cohort; -1 = n per sweep point
    for a in sys.argv[1:]:
        if a == "--capacity":
            capacity_opt = -1
        elif a.startswith("--capacity="):
            capacity_opt = int(a.split("=", 1)[1])
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
    chunk_blocks = 64
    update_hz = 5.0
    s16 = "--s16" in sys.argv[1:]  # device-quantized s16 pump PCM:
    # halves the device->host transfer (the measured relay-link lane
    # binder, pump_ab full-PCM rows) — the netserve wire format
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = int(a.split("=", 1)[1])
        elif a.startswith("--chunk-blocks="):
            # bigger pump chunks amortize the per-dispatch relay hop
            # (and the per-tick host transfer) over more audio; latency
            # grows with the chunk
            chunk_blocks = int(a.split("=", 1)[1])
        elif a.startswith("--update-hz="):
            # pose-update (and thus re-trace round) rate per stream;
            # every round holds the serialized relay for ~hop+device
            update_hz = float(a.split("=", 1)[1])
    seconds = float(pos_args[0]) if pos_args else 10.0
    max_streams = int(pos_args[1]) if len(pos_args) > 1 else 4
    if only is not None:
        max_streams = only
    cfg = DEFAULT_CONFIG
    obj = Path(__file__).resolve().parent.parent / "data" / "world.obj"
    scene = (Scene.from_obj(obj, cfg) if obj.exists()
             else Scene.from_triangles(box_room(), cfg))

    from audio_raytracing_tpu.app.walkthrough import synth_pad

    def pacer_run(coord, handles, seconds, capacity):
        """ONE host thread services every lane: pops each lane's pumped
        chunk at its absolute sample-clock deadline (pure host memory;
        a missing chunk counts an underrun instead of blocking the
        cohort) and issues ~5 Hz pose updates. With capacity, one extra
        stream JOINS the live pump at half-time and is paced like the
        rest. Host threads: this pacer + the pump + the acoustic round
        — 3 total regardless of N."""
        sr = cfg.sample_rate
        chunk = chunk_blocks * cfg.block_size
        upd_dt = 1.0 / update_hz
        lanes = list(handles)
        consumed = [0] * len(lanes)
        under = [0] * len(lanes)
        missed = [False] * len(lanes)
        next_upd = [0.0] * len(lanes)
        closed = [False] * len(lanes)
        anchors = None
        joiner_idx = None
        leaver_idx = None
        with coord:
            t0 = time.monotonic()
            t_end = t0 + seconds
            anchors = [t0] * len(lanes)
            join_at = t0 + seconds / 2 if capacity is not None else None
            while True:
                now = time.monotonic()
                if now >= t_end:
                    break
                if join_at is not None and now >= join_at:
                    join_at = None
                    # LEAVE: lane 0 exits the live pump (its slot frees)
                    leaver_idx = 0
                    closed[0] = True
                    lanes[0].close()
                    # JOIN: a brand-new stream takes the freed slot
                    r = IRStreamRenderer(
                        scene, cfg, n_rays=1 << 15, max_bounces=6
                    )
                    r.add_source(synth_pad(cfg.sample_rate),
                                 np.zeros(3, np.float32), gain=0.5)
                    j = coord.stream(r)
                    p, yaw = circle_path(now - t0 + 1.7 * len(lanes))
                    j.request(np.float32(p), yaw=yaw)
                    joiner_idx = len(lanes)
                    lanes.append(j)
                    consumed.append(None)  # clock starts at activation
                    under.append(0)
                    missed.append(False)
                    next_upd.append(now - t0)
                    anchors.append(None)
                    closed.append(False)
                nxt = t_end
                for i, h in enumerate(lanes):
                    if closed[i]:
                        continue
                    if consumed[i] is None:
                        # joiner clock anchors at FIRST AUDIO (like a
                        # netserve client starting playback on its
                        # first frame), not at lane activation — the
                        # activation tick's chunk is still in flight
                        # when ready() flips
                        if h.ready() and h.available() >= chunk:
                            consumed[i] = 0
                            anchors[i] = time.monotonic()
                        else:
                            continue  # joiner awaiting activation
                    due = anchors[i] + consumed[i] / sr
                    if now >= due:
                        if h.available() >= chunk:
                            h.render(chunk)
                            consumed[i] += chunk
                            missed[i] = False
                            due = anchors[i] + consumed[i] / sr
                        else:
                            if not missed[i]:
                                under[i] += 1
                                missed[i] = True
                            due = now + 0.002
                    nxt = min(nxt, due)
                    tu = t0 + next_upd[i]
                    if now >= tu:
                        p, yaw = circle_path(now - t0 + 1.7 * i)
                        h.request(np.float32(p), yaw=yaw)
                        next_upd[i] += upd_dt
                        tu = t0 + next_upd[i]
                    nxt = min(nxt, tu)
                dt = nxt - time.monotonic()
                if dt > 0:
                    time.sleep(min(dt, 0.05))
        wall = time.monotonic() - t0
        row = {
            "underruns": [u for u in under],
            "realtime_factor": [
                round((c or 0) / (wall * sr), 2) for c in consumed
            ],
            "retraces": [h.retraces for h in lanes],
            "updates": [h.updates for h in lanes],
            "wall_s": round(wall, 1),
            "pacer": True,
            "trace_rounds": coord.rounds,
            "pump_ticks": coord.pump_ticks,
            "avg_tick_ms": round(
                coord.pump_tick_s / max(1, coord.pump_ticks) * 1e3, 1
            ),
            "avg_round_ms": round(
                coord.round_s / max(1, coord.rounds) * 1e3, 1
            ),
            "pump_dropped": [h.pump_dropped for h in lanes],
        }
        if joiner_idx is not None:
            row["joiner"] = {
                "activated": consumed[joiner_idx] is not None,
                "chunks": (consumed[joiner_idx] or 0) // chunk,
                "underruns": under[joiner_idx],
            }
        if leaver_idx is not None:
            # the leaver was paced for the first half only: its rt
            # reads ~0.5 by construction; what matters is 0 underruns
            # while it was live and that its slot was reused
            row["leaver"] = {
                "chunks": (consumed[leaver_idx] or 0) // chunk,
                "underruns": under[leaver_idx],
                "slot_reused": lanes[joiner_idx].slot is not None,
            }
        if coord.error is not None:
            row["errors"] = [repr(coord.error)[:200]]
        return row

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
        capacity = None
        if capacity_opt is not None and pump:
            # exactly n lanes: the mid-run join reuses the slot the
            # mid-run leave frees (and L=n keeps the executable shapes
            # identical to the fixed-cohort runs' compile-cache entries)
            capacity = n if capacity_opt == -1 else capacity_opt
        if batched:
            from audio_raytracing_tpu.engine.serving import BatchedAcoustics

            coord = BatchedAcoustics(
                scene.device_arrays(), [np.zeros(3, np.float32)], cfg=cfg,
                n_rays=1 << 15, max_bounces=6, intersector=isect,
                # pump chunk = the walkthrough's render chunk (64
                # blocks) unless --chunk-blocks overrides
                render_pump=pump, capacity=capacity,
                pump_chunk_blocks=chunk_blocks,
                pump_pcm="s16" if s16 else "f32",
            )
            handles = [coord.stream(r) for r in renderers]
            if pump:
                # pump lanes need their dry sources BEFORE warmup (the
                # pump fixes the lane shape and stacks one (S, N)
                # arena); same pad the walkthrough would add, so
                # run_walkthrough skips its own add_source
                for r in renderers:
                    r.add_source(synth_pad(cfg.sample_rate),
                                 np.zeros(3, np.float32), gain=0.5)
            coord.warmup([circle_path(1.7 * i) for i in range(n)])
        if pacer:
            row = pacer_run(coord, handles, seconds, capacity)
            out[f"n{n}"] = row
            print(f"[serving] {n} streams: {row}", file=sys.stderr,
                  flush=True)
            n *= 2
            continue

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
        "extra": {"batched": batched, "pump": pump, "pacer": pacer,
                  "capacity": capacity_opt, **out},
    }))


if __name__ == "__main__":
    main()
