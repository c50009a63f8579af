#!/usr/bin/env python
"""TCP front-door serving benchmark: N loopback clients against
AcousticServer — the capacity figure for the SERVED path, not just the
in-process harness (engine/netserve.py; VERDICT r4 next #4).

Server architecture under test: AcousticServer(render_pump=True,
capacity=N) — one acoustic-round thread (one batched trace per
round), one render-pump thread (one device dispatch renders EVERY
client's next chunk), one paced writer thread per client (pops host
PCM, sends at the sample clock with lead_s of jitter buffer), one
accept thread. Client side is deliberately thin: ONE multiplexer
thread (selectors) drains every socket, parses frames incrementally,
and timestamps arrivals — so the bench measures the server, not a
client-thread pileup on the 1-core bench host.

Per client: samples received, startup latency (connect -> first frame),
post-startup realtime ratio (received / (wall * sr) — paced servers
hold this at ~1.0; a client is "late" when the ratio dips), and the
max inter-frame gap (a stall detector; pacing sends a frame every
chunk_s, so gaps >> chunk_s + scheduling noise mean the writer fell
behind). Pose updates flow at ~5 Hz per client from the mux thread.

--evict additionally STOPS reading one client at half time while
keeping its socket open: the server must evict it (SO_SNDTIMEO) and
every other client must keep its ratio — the dead-peer hygiene case at
serving load, not at N=2 like the unit test.

Run: python benchmarks/bench_netserve.py [seconds=15] [--only=N]
     [--sweep=16,32,48] [--evict] [--no-pump]
Prints one JSON line.
"""

import json
import selectors
import socket
import struct
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_FRAME_HDR = struct.Struct("<II")


class _ClientState:
    """Incremental wire-protocol parser + arrival bookkeeping for one
    non-blocking client socket (hello line, then framed s16le PCM)."""

    def __init__(self, sock, t_connect):
        self.sock = sock
        self.buf = b""
        self.hello = None
        self.samples = 0
        self.frames = 0
        self.t_connect = t_connect
        self.t_first = None
        self.t_last = None
        self.max_gap = 0.0
        self.error = None
        self.reading = True

    def feed(self, data: bytes, now: float) -> None:
        self.buf += data
        if self.hello is None:
            if b"\n" not in self.buf:
                return
            line, self.buf = self.buf.split(b"\n", 1)
            self.hello = json.loads(line)
            if "error" in self.hello:
                self.error = self.hello["error"]
                return
        while len(self.buf) >= _FRAME_HDR.size:
            _seq, n = _FRAME_HDR.unpack(self.buf[:_FRAME_HDR.size])
            need = _FRAME_HDR.size + n * 2 * 2  # stereo s16
            if len(self.buf) < need:
                return
            self.buf = self.buf[need:]
            self.samples += n
            self.frames += 1
            if self.t_first is None:
                self.t_first = now
            elif self.t_last is not None:
                self.max_gap = max(self.max_gap, now - self.t_last)
            self.t_last = now


def run_point(n, seconds, pump, evict, scene, cfg, sr, intersector,
              n_rays=1 << 15, pose_hz=5.0):
    import numpy as np

    from audio_raytracing_tpu.app.walkthrough import circle_path, synth_pad
    from audio_raytracing_tpu.engine.netserve import AcousticServer

    chunk_s = 64 * cfg.block_size / sr  # pump chunk == frame == 64 blocks
    srv = AcousticServer(
        scene, [(synth_pad(sr), np.zeros(3, np.float32))], cfg=cfg,
        n_rays=n_rays, max_bounces=6, capacity=n,
        chunk_s=chunk_s, lead_s=0.3, pace=True,
        send_timeout_s=3.0, sndbuf=65536,
        render_pump=pump, intersector=intersector,
    )
    sel = selectors.DefaultSelector()
    clients = []
    row = {}
    try:
        srv.start()
        for i in range(n):
            s = socket.create_connection((srv.host, srv.port), timeout=30)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            pose, yaw = circle_path(1.7 * i)
            s.sendall((json.dumps(
                {"pose": [float(x) for x in pose], "yaw": float(yaw)}
            ) + "\n").encode())
            s.setblocking(False)
            st = _ClientState(s, time.monotonic())
            sel.register(s, selectors.EVENT_READ, st)
            clients.append(st)
        t0 = time.monotonic()
        t_end = t0 + seconds
        next_pose = t0
        evict_at = t0 + seconds / 2 if evict else None
        evicted = None
        while time.monotonic() < t_end:
            now = time.monotonic()
            if evict_at is not None and now >= evict_at:
                evict_at = None
                evicted = clients[0]
                evicted.reading = False
                sel.unregister(evicted.sock)  # socket stays OPEN: a
                # wedged peer, not a disconnect — eviction is on the
                # server (SO_SNDTIMEO unwinds its writer)
            for key, _ev in sel.select(timeout=0.05):
                st = key.data
                try:
                    data = st.sock.recv(1 << 18)
                except (BlockingIOError, InterruptedError):
                    continue
                except OSError as e:
                    st.error = st.error or repr(e)[:120]
                    sel.unregister(st.sock)
                    continue
                if not data:
                    sel.unregister(st.sock)
                    continue
                st.feed(data, time.monotonic())
            if now >= next_pose:
                next_pose = now + 1.0 / pose_hz
                t_rel = now - t0
                for i, st in enumerate(clients):
                    if not st.reading or st.error:
                        continue
                    pose, yaw = circle_path(t_rel + 1.7 * i)
                    try:
                        st.sock.send((json.dumps(
                            {"pose": [float(x) for x in pose],
                             "yaw": float(yaw)}
                        ) + "\n").encode())
                    except OSError:
                        pass
        wall = time.monotonic() - t0
        live = [c for c in clients if c is not (evicted if evict else None)]
        ratios = [
            round(c.samples / sr / max(1e-9, wall - (c.t_first - t0)), 3)
            if c.t_first is not None else 0.0
            for c in live
        ]
        row = {
            "clients": n,
            "pump": pump,
            "wall_s": round(wall, 1),
            "startup_s": [
                round(c.t_first - c.t_connect, 2)
                if c.t_first is not None else None
                for c in live
            ],
            "realtime_ratio": ratios,
            "min_ratio": min(ratios) if ratios else 0.0,
            "max_interframe_gap_s": round(
                max((c.max_gap for c in live), default=0.0), 2
            ),
            "frames": sum(c.frames for c in live),
            "errors": [c.error for c in live if c.error],
            "trace_rounds": srv.coord.rounds,
        }
        if srv.coord.error is not None:
            row["coord_error"] = repr(srv.coord.error)[:300]
        if pump:
            row["pump_ticks"] = srv.coord.pump_ticks
            if srv.coord.pump_ticks:
                row["avg_tick_ms"] = round(
                    srv.coord.pump_tick_s / srv.coord.pump_ticks * 1e3, 1
                )
        if srv.coord.rounds:
            row["avg_round_ms"] = round(
                srv.coord.round_s / srv.coord.rounds * 1e3, 1
            )
        if evict:
            # the wedged peer must be evicted (its lane freed) while
            # everyone else kept flowing
            deadline = time.monotonic() + 10.0
            while (len(srv.coord._handles) > len(live)
                   and time.monotonic() < deadline):
                time.sleep(0.1)
            row["evicted_ok"] = len(srv.coord._handles) <= len(live)
            row["evicted_received_s"] = round(evicted.samples / sr, 1)
    finally:
        for c in clients:
            try:
                c.sock.close()
            except OSError:
                pass
        sel.close()
        srv.stop()
    return row


def main():
    from audio_raytracing_tpu.utils.compile_cache import enable as _cc
    _cc(Path(__file__).resolve().parent / ".jax_compile_cache")

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.scene import Scene, box_room

    pos_args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seconds = float(pos_args[0]) if pos_args else 15.0
    pump = "--no-pump" not in sys.argv[1:]
    evict = "--evict" in sys.argv[1:]
    counts = [16, 32, 48]
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            counts = [int(a.split("=", 1)[1])]
        elif a.startswith("--sweep="):
            counts = [int(x) for x in a.split("=", 1)[1].split(",")]

    cfg = DEFAULT_CONFIG
    obj = Path(__file__).resolve().parent.parent / "data" / "world.obj"
    scene = (Scene.from_obj(obj, cfg) if obj.exists()
             else Scene.from_triangles(box_room(), cfg))
    sr = cfg.sample_rate
    # the in-kernel multi-listener NEE tracer keeps acoustic rounds at
    # tens of ms at L~50 (the mt route's ~1 s rounds starve the pump's
    # dispatch cadence through the serialized relay — measured in the
    # r5 pacer bring-up); CPU smoke runs fall back to mt
    import jax

    intersector = ("pallas_nee" if jax.default_backend() == "tpu"
                   else "mt")
    n_rays = 1 << 15
    pose_hz = 5.0
    for a in sys.argv[1:]:
        if a.startswith("--intersector="):
            intersector = a.split("=", 1)[1]
        elif a.startswith("--rays="):
            # CPU smoke runs: full-size traces starve the CPU backend
            # (5 Hz x ~1.2 s rounds leave the pump no compute)
            n_rays = int(a.split("=", 1)[1])
        elif a.startswith("--pose-hz="):
            # CPU smoke runs: continuous rounds oversubscribe the CPU
            # cores and the pump chunk dispatch crawls (measured: 0.5 Hz
            # poses -> 84 ticks/15 s; 5 Hz -> 1 tick/20 s). The TPU is
            # unaffected (rounds are tens of ms of device time).
            pose_hz = float(a.split("=", 1)[1])

    out = {}
    for n in counts:
        row = run_point(n, seconds, pump, evict, scene, cfg, sr,
                        intersector, n_rays=n_rays, pose_hz=pose_hz)
        out[f"n{n}"] = row
        print(f"[netserve] {n} clients: {row}", file=sys.stderr, flush=True)
    ok = [
        v["clients"] for v in out.values()
        if v.get("min_ratio", 0) >= 0.98 and not v.get("errors")
    ]
    print(json.dumps({
        "metric": "tcp_realtime_streams",
        "value": max(ok) if ok else 0,
        "unit": "clients",
        "extra": out,
    }))


if __name__ == "__main__":
    main()
