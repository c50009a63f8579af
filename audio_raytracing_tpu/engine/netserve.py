"""Network audio serving: spatialized PCM streams over TCP.

The reference renders one listener into one local audio callback
(sound_system.zig:128-170). This module is the production-serving front
door the framework adds on top of engine/serving.py::BatchedAcoustics:
one process owns the scene and the chip, N remote clients connect over
TCP, each steers its own listener pose and receives its own binaural
PCM stream — while every acoustic round on the device stays ONE batched
multi-listener trace regardless of N (the measured 16-streams-0-underruns
architecture, benchmarks/RESULTS.md "16 streams at the full update
rate").

Wire protocol (all little-endian; deliberately minimal — no external
deps, parseable from any language):

  server -> client, once:  one JSON line (hello)
      {"sample_rate": 44100, "block": 128, "channels": 2,
       "format": "s16le", "magic": "ARTS"}
  client -> server, any time:  JSON lines
      {"pose": [x, y, z], "yaw": 0.0, "pitch": 0.0}    steer the listener
      {"bye": true}                                     clean disconnect
  server -> client, repeatedly:  audio frames
      u32 seq | u32 n_samples | n_samples*channels*s16le payload

Frames are paced to the sample clock with `lead_s` of jitter buffer
(absolute schedule, like native/audiosink.cpp's pull thread): the
server never races ahead of real time by more than the lead, and a
slow client only stalls ITS socket (its writer thread blocks on send;
every other stream keeps rendering). pace=False streams as fast as the
socket drains — for tests and offline pulls.

Dead peers are EVICTED, not waited on: each client socket carries an
OS-level send timeout (SO_SNDTIMEO, `send_timeout_s`), so a connected
peer that stops reading — a wedged client, a half-dead NAT mapping —
blocks its writer for at most that long before the lane is closed and
reclaimed for the next tenant. The reference frees finished voices
every audio callback (sound_system.zig:164-171); this is the same
hygiene at the network boundary. A merely SLOW reader is safe: pacing
keeps the server <= lead_s ahead of real time, so the socket buffers
only fill (and the timeout only starts counting) once the peer has
stopped draining entirely.

Capacity lanes (engine/serving.py capacity=) keep joins/leaves
recompile-free: a connecting client must never stall every other
tenant for an XLA executable build.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from .ir_stream import IRStreamRenderer
from .serving import BatchedAcoustics

_FRAME_HDR = struct.Struct("<II")
HELLO_MAGIC = "ARTS"


class AcousticServer:
    """Serve spatialized audio streams from one scene over TCP.

    sources: list of (samples, position) pairs (or dicts with
    samples/pos/gain/loop/directivity keys) every client hears.
    capacity: max concurrent clients (fixed listener-lane shape — live
    joins never recompile). chunk_s: seconds of audio per render
    dispatch/frame; lead_s: jitter-buffer lead the pacing allows.
    send_timeout_s: evict a peer whose socket stops draining for this
    long (None/0 disables — a wedged peer then holds its lane forever).
    sndbuf: kernel send-buffer bytes per client socket (None = OS
    default); smaller values tighten how much undrained audio a dead
    peer can hide before the send timeout starts counting.
    """

    def __init__(self, scene, sources, cfg: Config = DEFAULT_CONFIG,
                 host: str = "127.0.0.1", port: int = 0,
                 n_rays: int = 1 << 15, max_bounces: int = 6,
                 intersector: str = "mt", capacity: int = 8,
                 chunk_s: float = 0.1, lead_s: float = 0.25,
                 pace: bool = True, round_interval_s: float = 0.2,
                 send_timeout_s: float | None = 5.0,
                 sndbuf: int | None = None,
                 render_pump: bool = False,
                 pump_buffer_chunks: int = 2,
                 pump_max_buffer_chunks: int = 6,
                 sh_order: int | None = None):
        """render_pump=True batches the RENDER dispatches too: one pump
        thread renders every connected client's next chunk in ONE device
        dispatch (engine/serving.py render_pump + capacity lanes —
        clients join/leave the live pump with no recompile), instead of
        each client thread dispatching its own chunk. This is the
        measured-48-streams serving architecture made reachable through
        the TCP front door; the per-client threads become pure socket
        pacing (handle.render() pops host PCM). The pump chunk size is
        chunk_s (one frame == one pump chunk).

        sh_order=N serves higher-order-ambisonic acoustics over the
        same wire: the shared trace emits order-N SH moments and each
        client's lane decodes binaurally through the HOA respectra —
        still 2-channel s16le frames, and since binaural HOA cohorts
        qualify for the stacked respectra, render_pump composes with
        sh_order too."""
        self.scene = scene
        self.cfg = cfg
        self.n_rays = n_rays
        self.max_bounces = max_bounces
        self.chunk_blocks = max(
            1, int(round(chunk_s * cfg.sample_rate / cfg.block_size))
        )
        self.lead_s = float(lead_s)
        self.pace = bool(pace)
        self.send_timeout_s = send_timeout_s
        self.sndbuf = sndbuf
        self.render_pump = bool(render_pump)
        self.sh_order = sh_order
        self._sources = [
            s if isinstance(s, dict) else {"samples": s[0], "pos": s[1]}
            for s in sources
        ]
        self.coord = BatchedAcoustics(
            scene.device_arrays(),
            [np.asarray(s["pos"], np.float32) for s in self._sources],
            cfg=cfg, n_rays=n_rays, max_bounces=max_bounces,
            intersector=intersector, capacity=capacity,
            round_interval_s=round_interval_s,
            render_pump=render_pump,
            sh_order=sh_order,
            pump_chunk_blocks=self.chunk_blocks,
            pump_buffer_chunks=pump_buffer_chunks,
            pump_max_buffer_chunks=pump_max_buffer_chunks,
            # s16 IS the wire format: quantize on device, halve the
            # device->host PCM transfer (the measured lane binder
            # through a slow link), and skip the per-frame host
            # float->s16 conversion in every writer thread
            pump_pcm="s16" if render_pump else "f32",
            src_directivities=[
                s.get("directivity") for s in self._sources
            ] if any(s.get("directivity") for s in self._sources) else None,
        )
        self._sock = socket.create_server((host, port))
        self.host, self.port = self._sock.getsockname()[:2]
        self._threads: list[threading.Thread] = []
        self._clients: set = set()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._accept_thread = None
        self.served = 0  # total client connections handled

    # -- lifecycle ---------------------------------------------------------

    def start(self, warm_pose=None) -> "AcousticServer":
        """Enter the coordinator (starts its round thread), warm the
        batched trace once so the first client join is compile-free, and
        begin accepting connections."""
        self.coord.__enter__()
        pose = (np.zeros(3, np.float32), 0.0) if warm_pose is None \
            else warm_pose
        r = self._make_renderer()
        with self.coord.stream(r) as h:
            self.coord.warmup([pose])
            h.close()
        self._accept_thread = threading.Thread(
            target=self._accept_loop, name="netserve-accept", daemon=True
        )
        self._accept_thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        with self._lock:
            clients = list(self._clients)
        for c in clients:
            try:
                c.close()
            except OSError:
                pass
        for t in self._threads:
            t.join(timeout=5.0)
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=5.0)
        self.coord.__exit__(None, None, None)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
        return False

    # -- internals ---------------------------------------------------------

    def _make_renderer(self) -> IRStreamRenderer:
        r = IRStreamRenderer(
            self.scene, self.cfg, n_rays=self.n_rays,
            max_bounces=self.max_bounces, sh_order=self.sh_order,
        )
        for s in self._sources:
            r.add_source(
                s["samples"], pos=s["pos"], gain=s.get("gain", 1.0),
                loop=s.get("loop", True),
                directivity=s.get("directivity"),
            )
        return r

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _addr = self._sock.accept()
            except OSError:
                return  # listener closed
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            if self.sndbuf:
                conn.setsockopt(
                    socket.SOL_SOCKET, socket.SO_SNDBUF, int(self.sndbuf)
                )
            if self.send_timeout_s:
                # OS-level SEND timeout only: the reader side (pose
                # lines) stays fully blocking — a quiet-but-listening
                # client is never evicted, a non-draining one is.
                # sendall raises (BlockingIOError/TimeoutError, both
                # OSError) once the buffer stays full this long, which
                # unwinds _serve_client and frees the lane.
                sec = int(self.send_timeout_s)
                usec = int((self.send_timeout_s - sec) * 1e6)
                conn.setsockopt(
                    socket.SOL_SOCKET, socket.SO_SNDTIMEO,
                    struct.pack("@ll", sec, usec),
                )
            with self._lock:
                self._clients.add(conn)
            t = threading.Thread(
                target=self._serve_client, args=(conn,),
                name="netserve-client", daemon=True,
            )
            self._threads.append(t)
            t.start()

    def _serve_client(self, conn: socket.socket) -> None:
        handle = None
        try:
            hello = {
                "magic": HELLO_MAGIC,
                "sample_rate": self.cfg.sample_rate,
                "block": self.cfg.block_size,
                "channels": 2,
                "format": "s16le",
            }
            conn.sendall((json.dumps(hello) + "\n").encode())

            # first message must be a pose: a lane is only taken once the
            # client commits to a listener
            f = conn.makefile("r", encoding="utf-8", newline="\n")
            msg = json.loads(f.readline())
            if "pose" not in msg:
                raise ValueError("first client message must carry a pose")
            try:
                handle = self.coord.stream(self._make_renderer())
            except ValueError as e:  # at capacity
                conn.sendall(
                    (json.dumps({"error": str(e)}) + "\n").encode()
                )
                return
            self.served += 1
            bye = threading.Event()

            def _reader():
                try:
                    m = msg
                    while not (bye.is_set() or self._stop.is_set()):
                        if m.get("bye"):
                            bye.set()
                            return
                        if "pose" in m:
                            handle.request(
                                np.asarray(m["pose"], np.float32),
                                float(m.get("yaw", 0.0)),
                                float(m.get("pitch", 0.0)),
                            )
                        line = f.readline()
                        if not line:
                            bye.set()
                            return
                        m = json.loads(line)
                except (OSError, ValueError):
                    bye.set()

            rt = threading.Thread(target=_reader, daemon=True)
            rt.start()

            # wait for the stream's first published spectra (one round;
            # in pump mode, for the lane's ACTIVATION at a chunk
            # boundary — handle.ready() covers both)
            while not handle.ready() and not (
                bye.is_set() or self._stop.is_set()
            ):
                time.sleep(0.002)

            n = self.chunk_blocks * self.cfg.block_size
            seq = 0
            sent = 0
            t0 = time.monotonic()
            while not (bye.is_set() or self._stop.is_set()):
                if self.pace:
                    # absolute schedule: stay <= lead_s ahead of the
                    # sample clock (drift-free, like the native sink)
                    ahead = (
                        t0 + sent / self.cfg.sample_rate - self.lead_s
                        - time.monotonic()
                    )
                    if ahead > 0:
                        time.sleep(ahead)
                y = handle.render(n)  # (n, 2) f32 — or s16 (pump mode)
                if y.dtype == np.int16:
                    pcm = y  # device-quantized; little-endian host
                else:
                    # np.rint: the SAME round-to-nearest convention as
                    # the device s16 pump, so the wire bits don't
                    # depend on which server mode produced them (the
                    # old truncating astype differed by up to 1 LSB)
                    pcm = np.clip(
                        np.rint(y * 32767.0), -32768, 32767
                    ).astype("<i2")
                conn.sendall(_FRAME_HDR.pack(seq, n) + pcm.tobytes())
                seq += 1
                sent += n
            rt.join(timeout=2.0)
        except (OSError, ValueError, json.JSONDecodeError):
            pass  # client went away mid-frame: just release the lane
        finally:
            if handle is not None:
                handle.close()
            with self._lock:
                self._clients.discard(conn)
            try:
                conn.close()
            except OSError:
                pass


class AcousticNetClient:
    """Minimal blocking client for AcousticServer (tests, tooling,
    reference implementation of the wire protocol)."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._buf = b""
        line = self._read_line()
        self.hello = json.loads(line)
        if self.hello.get("magic") != HELLO_MAGIC:
            raise ValueError(f"not an AcousticServer: {self.hello!r}")

    def _read_line(self) -> bytes:
        while b"\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed during handshake")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed mid-frame")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def send_pose(self, pos, yaw: float = 0.0, pitch: float = 0.0) -> None:
        msg = {"pose": [float(x) for x in pos],
               "yaw": float(yaw), "pitch": float(pitch)}
        self._sock.sendall((json.dumps(msg) + "\n").encode())

    def read_frame(self) -> tuple[int, np.ndarray]:
        """-> (seq, (n, channels) float32 in [-1, 1])."""
        seq, n = _FRAME_HDR.unpack(self._read_exact(_FRAME_HDR.size))
        ch = self.hello["channels"]
        raw = self._read_exact(n * ch * 2)
        pcm = np.frombuffer(raw, "<i2").reshape(n, ch)
        return seq, pcm.astype(np.float32) / 32767.0

    def read(self, n_samples: int) -> np.ndarray:
        """Concatenate frames until n_samples are in hand."""
        parts = []
        got = 0
        while got < n_samples:
            _, y = self.read_frame()
            parts.append(y)
            got += y.shape[0]
        return np.concatenate(parts, axis=0)[:n_samples]

    def close(self) -> None:
        try:
            self._sock.sendall(b'{"bye": true}\n')
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
