"""Network serving (engine/netserve.py): TCP clients steering batched
listener lanes, loopback end to end on the CPU backend."""

import dataclasses
import json
import socket
import time

import numpy as np
import pytest

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.engine.netserve import (
    AcousticNetClient, AcousticServer,
)
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG = dataclasses.replace(
    DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_bounces=3
)
SRC = np.float32([1.0, 0.5, 0.5])


@pytest.fixture(autouse=True)
def _no_persistent_compile_cache():
    """Full-suite CPU runs segfaulted TWICE (r5) inside
    compilation_cache.get_executable_and_time during this module's
    coordinator warmup at ~50% of the suite — DESERIALIZING a
    persistent-cache entry against ~an hour of accumulated process
    state — while every test passes in isolation and in a
    serving+netserve-only run. Unlike test_pallas_trace's
    clear_caches() defense (which guards a COMPILE crash and would
    force MORE disk loads here), this module simply opts out of the
    persistent cache: its programs are small (tiny CFG), recompiles
    cost seconds. NOTE the two failed defenses (suite runs 3 and 4):
    jax_enable_compilation_cache=False does not gate the _cache_read
    path in this jax version, and updating jax_compilation_cache_dir
    alone is a no-op once the GLOBAL cache object initialized at suite
    start (_cache_initialized) — reset_cache() must drop it so the
    None dir takes effect. The crash itself is inside
    backend.deserialize_executable on a same-run entry (the serving
    trace's ~120 MB XLA:CPU executable) after ~an hour of process
    state."""
    import jax
    from jax._src import compilation_cache as _cc

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()  # drop the initialized global cache object
    # AND the in-memory jit caches: with disk loads gone, suite run 5
    # crashed in backend_compile_and_load itself — the original
    # accumulated-state compiler segfault test_pallas_trace defends
    # against the same way
    jax.clear_caches()
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    _cc.reset_cache()


def tone():
    return (
        0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / 44100)
    ).astype(np.float32)


def make_server(**kw):
    scene = Scene.from_triangles(
        box_room(size=(6.0, 3.0, 5.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )
    kw.setdefault("pace", False)
    kw.setdefault("capacity", 2)
    kw.setdefault("round_interval_s", 0.02)
    return AcousticServer(
        scene, [(tone(), SRC)], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces, **kw,
    )


def test_single_client_stream():
    with make_server() as srv:
        with AcousticNetClient(srv.host, srv.port) as c:
            assert c.hello["sample_rate"] == CFG.sample_rate
            assert c.hello["channels"] == 2
            assert c.hello["format"] == "s16le"
            c.send_pose([-1.0, 0.0, -1.0], yaw=0.4)
            y = c.read(8192)
        assert y.shape == (8192, 2)
        assert float(np.abs(y).max()) > 1e-4  # audible
        # binaural: channels must differ for an off-axis listener
        assert float(np.abs(y[:, 0] - y[:, 1]).max()) > 1e-5
    assert srv.served == 1


def test_frames_are_sequenced():
    with make_server() as srv:
        with AcousticNetClient(srv.host, srv.port) as c:
            c.send_pose([0.5, 0.0, 0.5])
            seqs = [c.read_frame()[0] for _ in range(5)]
        assert seqs == list(range(seqs[0], seqs[0] + 5))


def test_two_clients_hear_different_poses():
    with make_server() as srv:
        with AcousticNetClient(srv.host, srv.port) as a, \
                AcousticNetClient(srv.host, srv.port) as b:
            a.send_pose([-1.5, 0.0, -1.5])  # far from the source
            b.send_pose([0.8, 0.4, 0.4])    # next to it
            ya = a.read(8192)
            yb = b.read(8192)
        ra = float(np.sqrt(np.mean(ya**2)))
        rb = float(np.sqrt(np.mean(yb**2)))
        assert ra > 1e-6 and rb > 1e-6
        # the near listener is clearly louder (direct path ~5x shorter)
        assert rb > 1.5 * ra
    assert srv.served == 2


def test_capacity_rejection_and_lane_reuse():
    with make_server(capacity=1) as srv:
        c1 = AcousticNetClient(srv.host, srv.port)
        c1.send_pose([0.5, 0.0, 0.5])
        c1.read(256)  # lane is live
        # second client is refused with an error line (not a frame)
        c2 = AcousticNetClient(srv.host, srv.port)
        c2.send_pose([0.0, 0.0, 0.0])
        err = json.loads(c2._read_line())
        assert "capacity" in err.get("error", "")
        c2.close()
        c1.close()
        # the lane frees: a new client succeeds with no recompile
        deadline = time.time() + 5.0
        while True:
            c3 = AcousticNetClient(srv.host, srv.port)
            c3.send_pose([0.5, 0.0, 0.5])
            first = c3._read_line()
            if b'"error"' not in first:
                # first line was a frame header already? no — frames are
                # binary; push it back for read()
                c3._buf = first + b"\n" + c3._buf
                y = c3.read(256)
                assert y.shape[0] == 256
                c3.close()
                break
            c3.close()
            assert time.time() < deadline, "lane never freed"
            time.sleep(0.05)


def test_paced_mode_respects_clock():
    """pace=True: the server never sends more than (elapsed + lead)
    seconds of audio. The schedule starts at the server's t0 (>= our
    pose-send time), so total audio received by wall time T is bounded
    by (T - t_send) + lead regardless of establishment catch-up."""
    with make_server(pace=True, lead_s=0.1, chunk_s=0.05) as srv:
        with AcousticNetClient(srv.host, srv.port) as c:
            t_send = time.time()
            c.send_pose([0.5, 0.0, 0.5])
            c.read(int(1.2 * CFG.sample_rate))
            dt = time.time() - t_send
        # 1.2 s of audio needs >= 1.2 - 0.1 lead of wall time; allow
        # generous slack for loaded CI hosts' clock granularity
        assert dt > 0.8


def test_client_disconnect_releases_lane():
    with make_server(capacity=2) as srv:
        c = AcousticNetClient(srv.host, srv.port)
        c.send_pose([0.5, 0.0, 0.5])
        c.read(256)
        c.close()
        deadline = time.time() + 5.0
        while len(srv.coord._handles) > 0:
            assert time.time() < deadline, "handle never released"
            time.sleep(0.02)


def test_dead_peer_is_evicted_and_lane_reclaimed():
    """A connected-but-never-reading peer (wedged client, half-dead NAT
    mapping) must not hold its capacity lane forever: SO_SNDTIMEO unwinds
    the writer once the socket stops draining, the lane frees, and other
    streams keep flowing throughout."""
    with make_server(capacity=2, send_timeout_s=0.5, sndbuf=8192) as srv:
        # healthy tenant on lane 1, actively draining
        good = AcousticNetClient(srv.host, srv.port)
        good.send_pose([0.5, 0.0, 0.5])
        good.read(256)
        # dead peer on lane 2: handshakes, commits a pose, never reads.
        # Tiny recv buffer so the unpaced server fills the pipe fast.
        dead = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        dead.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        dead.settimeout(10)
        dead.connect((srv.host, srv.port))
        f = dead.makefile("rb")
        f.readline()  # hello
        dead.sendall(b'{"pose": [-1.0, 0.0, -1.0]}\n')
        deadline = time.time() + 20.0
        while len(srv.coord._handles) > 1:
            assert time.time() < deadline, "dead peer never evicted"
            time.sleep(0.05)
        # the healthy stream was never disturbed
        y = good.read(1024)
        assert y.shape == (1024, 2)
        good.close()
        dead.close()
        # the reclaimed lane serves a new client (retry across the
        # close/free race, as in the lane-reuse test above)
        deadline = time.time() + 5.0
        while True:
            c = AcousticNetClient(srv.host, srv.port)
            c.send_pose([0.5, 0.0, 0.5])
            first = c._read_line()
            if b'"error"' not in first:
                c._buf = first + b"\n" + c._buf
                assert c.read(256).shape[0] == 256
                c.close()
                break
            c.close()
            assert time.time() < deadline, "evicted lane never freed"
            time.sleep(0.05)


def test_render_pump_server_end_to_end():
    """AcousticServer(render_pump=True): the production-shaped TCP
    server rides the one-dispatch-renders-all-lanes pump with capacity
    join/leave — clients connect to a LIVE pump, stream real audio,
    disconnect, and a later client reuses the freed lane (the r4
    verdict's headline gap: pump and capacity were mutually
    exclusive)."""
    with make_server(capacity=3, render_pump=True, chunk_s=0.02) as srv:
        assert srv.coord.render_pump
        with AcousticNetClient(srv.host, srv.port) as a, \
                AcousticNetClient(srv.host, srv.port) as b:
            a.send_pose([-1.5, 0.0, -1.5])
            b.send_pose([0.8, 0.4, 0.4])
            ya = a.read(4096)
            yb = b.read(4096)
            assert ya.shape == (4096, 2) and yb.shape == (4096, 2)
            ra = float(np.sqrt(np.mean(ya**2)))
            rb = float(np.sqrt(np.mean(yb**2)))
            assert ra > 1e-6 and rb > 1e-6
            assert rb > 1.5 * ra  # near listener clearly louder
        assert srv.coord.pump_ticks >= 1
        assert srv.coord.error is None
        # both lanes freed; a new client joins the still-live pump
        deadline = time.time() + 10.0
        while True:
            c = AcousticNetClient(srv.host, srv.port)
            c.send_pose([0.5, 0.0, 0.5])
            first = c._read_line()
            if b'"error"' not in first:
                c._buf = first + b"\n" + c._buf
                assert c.read(1024).shape == (1024, 2)
                c.close()
                break
            c.close()
            assert time.time() < deadline, "pump lane never freed"
            time.sleep(0.05)
    assert srv.served == 3


def test_rejects_poseless_first_message():
    with make_server() as srv:
        s = socket.create_connection((srv.host, srv.port), timeout=10)
        f = s.makefile("rb")
        f.readline()  # hello
        s.sendall(b'{"yaw": 1.0}\n')
        # server drops the connection without granting a lane
        rest = f.read()
        assert rest == b""
        s.close()
        assert srv.served == 0


def test_hoa_server_streams_audio():
    """sh_order server (r5): HOA acoustics over the same 2-channel wire
    — the shared trace emits SH moments, lanes decode binaurally."""
    with make_server(sh_order=2) as srv:
        with AcousticNetClient(srv.host, srv.port) as c:
            c.send_pose([0.5, 0.0, 0.5], yaw=0.7)
            y = c.read(4096)
        assert y.shape == (4096, 2)
        assert float(np.abs(y).max()) > 1e-4
        assert float(np.abs(y[:, 0] - y[:, 1]).max()) > 1e-5
    assert srv.served == 1
