"""Live audio sink tests: the real-time pull loop (native/audiosink.cpp +
native.AudioSink fallback) and the run_live producer.

The reference's L0 runtime is SDL pulling 128-sample stereo blocks under a
hard ~2.9 ms cadence (sound_system.zig:44-92, 123-172). These tests drive
the same contract against a REAL wall clock: a kept-fed ring plays
(essentially) clean; a starved ring counts underruns; the fd path streams
the producer's PCM bit-exactly; the Python fallback matches the native
semantics. Because the suite shares a loaded CI box, kept-fed assertions
tolerate a small bounded number of scheduler-noise underruns (the
DETERMINISTIC zero-miss guarantee is test_realtime.py's simulated-clock
harness); the semantics — accounting identities, exact PCM, completion,
no deadlock — are asserted exactly.
"""

import os
import threading
import time

import numpy as np
import pytest

import audio_raytracing_tpu.native as native
from audio_raytracing_tpu.engine.live import run_live


def _noise_budget(stats):
    """Allowed scheduler-noise underruns on a shared box: 5% of blocks,
    at least 3 — PLUS the sink's own late-wakeup count when the host is
    visibly loaded (a full-suite run alongside TPU dispatch loops
    measured 33 late wakeups and 5 underruns here: every underrun under
    load traces to a late wakeup, which the sink reports precisely, so
    scale the budget by what the scheduler actually did rather than
    fail on machine noise)."""
    return max(3, stats["blocks"] // 20, stats.get("late_wakeups", 0) // 4)


def _sine_render(sr=44100, freq=440.0, amp=0.1, channels=2):
    t = [0]

    def render(n):
        x = np.arange(t[0], t[0] + n) / sr
        t[0] += n
        sig = (amp * np.sin(2 * np.pi * freq * x)).astype(np.float32)
        return np.stack([sig] * channels, -1)

    return render


def _py_sink(*args, **kw):
    """An AudioSink forced onto the pure-Python fallback path."""
    orig = native._load
    native._load = lambda: None
    try:
        return native.AudioSink(*args, **kw)
    finally:
        native._load = orig


@pytest.fixture(params=["native", "python"])
def make_sink(request):
    if request.param == "native" and not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return native.AudioSink if request.param == "native" else _py_sink


def test_ring_write_space_level(make_sink):
    s = make_sink(44100, block_frames=128, channels=2, ring_blocks=8)
    try:
        cap = s.space
        assert cap >= 8 * 128
        a = np.ones((300, 2), np.float32)
        assert s.write(a) == 300
        assert s.level == 300
        assert s.space == cap - 300
        # overfill: accepts only what fits, never blocks
        big = np.zeros((cap, 2), np.float32)
        assert s.write(big) == cap - 300
        assert s.space == 0
        assert s.write(a) == 0
    finally:
        s.close()


def test_kept_fed_plays_clean(make_sink):
    """A producer that outpaces the clock: every block plays clean (up
    to the shared-box noise budget)."""
    s = make_sink(44100, block_frames=128, channels=2, ring_blocks=32)
    try:
        stats = run_live(_sine_render(), 0.4, 44100, sink=s)
    finally:
        s.close()
    assert stats["underruns"] <= _noise_budget(stats)
    assert stats["blocks_played"] >= stats["blocks"]
    assert stats["frames_written"] == stats["blocks"] * 128
    assert stats["realtime_factor"] > 1.0


def test_chunk_larger_than_ring(make_sink):
    """run_live clamps the render chunk to the sink's real capacity —
    a chunk that could never find space used to spin forever."""
    s = make_sink(44100, block_frames=128, channels=2, ring_blocks=8)
    try:
        stats = run_live(_sine_render(), 0.3, 44100, chunk_blocks=64, sink=s)
    finally:
        s.close()
    # an 8-block ring is only ~23 ms of jitter budget — this test guards
    # the CLAMP (completion, exact accounting), not clean playback. Under
    # real host load (full suite + experiments) even blocks//4 flaked
    # (34/104 underruns, every one a reported late wakeup), so the
    # underrun bound only applies when the scheduler was actually on
    # time; the accounting asserts are the unconditional contract.
    if stats.get("late_wakeups", 0) <= stats["blocks"] // 8:
        assert stats["underruns"] <= stats["blocks"] // 4
    assert stats["frames_written"] == stats["blocks"] * 128


def test_starved_ring_counts_underruns(make_sink):
    """The pull-callback contract: the clock ticks regardless; an empty
    ring plays silence and counts (sound_system.zig's SDL device keeps
    pulling whether or not the app keeps up)."""
    s = make_sink(44100, block_frames=128, channels=2, ring_blocks=8)
    try:
        s.write(np.ones((2 * 128, 2), np.float32))  # 2 blocks, then nothing
        s.start()
        time.sleep(0.1)  # ~34 ticks at 2.9 ms
        s.stop()
        stats = s.stats()
    finally:
        s.close()
    assert stats["blocks_played"] >= 10
    assert stats["underruns"] >= stats["blocks_played"] - 2 - 3  # jitter slop
    assert stats["underruns"] <= stats["blocks_played"] - 2


def test_fd_streams_exact_pcm(make_sink):
    """Raw-PCM out: a non-blocking pipe drained concurrently receives the
    produced samples bit-exactly, in order."""
    r, w = os.pipe()
    os.set_blocking(r, False)
    os.set_blocking(w, False)
    chunks, done = [], threading.Event()

    def reader():
        while True:
            try:
                c = os.read(r, 1 << 16)
                if c:
                    chunks.append(c)
                    continue
            except BlockingIOError:
                pass
            if done.is_set():
                return
            time.sleep(0.001)

    th = threading.Thread(target=reader)
    th.start()
    render = _sine_render()
    expected = []
    orig_render = render

    def tee(n):
        out = orig_render(n)
        expected.append(out)
        return out

    s = make_sink(44100, block_frames=128, channels=2, ring_blocks=32, fd=w)
    try:
        stats = run_live(tee, 0.15, 44100, sink=s)
    finally:
        s.close()
        done.set()
        th.join()
        os.close(w)
        os.close(r)
    pcm = np.frombuffer(b"".join(chunks), np.float32).reshape(-1, 2)
    # short writes on the non-blocking pipe drop frames rather than stall
    # the clock, so piped <= played
    assert len(pcm) <= stats["blocks_played"] * 128
    # scheduler-noise underruns interleave silence blocks into the
    # stream; drop them (the 440 Hz sine never yields an all-zero block)
    # and the remainder must be the producer's PCM bit-exactly, in order
    assert stats["underruns"] <= _noise_budget(stats)
    blocks = pcm.reshape(-1, 128, 2)
    real = blocks[np.abs(blocks).max(axis=(1, 2)) > 0].reshape(-1, 2)
    want = np.concatenate(expected)
    np.testing.assert_array_equal(real, want[: len(real)])
    assert len(real) >= 0.8 * stats["frames_written"]


def test_stop_is_prompt_and_restartable(make_sink):
    s = make_sink(44100, block_frames=128, channels=2, ring_blocks=8)
    try:
        s.start()
        time.sleep(0.02)
        t0 = time.perf_counter()
        s.stop()
        assert time.perf_counter() - t0 < 0.1
        played = s.stats()["blocks_played"]
        time.sleep(0.02)
        assert s.stats()["blocks_played"] == played  # clock really stopped
        s.start()
        time.sleep(0.02)
        s.stop()
        assert s.stats()["blocks_played"] > played  # and restarts
    finally:
        s.close()


def test_live_realtime_engine_three_threads():
    """The FULL reference architecture, all three threads real: the
    acoustic update thread re-traces and publishes through the lock-free
    mailbox, the producer renders blocks adopting the freshest params,
    and the sink's pull thread plays them on the wall clock
    (main.zig:518-521's triple-buffer design + sound_system.zig:123-172's
    callback). Stream sized to the priming lead (CPU renders slower than
    real time; see test_live_sound_system_end_to_end)."""
    import dataclasses

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.engine.realtime import RealtimeEngine
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, ir_length=2048, rays_per_source=256, max_voices=4
    )
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), cfg,
        absorption=np.full(12, 0.3, np.float32),
    )
    eng = RealtimeEngine(scene, cfg, updates_per_second=40.0)
    rng = np.random.default_rng(1)
    tone = (0.4 * rng.standard_normal(cfg.sample_rate)).astype(np.float32)
    sid = eng.system.load_sound(tone)
    eng.play_sound(sid, pos=[2.0, 0.5, 1.0], gain=0.5, repeat=True)
    eng.set_listener([0.0, 0.0, 0.0], yaw=0.2)

    n_blocks = 16
    dur = n_blocks * cfg.block_size / cfg.sample_rate
    sink = _py_sink(cfg.sample_rate, block_frames=cfg.block_size,
                    channels=2, ring_blocks=2 * n_blocks)
    try:
        with eng:  # tracing thread runs while we produce + play
            stats = run_live(eng.render, dur, cfg.sample_rate,
                             block_frames=cfg.block_size, chunk_blocks=4,
                             sink=sink)
    finally:
        sink.close()
    assert stats["underruns"] <= _noise_budget(stats)
    assert stats["frames_written"] == n_blocks * cfg.block_size
    assert eng.updates_done >= 1  # acoustics really landed mid-playback
    assert float(np.asarray(eng.system.params.wet)[0]) > 0.0


def test_live_sound_system_end_to_end():
    """The full L0 loop: a SoundSystem voice playing through the live sink.

    The CPU engine renders slower than real time (tests run on the
    8-virtual-device CPU mesh), so the stream is sized to fit the ring's
    priming lead — this checks the data path and accounting end to end,
    not CPU render throughput (the TPU deadline numbers live in
    test_realtime.py and the profile budget gate)."""
    from audio_raytracing_tpu.config import Config
    from audio_raytracing_tpu.engine.system import SoundSystem

    cfg = Config()
    sys_ = SoundSystem(scene=None, cfg=cfg)
    rng = np.random.default_rng(0)
    snd = (rng.standard_normal(cfg.sample_rate) * 0.1).astype(np.float32)
    sys_.play_sound(sys_.load_sound(snd), pos=(1.0, 0.0, 0.5))

    n_blocks = 24
    dur = n_blocks * cfg.block_size / cfg.sample_rate
    sink = _py_sink(cfg.sample_rate, block_frames=cfg.block_size,
                    channels=2, ring_blocks=n_blocks + 8)
    try:
        stats = run_live(sys_.render, dur, cfg.sample_rate,
                         block_frames=cfg.block_size, chunk_blocks=8,
                         ring_blocks=n_blocks + 8, sink=sink)
    finally:
        sink.close()
    assert stats["underruns"] <= _noise_budget(stats)
    assert stats["blocks_played"] >= n_blocks
    assert stats["frames_written"] == n_blocks * cfg.block_size
