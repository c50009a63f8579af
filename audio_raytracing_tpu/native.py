"""ctypes bindings for the native host runtime (native/arbih.cpp).

The reference's host-side native code (Zig: BIH builder, OBJ parser, ray
queries) maps to a small C++ library here, loaded via ctypes with a
transparent NumPy fallback: every entry point has identical semantics to
its Python implementation (bit-identical BIH arenas), so the framework
works without the library and accelerates host-side work when it is built
(`make -C native`). Build on import is attempted once if a compiler is
available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libarbih.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(LIB_PATH))
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.arbih_build.restype = ctypes.c_int32
    lib.arbih_build.argtypes = [
        f32p, f32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, f32p, f32p, i32p, i32p, i32p, i32p, f32p, f32p, i32p,
    ]
    lib.arbih_nearest_hit.restype = None
    lib.arbih_nearest_hit.argtypes = [
        f32p, ctypes.c_int32, f32p, f32p, ctypes.c_int32, f32p, i32p,
    ]
    lib.arbih_parse_obj.restype = ctypes.c_int32
    lib.arbih_parse_obj.argtypes = [ctypes.c_char_p, ctypes.c_int64, f32p]
    try:
        # newer symbols: a stale libarbih.so built before mailbox.cpp
        # existed must NOT break the core bindings — kick off a rebuild
        # (benefits the next process; dlopen caches this one) and let
        # Mailbox fall back to its Python implementation
        lib.arbih_mailbox_create.restype = ctypes.c_void_p
        lib.arbih_mailbox_create.argtypes = [ctypes.c_int64]
        lib.arbih_mailbox_destroy.restype = None
        lib.arbih_mailbox_destroy.argtypes = [ctypes.c_void_p]
        lib.arbih_mailbox_write.restype = None
        lib.arbih_mailbox_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.arbih_mailbox_read.restype = ctypes.c_int32
        lib.arbih_mailbox_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.arbih_mailbox_seq.restype = ctypes.c_uint64
        lib.arbih_mailbox_seq.argtypes = [ctypes.c_void_p]
        lib.arbih_sink_create.restype = ctypes.c_void_p
        lib.arbih_sink_create.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.arbih_sink_start.restype = ctypes.c_int
        lib.arbih_sink_start.argtypes = [ctypes.c_void_p]
        lib.arbih_sink_stop.restype = None
        lib.arbih_sink_stop.argtypes = [ctypes.c_void_p]
        lib.arbih_sink_write.restype = ctypes.c_int64
        lib.arbih_sink_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.arbih_sink_space.restype = ctypes.c_int64
        lib.arbih_sink_space.argtypes = [ctypes.c_void_p]
        lib.arbih_sink_level.restype = ctypes.c_int64
        lib.arbih_sink_level.argtypes = [ctypes.c_void_p]
        lib.arbih_sink_stats.restype = None
        lib.arbih_sink_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.arbih_sink_destroy.restype = None
        lib.arbih_sink_destroy.argtypes = [ctypes.c_void_p]
    except AttributeError:
        try:
            subprocess.run(
                ["make", "-C", str(NATIVE_DIR), "clean", "all"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            pass
    _lib = lib
    return _lib


def _has_mailbox(lib) -> bool:
    return lib is not None and hasattr(lib, "arbih_mailbox_create")


def _has_sink(lib) -> bool:
    return lib is not None and hasattr(lib, "arbih_sink_create")


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bih_native(aabb_low, aabb_high, values, max_leaf_size: int = 8):
    """Native BIH build; returns a models.bih.BIHArena identical to the
    NumPy builder's, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from .models.bih import BIHArena

    low = np.ascontiguousarray(aabb_low, np.float32)
    high = np.ascontiguousarray(aabb_high, np.float32)
    vals = np.ascontiguousarray(values, np.int32)
    n = len(vals)
    null_f = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    null_i = ctypes.cast(None, ctypes.POINTER(ctypes.c_int32))
    n_nodes = lib.arbih_build(
        _fp(low), _fp(high), _ip(vals), n, max_leaf_size, 1,
        null_i, null_f, null_f, null_i, null_i, null_i, null_i,
        null_f, null_f, null_i,
    )
    if n_nodes < 0:
        return None
    axis = np.empty(n_nodes, np.int32)
    left_max = np.empty(n_nodes, np.float32)
    right_min = np.empty(n_nodes, np.float32)
    left = np.empty(n_nodes, np.int32)
    right = np.empty(n_nodes, np.int32)
    leaf_start = np.empty(n_nodes, np.int32)
    leaf_count = np.empty(n_nodes, np.int32)
    out_low = np.empty((n, 3), np.float32)
    out_high = np.empty((n, 3), np.float32)
    out_vals = np.empty(n, np.int32)
    lib.arbih_build(
        _fp(low), _fp(high), _ip(vals), n, max_leaf_size, 0,
        _ip(axis), _fp(left_max), _fp(right_min), _ip(left), _ip(right),
        _ip(leaf_start), _ip(leaf_count), _fp(out_low), _fp(out_high), _ip(out_vals),
    )
    return BIHArena(
        axis=axis, left_max=left_max, right_min=right_min, left=left,
        right=right, leaf_start=leaf_start, leaf_count=leaf_count,
        aabb_low=out_low, aabb_high=out_high, values=out_vals,
    )


def nearest_hit_native(tris, origins, dirs):
    """Native brute-force MT nearest hit. tris (T,3,3); origins/dirs (R,3).
    Returns (t (R,), idx (R,)) or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris, np.float32).reshape(-1, 9)
    origins = np.ascontiguousarray(origins, np.float32)
    dirs = np.ascontiguousarray(dirs, np.float32)
    r = origins.shape[0]
    out_t = np.empty(r, np.float32)
    out_i = np.empty(r, np.int32)
    lib.arbih_nearest_hit(
        _fp(tris), tris.shape[0], _fp(origins), _fp(dirs), r, _fp(out_t), _ip(out_i)
    )
    return out_t, out_i


def parse_obj_native(text: str):
    """Native OBJ triangle-soup parse. Returns (T, 3, 3) positions or None."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode()
    n = lib.arbih_parse_obj(raw, len(raw), ctypes.cast(None, ctypes.POINTER(ctypes.c_float)))
    if n < 0:
        return None
    out = np.empty((n, 3, 3), np.float32)
    lib.arbih_parse_obj(raw, len(raw), _fp(out))
    return out


class Mailbox:
    """Lock-free triple-buffer mailbox (native/mailbox.cpp) — the design
    the reference's own comment recommends instead of its mutex
    (main.zig:518-521): a writer thread publishes fixed-size float32
    blocks at any rate; a reader thread always receives the latest
    COMPLETE block without blocking either side. Single writer, single
    reader. Falls back to a Python-lock implementation when the native
    library is unavailable (same semantics, not lock-free)."""

    def __init__(self, n_floats: int):
        self.n = int(n_floats)
        lib = _load()
        self._lib = lib
        if _has_mailbox(lib):
            self._h = lib.arbih_mailbox_create(4 * self.n)
            if not self._h:
                raise MemoryError("mailbox allocation failed")
        else:  # pure-Python fallback (locked, same interface)
            import threading

            self._h = None
            self._lock = threading.Lock()
            self._latest = None
            self._taken = True

    def write(self, block) -> None:
        import numpy as _np

        a = _np.ascontiguousarray(block, _np.float32).reshape(self.n)
        if self._h:
            self._lib.arbih_mailbox_write(self._h, _fp(a))
        else:
            with self._lock:
                self._latest = a.copy()
                self._taken = False

    def read(self):
        """Latest unseen block as (n,) float32, or None."""
        import numpy as _np

        if self._h:
            out = _np.empty(self.n, _np.float32)
            if self._lib.arbih_mailbox_read(self._h, _fp(out)):
                return out
            return None
        with self._lock:
            if self._taken or self._latest is None:
                return None
            self._taken = True
            return self._latest

    @property
    def seq(self) -> int:
        """Writer publish count (native backend only; diagnostic)."""
        return int(self._lib.arbih_mailbox_seq(self._h)) if self._h else -1

    def close(self) -> None:
        if self._h:
            self._lib.arbih_mailbox_destroy(self._h)
            self._h = None

    def __del__(self):  # best effort
        try:
            self.close()
        except Exception:
            pass


class AudioSink:
    """Live audio output loop (native/audiosink.cpp) — the reference's L0
    runtime behavior (SDL device pulling 128-sample stereo f32 blocks
    under a hard ~2.9 ms cadence, sound_system.zig:44-92, 123-172) as a
    real OS thread: clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME) on an
    absolute t0 + k*period schedule consumes one block per tick from a
    lock-free SPSC ring; a short ring is an UNDERRUN (silence plays, the
    count increments — the pull-callback contract). Optional raw
    interleaved-f32 PCM to a file descriptor (pipe it to aplay/pacat on a
    machine with a DAC); fd=None discards samples (pure timing harness).
    The fd must either be drained in real time (a player) or be
    non-blocking (short writes are dropped, the clock keeps ticking) — a
    blocking fd nobody reads stalls the pull thread once the pipe fills.

    Producer API (any single thread): write(frames) -> frames accepted
    (non-blocking), space/level in frames, stats dict.

    Falls back to a Python thread paced on time.monotonic_ns when the
    native library is unavailable (same semantics and stats; GIL-level
    jitter instead of lock-free handoff).
    """

    def __init__(self, sample_rate: int, block_frames: int = 128,
                 channels: int = 2, ring_blocks: int = 32, fd=None):
        self.sample_rate = int(sample_rate)
        self.block_frames = int(block_frames)
        self.channels = int(channels)
        self._fd = -1 if fd is None else int(fd)
        ring_frames = int(ring_blocks) * self.block_frames
        lib = _load()
        self._lib = lib
        self._h = None
        if _has_sink(lib):
            self._h = lib.arbih_sink_create(
                self.sample_rate, self.block_frames, self.channels,
                ring_frames, self._fd,
            )
            if not self._h:
                raise MemoryError("sink allocation failed")
        else:  # pure-Python fallback
            import threading

            n = 1
            while n < max(ring_frames, 4 * self.block_frames):
                n *= 2
            self._ring = np.zeros((n, self.channels), np.float32)
            self._ring_frames = n
            self._head = 0  # frames ever written
            self._tail = 0  # frames ever consumed
            self._lock = threading.Lock()
            self._stop_evt = threading.Event()
            self._thread = None
            self._stats = [0, 0, 0, 0]

    # -- producer side ---------------------------------------------------

    def write(self, frames) -> int:
        """Offer (n, channels) float32 frames; returns frames accepted."""
        a = np.ascontiguousarray(frames, np.float32).reshape(-1, self.channels)
        if self._h:
            return int(self._lib.arbih_sink_write(self._h, _fp(a), len(a)))
        with self._lock:
            space = self._ring_frames - (self._head - self._tail)
            n = min(len(a), space)
            for f in range(n):
                self._ring[(self._head + f) % self._ring_frames] = a[f]
            self._head += n
            self._stats[3] += n
            return n

    @property
    def space(self) -> int:
        if self._h:
            return int(self._lib.arbih_sink_space(self._h))
        with self._lock:
            return self._ring_frames - (self._head - self._tail)

    @property
    def level(self) -> int:
        if self._h:
            return int(self._lib.arbih_sink_level(self._h))
        with self._lock:
            return self._head - self._tail

    def stats(self) -> dict:
        """{"blocks_played", "underruns", "late_wakeups", "frames_written"}."""
        if self._h:
            out = (ctypes.c_uint64 * 4)()
            self._lib.arbih_sink_stats(self._h, out)
            vals = [int(v) for v in out]
        else:
            with self._lock:
                vals = list(self._stats)
        return dict(zip(
            ("blocks_played", "underruns", "late_wakeups", "frames_written"),
            vals,
        ))

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> None:
        if self._h:
            if self._lib.arbih_sink_start(self._h) != 0:
                raise RuntimeError("sink thread failed to start")
            return
        import threading

        if self._thread is not None and self._thread.is_alive():
            return
        self._stop_evt = threading.Event()
        self._thread = threading.Thread(
            target=self._py_loop, args=(self._stop_evt,),
            name="audio-sink", daemon=True,
        )
        self._thread.start()

    def stop(self) -> None:
        if self._h:
            self._lib.arbih_sink_stop(self._h)
            return
        if self._thread is None:
            return
        self._stop_evt.set()
        self._thread.join(timeout=5.0)
        self._thread = None

    def _py_loop(self, stop_evt) -> None:
        import os
        import time

        period_ns = int(1e9 * self.block_frames / self.sample_rate)
        nxt = time.monotonic_ns()
        blk = self.block_frames
        while not stop_evt.is_set():
            nxt += period_ns
            dt = nxt - time.monotonic_ns()
            if dt > 0:
                time.sleep(dt / 1e9)
            # a stop that landed during the sleep is not a tick to service
            if stop_evt.is_set():
                break
            late = time.monotonic_ns() - nxt > period_ns // 2
            with self._lock:
                if late:
                    self._stats[2] += 1
                if self._head - self._tail >= blk:
                    idx = (self._tail + np.arange(blk)) % self._ring_frames
                    out = self._ring[idx].copy()
                    self._tail += blk
                else:
                    out = np.zeros((blk, self.channels), np.float32)
                    self._stats[1] += 1
                self._stats[0] += 1
            if self._fd >= 0:
                try:
                    os.write(self._fd, out.tobytes())
                except OSError:
                    pass

    def close(self) -> None:
        self.stop()
        if self._h:
            self._lib.arbih_sink_destroy(self._h)
            self._h = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    def __del__(self):  # best effort
        try:
            self.close()
        except Exception:
            pass
