"""Headless demo driver reproducing the reference app's behaviors.

The reference main loop (src/main.zig:452-512) without SDL/GPU: fixed
83 Hz timestep with a lag accumulator capped at 0.1 s, mouse-look fly
camera, click -> blip at the camera, footstep logic (walk-distance
counter, downward raycast, footstep at the ground point x0.95 dist,
main.zig:475-505), `grab` drags the looping music source to the camera
(main.zig:535-538), per-frame acoustic update (the mutex block,
main.zig:522-788) and audio pulled in blocks like the SDL callback.
Renders to a stereo float32 buffer / WAV instead of a sound card, driven
by a scripted or programmatic event stream.

Run: python -m audio_raytracing_tpu.app.demo [seconds] [out.wav]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..engine.system import SoundSystem
from ..models.scene import Scene, box_room
from ..ops.intersect import nearest_hit
from ..utils.wav import load_sound, write_wav
from .camera import Camera
from .input import GameInput, Input

ROOT = Path(__file__).resolve().parent.parent.parent
DATA = ROOT / "data"


def synth_blip(rate=44100) -> np.ndarray:
    """Short rising square blip (stand-in for blipSelect.wav, which the
    reference repo also ships without)."""
    n = int(0.09 * rate)
    t = np.arange(n) / rate
    f = 440.0 + 1200.0 * t / t[-1]
    x = np.sign(np.sin(2 * np.pi * np.cumsum(f) / rate)).astype(np.float32)
    env = np.exp(-t * 18.0).astype(np.float32)
    return 0.4 * x * env


def synth_music(rate=44100, seconds=4.0) -> np.ndarray:
    """Looping chord bed (stand-in for the missing music blob)."""
    n = int(seconds * rate)
    t = np.arange(n) / rate
    out = np.zeros(n, np.float32)
    for f, a in ((110.0, 0.3), (165.0, 0.2), (220.0, 0.2), (277.2, 0.15)):
        out += a * np.sin(2 * np.pi * f * t).astype(np.float32)
    # gentle amplitude pattern so doppler/reflection changes are audible
    out *= (0.6 + 0.4 * np.sin(2 * np.pi * t / seconds)).astype(np.float32)
    return out.astype(np.float32)


class Demo:
    def __init__(self, cfg: Config = DEFAULT_CONFIG, scene: Scene | None = None):
        self.cfg = cfg
        if scene is None:
            obj = DATA / "world.obj"
            scene = Scene.from_obj(obj, cfg) if obj.exists() else Scene.from_triangles(box_room(), cfg)
        self.scene = scene
        self.system = SoundSystem(scene=scene, cfg=cfg)
        self.camera = Camera()
        self.input = Input()
        self.input.bind_key("w", GameInput.FORWARD)
        self.input.bind_key("s", GameInput.BACKWARD)
        self.input.bind_key("d", GameInput.RIGHT)
        self.input.bind_key("a", GameInput.LEFT)
        self.input.bind_key("space", GameInput.UP)
        self.input.bind_key("lctrl", GameInput.DOWN)
        self.input.bind_mouse("left", GameInput.FIRE)
        self.input.bind_key("e", GameInput.GRAB)

        fs_path = DATA / "sounds" / "footstep.wav"
        footstep = load_sound(fs_path, cfg.sample_rate) if fs_path.exists() else synth_blip()
        self.music_sid = self.system.load_sound(synth_music(cfg.sample_rate))
        self.blip_sid = self.system.load_sound(synth_blip(cfg.sample_rate))
        self.footstep_sid = self.system.load_sound(footstep)

        # music auto-plays looping from the origin (main.zig:430-438)
        self.music_pos = np.zeros(3, np.float32)
        self.music_handle = self.system.play_sound(
            self.music_sid, pos=self.music_pos, gain=0.5, repeat=True
        )
        self.walk_counter = 0.0
        self._arrays = scene.device_arrays()

    def _floor_raycast(self, pos) -> float:
        """Downward nearest hit (footstep placement, main.zig:483-498)."""
        import jax.numpy as jnp

        t, _, hit = nearest_hit(
            jnp.asarray(pos, jnp.float32)[None],
            jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32),
            self._arrays.v0, self._arrays.v1, self._arrays.v2,
        )
        return float(t[0]) if bool(hit[0]) else math.inf

    def tick(self, events=()) -> None:
        """One fixed 83 Hz game tick (the inner while of main.zig:466-512)."""
        for e in events:
            self.input.accumulate(e)
        self.camera.update(self.input, self.cfg)

        if self.input.peek(GameInput.FIRE).pressed:
            self.system.play_sound(self.blip_sid, pos=self.camera.pos, gain=0.2)

        self.walk_counter += float(np.linalg.norm(self.camera.pos - self.camera.prev_pos))
        if self.walk_counter > 1.0:
            dist = self._floor_raycast(self.camera.pos)
            if math.isfinite(dist):
                self.system.play_sound(
                    self.footstep_sid,
                    pos=self.camera.pos + np.float32([0, -1, 0]) * np.float32(0.95 * dist),
                    gain=0.5,
                )
            self.walk_counter = 0.0

        self.input.decay()

    def update_audio_state(self) -> None:
        """The per-frame acoustic update block (main.zig:522-788)."""
        if self.input.peek(GameInput.GRAB).held:
            self.music_pos = self.camera.pos.copy()
            if self.system.is_playing(self.music_handle):
                self.system.set_pos(self.music_handle, self.music_pos)
        self.system.set_listener(self.camera.pos, yaw=self.camera.yaw, pitch=self.camera.pitch)
        self.system.update_acoustics()

    def run(self, seconds: float, script=None) -> np.ndarray:
        """Run the fixed-timestep loop for `seconds`, pulling audio after
        every simulated frame. script(tick_index) -> list of input events.
        Returns the rendered stereo buffer."""
        cfg = self.cfg
        n_ticks = int(seconds * cfg.ticks_per_second)
        samples_per_tick = cfg.sample_rate / cfg.ticks_per_second
        out = []
        rendered = 0
        for i in range(n_ticks):
            self.tick(script(i) if script else ())
            self.update_audio_state()
            want = int((i + 1) * samples_per_tick) - rendered
            want = (want // cfg.block_size) * cfg.block_size
            if want > 0:
                out.append(self.system.render(want))
                rendered += out[-1].shape[0]
        return np.concatenate(out, axis=0) if out else np.zeros((0, 2), np.float32)

    def run_live(self, seconds: float, script=None, fd=None,
                 acoustics_every: int = 8, chunk_blocks: int = 64,
                 ring_blocks: int = 192, warmup: bool = True,
                 **sink_kw) -> dict:
        """The reference's actual runtime shape: audio plays through a live
        sink (native pull thread on the wall clock, one 128-frame block per
        ~2.9 ms tick — sound_system.zig:44-92, 123-172) while the game loop
        produces. The audio clock is the master: game ticks advance exactly
        as far as the samples being rendered require (the fixed-timestep
        accumulator of main.zig:452-512 with the DAC as the time source).

        acoustics_every: game ticks between acoustic probe updates
        (default 8 ≈ 10 Hz at the 83 Hz tick) — the decoupled update rate
        the RealtimeEngine runs its tracing thread at; the reference
        re-probes per frame only because its tracer shares the frame
        budget (main.zig:522-788). Input/camera/voice logic still runs
        every tick. Through this container's TPU relay each device
        dispatch pays a ~25 ms round trip regardless of size, hence the
        large default chunk (64 blocks = 186 ms of audio per dispatch;
        measured 0 underruns / 1.27x real time over a 10 s scripted run)
        and ring (the jitter budget); on local hardware both can shrink
        to SDL-like values.

        warmup: compile every device op the script can trigger BEFORE the
        clock starts (voice start/stop/move, the floor raycast, the probe
        update, each render chunk shape) — the live-audio equivalent of a
        game precompiling shaders. Without it the first footstep/blip of
        the run JIT-compiles mid-playback (seconds through this
        container's remote TPU relay) and starves the ring. Warm renders
        advance playback by ~2 chunks of pre-roll.

        fd: raw interleaved-f32 PCM destination (None discards). Returns
        the sink stats (underruns = missed audio deadlines)."""
        from ..engine.live import run_live as _run_live

        cfg = self.cfg
        samples_per_tick = cfg.sample_rate / cfg.ticks_per_second
        n_blocks_total = int(np.ceil(seconds * cfg.sample_rate / cfg.block_size))
        if warmup:
            h = self.system.play_sound(self.blip_sid, pos=self.camera.pos,
                                       gain=0.0)
            self.system.set_pos(h, self.camera.pos)
            self.system.stop(h)
            self._floor_raycast(self.camera.pos)
            self.update_audio_state()
            self.system.render(chunk_blocks * cfg.block_size)
            rem = n_blocks_total % chunk_blocks
            if rem:  # the run's tail chunk is a second compiled shape
                self.system.render(rem * cfg.block_size)
        state = {"tick": 0, "rendered": 0}

        def render(n: int) -> np.ndarray:
            target = state["rendered"] + n
            while state["tick"] * samples_per_tick < target:
                i = state["tick"]
                self.tick(script(i) if script else ())
                if i % acoustics_every == 0:
                    self.update_audio_state()
                state["tick"] += 1
            state["rendered"] += n
            return self.system.render(n)

        return _run_live(render, seconds, cfg.sample_rate,
                         block_frames=cfg.block_size, fd=fd,
                         chunk_blocks=chunk_blocks, ring_blocks=ring_blocks,
                         **sink_kw)


def default_script(i: int):
    """A small scripted walk: move forward, look around, grab the music."""
    ev = []
    if i == 0:
        ev.append({"type": "key_down", "code": "w"})
    if i == 40:
        ev.append({"type": "mouse_down", "code": "left"})
    if i == 41:
        ev.append({"type": "mouse_up", "code": "left"})
    if i % 10 == 5:
        ev.append({"type": "mouse_motion", "pos": (0, 0), "rel": (30.0, 0.0)})
    if i == 120:
        ev.append({"type": "key_down", "code": "e"})
    if i == 160:
        ev.append({"type": "key_up", "code": "e"})
    return ev


def main():
    args = [a for a in sys.argv[1:] if a != "--live"]
    live = "--live" in sys.argv[1:]
    seconds = float(args[0]) if args else 3.0
    out_path = args[1] if len(args) > 1 else ("demo_out.pcm" if live else "demo_out.wav")
    demo = Demo()
    if live:
        # real-time playback: raw interleaved f32 PCM lands in out_path
        # (aplay -f FLOAT_LE -r 44100 -c 2 on a machine with a DAC);
        # underruns are missed ~2.9 ms audio deadlines
        with open(out_path, "wb") as f:
            stats = demo.run_live(seconds, script=default_script, fd=f.fileno())
        print(f"live: {stats['blocks_played']} blocks, "
              f"{stats['underruns']} underruns, "
              f"{stats['late_wakeups']} late wakeups, "
              f"realtime_factor {stats['realtime_factor']:.2f}; "
              f"pcm -> {out_path}")
        return
    audio = demo.run(seconds, script=default_script)
    write_wav(out_path, audio, demo.cfg.sample_rate)
    peak = float(np.abs(audio).max()) if audio.size else 0.0
    print(f"wrote {out_path}: {audio.shape[0]} samples, peak {peak:.4f}")


if __name__ == "__main__":
    main()
