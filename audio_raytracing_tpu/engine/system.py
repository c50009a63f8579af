"""SoundSystem — the public engine facade.

Mirrors the reference's surface (src/sound_system.zig:44-121 plus the
per-voice parameter writes the game loop performs, src/main.zig:522-788):

    system = SoundSystem(scene)                 # SoundSystem.init
    sid = system.load_sound("foo.wav")          # loadSound -> handle
    h = system.play_sound(sid, pos=..., gain=0.5, repeat=True)  # playSound
    system.set_listener(pos, yaw=..., pitch=...)   # listener/orientation
    system.set_pos(h, new_pos)                  # playing.getPtr(h).pos = ...
    system.update_acoustics()                   # the main.zig:522-788 block
    stereo = system.render(n_samples)           # the SDL pull callback

Differences by design: no SDL/audio device — render() returns float32
stereo blocks for the caller to sink (offline file, stream, test); all
compute runs in jit on the accelerator; host state is a handle table over
a static voice slot array. Voice handles are monotonically increasing
(playing_counter, zig:37) and slots of finished voices are swept and
reused after each render, like callback's sweep (zig:164-171).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config, DEFAULT_CONFIG
from ..models.scene import Scene
from ..sim.probe import VoiceParams, acoustic_update
from ..utils import profiling, quat
from ..utils.wav import load_sound as load_wav_mono
from . import voices as V
from ..ops.reverb import DEFAULT_FEEDBACK_GAIN

DATA_DIR = Path(__file__).resolve().parent.parent.parent / "data"


def default_hrtf():
    with np.load(DATA_DIR / "hrtf_magls.npz") as z:
        return z["irs_l"].astype(np.float32), z["irs_r"].astype(np.float32)


@jax.jit
def _start_voice(state, params, slot, offset, length, pos, gain, repeat):
    """Start a voice in `slot` — ONE compiled dispatch for ANY slot.

    The slot index is a traced operand (not a Python constant baked into
    eager `.at[slot].set` ops), so live use — footsteps/blips starting
    voices mid-playback, slots cycling through the table — never JIT-
    compiles again after the first call. Matters through this container's
    remote TPU relay, where each fresh eager-op compile costs ~0.3-1 s and
    a cold play_sound once starved the live audio sink for seconds."""
    vt = state.voices
    sel = lambda a, v: a.at[slot].set(jnp.asarray(v, a.dtype))  # noqa: E731
    vt = vt._replace(
        active=sel(vt.active, True),
        finished=sel(vt.finished, False),
        sound_offset=sel(vt.sound_offset, offset),
        sound_length=sel(vt.sound_length, length),
        pos=vt.pos.at[slot].set(pos),
        gain=sel(vt.gain, gain),
        cursor=sel(vt.cursor, 0),
        repeat=sel(vt.repeat, repeat),
        prev_dist=sel(vt.prev_dist, jnp.nan),
        refl_dist_prev=vt.refl_dist_prev.at[slot].set(jnp.nan),
        eq_z=vt.eq_z.at[slot].set(0.0),
    )
    # fresh per-voice reverb (reference constructs Reverb per Playing)
    rv = state.reverb
    rv = rv._replace(
        diff_buf=rv.diff_buf.at[slot].set(0.0),
        diff_cursor=rv.diff_cursor.at[slot].set(0),
        fb_buf=rv.fb_buf.at[slot].set(0.0),
        fb_cursor=rv.fb_cursor.at[slot].set(0),
        fb_filter=rv.fb_filter.at[slot].set(0.0),
    )
    params = params._replace(
        occlusion=params.occlusion.at[slot].set(0.0),
        refl_dist=params.refl_dist.at[slot].set(0.0),
        refl_lam=params.refl_lam.at[slot].set(0.0),
        feedback_gain=params.feedback_gain.at[slot].set(DEFAULT_FEEDBACK_GAIN),
        wet=params.wet.at[slot].set(0.0),
    )
    return state._replace(voices=vt, reverb=rv), params


@jax.jit
def _set_slot_pos(state, slot, pos):
    vt = state.voices
    return state._replace(voices=vt._replace(pos=vt.pos.at[slot].set(pos)))


@jax.jit
def _stop_slot(state, slot):
    vt = state.voices
    return state._replace(
        voices=vt._replace(active=vt.active.at[slot].set(False))
    )


class SoundSystem:
    def __init__(self, scene: Scene | None = None, cfg: Config = DEFAULT_CONFIG,
                 hrtf=None):
        self.cfg = cfg
        self.scene = scene
        self._scene_arrays = scene.device_arrays() if scene is not None else None
        hl, hr = hrtf if hrtf is not None else default_hrtf()
        self.hrtf_l = jnp.asarray(hl)
        self.hrtf_r = jnp.asarray(hr)
        self._sounds: list[np.ndarray] = []
        self._arena = jnp.zeros(1, jnp.float32)
        self._offsets: list[int] = []
        self.state = V.init_state(cfg)
        self.params = VoiceParams(
            occlusion=jnp.zeros(cfg.max_voices),
            refl_dist=jnp.zeros((cfg.max_voices, 6)),
            refl_lam=jnp.zeros((cfg.max_voices, 6)),
            feedback_gain=jnp.full(cfg.max_voices, DEFAULT_FEEDBACK_GAIN),
            wet=jnp.zeros(cfg.max_voices),
        )
        self.listener = np.zeros(3, np.float32)
        self.orientation = np.asarray([0.0, 0.0, 0.0, 1.0], np.float32)
        self._handles: dict[int, int] = {}  # handle -> slot
        self._next_handle = 0
        # host mirror of per-slot liveness (active & ~finished), updated
        # by play/stop and render's finished sweep — lets slot allocation
        # and is_playing avoid device->host syncs (see _free_slot)
        self._live = np.zeros(cfg.max_voices, bool)
        # slot -> (feedback_gain, wet) traced-IR calibration overrides
        # (engine/calibrate.py); sticky across update_acoustics
        self._reverb_cal: dict[int, tuple[float, float]] = {}

    # --- resources -------------------------------------------------------

    def load_sound(self, source) -> int:
        """Load a WAV path or a float32 mono array; returns a sound id."""
        if isinstance(source, (str, Path)):
            samples = load_wav_mono(source, self.cfg.sample_rate)
        else:
            samples = np.asarray(source, np.float32)
        sid = len(self._sounds)
        self._sounds.append(samples)
        offsets = np.cumsum([0] + [len(s) for s in self._sounds])[:-1]
        self._offsets = offsets.tolist()
        self._arena = jnp.asarray(np.concatenate(self._sounds))
        return sid

    # --- voices ----------------------------------------------------------

    def play_sound(self, sound: int, pos, gain: float = 1.0, repeat: bool = False) -> int:
        """Start a voice; returns a handle (cf. playSound, zig:113-121).

        One compiled device dispatch for any slot (_start_voice) and no
        device sync: slot choice reads the host liveness mirror."""
        slot = self._free_slot()
        self.state, self.params = _start_voice(
            self.state, self.params, jnp.int32(slot),
            jnp.int32(self._offsets[sound]),
            jnp.int32(len(self._sounds[sound])),
            jnp.asarray(pos, jnp.float32), jnp.float32(gain),
            jnp.bool_(repeat),
        )
        self._live[slot] = True
        self._reverb_cal.pop(slot, None)  # recycled slot: stale calibration
        h = self._next_handle
        self._next_handle += 1
        self._handles[h] = slot
        return h

    def _free_slot(self) -> int:
        """First free slot per the host liveness mirror (`self._live`) —
        exact as of the last rendered block (render's finished sweep is
        the only place voices end on their own), so starting a voice never
        blocks on a device->host transfer. The reference's game thread
        reads callback-owned liveness with the same one-block staleness."""
        free = np.nonzero(~self._live)[0]
        if len(free) == 0:
            raise RuntimeError(
                f"voice table full ({self.cfg.max_voices}); raise Config.max_voices"
            )
        slot = int(free[0])
        # drop stale handle mappings to this slot
        self._handles = {h: s for h, s in self._handles.items() if s != slot}
        return slot

    def stop(self, handle: int) -> None:
        slot = self._handles.pop(handle, None)
        if slot is None:
            return
        self.state = _stop_slot(self.state, jnp.int32(slot))
        self._live[slot] = False

    def set_pos(self, handle: int, pos) -> None:
        slot = self._handles[handle]
        self.state = _set_slot_pos(
            self.state, jnp.int32(slot), jnp.asarray(pos, jnp.float32)
        )

    def is_playing(self, handle: int) -> bool:
        """Liveness as of the last rendered block (host mirror — no
        device sync; see _free_slot)."""
        slot = self._handles.get(handle)
        return slot is not None and bool(self._live[slot])

    # --- listener / acoustics ---------------------------------------------

    def set_listener(self, pos, yaw: float = 0.0, pitch: float = 0.0) -> None:
        """Pose push (main.zig:528-533): orientation from pitch/yaw."""
        self.listener = np.asarray(pos, np.float32)
        self.orientation = quat.quat_from_roll_pitch_yaw(
            np.float32(pitch), np.float32(yaw), np.float32(0.0)
        )

    def update_acoustics(self) -> VoiceParams:
        """Re-trace the scene and refresh all per-voice DSP parameters —
        the batched equivalent of main.zig:522-788. Resets reflection
        prev-dists like the reference's `reflections = .{}` (main.zig:675)."""
        if self.scene is None:
            raise RuntimeError("SoundSystem has no scene")
        vt = self.state.voices
        with profiling.span("update"):  # cf. main.zig:525-526
            params = acoustic_update(
            self._scene_arrays,
                jnp.asarray(self.listener),
                vt.pos,
                vt.active & ~vt.finished,
                cfg=self.cfg,
            )
        # keep reverb feedback default when no coupling was traced? No —
        # the reference overwrites with the coupling (main.zig:785).
        # Voices calibrated via calibrate_reverb() keep their traced-IR
        # parameters instead of the atan heuristic.
        for slot, cal in self._reverb_cal.items():
            g, w = cal[0], cal[1]
            params = params._replace(
                feedback_gain=params.feedback_gain.at[slot].set(g),
                wet=params.wet.at[slot].set(w),
            )
            if len(cal) > 2:
                params = params._replace(
                    damping_alpha=params.damping_alpha.at[slot].set(cal[2])
                )
        self.params = params
        self.state = self.state._replace(
            voices=vt._replace(refl_dist_prev=jnp.full_like(vt.refl_dist_prev, jnp.nan))
        )
        return params

    def calibrate_reverb(self, handle: int | None = None,
                         n_rays: int | None = None,
                         max_bounces: int | None = None,
                         clear: bool = False,
                         per_band_damping: bool = False):
        """Replace the reference's heuristic reverb coupling
        (feedback_gain = wet = 0.5*atan(100*capped_mean_dist),
        main.zig:785-786) with parameters matched to a REAL traced
        impulse response: per voice, trace source->listener
        (models/ir.trace_ir), measure the ISO-3382 T30, and solve the FDN
        feedback gain whose decay matches plus a wet level from the IR's
        direct/reverberant split (engine/calibrate.py).

        handle=None calibrates every active voice. The calibration is
        sticky — update_acoustics re-applies it until clear=True or the
        voice's slot is recycled by a new play_sound. Returns
        {handle: (feedback_gain, wet)}.
        """
        if clear:
            if handle is None:
                self._reverb_cal.clear()
            else:
                self._reverb_cal.pop(self._handles[handle], None)
            return {}
        if self.scene is None:
            raise RuntimeError("SoundSystem has no scene")
        from ..models.ir import trace_ir
        from .calibrate import reverb_params_from_ir

        if handle is None:
            targets = [
                (h, s) for h, s in self._handles.items() if self.is_playing(h)
            ]
        else:
            targets = [(handle, self._handles[handle])]
        out = {}
        p = self.params
        for h, slot in targets:
            ir = trace_ir(
                self._scene_arrays,
                jnp.asarray(self.state.voices.pos[slot]),
                jnp.asarray(self.listener),
                cfg=self.cfg,
                n_rays=n_rays or self.cfg.rays_per_source,
                max_bounces=max_bounces or self.cfg.max_bounces,
                intersector="mxu",
                scatter="matmul",
            )
            cal = reverb_params_from_ir(
                ir.energy, cfg=self.cfg, per_band_damping=per_band_damping
            )
            cal = tuple(float(v) for v in cal)
            self._reverb_cal[slot] = cal
            g, w = cal[0], cal[1]
            p = p._replace(
                feedback_gain=p.feedback_gain.at[slot].set(g),
                wet=p.wet.at[slot].set(w),
            )
            if per_band_damping:
                if p.damping_alpha is None:
                    from ..ops.reverb import FB_LOWPASS_ALPHA

                    p = p._replace(damping_alpha=jnp.full_like(
                        p.feedback_gain, FB_LOWPASS_ALPHA
                    ))
                p = p._replace(
                    damping_alpha=p.damping_alpha.at[slot].set(cal[2])
                )
            out[h] = cal
        self.params = p
        return out

    # --- rendering ---------------------------------------------------------

    def render(self, n_samples: int) -> np.ndarray:
        """Pull n_samples of spatialized stereo (the SDL callback contract,
        zig:123-162): renders ceil(n/block) blocks, total_frames =
        n//block + 1, then sweeps finished voices."""
        n = self.cfg.block_size
        total_frames = n_samples // n + 1
        n_blocks = -(-n_samples // n)
        with profiling.span("callback"):  # cf. sound_system.zig:133-134
            out, self.state = V.render_blocks(
                self._arena,
                self.state,
                self.params,
                jnp.asarray(self.listener),
                jnp.asarray(self.orientation),
                self.hrtf_l,
                self.hrtf_r,
                0,
                total_frames,
                n_blocks,
                cfg=self.cfg,
            )
        out = np.asarray(out)
        # sweep finished voices (zig:164-171)
        vt = self.state.voices
        fin = np.asarray(vt.finished)
        if fin.any():
            self.state = self.state._replace(
                voices=vt._replace(
                    active=vt.active & ~jnp.asarray(fin),
                    finished=jnp.zeros_like(vt.finished),
                )
            )
            self._handles = {
                h: s for h, s in self._handles.items() if not fin[s]
            }
            self._live &= ~fin
        return out

    # --- checkpoint / resume ------------------------------------------------

    def save_state(self, path) -> None:
        """Serialize the full engine state (voice table, reverb, overlap,
        params, handles) to .npz — checkpoint/resume for long offline
        renders (the reference has no equivalent; SURVEY.md §5)."""
        import jax

        flat = {}
        for prefix, tree in (("state", self.state), ("params", self.params)):
            leaves, _ = jax.tree.flatten(tree)
            for i, leaf in enumerate(leaves):
                flat[f"{prefix}_{i}"] = np.asarray(leaf)
        handles = np.asarray(sorted(self._handles.items()), np.int64).reshape(-1, 2)
        np.savez_compressed(
            path,
            listener=self.listener,
            orientation=self.orientation,
            handles=handles,
            next_handle=np.int64(self._next_handle),
            **flat,
        )

    def load_state(self, path) -> None:
        import jax

        with np.load(path) as z:
            for prefix, tree_name in (("state", "state"), ("params", "params")):
                tree = getattr(self, tree_name)
                leaves, treedef = jax.tree.flatten(tree)
                new_leaves = [
                    jnp.asarray(z[f"{prefix}_{i}"]) for i in range(len(leaves))
                ]
                setattr(self, tree_name, jax.tree.unflatten(treedef, new_leaves))
            self.listener = z["listener"]
            self.orientation = z["orientation"]
            self._handles = {int(h): int(s) for h, s in z["handles"]}
            self._next_handle = int(z["next_handle"])
        # rebuild the host liveness mirror from the restored device state
        vt = self.state.voices
        self._live = np.asarray(vt.active) & ~np.asarray(vt.finished)
