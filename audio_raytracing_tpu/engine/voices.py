"""Voice table + jittable 128-sample block renderer.

This is the reference's audio-callback hot path (callback ->
buildAmbisonicReverb -> rotateAmbisonic -> ambisonicToStereo,
src/sound_system.zig:123-524) redesigned as one pure function over a
static-shape voice table:

  * voices live in a fixed table of cfg.max_voices slots (active mask), so
    every block compiles once and reruns forever — the reference's
    AutoArrayHashMap iteration becomes masked SIMD over the V axis;
  * all loaded sounds are packed in a single device-resident sample arena
    (offset/length per voice) — the doppler fetches are batched gathers;
  * the only sequential work per block is two tiny linear recurrences (EQ
    state and the reverb one-pole), everything else is data-parallel;
  * state is a pytree threaded functionally — the "triple-buffer mailbox
    instead of a mutex" the reference wishes for in its own comment
    (src/main.zig:518-521) falls out of functional updates for free.

Per-voice semantics match buildAmbisonicReverb step by step (SH encode ->
lazy prev-dist init -> EQ gains -> doppler direct fetch -> reverb feed ->
direct SH accumulate -> 6 doppler-resampled reflections -> one-shot finish
at len + 65536 -> per-voice reverb, wet into W -> prev-dist roll on the
last frame). The one deliberate divergence is the per-voice-independent
reverb documented in ops/reverb.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..ops.ambisonic import ambisonic_to_stereo, rotate_ambisonic, sh_encode
from ..ops.doppler import fetch_oneshot, fetch_repeat
from ..ops.eq import eq_apply_block, eq_gains
from ..ops.reverb import ReverbState, reverb_apply_block, reverb_init
from ..sim.probe import VoiceParams

# reflection bin order [x+, x-, y+, y-, z+, z-] -> ambisonic channel and sign
# (sound_system.zig:279-345: x -> ch1, y -> ch2, z -> ch3; +/- sign)
REFL_CHANNELS = np.asarray([1, 1, 2, 2, 3, 3], np.int32)
REFL_SIGNS = np.asarray([1.0, -1.0, 1.0, -1.0, 1.0, -1.0], np.float32)


class VoiceTable(NamedTuple):
    """SoA voice table (cf. Playing, sound_system.zig:550-563)."""

    active: jnp.ndarray  # (V,) bool
    finished: jnp.ndarray  # (V,) bool
    sound_offset: jnp.ndarray  # (V,) int32 into the arena
    sound_length: jnp.ndarray  # (V,) int32
    pos: jnp.ndarray  # (V, 3) f32
    gain: jnp.ndarray  # (V,) f32
    cursor: jnp.ndarray  # (V,) int32
    repeat: jnp.ndarray  # (V,) bool
    prev_dist: jnp.ndarray  # (V,) f32; NaN = unset (lazy init, zig:213)
    refl_dist_prev: jnp.ndarray  # (V, 6) f32; NaN = unset (zig:214-225)
    eq_z: jnp.ndarray  # (V, 4) f32 EQ filter state


class EngineState(NamedTuple):
    voices: VoiceTable
    reverb: ReverbState
    overlap: jnp.ndarray  # (block, 2) f32 convolution carry (zig:41, 156-160)


def init_state(cfg: Config = DEFAULT_CONFIG) -> EngineState:
    V = cfg.max_voices
    return EngineState(
        voices=VoiceTable(
            active=jnp.zeros(V, bool),
            finished=jnp.zeros(V, bool),
            sound_offset=jnp.zeros(V, jnp.int32),
            sound_length=jnp.ones(V, jnp.int32),
            pos=jnp.zeros((V, 3), jnp.float32),
            gain=jnp.ones(V, jnp.float32),
            cursor=jnp.zeros(V, jnp.int32),
            repeat=jnp.zeros(V, bool),
            prev_dist=jnp.full(V, jnp.nan, jnp.float32),
            refl_dist_prev=jnp.full((V, 6), jnp.nan, jnp.float32),
            eq_z=jnp.zeros((V, 4), jnp.float32),
        ),
        reverb=reverb_init(V),
        overlap=jnp.zeros((cfg.block_size, 2), jnp.float32),
    )


def _render_block_impl(
    arena,
    state: EngineState,
    params: VoiceParams,
    listener,
    orientation,
    hrtf_l,
    hrtf_r,
    frame_index,
    total_frames,
    cfg: Config = DEFAULT_CONFIG,
):
    """Render one block for all voices. Returns (stereo (block, 2), state)."""
    N = cfg.block_size
    v = state.voices
    V = v.active.shape[0]
    act = v.active & ~v.finished
    actf = act.astype(jnp.float32)

    # --- SH encode + distances (zig:190-212) ---
    rel = v.pos - listener[None, :]
    sh, dist = sh_encode(rel)  # (V, 4), (V,)

    # --- lazy prev-dist init (zig:213-225) ---
    prev_dist = jnp.where(jnp.isnan(v.prev_dist), dist, v.prev_dist)
    refl_prev = jnp.where(jnp.isnan(v.refl_dist_prev), params.refl_dist, v.refl_dist_prev)

    # --- attenuation EQ gains (zig:229-238) ---
    gains = eq_gains(dist, params.occlusion, cfg.air_absorption)

    fi = jnp.asarray(frame_index, jnp.float32)
    tf = jnp.asarray(total_frames, jnp.float32)

    # --- direct-path doppler fetch: both variants, per-voice select ---
    rep_s = fetch_repeat(
        arena, v.sound_offset, v.sound_length, v.cursor, prev_dist, dist,
        fi, tf, N, cfg.sample_rate, cfg.speed_of_sound, headroom_mult=1,
    )
    one_s, one_valid = fetch_oneshot(
        arena, v.sound_offset, v.sound_length, v.cursor, prev_dist, dist,
        fi, tf, N, cfg.sample_rate, cfg.speed_of_sound, reflection_beta=False,
    )
    repeat = v.repeat[:, None]
    direct = jnp.where(repeat, rep_s, one_s)
    step_mask = jnp.where(repeat, True, one_valid) & act[:, None]

    # --- reverb feed (zig:270, 373) ---
    reverb_in = direct * (v.gain / (dist + 2.0) / (params.occlusion + 2.0))[:, None]
    reverb_in = reverb_in * actf[:, None]

    # --- direct SH accumulate through the EQ (zig:272, 374) ---
    eq_out, eq_z = eq_apply_block(direct, v.eq_z, gains, step_mask)
    eq_out = eq_out * step_mask.astype(jnp.float32)
    amb = jnp.einsum("vc,vn->cn", sh * (v.gain * actf)[:, None], eq_out, precision=jax.lax.Precision.HIGHEST)  # (4, N)

    # --- 6 early reflections per voice (zig:279-345 / 377-450) ---
    B = 6
    off6 = jnp.repeat(v.sound_offset, B)
    len6 = jnp.repeat(v.sound_length, B)
    cur6 = jnp.repeat(v.cursor, B)
    rep_r = fetch_repeat(
        arena, off6, len6, cur6, refl_prev.reshape(-1), params.refl_dist.reshape(-1),
        fi, tf, N, cfg.sample_rate, cfg.speed_of_sound, headroom_mult=4,
    )
    one_r, _ = fetch_oneshot(
        arena, off6, len6, cur6, refl_prev.reshape(-1), params.refl_dist.reshape(-1),
        fi, tf, N, cfg.sample_rate, cfg.speed_of_sound, reflection_beta=True,
    )
    refl_s = jnp.where(jnp.repeat(v.repeat, B)[:, None], rep_r, one_r).reshape(V, B, N)
    refl_scale = (
        v.gain[:, None] * params.refl_lam / (params.refl_dist + 1.0) * actf[:, None]
    )  # (V, B)
    refl = refl_s * refl_scale[:, :, None]  # (V, B, N)
    amb = amb.at[0].add(jnp.sum(refl, axis=(0, 1)))
    signed = refl * REFL_SIGNS[None, :, None]
    for ch in (1, 2, 3):
        amb = amb.at[ch].add(jnp.sum(signed[:, REFL_CHANNELS == ch], axis=(0, 1)))

    # --- per-voice reverb, wet into W (zig:461-466) ---
    rv_out, reverb_state = reverb_apply_block(
        reverb_in, state.reverb, params.feedback_gain,
        getattr(params, "damping_alpha", None),
    )
    amb = amb.at[0].add(jnp.einsum("v,vn->n", params.wet * actf, rv_out, precision=jax.lax.Precision.HIGHEST))

    # --- cursor advance + one-shot finish (zig:347, 453-458) ---
    cursor = jnp.where(act, v.cursor + N, v.cursor)
    finished = v.finished | (
        act & ~v.repeat & (cursor >= v.sound_length + cfg.finish_grace_samples)
    )

    # --- prev-dist roll on the last frame (zig:468-476) ---
    is_last = (frame_index + 1) == total_frames
    new_prev = jnp.where(is_last, dist, prev_dist)
    new_refl_prev = jnp.where(is_last, params.refl_dist, refl_prev)

    # --- rotate + HRTF decode + overlap-add (zig:480-524, 142-160) ---
    amb = rotate_ambisonic(amb, orientation)
    conv = ambisonic_to_stereo(amb, hrtf_l, hrtf_r)  # (2N-1, 2)
    out = conv[:N] + state.overlap
    carry = jnp.pad(conv[N:], ((0, 1), (0, 0)))
    # optional output stage (off by default for reference parity)
    if cfg.master_gain != 1.0:
        out = out * cfg.master_gain
    if cfg.limiter:
        out = jnp.tanh(out)

    new_state = EngineState(
        voices=VoiceTable(
            active=v.active,
            finished=finished,
            sound_offset=v.sound_offset,
            sound_length=v.sound_length,
            pos=v.pos,
            gain=v.gain,
            cursor=cursor,
            repeat=v.repeat,
            prev_dist=new_prev,
            refl_dist_prev=new_refl_prev,
            eq_z=eq_z,
        ),
        reverb=reverb_state,
        overlap=carry,
    )
    return out, new_state


render_block = partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))(
    _render_block_impl
)


@partial(jax.jit, static_argnames=("cfg", "n_blocks"), donate_argnames=("state",))
def render_blocks(
    arena,
    state: EngineState,
    params: VoiceParams,
    listener,
    orientation,
    hrtf_l,
    hrtf_r,
    first_frame_index,
    total_frames,
    n_blocks: int,
    cfg: Config = DEFAULT_CONFIG,
):
    """Render n_blocks consecutive blocks in one compiled scan.

    One device dispatch for n_blocks * block_size samples — the throughput
    path for offline rendering and for amortizing host->device dispatch
    latency in streaming use. Semantically identical to n_blocks calls of
    render_block with frame_index = first_frame_index + i.
    Returns (stereo (n_blocks * block, 2), state).
    """

    def step(st, i):
        out, st = _render_block_impl(
            arena, st, params, listener, orientation, hrtf_l, hrtf_r,
            first_frame_index + i, total_frames, cfg=cfg,
        )
        return st, out

    state, outs = jax.lax.scan(step, state, jnp.arange(n_blocks))
    return outs.reshape(n_blocks * cfg.block_size, 2), state
