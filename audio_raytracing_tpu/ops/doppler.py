"""Doppler fractional-delay resampling from a packed sample arena.

The reference fetches source samples at an offset of `44100 * d / c` behind
the write cursor, with the distance d lerped from the previous block's
value across the callback (src/sound_system.zig:248-272 repeat path,
355-374 one-shot path, 787-845 reflection variants) — distance changes
shift the read position, giving doppler "for free".

TPU design: all loaded sounds live concatenated in one device-resident 1-D
arena (`offset`/`length` per voice), so the per-sample fetch is a single
batched gather over (V voices x N samples) — no dynamic shapes, no host
round-trips. The reference's formula quirks are reproduced exactly and
flagged inline:
  * repeat direct adds +len, reflections +4*len headroom before the modulo
    (zig:259-261, 804-806);
  * repeat lerps (s[k], s[k-1], beta) — i.e. *toward the earlier sample*
    (zig:264-268);
  * one-shot direct uses lerp(next, cur, 1-beta) but one-shot reflections
    use lerp(next, cur, beta) (zig:368-372 vs 839-843) — an upstream
    inconsistency kept for parity;
  * one-shot clamps foff at 0 (zig:365) — we additionally clamp the repeat
    path's foff at 0 (the reference would invoke UB casting a negative
    float to usize, reachable only for sources hundreds of meters away at
    playback start).
"""

from __future__ import annotations

import jax.numpy as jnp


def _lerped_distance(prev_dist, dist, frame_index, total_frames, n: int):
    """d_i = lerp(prev, cur, (N*frame_index + i) / (N*total_frames)),
    zig:253-258. prev_dist/dist: (...,); returns (..., n)."""
    i = jnp.arange(n, dtype=jnp.float32)
    frac = (n * frame_index + i) / (n * total_frames)
    return prev_dist[..., None] + (dist[..., None] - prev_dist[..., None]) * frac


def fetch_repeat(arena, offset, length, cursor, prev_dist, dist,
                 frame_index, total_frames, n: int, sample_rate: float,
                 speed_of_sound: float, headroom_mult: int = 1):
    """Looping fetch (zig:248-268 direct, 787-815 reflections).

    arena: (A,) f32; offset/length/cursor: (V,) int32; prev_dist/dist: (V,).
    headroom_mult: 1 for the direct path (+len), 4 for reflections (+4*len).
    Returns (V, n) samples.
    """
    d = _lerped_distance(prev_dist, dist, frame_index, total_frames, n)
    lenf = length.astype(jnp.float32)[:, None]
    foff = (
        cursor.astype(jnp.float32)[:, None]
        + headroom_mult * lenf
        - sample_rate * d / speed_of_sound
    )
    foff = jnp.maximum(foff, 0.0)  # guard: reference UB for negative offsets
    ioff = foff.astype(jnp.int32)
    beta = foff - jnp.trunc(foff)
    i = jnp.arange(n, dtype=jnp.int32)[None, :]
    L = jnp.maximum(length, 1)[:, None]
    k0 = jnp.mod(ioff + i, L)
    k1 = jnp.mod(ioff + i - 1, L)
    s0 = arena[offset[:, None] + k0]
    s1 = arena[offset[:, None] + k1]
    return s0 + beta * (s1 - s0)  # lerp toward the *earlier* sample (zig:264)


def fetch_oneshot(arena, offset, length, cursor, prev_dist, dist,
                  frame_index, total_frames, n: int, sample_rate: float,
                  speed_of_sound: float, reflection_beta: bool = False):
    """One-shot fetch (zig:355-372 direct, 817-845 reflections).

    Samples at indices >= end (= min(cursor + n, length)) read as 0, and
    positions k >= end - begin produce no output (masked to 0 here; the
    caller also masks EQ stepping with `valid`).
    reflection_beta selects the reflection variant's lerp factor
    (beta instead of 1-beta — see module docstring).
    Returns (samples (V, n), valid (V, n) bool).
    """
    d = _lerped_distance(prev_dist, dist, frame_index, total_frames, n)
    foff = cursor.astype(jnp.float32)[:, None] - sample_rate * d / speed_of_sound
    foff = jnp.maximum(foff, 0.0)
    ioff = foff.astype(jnp.int32)
    beta = foff - jnp.trunc(foff)

    begin = jnp.minimum(cursor, length)
    end = jnp.minimum(cursor + n, length)
    k = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = k < (end - begin)[:, None]

    idx_cur = ioff + k
    idx_next = idx_cur + 1
    in_cur = idx_cur < end[:, None]
    in_next = idx_next < end[:, None]
    safe_cur = jnp.clip(idx_cur, 0, jnp.maximum(length - 1, 0)[:, None])
    safe_next = jnp.clip(idx_next, 0, jnp.maximum(length - 1, 0)[:, None])
    s_cur = jnp.where(in_cur, arena[offset[:, None] + safe_cur], 0.0)
    s_next = jnp.where(in_next, arena[offset[:, None] + safe_next], 0.0)
    t = beta if reflection_beta else (1.0 - beta)
    out = s_next + t * (s_cur - s_next)  # lerp(next, cur, t)
    return jnp.where(valid, out, 0.0), valid
