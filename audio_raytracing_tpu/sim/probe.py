"""Acoustic simulation policy: environment probe, occlusion, reflections.

This is the reference's per-frame tracing block (src/main.zig:522-788)
promoted from app code into a first-class, batched, jit-compiled library
layer (SURVEY.md §1 "key boundary"). One call computes the complete
per-voice DSP parameter block — occlusion, 6-direction reflections, reverb
coupling — for *all* voices at once:

  - environment probe: 14 sphere-pattern rays from the listener
    (raycast_sphere_pattern, main.zig:1081-1096, ordered as opposite pairs),
    nearest triangle hit each, hit point backed off x0.999 (main.zig:591),
    paired-distance reverb size estimate (main.zig:580-596);
  - occlusion: listener->source and source->listener nearest-hit distances,
    occluded path length = max(0, |L-S| - (d0+d1)) (main.zig:598-668);
  - reflections: per (voice, hit point) visibility ray, reflection strength
    lam = |dot(n, d)| + max(dot(n, half), 0)^16 (Lambert + Blinn-Phong,
    main.zig:710-722), energy-binned into 6 cardinal directions weighted by
    squared listener-ray components (main.zig:723-780);
  - reverb coupling: feedback_gain = wet = 0.5*atan(100*capped_mean_dist)
    (main.zig:785-786).

Differences from the reference, all deliberate and configurable:
  - Queries are *dense* nearest-hit over all triangles instead of the
    BIH-candidate pipeline, so there is no capacity-128 truncation
    (main.zig:561) and no origin-only BIH pruning (raytracer.zig:219-315)
    — strictly more correct, and faster on TPU (regular shapes).
  - Two upstream quirks are reproduced by default and fixable via Config:
    quirk_capped_mean_overwrite (main.zig:583 assigns instead of
    accumulating, so only the last opposite pair feeds the mean) and
    quirk_zbin_ld0 (main.zig:745 tests `ld[0] > 2` where symmetry says
    `ld[2] > 0`).

All shapes are static: V = cfg.max_voices padded voices with an active
mask. Inactive voices get zero params.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..ops.intersect import nearest_hit

# 6 axis directions + 8 corners, ordered as opposite pairs
# (raycast_sphere_pattern, main.zig:1081-1096)
SPHERE_PATTERN = np.asarray(
    [
        [1, 0, 0], [-1, 0, 0],
        [0, 1, 0], [0, -1, 0],
        [0, 0, 1], [0, 0, -1],
        [1, 1, 1], [-1, -1, -1],
        [1, 1, -1], [-1, -1, 1],
        [1, -1, 1], [-1, 1, -1],
        [1, -1, -1], [-1, 1, 1],
    ],
    dtype=np.float32,
)
SPHERE_PATTERN_UNIT = SPHERE_PATTERN / np.linalg.norm(SPHERE_PATTERN, axis=1, keepdims=True)
N_PROBE = SPHERE_PATTERN.shape[0]


class EnvironmentProbe(NamedTuple):
    """Listener environment: one entry per sphere-pattern ray."""

    hit: jnp.ndarray  # (14,) bool
    dist: jnp.ndarray  # (14,) f32 (inf on miss)
    point: jnp.ndarray  # (14, 3) f32, backed off x0.999 toward listener
    normal: jnp.ndarray  # (14, 3) f32, triangle winding normal
    capped_mean_dist: jnp.ndarray  # () f32, reverb room-size estimate


class VoiceParams(NamedTuple):
    """Per-voice DSP parameter block — the tracing->DSP interface
    (cf. Playing.{occlusion, reflections, reverb.feedback_gain, wet},
    sound_system.zig:550-563)."""

    occlusion: jnp.ndarray  # (V,) f32: occluded path length
    refl_dist: jnp.ndarray  # (V, 6) f32: per-bin mean total path distance
    refl_lam: jnp.ndarray  # (V, 6) f32: per-bin mean reflection strength
    feedback_gain: jnp.ndarray  # (V,) f32
    wet: jnp.ndarray  # (V,) f32
    # (V,) f32 FDN in-loop lowpass coefficient; the reference's fixed 0.2
    # (sound_system.zig:715) unless calibrated per band
    # (SoundSystem.calibrate_reverb(per_band_damping=True)); None in
    # hand-built params means the same parity default
    damping_alpha: jnp.ndarray = None


def _safe_unit(v, eps=1e-20):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)


def environment_probe(scene_arrays, listener, cfg: Config = DEFAULT_CONFIG) -> EnvironmentProbe:
    """14-ray probe from the listener (main.zig:544-596)."""
    v0, v1, v2, normals = (scene_arrays.v0, scene_arrays.v1,
                            scene_arrays.v2, scene_arrays.normals)
    dirs = jnp.asarray(SPHERE_PATTERN_UNIT)
    origins = jnp.broadcast_to(listener, (N_PROBE, 3))
    t, idx, hit = nearest_hit(origins, dirs, v0, v1, v2)
    # missed rays carry t = inf: keep dist = inf (the paired reverb
    # estimate relies on it) but store a finite point (the oracle stores
    # zeros) so downstream reflection math can mask instead of meeting NaN
    point = jnp.where(
        hit[:, None], origins + dirs * (t * cfg.backoff)[:, None], 0.0
    )
    n = jnp.where(hit[:, None], normals[jnp.maximum(idx, 0)], 0.0)

    d_pair = t.reshape(-1, 2)  # opposite pairs (j even, j odd)
    pair_sum = d_pair[:, 0] + d_pair[:, 1]
    pair_val = 1.0 / (pair_sum * pair_sum + 2.0)  # inf-safe: -> 0
    pair_val = jnp.where(jnp.isnan(pair_val), 0.0, pair_val)
    if cfg.quirk_capped_mean_overwrite:
        capped = pair_val[-1] / N_PROBE  # only the last pair survives
    else:
        capped = jnp.sum(pair_val) / N_PROBE
    return EnvironmentProbe(hit=hit, dist=t, point=point, normal=n, capped_mean_dist=capped)


def occlusion_lengths(scene_arrays, listener, positions, cfg: Config = DEFAULT_CONFIG):
    """Occluded path length per voice (main.zig:598-668).

    positions: (V, 3). Returns (V,) f32.
    """
    v0, v1, v2 = scene_arrays.v0, scene_arrays.v1, scene_arrays.v2
    to_src = positions - listener[None, :]
    colocated = jnp.sum(to_src * to_src, axis=-1) < cfg.occlusion_colocated_eps
    # guard zero dirs for the normalize inside nearest_hit
    safe_dir = jnp.where(colocated[:, None], jnp.float32([1.0, 0.0, 0.0]), to_src)
    V = positions.shape[0]
    origins = jnp.concatenate([jnp.broadcast_to(listener, (V, 3)), positions], axis=0)
    dirs = jnp.concatenate([safe_dir, -safe_dir], axis=0)
    t, _, _ = nearest_hit(origins, dirs, v0, v1, v2)
    d0, d1 = t[:V], t[V:]
    d0 = jnp.where(colocated, 0.0, d0)
    d1 = jnp.where(colocated, 0.0, d1)
    maxdist = jnp.linalg.norm(to_src, axis=-1)
    occ = maxdist - (d0 + d1)
    occ = jnp.where(jnp.isnan(occ) | (occ < 0.0), 0.0, occ)  # inf-inf safe
    return jnp.maximum(occ, 0.0)


def reflections(scene_arrays, listener, positions, probe: EnvironmentProbe,
                cfg: Config = DEFAULT_CONFIG):
    """6-direction binned early reflections per voice (main.zig:670-780).

    Returns (refl_dist (V,6), refl_lam (V,6)); bin order
    [x+, x-, y+, y-, z+, z-].
    """
    v0, v1, v2 = scene_arrays.v0, scene_arrays.v1, scene_arrays.v2
    V = positions.shape[0]
    H = N_PROBE

    # (V, H, 3): source -> probe hit point
    d_vh = probe.point[None, :, :] - positions[:, None, :]
    dist2 = jnp.linalg.norm(d_vh, axis=-1)  # (V, H)
    near = (dist2 * dist2) <= cfg.reflection_dir_eps

    # visibility rays (flattened batch); degenerate dirs guarded
    safe = jnp.where(near[..., None], jnp.float32([1.0, 0.0, 0.0]), d_vh)
    t_vis, _, _ = nearest_hit(
        jnp.broadcast_to(positions[:, None, :], (V, H, 3)).reshape(-1, 3),
        safe.reshape(-1, 3),
        v0, v1, v2,
    )
    t_vis = t_vis.reshape(V, H)
    blocked = (~near) & (t_vis <= dist2)  # any hit at or before the point
    visible = probe.hit[None, :] & ~blocked

    d_hat = _safe_unit(d_vh)
    to_listener = _safe_unit(listener[None, :] - positions)  # (V, 3)
    half = _safe_unit(d_hat + to_listener[:, None, :])
    n = probe.normal[None, :, :]
    lam = jnp.abs(jnp.sum(n * d_hat, axis=-1)) + jnp.power(
        jnp.maximum(jnp.sum(n * half, axis=-1), 0.0), cfg.specular_exponent
    )
    total_dist = dist2 + probe.dist[None, :]  # (V, H)

    ld = listener[None, None, :] - probe.point[None, :, :]  # (1, H, 3)
    parts = ld * ld  # squared components
    pos_x = ld[..., 0] > 0
    pos_y = ld[..., 1] > 0
    pos_z = (ld[..., 0] > 2) if cfg.quirk_zbin_ld0 else (ld[..., 2] > 0)

    w = jnp.where(visible, 1.0, 0.0)
    # select (not multiply) the masked quantities: probe.dist is inf on
    # missed rays and 0 * inf = NaN would poison the bin sums (open scenes)
    tdist = jnp.where(visible, total_dist, 0.0)
    lam = jnp.where(visible, lam, 0.0)

    def bin_pair(part, pos_mask):
        wp = w * part
        w_pos = jnp.sum(wp * pos_mask, axis=1)
        w_neg = jnp.sum(wp * (~pos_mask), axis=1)
        d_pos = jnp.sum(wp * pos_mask * tdist, axis=1)
        d_neg = jnp.sum(wp * (~pos_mask) * tdist, axis=1)
        l_pos = jnp.sum(wp * pos_mask * lam, axis=1)
        l_neg = jnp.sum(wp * (~pos_mask) * lam, axis=1)
        return (w_pos, d_pos, l_pos), (w_neg, d_neg, l_neg)

    bins = []
    for part, mask in (
        (parts[..., 0], pos_x),
        (parts[..., 1], pos_y),
        (parts[..., 2], pos_z),
    ):
        p, nn = bin_pair(part, jnp.broadcast_to(mask, (V, H)))
        bins.append(p)
        bins.append(nn)

    weight = jnp.stack([b[0] for b in bins], axis=1)  # (V, 6)
    dist_sum = jnp.stack([b[1] for b in bins], axis=1)
    lam_sum = jnp.stack([b[2] for b in bins], axis=1)
    nonzero = weight > 0
    refl_dist = jnp.where(nonzero, dist_sum / jnp.where(nonzero, weight, 1.0), 0.0)
    refl_lam = jnp.where(nonzero, lam_sum / jnp.where(nonzero, weight, 1.0), 0.0)
    return refl_dist, refl_lam


@partial(jax.jit, static_argnames=("cfg",))
def acoustic_update(scene_arrays, listener, positions, active,
                    cfg: Config = DEFAULT_CONFIG) -> VoiceParams:
    """Full per-frame acoustic parameter update for all voices.

    The batched equivalent of the mutex-guarded block main.zig:522-788.
    positions: (V, 3); active: (V,) bool mask for the padded voice table.
    """
    probe = environment_probe(scene_arrays, listener, cfg)
    occ = occlusion_lengths(scene_arrays, listener, positions, cfg)
    refl_dist, refl_lam = reflections(scene_arrays, listener, positions, probe, cfg)
    coupling = cfg.reverb_coupling_scale * jnp.arctan(
        cfg.reverb_coupling_rate * probe.capped_mean_dist
    )
    V = positions.shape[0]
    act = active.astype(jnp.float32)
    from ..ops.reverb import FB_LOWPASS_ALPHA

    return VoiceParams(
        occlusion=occ * act,
        refl_dist=refl_dist * act[:, None],
        refl_lam=refl_lam * act[:, None],
        feedback_gain=jnp.broadcast_to(coupling, (V,)) * act,
        wet=jnp.broadcast_to(coupling, (V,)) * act,
        damping_alpha=jnp.full((V,), FB_LOWPASS_ALPHA, jnp.float32),
    )
