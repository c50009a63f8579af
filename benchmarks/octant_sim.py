#!/usr/bin/env python
"""Host-side feasibility study for direction-octant front-face culling on
the strict-metric scene (world.obj, the fused resident kernel).

Questions answered before any kernel work (r3 VERDICT item 1a/1b):
  1. Is world.obj closed one-sided as seen by the tracer — i.e. is every
     accepted nearest hit front-facing (n . d < 0 with the GEOMETRIC
     normal, pre-flip), and is every blocking shadow segment detectable
     by a front crossing alone?
  2. Per-octant cullability: for ray-direction octant s (sign bits), a
     triangle can produce a front-facing hit only if some d in the octant
     has n . d < 0, i.e. NOT (n_x s_x >= 0 and n_y s_y >= 0 and
     n_z s_z >= 0). How many of the 16 groups of 8 survive per octant
     when triangles are sorted by their 8-bit octant-visibility mask?
  3. Row purity: the kernel tests per (1, 128)-lane row; the cull only
     engages when all 128 lanes share an octant. Replaying the exact
     specular bounce geometry, what fraction of (row, bounce) path passes
     and shadow passes are pure, and what is the resulting expected
     fraction of group tests actually run?

Prints one JSON line. CPU-only (forces the CPU backend).
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from audio_raytracing_tpu.config import DEFAULT_CONFIG  # noqa: E402
from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted  # noqa: E402
from audio_raytracing_tpu.models.scene import Scene  # noqa: E402


def octant_visibility_mask(normals: np.ndarray) -> np.ndarray:
    """(T,) uint8: bit o set iff octant o (sign bits sx=o&1 -> x<0 ...,
    matching the kernel's (dx<0) + 2(dy<0) + 4(dz<0) id) can front-face
    the triangle. Octant o holds directions with d_k < 0 where bit k set,
    d_k > 0 otherwise; min over the octant of n . d is < 0 unless
    n_k s_k >= 0 for all k (s_k = -1 if bit set else +1). Degenerate
    (zero-normal padding) triangles get mask 0: culled everywhere."""
    T = normals.shape[0]
    mask = np.zeros(T, np.uint8)
    for o in range(8):
        s = np.array([-1.0 if o & 1 else 1.0,
                      -1.0 if o & 2 else 1.0,
                      -1.0 if o & 4 else 1.0])
        back = np.all(normals * s >= 0.0, axis=1)
        mask |= (~back).astype(np.uint8) << o
    return mask


def main():
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    arrays = scene.device_arrays()
    v0 = np.asarray(arrays.v0)
    v1 = np.asarray(arrays.v1)
    v2 = np.asarray(arrays.v2)
    normals = np.asarray(arrays.normals)
    T = v0.shape[0]

    # --- 2. per-octant cullability ------------------------------------
    vis = octant_visibility_mask(normals)
    degenerate = (np.linalg.norm(normals, axis=1) < 0.5)
    surv = [int(((vis >> o) & 1).sum()) for o in range(8)]
    # group-level (8 tris/group): sort by visibility mask, then count
    # groups with any survivor per octant
    order = np.argsort(vis, kind="stable")
    vis_sorted = vis[order]
    Tp = -(-T // 8) * 8
    vis_pad = np.zeros(Tp, np.uint8)
    vis_pad[:T] = vis_sorted
    gmask = vis_pad.reshape(-1, 8)
    group_any = [(np.any((gmask >> o) & 1, axis=1)).sum() for o in range(8)]
    n_groups = Tp // 8

    # --- 1 & 3. replay the bounce geometry (MT intersection, numpy) ----
    R = 1 << 15
    B = 8
    dirs = np.asarray(fibonacci_sphere_sorted(R), np.float64)
    src = np.array([1.0, 0.3, 0.5])
    lst = np.array([-1.0, 0.0, -0.5])
    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)

    def nearest_hit(o, d):
        """Two-sided MT over all T; returns (t, tri_idx) with t=inf miss."""
        eps = 1e-6
        pvec = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("rtk,tk->rt", pvec, e1)
        inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("rtk,rtk->rt", tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("rk,rtk->rt", d, qvec) * inv if d.ndim == 2 else None
        v = np.einsum("rtk,rk->rt", qvec, d) * inv
        t = np.einsum("rtk,tk->rt", qvec, e2) * inv
        ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
              & (t >= eps))
        t = np.where(ok, t, np.inf)
        idx = np.argmin(t, axis=1)
        return t[np.arange(t.shape[0]), idx], idx

    def seg_cross(a, b):
        """For segments a->b: (front_cross_any, any_cross_any)."""
        o = a
        d = b - a
        eps = 1e-6
        pvec = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("rtk,tk->rt", pvec, e1)
        inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("rtk,rtk->rt", tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("rtk,rk->rt", qvec, d) * inv
        t = np.einsum("rtk,tk->rt", qvec, e2) * inv
        ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
              & (t >= eps) & (t <= 1.0))
        nd = np.einsum("rk,tk->rt", d, normals.astype(np.float64))
        front = ok & (nd < 0)
        return front.any(axis=1), ok.any(axis=1)

    o = np.broadcast_to(src, (R, 3)).copy()
    d = dirs.copy()
    alive = np.ones(R, bool)
    back_hits = 0
    total_hits = 0
    shadow_front_mismatch = 0
    shadow_total = 0
    rows = R // 128
    path_pure = np.zeros(B, np.int64)
    shadow_pure = np.zeros(B, np.int64)
    path_groups_run = 0.0
    shadow_groups_run = 0.0
    group_tot = 0.0

    def row_octants(vec):
        """(rows,) octant id if the 128-lane row is pure else -1."""
        oc = ((vec[:, 0] < 0).astype(int) + 2 * (vec[:, 1] < 0)
              + 4 * (vec[:, 2] < 0)).reshape(rows, 128)
        pure = (oc.min(axis=1) == oc.max(axis=1))
        return np.where(pure, oc[:, 0], -1)

    for b in range(B):
        t, idx = nearest_hit(o, d)
        hit = np.isfinite(t) & alive
        nd = np.einsum("rk,rk->r", d, normals[idx].astype(np.float64))
        back_hits += int((hit & (nd > 0)).sum())
        total_hits += int(hit.sum())

        # path-pass purity + expected group tests for THIS bounce
        ro = row_octants(d)
        path_pure[b] = (ro >= 0).sum()
        for r in range(rows):
            if ro[r] >= 0:
                path_groups_run += group_any[ro[r]]
            else:
                path_groups_run += n_groups
        group_tot += rows * n_groups

        t_safe = np.where(hit, t, 0.0)
        v = o + d * t_safe[:, None] * cfg.backoff
        # shadow pass: listener -> hit vertex
        w = v - lst
        front_any, any_any = seg_cross(np.broadcast_to(lst, (R, 3)).copy(), v)
        m = hit
        shadow_front_mismatch += int((front_any[m] != any_any[m]).sum())
        shadow_total += int(m.sum())
        so = row_octants(w)
        shadow_pure[b] = (so >= 0).sum()
        for r in range(rows):
            if so[r] >= 0:
                shadow_groups_run += group_any[so[r]]
            else:
                shadow_groups_run += n_groups

        # specular reflect
        n = normals[idx].astype(np.float64)
        flip = np.sign(1e-30 - np.einsum("rk,rk->r", n, d))[:, None]
        n = n * flip
        d_new = d - 2 * np.einsum("rk,rk->r", n, d)[:, None] * n
        d = np.where(hit[:, None], d_new, d)
        o = v
        alive = alive & hit

    out = {
        "triangles": T,
        "padded_groups": n_groups,
        "degenerate": int(degenerate.sum()),
        "per_octant_surviving_tris": surv,
        "per_octant_surviving_groups_visorted": [int(g) for g in group_any],
        "mean_group_survival_pct": 100.0 * float(np.mean(group_any)) / n_groups,
        "back_face_nearest_hits": back_hits,
        "total_nearest_hits": total_hits,
        "shadow_front_vs_any_mismatches": shadow_front_mismatch,
        "shadow_segments": shadow_total,
        "path_pure_rows_by_bounce": [int(x) / rows for x in path_pure],
        "shadow_pure_rows_by_bounce": [int(x) / rows for x in shadow_pure],
        "expected_path_group_fraction": path_groups_run / group_tot,
        "expected_shadow_group_fraction": shadow_groups_run / group_tot,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
