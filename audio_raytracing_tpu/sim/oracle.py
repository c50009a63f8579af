"""Pure-NumPy reference oracle for the acoustic simulation policy.

A scalar, loop-based port of the reference's per-frame tracing semantics
(src/main.zig:522-788) with dense nearest-hit queries — the "reference CPU
tracer" that the batched TPU ops in sim/probe.py are differentially tested
against (the strategy of the reference's own fuzz test,
raytracer.zig:568-628, extended to the whole policy per SURVEY.md §4).

Slow on purpose: clarity over speed; tests only.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from .probe import SPHERE_PATTERN


def ray_triangle(src, dir_, v0, v1, v2, eps=1e-6):
    """main.zig:1041-1079 semantics; returns t (along unit dir) or None."""
    src = np.asarray(src, np.float64)
    d = np.asarray(dir_, np.float64)
    d = d / math.sqrt(float(d @ d))
    a, b, c = (np.asarray(v, np.float64) for v in (v0, v1, v2))
    ab, ac = b - a, c - a
    h = np.cross(d, ac)
    det = float(ab @ h)
    if -eps < det < eps:
        return None
    f = 1.0 / det
    s = src - a
    u = f * float(s @ h)
    if u < 0.0 or u > 1.0:
        return None
    q = np.cross(s, ab)
    v = f * float(d @ q)
    if v < 0.0 or u + v > 1.0:
        return None
    t = f * float(ac @ q)
    if t < eps:
        return None
    return t


def nearest(src, dir_, tris):
    best_t, best_i = math.inf, -1
    for i, (a, b, c) in enumerate(tris):
        t = ray_triangle(src, dir_, a, b, c)
        if t is not None and t < best_t:
            best_t, best_i = t, i
    return best_t, best_i


def tri_normal(a, b, c):
    n = np.cross(np.asarray(b, np.float64) - a, np.asarray(c, np.float64) - a)
    return n / np.linalg.norm(n)


def acoustic_update_oracle(tris, listener, positions, cfg: Config = DEFAULT_CONFIG):
    """Returns dict with probe + per-voice params, reference semantics.

    tris: (T, 3, 3); listener: (3,); positions: (V, 3).
    """
    listener = np.asarray(listener, np.float64)
    positions = np.asarray(positions, np.float64)
    V = positions.shape[0]

    # --- environment probe (main.zig:544-596) ---
    hit_dists, hit_points, hit_normals, hits = [], [], [], []
    capped_mean = 0.0
    tmp = 0.0
    for j, raw in enumerate(SPHERE_PATTERN):
        d = raw / np.linalg.norm(raw)
        t, i = nearest(listener, d, tris)
        if j % 2 == 0:
            tmp = t
        else:
            val = 1.0 / ((tmp + t) ** 2 + 2.0)
            if cfg.quirk_capped_mean_overwrite:
                capped_mean = val
            else:
                capped_mean += val
        ok = i >= 0
        hits.append(ok)
        hit_dists.append(t)
        hit_points.append(listener + d * (t * cfg.backoff) if ok else np.zeros(3))
        hit_normals.append(tri_normal(*tris[i]) if ok else np.zeros(3))
    capped_mean /= len(SPHERE_PATTERN)

    # --- occlusion (main.zig:598-668) ---
    occlusion = np.zeros(V)
    for v in range(V):
        to_src = positions[v] - listener
        if float(to_src @ to_src) < cfg.occlusion_colocated_eps:
            d0 = d1 = 0.0
        else:
            d0, _ = nearest(listener, to_src, tris)
            d1, _ = nearest(positions[v], -to_src, tris)
        maxdist = float(np.linalg.norm(to_src))
        occlusion[v] = max(0.0, maxdist - (d0 + d1))

    # --- reflections (main.zig:670-780) ---
    refl_dist = np.zeros((V, 6))
    refl_lam = np.zeros((V, 6))
    for v in range(V):
        weight = np.zeros(6)
        dsum = np.zeros(6)
        lsum = np.zeros(6)
        for j in range(len(SPHERE_PATTERN)):
            if not hits[j]:
                continue
            point, normal, dist = hit_points[j], hit_normals[j], hit_dists[j]
            dir_ = point - positions[v]
            dist2 = float(np.linalg.norm(dir_))
            if float(dir_ @ dir_) > cfg.reflection_dir_eps:
                t, i = nearest(positions[v], dir_, tris)
                if i >= 0 and t <= dist2:
                    continue  # blocked
            ld = listener - point
            total_dist = dist2 + dist
            d_hat = dir_ / max(dist2, 1e-20)
            to_l = listener - positions[v]
            to_l = to_l / max(np.linalg.norm(to_l), 1e-20)
            half = d_hat + to_l
            half = half / max(np.linalg.norm(half), 1e-20)
            lam = abs(float(normal @ d_hat)) + max(float(normal @ half), 0.0) ** cfg.specular_exponent
            xpart, ypart, zpart = ld[0] ** 2, ld[1] ** 2, ld[2] ** 2
            pairs = [
                (0 if ld[0] > 0 else 1, xpart),
                (2 if ld[1] > 0 else 3, ypart),
            ]
            z_test = (ld[0] > 2) if cfg.quirk_zbin_ld0 else (ld[2] > 0)
            pairs.append((4 if z_test else 5, zpart))
            for b, part in pairs:
                weight[b] += part
                dsum[b] += part * total_dist
                lsum[b] += part * lam
        for b in range(6):
            if weight[b] > 0:
                refl_dist[v, b] = dsum[b] / weight[b]
                refl_lam[v, b] = lsum[b] / weight[b]

    coupling = cfg.reverb_coupling_scale * math.atan(cfg.reverb_coupling_rate * capped_mean)
    return {
        "hit": np.asarray(hits),
        "dist": np.asarray(hit_dists),
        "point": np.asarray(hit_points),
        "normal": np.asarray(hit_normals),
        "capped_mean_dist": capped_mean,
        "occlusion": occlusion,
        "refl_dist": refl_dist,
        "refl_lam": refl_lam,
        "feedback_gain": np.full(V, coupling),
        "wet": np.full(V, coupling),
    }
