#!/usr/bin/env python
"""Host-side feasibility study for BOUNCE-MAJOR (windowed) histogram
binning in the fused kernel (r3 VERDICT item 1 candidate (c)).

The idea: if the delay bins of one (1, 128)-lane row at one bounce span
a narrow window, the coarse one-hot could shrink from the full
n_coarse = 256 rows to a small per-row window at a dynamic (8-aligned)
offset — cutting the dominant a-side build. The feasibility question is
the SPREAD: per (row, bounce), how wide is max(bin) - min(bin) over the
row's visible lanes? The kernel's rows are 128 consecutive
octant-major-sorted fibonacci directions (the exact production order),
replayed here through the same specular bounce geometry as
octant_sim.py (numpy MT, world.obj, 2^15 rays x 8 bounces).

A window variant must also still route lanes that MISS the window
(occluded lanes ride the sentinel; they zero their payload and need no
window, but a visible lane outside the window would be dropped), so the
decision number is the fraction of rows whose visible spread fits W
coarse rows for W in {2, 4, 8, 16} (W * 128 bins).

Prints one JSON line. CPU-only.
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


def main():
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    arrays = scene.device_arrays()
    v0 = np.asarray(arrays.v0, np.float64)
    v1 = np.asarray(arrays.v1, np.float64)
    v2 = np.asarray(arrays.v2, np.float64)
    normals = np.asarray(arrays.normals, np.float64)
    e1, e2 = v1 - v0, v2 - v0

    R, B, LANES = 1 << 15, 8, 128
    dirs = np.asarray(fibonacci_sphere_sorted(R), np.float64)
    src = np.array([1.0, 0.3, 0.5])
    lst = np.array([-1.0, 0.0, -0.5])
    spm_bps = cfg.samples_per_meter * cfg.ir_bins_per_sample
    n_bins = cfg.ir_n_bins

    def nearest_hit(o, d):
        eps = 1e-6
        pvec = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("rtk,tk->rt", pvec, e1)
        inv = np.where(np.abs(det) > 1e-12,
                       1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("rtk,rtk->rt", tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("rtk,rk->rt", qvec, d) * inv
        t = np.einsum("rtk,tk->rt", qvec, e2) * inv
        ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
              & (t >= eps))
        t = np.where(ok, t, np.inf)
        idx = np.argmin(t, axis=1)
        return t[np.arange(t.shape[0]), idx], idx

    def blocked(a, b):
        o, d = a, b - a
        eps = 1e-6
        pvec = np.cross(d[:, None, :], e2[None, :, :])
        det = np.einsum("rtk,tk->rt", pvec, e1)
        inv = np.where(np.abs(det) > 1e-12,
                       1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("rtk,rtk->rt", tvec, pvec) * inv
        qvec = np.cross(tvec, e1[None, :, :])
        v = np.einsum("rtk,rk->rt", qvec, d) * inv
        t = np.einsum("rtk,tk->rt", qvec, e2) * inv
        ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1.0)
              & (t >= eps) & (t <= 1.0 - eps))
        return ok.any(axis=1)

    o = np.broadcast_to(src, (R, 3)).copy()
    d = dirs.copy()
    path = np.zeros(R)
    alive = np.ones(R, bool)

    spreads = []  # (bounce, row) visible-lane bin spread; -1 = no visible
    per_bounce = []
    for b in range(B):
        t, idx = nearest_hit(o, d)
        hit = np.isfinite(t)
        alive &= hit
        t = np.where(alive, t, 0.0)
        vtx = o + t[:, None] * d
        path = path + np.where(alive, t, 0.0)
        back = vtx - 1e-4 * d  # shadow origin backoff (models/ir.py law)
        vis = alive & ~blocked(np.broadcast_to(lst, (R, 3)), back)
        dl = np.linalg.norm(vtx - lst, axis=1)
        d_total = path + dl
        bins = np.clip(d_total * spm_bps + 0.5, 0.0, n_bins - 1.0)
        bins = np.where(vis, bins, np.nan).reshape(-1, LANES)
        row_min = np.nanmin(bins, axis=1)
        row_max = np.nanmax(bins, axis=1)
        srow = np.where(np.isnan(row_min), -1.0, row_max - row_min)
        spreads.append(srow)
        per_bounce.append({
            "bounce": b,
            "p50_spread_bins": float(np.median(srow[srow >= 0])),
            "p95_spread_bins": float(np.percentile(srow[srow >= 0], 95)),
            "max_spread_bins": float(srow.max()),
        })
        # specular reflect
        n = normals[idx]
        nd = np.einsum("rk,rk->r", n, d)
        d = np.where(alive[:, None], d - 2 * nd[:, None] * n, d)
        o = vtx

    srows = np.stack(spreads)  # (B, rows)
    valid = srows >= 0
    out = {
        "rays": R, "bounces": B, "scene": "world.obj",
        "per_bounce": per_bounce,
    }
    for w_coarse in (2, 4, 8, 16):
        w_bins = w_coarse * LANES
        fit = float((srows[valid] <= w_bins - 1).mean())
        out[f"fit_frac_W{w_coarse}coarse"] = round(fit, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
