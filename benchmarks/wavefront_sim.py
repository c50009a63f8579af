#!/usr/bin/env python
"""Host-side sim: does PER-BOUNCE ray re-sorting tighten sg_cull?

r2 measured (benchmarks/RESULTS.md "Supergroup culling") that the
per-row conservative reach test passes 42/66/88/92% of supergroups at
bounces 0-3 on the 49k scene — coherence decays as reflections mix
direction signs within each (1, 128) row. The r1/r2 wavefront dead end
("one 1M argsort = 47.6 ms") was measured at 1M rays; the bigscene
workload is 2^15 rays where a sort is ~30x smaller. This sim quantifies
the prize before any kernel work: replay the bounce states of the exact
bigscene workload and evaluate the kernel's _sg_pred per (1, 128) row
per supergroup under
  (a) static order   — dirs sorted once at bounce 0 (production today),
  (b) resort o|d     — per-bounce sort by morton(origin) + dir octant,
  (c) resort d|o     — per-bounce sort by dir octant + morton(origin).
Prints one JSON line with per-bounce path/shadow pass rates per order.

Run on CPU (pure jnp + NumPy; chunked brute-force nearest-hit).
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def nearest_hit(o, d, v0, e1, e2, chunk=512):
    """Brute-force Moller-Trumbore nearest hit. o/d: (N, 3); returns
    (t (N,), tri (N,)) with t=inf on miss."""

    @jax.jit
    def _chunk(oc, dc):
        p = jnp.cross(dc[:, None, :], e2[None, :, :])  # (n, T, 3)
        det = jnp.sum(p * e1[None, :, :], axis=-1)
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        s = oc[:, None, :] - v0[None, :, :]
        u = jnp.sum(s * p, axis=-1) * inv
        q = jnp.cross(s, e1[None, :, :])
        v = jnp.sum(q * dc[:, None, :], axis=-1) * inv
        t = jnp.sum(q * e2[None, :, :], axis=-1) * inv
        ok = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t >= 1e-4)
        )
        tc = jnp.where(ok, t, jnp.inf)
        return jnp.min(tc, axis=1), jnp.argmin(tc, axis=1)

    ts, tris = [], []
    for i in range(0, o.shape[0], chunk):
        t, tri = _chunk(o[i : i + chunk], d[i : i + chunk])
        ts.append(t)
        tris.append(tri)
    return jnp.concatenate(ts), jnp.concatenate(tris)


def morton3_np(q):
    def spread(x):
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def sort_keys(o, d, mode, lo, span):
    """Wavefront re-sort keys. mode 'od': morton(o) high, octant(d) low;
    mode 'do': octant(d) high, morton(o) low (30-bit morton, 3-bit oct)."""
    q = np.clip((o - lo) / span * 1023.0, 0, 1023).astype(np.int32)
    m = morton3_np(q).astype(np.int64)
    oct_ = (
        (d[:, 0] > 0).astype(np.int64)
        | ((d[:, 1] > 0).astype(np.int64) << 1)
        | ((d[:, 2] > 0).astype(np.int64) << 2)
    )
    if mode == "od":
        return (m << 3) | oct_
    return (oct_ << 30) | m


def row_pass_rates(o, d, sg_lo, sg_hi):
    """Fraction of (row, supergroup) path-pass preds that pass. o/d:
    (N, 3) in ROW ORDER (consecutive 128 = one row). Mirrors _sg_pred."""
    R = o.shape[0] // 128
    o_r = o.reshape(R, 128, 3)
    d_r = d.reshape(R, 128, 3)
    o_lo, o_hi = o_r.min(axis=1), o_r.max(axis=1)  # (R, 3)
    neg = (d_r < 0).any(axis=1)  # (R, 3)
    pos = (d_r > 0).any(axis=1)
    r_lo = np.where(neg, -np.inf, 0.0)
    r_hi = np.where(pos, np.inf, 0.0)
    ok = (sg_hi[None] >= (o_lo + r_lo)[:, None]) & (
        sg_lo[None] <= (o_hi + r_hi)[:, None]
    )  # (R, S, 3)
    return float(ok.all(axis=2).mean())


def shadow_pass_rates(hit, listener, sg_lo, sg_hi):
    """Shadow segments run listener -> hit vertex; origin = listener,
    reach = row min/max vertex offsets clamped to include 0."""
    R = hit.shape[0] // 128
    w = (hit - listener[None]).reshape(R, 128, 3)
    r_lo = np.minimum(w.min(axis=1), 0.0)
    r_hi = np.maximum(w.max(axis=1), 0.0)
    l_ = listener[None, None]
    ok = (sg_hi[None] >= l_ + r_lo[:, None]) & (sg_lo[None] <= l_ + r_hi[:, None])
    return float(ok.all(axis=2).mean())


def main():
    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
    from audio_raytracing_tpu.models.scene import Scene, box_room_subdivided
    from audio_raytracing_tpu.ops.pallas_trace import TRI_GROUP, build_tri_tables

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rays = 1 << 15
    bounces = 4
    cfg = DEFAULT_CONFIG
    scene = Scene.from_triangles(
        box_room_subdivided(size=(10.0, 4.0, 8.0), k=k), cfg
    )
    arrays = scene.device_arrays()
    _, gaabb = build_tri_tables(arrays)
    gaabb = np.asarray(gaabb)
    n_groups = gaabb.shape[0]
    fori_unroll = next(
        (c for c in (32, 16, 8) if n_groups % c == 0 and n_groups >= c), 1
    )
    g3 = gaabb.reshape(n_groups // fori_unroll, fori_unroll, 8)
    sg_lo = g3[:, :, :3].min(axis=1)
    sg_hi = g3[:, :, 3:6].max(axis=1)

    v0 = jnp.asarray(arrays.v0)
    e1 = jnp.asarray(arrays.v1) - v0
    e2 = jnp.asarray(arrays.v2) - v0
    nrm = np.asarray(arrays.normals)
    T = int(v0.shape[0])
    print(
        f"[sim] k={k} T={T} supergroups={sg_lo.shape[0]} "
        f"(unroll {fori_unroll} x {TRI_GROUP})",
        file=sys.stderr,
    )

    src = np.asarray([1.0, 0.3, 0.5], np.float32)
    listener = np.asarray([-1.0, 0.0, -0.5], np.float32)
    d = fibonacci_sphere_sorted(rays).astype(np.float32)
    o = np.broadcast_to(src, d.shape).copy()

    all_lo = np.asarray(arrays.v0).min(axis=0)
    all_hi = np.asarray(arrays.v0).max(axis=0)
    span = np.maximum(all_hi - all_lo, 1e-9)

    out = {"k": k, "T": T, "rays": rays, "bounces": []}
    for b in range(bounces):
        t0 = time.time()
        row = {"bounce": b}
        row["path_static"] = row_pass_rates(o, d, sg_lo, sg_hi)
        for mode in ("od", "do"):
            perm = np.argsort(sort_keys(o, d, mode, all_lo, span), kind="stable")
            row[f"path_resort_{mode}"] = row_pass_rates(
                o[perm], d[perm], sg_lo, sg_hi
            )
        t, tri = nearest_hit(jnp.asarray(o), jnp.asarray(d), v0, e1, e2)
        t = np.asarray(t)
        tri = np.asarray(tri)
        alive = np.isfinite(t)
        row["alive"] = float(alive.mean())
        hit = o + np.where(alive, t, 0.0)[:, None] * d
        row["shadow_static"] = shadow_pass_rates(hit, listener, sg_lo, sg_hi)
        n = nrm[tri]
        d_new = d - 2.0 * np.sum(d * n, axis=1, keepdims=True) * n
        for mode in ("od", "do"):
            perm = np.argsort(
                sort_keys(hit, d_new, mode, all_lo, span), kind="stable"
            )
            row[f"shadow_resort_{mode}"] = shadow_pass_rates(
                hit[perm], listener, sg_lo, sg_hi
            )
        o, d = hit, d_new
        row["sim_s"] = round(time.time() - t0, 1)
        out["bounces"].append(row)
        print(f"[sim] bounce {b}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
