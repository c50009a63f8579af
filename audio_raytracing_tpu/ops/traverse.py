"""Batched BIH traversal nearest-hit — the large-scene query path.

The dense kernels (ops/intersect.py, ops/pallas_trace.py) test every
triangle per ray: optimal for scenes up to a few thousand triangles, wasted
work beyond. This op walks the flat BIH arena (models/bih.py) with a
fixed-depth explicit stack inside `lax.while_loop`, vmapped over rays —
masked, compiler-friendly control flow with no data-dependent shapes.

Unlike the reference's traversal (origin-only child pruning,
raytracer.zig:219-315 — which can miss hits), pruning here is conservative:
a child is visited if the ray origin lies inside its interval OR the ray
points toward its plane and reaches it within the current best_t, so
results match brute-force nearest-hit exactly (differentially tested).
Leaves hold at most `max_leaf_size` prims; each leaf performs that many
masked Möller–Trumbore tests.

MEASURED ROLE (v5e, benchmarks/RESULTS.md "BIH traversal on TPU"): this
path is the *parity/portability* backend (reference Space.raycast
semantics, CPU meshes, host fallback), NOT the TPU large-scene perf
path. The per-iteration triangle gathers serialize on TPU (no MXU, no
contiguous loads): 49k tris x 4096 rays x 4 bounces = ~48 s warm, ~4000x
slower per ray than the fused Pallas kernel, and full-batch runs trip
the device watchdog. On TPU, large scenes are served by supergroup
culling + the HBM-streamed kernel (ops/pallas_trace.py sg_cull /
stream_tris: 786k tris at 7.65e10 tests/s), which is the
hardware-shaped answer to the problem this tree solves on CPUs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bih import BIHArena
from .intersect import intersect_pairs

MAX_STACK = 64


class BIHDeviceArena(NamedTuple):
    """The flat arena + reordered triangle vertices on device."""

    axis: jnp.ndarray  # (N,) int32, -1 = leaf
    left_max: jnp.ndarray  # (N,)
    right_min: jnp.ndarray  # (N,)
    left: jnp.ndarray  # (N,) int32
    right: jnp.ndarray  # (N,) int32
    leaf_start: jnp.ndarray  # (N,) int32
    leaf_count: jnp.ndarray  # (N,) int32
    tri_v0: jnp.ndarray  # (P, 3) in arena prim order
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_index: jnp.ndarray  # (P,) original triangle index
    max_leaf_size: int


def device_arena(arena: BIHArena, scene_v0, scene_v1, scene_v2,
                 max_leaf_size: int = 8) -> BIHDeviceArena:
    """Upload an arena; `values` hold base-vertex indices (3 * tri)."""
    tri_idx = np.asarray(arena.values) // 3
    return BIHDeviceArena(
        axis=jnp.asarray(arena.axis),
        left_max=jnp.asarray(arena.left_max),
        right_min=jnp.asarray(arena.right_min),
        left=jnp.asarray(arena.left),
        right=jnp.asarray(arena.right),
        leaf_start=jnp.asarray(arena.leaf_start),
        leaf_count=jnp.asarray(arena.leaf_count),
        tri_v0=jnp.asarray(np.asarray(scene_v0)[tri_idx]),
        tri_v1=jnp.asarray(np.asarray(scene_v1)[tri_idx]),
        tri_v2=jnp.asarray(np.asarray(scene_v2)[tri_idx]),
        tri_index=jnp.asarray(tri_idx.astype(np.int32)),
        max_leaf_size=max_leaf_size,
    )


def _nearest_one(arena: BIHDeviceArena, origin, direction, leaf_cap: int):
    d = direction / jnp.linalg.norm(direction)

    def cond(state):
        sp, *_ = state
        return sp > 0

    def body(state):
        sp, stack, best_t, best_i = state
        sp = sp - 1
        node = stack[sp]
        ax = arena.axis[node]
        is_leaf = ax < 0

        # --- leaf: masked MT over up to leaf_cap prims ---
        start = arena.leaf_start[node]
        count = arena.leaf_count[node]
        k = jnp.arange(leaf_cap)
        pidx = jnp.clip(start + k, 0, arena.tri_index.shape[0] - 1)
        t, _, valid = intersect_pairs(
            origin[None, :], d[None, :],
            arena.tri_v0[pidx], arena.tri_v1[pidx], arena.tri_v2[pidx],
        )
        in_leaf = is_leaf & (k < count)
        t = jnp.where(in_leaf & valid, t, jnp.inf)
        leaf_best = jnp.min(t)
        leaf_arg = jnp.argmin(t)
        better = leaf_best < best_t
        best_t = jnp.where(better, leaf_best, best_t)
        best_i = jnp.where(better, arena.tri_index[pidx[leaf_arg]], best_i)

        # --- internal: distance-pruned near-first push ---
        # A child is visited iff the ray SEGMENT [0, best_t] reaches its
        # half-space: trivially when the origin is inside it, else when
        # the ray points at the plane and reaches it before the current
        # nearest hit. Exact (never skips a hittable child) and — unlike
        # the origin-only heuristic it replaces — it shrinks with best_t,
        # which keeps the vmapped while_loop's trip count O(depth + k).
        # (The old `| (d_ax < 0)` form visited entire subtrees: at 49k
        # triangles the walk degenerated toward O(N) nodes/ray and the
        # minutes-long device program got the TPU worker killed —
        # bigscene bih_err in r2 logs. Reference analogue: the
        # raytracer.zig:219-315 walk prunes by child interval too, but
        # with an origin-only test that can miss hits; ours stays
        # conservative-exact, cf. the module docstring.)
        axc = jnp.maximum(ax, 0)
        o_ax = origin[axc]
        d_ax = d[axc]
        safe_inv = 1.0 / jnp.where(jnp.abs(d_ax) < 1e-20,
                                   jnp.float32(1e-20), d_ax)
        t_left = (arena.left_max[node] - o_ax) * safe_inv
        t_right = (arena.right_min[node] - o_ax) * safe_inv
        hit_left = (o_ax <= arena.left_max[node]) | (
            (d_ax < 0) & (t_left <= best_t)
        )
        hit_right = (o_ax >= arena.right_min[node]) | (
            (d_ax > 0) & (t_right <= best_t)
        )
        near_left = d_ax >= 0
        first = jnp.where(near_left, arena.left[node], arena.right[node])
        second = jnp.where(near_left, arena.right[node], arena.left[node])
        push_first = ~is_leaf & jnp.where(near_left, hit_left, hit_right)
        push_second = ~is_leaf & jnp.where(near_left, hit_right, hit_left)
        # push far (second) first so near pops first
        stack = stack.at[sp].set(jnp.where(push_second, second, stack[sp]))
        sp = sp + push_second.astype(jnp.int32)
        stack = stack.at[jnp.minimum(sp, MAX_STACK - 1)].set(
            jnp.where(push_first, first, stack[jnp.minimum(sp, MAX_STACK - 1)])
        )
        sp = sp + push_first.astype(jnp.int32)
        return sp, stack, best_t, best_i

    stack0 = jnp.zeros(MAX_STACK, jnp.int32)
    sp0 = jnp.int32(1)  # root on the stack
    _, _, best_t, best_i = jax.lax.while_loop(
        cond, body, (sp0, stack0, jnp.inf, jnp.int32(-1))
    )
    hit = jnp.isfinite(best_t)
    return best_t, jnp.where(hit, best_i, -1), hit


@partial(jax.jit, static_argnames=("leaf_cap",))
def nearest_hit_bih(arena: BIHDeviceArena, origins, dirs, leaf_cap: int = 8):
    """Nearest hit per ray through the BIH. origins/dirs: (R, 3).
    Returns (t, tri_idx, hit) like ops.intersect.nearest_hit."""
    return jax.vmap(lambda o, d: _nearest_one(arena, o, d, leaf_cap))(origins, dirs)
