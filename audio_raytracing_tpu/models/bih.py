"""Bounding-interval-hierarchy (BIH) spatial index as a flat array arena.

The reference packs 7 logical tree nodes into 64-byte cache-line Nodes with
2-bit axis/leaf tags (src/raytracer.zig:24-51) — a CPU cache optimization
that is meaningless on TPU. Here the same tree (same construction policy:
midpoint split on the largest extent of the *centroid* bounds, in-place
head/tail partition, per-node left_max/right_min interval bounds —
src/raytracer.zig:451-564) is stored as parallel int32/float32 arrays: a
kernel-friendly arena that can be uploaded to HBM once and traversed with
masked, fixed-shape control flow, or serialized to .npz to skip rebuilds
(the checkpoint/resume analogue; SURVEY.md §5).

Query semantics follow the reference's hot SoA path (raydistSoA,
src/raytracer.zig:90-149): a candidate box is reported with its slab-test
entry distance tmin = max(min(t1,t2)) and *skipped when tmin < 0* — i.e.
boxes behind the origin or containing it are dropped, exactly like
raycastCapacityImpl's `results[i] < 0` check (src/raytracer.zig:205-207).
(The reference's scalar tail path clamps tmin to 0 instead; we use the SoA
semantics uniformly and document the divergence.) Results are the
`capacity` nearest candidates sorted ascending by entry distance, matching
insertOrdered (src/raytracer.zig:323-342).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LEAF_AXIS = -1


@dataclass
class BIHArena:
    """Flat BIH. Node arrays are parallel; prims are build-reordered."""

    axis: np.ndarray  # (N,) int32: split axis 0..2, or -1 for leaf
    left_max: np.ndarray  # (N,) f32: max high[axis] over the left child
    right_min: np.ndarray  # (N,) f32: min low[axis] over the right child
    left: np.ndarray  # (N,) int32: left child node index
    right: np.ndarray  # (N,) int32: right child node index
    leaf_start: np.ndarray  # (N,) int32: first prim of a leaf
    leaf_count: np.ndarray  # (N,) int32: prim count of a leaf
    aabb_low: np.ndarray  # (P, 3) f32, reordered
    aabb_high: np.ndarray  # (P, 3) f32, reordered
    values: np.ndarray  # (P,) payload, reordered

    @property
    def n_nodes(self) -> int:
        return self.axis.shape[0]

    @property
    def n_prims(self) -> int:
        return self.values.shape[0]

    def depth(self) -> int:
        if self.n_nodes == 0:
            return 0
        stack = [(0, 1)]
        best = 0
        while stack:
            node, d = stack.pop()
            best = max(best, d)
            if self.axis[node] != LEAF_AXIS:
                stack.append((int(self.left[node]), d + 1))
                stack.append((int(self.right[node]), d + 1))
        return best

    def save(self, path) -> None:
        np.savez_compressed(path, **{k: getattr(self, k) for k in self.__dataclass_fields__})

    @classmethod
    def load(cls, path) -> "BIHArena":
        with np.load(path) as z:
            return cls(**{k: z[k] for k in cls.__dataclass_fields__})


def build_bih(
    aabb_low: np.ndarray,
    aabb_high: np.ndarray,
    values: np.ndarray,
    max_leaf_size: int = 8,
) -> BIHArena:
    """Build the tree with the reference's policy (raytracer.zig:451-564).

    Leaf when count <= max_leaf_size (the reference uses depth-varying leaf
    caps {64,128,...} purely to fill its packed node layout, raytracer.zig:17;
    a flat arena wants small uniform leaves instead). Degenerate splits where
    every centroid lands on one side (possible when centroids coincide — the
    reference would recurse forever) fall back to an even index split.
    """
    low = np.array(aabb_low, dtype=np.float32, copy=True)
    high = np.array(aabb_high, dtype=np.float32, copy=True)
    vals = np.array(values, copy=True)
    n = low.shape[0]

    ax_l: list = []
    lm_l: list = []
    rm_l: list = []
    le_l: list = []
    ri_l: list = []
    ls_l: list = []
    lc_l: list = []

    def new_node() -> int:
        ax_l.append(LEAF_AXIS)
        lm_l.append(0.0)
        rm_l.append(0.0)
        le_l.append(-1)
        ri_l.append(-1)
        ls_l.append(0)
        lc_l.append(0)
        return len(ax_l) - 1

    def build(node: int, start: int, count: int, cb_low, cb_high) -> None:
        if count <= max_leaf_size:
            ls_l[node] = start
            lc_l[node] = count
            return
        centers = 0.5 * (low[start : start + count] + high[start : start + count])
        d = cb_high - cb_low
        if d[0] > d[1] and d[0] > d[2]:
            axis = 0
        elif d[1] > d[2]:
            axis = 1
        else:
            axis = 2
        split = 0.5 * (cb_low[axis] + cb_high[axis])
        go_left = centers[:, axis] < split
        n_left = int(go_left.sum())
        if n_left == 0 or n_left == count:
            # degenerate: even index split keeps progress (see docstring)
            order = np.argsort(centers[:, axis], kind="stable")
            n_left = count // 2
            go_left = np.zeros(count, dtype=bool)
            go_left[order[:n_left]] = True
        perm = np.concatenate([np.nonzero(go_left)[0], np.nonzero(~go_left)[0]])
        sl = slice(start, start + count)
        low[sl] = low[sl][perm]
        high[sl] = high[sl][perm]
        vals[sl] = vals[sl][perm]
        centers = centers[perm]

        lcent = centers[:n_left]
        rcent = centers[n_left:]
        ax_l[node] = axis
        lm_l[node] = float(high[start : start + n_left, axis].max())
        rm_l[node] = float(low[start + n_left : start + count, axis].min())
        lnode = new_node()
        rnode = new_node()
        le_l[node] = lnode
        ri_l[node] = rnode
        build(lnode, start, n_left, lcent.min(axis=0), lcent.max(axis=0))
        build(rnode, start + n_left, count - n_left, rcent.min(axis=0), rcent.max(axis=0))

    if n > 0:
        root = new_node()
        centers = 0.5 * (low + high)
        build(root, 0, n, centers.min(axis=0), centers.max(axis=0))

    return BIHArena(
        axis=np.asarray(ax_l, dtype=np.int32),
        left_max=np.asarray(lm_l, dtype=np.float32),
        right_min=np.asarray(rm_l, dtype=np.float32),
        left=np.asarray(le_l, dtype=np.int32),
        right=np.asarray(ri_l, dtype=np.int32),
        leaf_start=np.asarray(ls_l, dtype=np.int32),
        leaf_count=np.asarray(lc_l, dtype=np.int32),
        aabb_low=low,
        aabb_high=high,
        values=vals,
    )


def slab_entry_distances(aabb_low, aabb_high, src, dir_normalized) -> np.ndarray:
    """Unclamped slab-test entry distances for all boxes; -1 on miss.

    Matches raydistSoA (src/raytracer.zig:90-149): tmin = max over axes of
    min(t1,t2), tmax = min over axes of max(t1,t2), hit iff tmin <= tmax.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        idir = np.float32(1.0) / dir_normalized
        t1 = (aabb_low - src) * idir
        t2 = (aabb_high - src) * idir
    tmin = np.minimum(t1, t2).max(axis=-1)
    tmax = np.maximum(t1, t2).min(axis=-1)
    return np.where(tmin <= tmax, tmin, np.float32(-1.0))


def slab_entry_distances_scalar(aabb_low, aabb_high, src, dir_normalized) -> np.ndarray:
    """The reference's SCALAR slab test (BoundingBox.raydist,
    src/raytracer.zig:67-78): running tmin starts at 0 / tmax at inf and
    each axis clamps through them sequentially — so a box containing the
    origin reports distance 0 (the SoA path drops it) and behind-the-origin
    boxes still miss. Used for the tail lanes in exact_tail mode."""
    with np.errstate(divide="ignore", invalid="ignore"):
        idir = np.float32(1.0) / dir_normalized
        t1 = (aabb_low - src) * idir
        t2 = (aabb_high - src) * idir
    tmin = np.zeros(t1.shape[:-1], np.float32)
    tmax = np.full(t1.shape[:-1], np.inf, np.float32)
    for i in range(3):
        tmin = np.minimum(np.maximum(t1[..., i], tmin), np.maximum(t2[..., i], tmin))
        tmax = np.maximum(np.minimum(t1[..., i], tmax), np.minimum(t2[..., i], tmax))
    return np.where(tmin <= tmax, tmin, np.float32(-1.0))


def raycast_bih(arena: BIHArena, src, direction, capacity: int = 128,
                exact_tail: bool = False):
    """Reference-parity query: (values[count], dists[count]) sorted by entry
    distance, nearest `capacity` kept. Traverses near-child-first by ray sign
    with the plane tests of raycastCapacityImpl (src/raytracer.zig:216-315).

    exact_tail=True reproduces the reference's per-lane split byte for
    byte: within each leaf run, full 8-lane chunks use the SoA semantics
    (raydistSoA, origin-inside boxes skipped) and the remaining tail boxes
    use the scalar clamped test (kept at distance 0) — the reference's own
    two paths disagree there (src/raytracer.zig:115-149 vs 67-78). Default
    False = uniform SoA semantics (documented divergence, module docstring).
    """
    src = np.asarray(src, dtype=np.float32)
    d = np.asarray(direction, dtype=np.float32)
    norm = np.sqrt(float(d @ d))
    if norm == 0.0 or arena.n_nodes == 0:
        return np.empty(0, arena.values.dtype), np.empty(0, np.float32)
    d = d / norm
    with np.errstate(divide="ignore"):
        idir = np.float32(1.0) / d

    out_vals: list = []
    out_dists: list = []
    stack = [0]
    while stack:
        node = stack.pop()
        axis = int(arena.axis[node])
        if axis == LEAF_AXIS:
            s = int(arena.leaf_start[node])
            c = int(arena.leaf_count[node])
            if c == 0:
                continue
            lo = arena.aabb_low[s : s + c]
            hi = arena.aabb_high[s : s + c]
            if exact_tail:
                k8 = (c // 8) * 8
                dists = np.concatenate(
                    [
                        slab_entry_distances(lo[:k8], hi[:k8], src, d),
                        slab_entry_distances_scalar(lo[k8:], hi[k8:], src, d),
                    ]
                )
            else:
                dists = slab_entry_distances(lo, hi, src, d)
            ok = dists >= 0
            out_vals.extend(arena.values[s : s + c][ok].tolist())
            out_dists.extend(dists[ok].tolist())
        else:
            hit_left = src[axis] <= arena.left_max[node]
            hit_right = src[axis] >= arena.right_min[node]
            near_first_left = idir[axis] >= 0
            order = (
                (arena.left[node], hit_left, arena.right[node], hit_right)
                if near_first_left
                else (arena.right[node], hit_right, arena.left[node], hit_left)
            )
            # push far first so near pops first (stack order)
            if order[3]:
                stack.append(int(order[2]))
            if order[1]:
                stack.append(int(order[0]))
    if not out_vals:
        return np.empty(0, arena.values.dtype), np.empty(0, np.float32)
    vals = np.asarray(out_vals)
    dists = np.asarray(out_dists, dtype=np.float32)
    order = np.argsort(dists, kind="stable")[:capacity]
    return vals[order], dists[order]


def raycast_brute(aabb_low, aabb_high, values, src, direction, capacity: int = 128):
    """Brute-force oracle with the same SoA semantics (for differential tests,
    mirroring the reference's fuzz oracle raytracer.zig:614-623)."""
    src = np.asarray(src, dtype=np.float32)
    d = np.asarray(direction, dtype=np.float32)
    d = d / np.sqrt(float(d @ d))
    dists = slab_entry_distances(aabb_low, aabb_high, src, d)
    ok = dists >= 0
    vals = np.asarray(values)[ok]
    dd = dists[ok]
    order = np.argsort(dd, kind="stable")[:capacity]
    return vals[order], dd[order]


def refit_bih(arena: BIHArena, aabb_low, aabb_high) -> BIHArena:
    """Recompute all bounds for moved primitives WITHOUT rebuilding.

    The reference has no refit — any geometry change rebuilds the whole
    Space (SURVEY.md §5: all state rebuilt at launch). Here animated scenes
    keep the tree topology (splits, prim order, leaves) and only recompute
    the per-prim AABBs and every internal node's left_max/right_min
    interval bounds bottom-up. Queries stay exactly correct (the bounds
    still bound their subtrees); quality degrades gracefully if prims drift
    far from their build-time positions — rebuild occasionally for that.

    aabb_low/aabb_high: (P, 3) in the ARENA's prim order (the build-time
    reordering; Space.refit maps insertion order for you). O(P log P)
    host-side, like the build."""
    low = np.ascontiguousarray(np.asarray(aabb_low, np.float32))
    high = np.ascontiguousarray(np.asarray(aabb_high, np.float32))
    assert low.shape == (arena.n_prims, 3) and high.shape == low.shape
    N = arena.n_nodes
    left_max = np.array(arena.left_max, copy=True)
    right_min = np.array(arena.right_min, copy=True)
    if N == 0:
        return BIHArena(
            axis=arena.axis, left_max=left_max, right_min=right_min,
            left=arena.left, right=arena.right, leaf_start=arena.leaf_start,
            leaf_count=arena.leaf_count, aabb_low=low, aabb_high=high,
            values=arena.values,
        )
    # post-order: compute each node's contiguous prim range, then the
    # split-axis bounds of its children's ranges
    lo_r = np.zeros(N, np.int64)
    hi_r = np.zeros(N, np.int64)
    stack = [(0, False)]
    order = []
    while stack:
        node, done = stack.pop()
        if arena.axis[node] == LEAF_AXIS:
            lo_r[node] = arena.leaf_start[node]
            hi_r[node] = arena.leaf_start[node] + arena.leaf_count[node]
            continue
        if not done:
            stack.append((node, True))
            stack.append((int(arena.left[node]), False))
            stack.append((int(arena.right[node]), False))
        else:
            l, r = int(arena.left[node]), int(arena.right[node])
            lo_r[node] = min(lo_r[l], lo_r[r])
            hi_r[node] = max(hi_r[l], hi_r[r])
            order.append(node)
    for node in order:
        ax = int(arena.axis[node])
        l, r = int(arena.left[node]), int(arena.right[node])
        ll, lh = lo_r[l], hi_r[l]
        rl, rh = lo_r[r], hi_r[r]
        left_max[node] = high[ll:lh, ax].max() if lh > ll else -np.inf
        right_min[node] = low[rl:rh, ax].min() if rh > rl else np.inf
    return BIHArena(
        axis=arena.axis, left_max=left_max, right_min=right_min,
        left=arena.left, right=arena.right, leaf_start=arena.leaf_start,
        leaf_count=arena.leaf_count, aabb_low=low, aabb_high=high,
        values=arena.values,
    )
