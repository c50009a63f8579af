"""Space / SpaceBuilder — the reference's public spatial-index surface.

Mirrors Builder(T)/Space(T) (src/raytracer.zig:366-449, 156-363):

    builder = SpaceBuilder()
    builder.add(low, high, value)        # Builder.add
    space = builder.finish()             # Builder.finish
    values, dists = space.raycast(src, dir, capacity=128)  # raycastCapacity
    space.depth()                        # Space.depth

Queries return the `capacity` nearest candidates by AABB slab-test entry
distance, sorted ascending (insertOrdered semantics, raytracer.zig:323-342)
with the documented SoA-path behavior for negative entry distances (see
models/bih.py). Construction uses the native C++ builder when available,
falling back to the bit-identical NumPy one.
"""

from __future__ import annotations

import numpy as np

from .. import native
from .bih import BIHArena, build_bih, raycast_bih


class Space:
    def __init__(self, arena: BIHArena, cfg=None, insert_values=None):
        from ..config import DEFAULT_CONFIG

        self.arena = arena
        self.cfg = cfg or DEFAULT_CONFIG
        # payloads in insertion order (SpaceBuilder keeps them so refit can
        # map caller-order boxes to the build-time prim reordering)
        self._insert_values = (
            np.asarray(insert_values) if insert_values is not None else None
        )

    def raycast(self, src, direction, capacity: int = 128,
                exact_tail: bool | None = None):
        """(values, dists): nearest `capacity` AABB candidates along the ray
        (cf. raycastCapacity, raytracer.zig:171-187). exact_tail reproduces
        the reference's scalar-clamped tail lanes (see models/bih.raycast_bih);
        defaults to Config.quirk_tail_lane_clamp."""
        if exact_tail is None:
            exact_tail = self.cfg.quirk_tail_lane_clamp
        return raycast_bih(self.arena, src, direction, capacity, exact_tail)

    def depth(self) -> int:
        return self.arena.depth()

    # -- animated geometry: bounds refit without rebuild ---------------------

    def _perm_insertion_to_arena(self) -> np.ndarray:
        """perm[k] = insertion index of the prim in arena slot k."""
        if self._insert_values is None:
            raise ValueError(
                "refit in insertion order needs a builder-built Space "
                "(loaded arenas only support order='arena')"
            )
        vals = np.asarray(self.arena.values)
        ins = self._insert_values
        if len(np.unique(ins)) != len(ins):
            raise ValueError("refit requires unique payload values")
        order = np.argsort(ins, kind="stable")
        pos = np.searchsorted(ins[order], vals)
        return order[pos]

    def refit(self, low, high, order: str = "insertion") -> None:
        """Recompute all bounds for moved boxes WITHOUT rebuilding the tree
        (models/bih.refit_bih; the reference rebuilds the whole Space for
        any geometry change). low/high: (P, 3) in the order the boxes were
        add()ed (order="insertion"), or in the arena's internal prim order
        (order="arena", e.g. for loaded arenas)."""
        from .bih import refit_bih

        low = np.asarray(low, np.float32)
        high = np.asarray(high, np.float32)
        if order == "insertion":
            perm = self._perm_insertion_to_arena()
            low, high = low[perm], high[perm]
        elif order != "arena":
            raise ValueError(f"unknown order {order!r}")
        self.arena = refit_bih(self.arena, low, high)

    def refit_transform(self, rotation, translation, mask=None) -> None:
        """Rigid-transform a subset of the indexed boxes and refit.

        rotation (3, 3), translation (3,); mask: per-prim bool in insertion
        order (None = all). New AABBs are the boxes of the 8 transformed
        corners — conservative under rotation (a rotated box's AABB grows),
        exact for pure translations; the device-side tracing path
        transforms true triangle geometry instead
        (models/scene.rigid_transform_arrays)."""
        r = np.asarray(rotation, np.float32)
        t = np.asarray(translation, np.float32)
        perm = self._perm_insertion_to_arena()
        inv = np.argsort(perm, kind="stable")
        low = np.asarray(self.arena.aabb_low)[inv]  # insertion order
        high = np.asarray(self.arena.aabb_high)[inv]
        if mask is None:
            mask = np.ones(low.shape[0], bool)
        mask = np.asarray(mask, bool)
        corners = np.stack(
            [
                np.stack(
                    [np.where(b & (1 << i), high[:, i], low[:, i]) for i in range(3)],
                    axis=-1,
                )
                for b in range(8)
            ],
            axis=1,
        )  # (P, 8, 3)
        moved = corners @ r.T + t
        new_low = np.where(mask[:, None], moved.min(axis=1), low)
        new_high = np.where(mask[:, None], moved.max(axis=1), high)
        self.refit(new_low, new_high, order="insertion")

    def save(self, path) -> None:
        """Serialize the arena (.npz) — skip rebuilds on reload."""
        self.arena.save(path)

    @classmethod
    def load(cls, path) -> "Space":
        return cls(BIHArena.load(path))


class SpaceBuilder:
    def __init__(self, max_leaf_size: int = 8, cfg=None):
        self.max_leaf_size = max_leaf_size
        self.cfg = cfg
        self._low: list = []
        self._high: list = []
        self._values: list = []

    def add(self, low, high, value) -> None:
        low = np.asarray(low, np.float32)
        high = np.asarray(high, np.float32)
        assert np.all(low <= high)
        assert float(np.sum(high - low)) > 0.0  # cf. raytracer.zig:402-405
        self._low.append(low)
        self._high.append(high)
        self._values.append(value)

    def __len__(self) -> int:
        return len(self._values)

    def finish(self) -> Space:
        low = np.stack(self._low) if self._low else np.zeros((0, 3), np.float32)
        high = np.stack(self._high) if self._high else np.zeros((0, 3), np.float32)
        values = np.asarray(self._values, np.int32)
        arena = native.build_bih_native(low, high, values, self.max_leaf_size)
        if arena is None:
            arena = build_bih(low, high, values, self.max_leaf_size)
        return Space(arena, cfg=self.cfg, insert_values=values)
