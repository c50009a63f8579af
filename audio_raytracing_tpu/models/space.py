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
    def __init__(self, arena: BIHArena, cfg=None):
        from ..config import DEFAULT_CONFIG

        self.arena = arena
        self.cfg = cfg or DEFAULT_CONFIG

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
        return Space(arena, cfg=self.cfg)
