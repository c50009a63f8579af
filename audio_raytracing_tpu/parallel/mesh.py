"""Device-mesh construction helpers.

The reference has no distributed layer at all (SURVEY.md §2.6); this is a
new first-class component. Meshes are the standard jax.sharding kind: a
1-D "rays" axis for data-parallel ray sharding, or a 2-D ("sources",
"rays") mesh for the 8-concurrent-source configuration — sources split
across one axis, each source's ray wavefront split across the other, with
IR histograms allreduced over the rays axis (ICI) only.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axes: tuple = ("rays",),
              shape: tuple | None = None) -> Mesh:
    """Build a mesh over (the first) n_devices devices.

    axes: axis names; shape: explicit per-axis sizes (defaults to all
    devices on the first axis, 1 on the rest).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(np.asarray(devs).reshape(shape), axes)


def source_ray_mesh(n_devices: int | None = None, n_sources_axis: int | None = None) -> Mesh:
    """2-D ("sources", "rays") mesh: sources axis as large as divides the
    device count (capped at the source count when given)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    s = 1
    for cand in range(min(n, n_sources_axis or n), 0, -1):
        if n % cand == 0:
            s = cand
            break
    return make_mesh(n, ("sources", "rays"), (s, n // s))
