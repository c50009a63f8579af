"""Acoustic surface materials: named absorption/scattering tables.

The reference has exactly one implicit material — every surface reflects
with the same energy and the only frequency dependence is the air
absorption law (sound_system.zig:229-234). This module adds the standard
room-acoustics upgrade: per-surface, per-band energy absorption plus a
scattering coefficient (the probability a reflection is diffuse rather
than specular, consumed by models/ir.trace_ir's stochastic family).

Band mapping: the framework's four bands follow the reference's 4-band EQ
(crossovers ~128 / 768 / 4608 Hz, sound_system.zig:580-581), so preset
coefficients are resampled from published octave-band absorption tables
(e.g. Vorländer, "Auralization", App.; Long, "Architectural Acoustics")
onto [low < 128 Hz, 128-768, 768-4608, > 4608 Hz] by averaging the octaves
inside each band. They are genuinely approximate — materials vary by
mounting — and exist to make scenes *sound different per surface*, not to
certify measurements.

Usage:
    mesh = load_obj("hall.obj")            # tracks usemtl per triangle
    scene = Scene.from_mesh(mesh, cfg, materials={
        "Floor": "carpet",                  # preset by name
        "Walls": AcousticMaterial(absorption=(0.02, 0.03, 0.04, 0.05)),
    })
Unmapped names fall back to `default` (the reference-parity 0.1 flat).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping, Tuple, Union

import numpy as np

N_BANDS = 4


@dataclass(frozen=True)
class AcousticMaterial:
    """absorption: per-band energy absorption coefficient in [0, 1]
    (energy kept per bounce = 1 - a). scattering: probability in [0, 1]
    that a bounce leaves diffusely (cosine-weighted) instead of specularly.
    """

    absorption: Tuple[float, float, float, float]
    scattering: float = 0.0

    def __post_init__(self):
        if len(self.absorption) != N_BANDS:
            raise ValueError(f"absorption needs {N_BANDS} bands")
        if not all(0.0 <= a <= 1.0 for a in self.absorption):
            raise ValueError(f"absorption out of [0,1]: {self.absorption}")
        if not 0.0 <= self.scattering <= 1.0:
            raise ValueError(f"scattering out of [0,1]: {self.scattering}")


# the reference-parity default: flat 0.1 (models/scene.py's historical
# default), purely specular
DEFAULT_MATERIAL = AcousticMaterial((0.1, 0.1, 0.1, 0.1), 0.0)

MATERIAL_PRESETS: Dict[str, AcousticMaterial] = {
    "default": DEFAULT_MATERIAL,
    # hard, smooth
    "concrete": AcousticMaterial((0.01, 0.02, 0.02, 0.03), 0.05),
    "brick": AcousticMaterial((0.02, 0.03, 0.04, 0.06), 0.25),
    "marble": AcousticMaterial((0.01, 0.01, 0.01, 0.02), 0.02),
    "glass": AcousticMaterial((0.18, 0.06, 0.03, 0.02), 0.02),
    "plaster": AcousticMaterial((0.02, 0.04, 0.05, 0.05), 0.05),
    # wood
    "wood_panel": AcousticMaterial((0.25, 0.15, 0.08, 0.07), 0.1),
    "wood_floor": AcousticMaterial((0.15, 0.10, 0.07, 0.07), 0.1),
    # soft / porous
    "carpet": AcousticMaterial((0.05, 0.15, 0.35, 0.55), 0.2),
    "curtain": AcousticMaterial((0.07, 0.30, 0.50, 0.60), 0.3),
    "acoustic_tile": AcousticMaterial((0.25, 0.55, 0.75, 0.70), 0.3),
    "upholstery": AcousticMaterial((0.20, 0.40, 0.60, 0.65), 0.3),
    # people / misc
    "audience": AcousticMaterial((0.30, 0.55, 0.80, 0.85), 0.6),
    "grass": AcousticMaterial((0.10, 0.25, 0.55, 0.65), 0.7),
    "water": AcousticMaterial((0.01, 0.01, 0.02, 0.03), 0.05),
}

MaterialLike = Union[AcousticMaterial, str]


def resolve_material(m: MaterialLike) -> AcousticMaterial:
    """A material or a preset name -> AcousticMaterial."""
    if isinstance(m, AcousticMaterial):
        return m
    try:
        return MATERIAL_PRESETS[m]
    except KeyError:
        raise KeyError(
            f"unknown material preset {m!r}; available: "
            f"{sorted(MATERIAL_PRESETS)}"
        ) from None


def mesh_surface_tables(
    mesh,
    materials: Mapping[str, MaterialLike] | None = None,
    default: MaterialLike = DEFAULT_MATERIAL,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-triangle (absorption (T, 4), scattering (T,)) from a mesh's
    `usemtl` names. `materials` maps OBJ material names to materials or
    preset names; names absent from the map (and the unnamed "" material)
    use `default`."""
    default = resolve_material(default)
    materials = materials or {}
    per_name = []
    for name in mesh.material_names:
        m = materials.get(name)
        per_name.append(resolve_material(m) if m is not None else default)
    absorb = np.asarray(
        [per_name[i].absorption for i in mesh.material_ids], np.float32
    ).reshape(-1, N_BANDS)
    scatter = np.asarray(
        [per_name[i].scattering for i in mesh.material_ids], np.float32
    ).reshape(-1)
    return absorb, scatter
