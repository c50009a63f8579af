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
    transmission: per-band energy fraction passing THROUGH the surface —
    a shadow/occlusion ray crossing it is attenuated by sqrt(transmission)
    in amplitude instead of hard-blocked (the standard game-audio
    occlusion-vs-transmission split; the reference only hard-blocks,
    main.zig:683-702). Refraction/added delay through the material is
    ignored. Energy accounting: the absorption coefficient covers
    everything not reflected (reflected = 1 - a), so transmitted energy
    must come out of it: transmission[b] <= absorption[b] per band.
    """

    absorption: Tuple[float, float, float, float]
    scattering: float = 0.0
    transmission: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)

    def __post_init__(self):
        if len(self.absorption) != N_BANDS:
            raise ValueError(f"absorption needs {N_BANDS} bands")
        if not all(0.0 <= a <= 1.0 for a in self.absorption):
            raise ValueError(f"absorption out of [0,1]: {self.absorption}")
        if not 0.0 <= self.scattering <= 1.0:
            raise ValueError(f"scattering out of [0,1]: {self.scattering}")
        if len(self.transmission) != N_BANDS:
            raise ValueError(f"transmission needs {N_BANDS} bands")
        if not all(0.0 <= t <= 1.0 for t in self.transmission):
            raise ValueError(f"transmission out of [0,1]: {self.transmission}")
        if any(t > a + 1e-9 for t, a in zip(self.transmission, self.absorption)):
            raise ValueError(
                "transmission must be <= absorption per band (transmitted "
                f"energy comes out of the non-reflected fraction): "
                f"t={self.transmission} a={self.absorption}"
            )


# the reference-parity default: flat 0.1 (models/scene.py's historical
# default), purely specular
DEFAULT_MATERIAL = AcousticMaterial((0.1, 0.1, 0.1, 0.1), 0.0)

MATERIAL_PRESETS: Dict[str, AcousticMaterial] = {
    "default": DEFAULT_MATERIAL,
    # hard, smooth
    "concrete": AcousticMaterial((0.01, 0.02, 0.02, 0.03), 0.05),
    "brick": AcousticMaterial((0.02, 0.03, 0.04, 0.06), 0.25),
    "marble": AcousticMaterial((0.01, 0.01, 0.01, 0.02), 0.02),
    # glass transmits audibly (mass law: transmission loss grows with
    # frequency); single pane TL ~ 15-30 dB across the bands
    "glass": AcousticMaterial((0.18, 0.06, 0.03, 0.02), 0.02,
                              transmission=(0.03, 0.01, 0.003, 0.001)),
    "plaster": AcousticMaterial((0.02, 0.04, 0.05, 0.05), 0.05),
    # wood
    "wood_panel": AcousticMaterial((0.25, 0.15, 0.08, 0.07), 0.1),
    "wood_floor": AcousticMaterial((0.15, 0.10, 0.07, 0.07), 0.1),
    # soft / porous
    "carpet": AcousticMaterial((0.05, 0.15, 0.35, 0.55), 0.2),
    # a curtain barely blocks sound at all: most of its "absorption" is
    # really transmission to the other side
    "curtain": AcousticMaterial((0.07, 0.30, 0.50, 0.60), 0.3,
                                transmission=(0.05, 0.20, 0.30, 0.30)),
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
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-triangle (absorption (T, 4), scattering (T,), transmission
    (T, 4)) from a mesh's `usemtl` names. `materials` maps OBJ material
    names to materials or preset names; names absent from the map (and the
    unnamed "" material) use `default`."""
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
    transmit = np.asarray(
        [per_name[i].transmission for i in mesh.material_ids], np.float32
    ).reshape(-1, N_BANDS)
    return absorb, scatter, transmit
