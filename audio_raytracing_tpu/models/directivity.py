"""Source directivity: frequency-dependent radiation patterns.

The reference's sources radiate omnidirectionally (a Playing voice has
only a position, sound_system.zig:550-563); every production acoustics
engine also models HOW sources radiate — a voice, a loudspeaker and a
trombone do not excite a room equally in all directions. This module adds
the standard first-order ("cardioid family") parametric pattern

    g(theta) = |a + (1 - a) cos(theta)|^p

with theta the angle off the source's axis, a in [0, 1] the
omni/figure-8 blend (1 = omni, 0.5 = cardioid, 0 = figure-8) and p >= 0
a sharpening exponent — per EQ band, so a trumpet can beam its highs
while staying omni in the lows (the usual measured behavior of
instruments and speakers).

Energy semantics: g scales the source's AMPLITUDE in the emission
direction (the first leg of every path — traced ray, direct path, image
source's unfolded first leg, diffraction's source leg). It is a relative
pattern, NOT power-normalized: g(0) = 1 keeps on-axis level identical to
the omni source, so switching patterns changes total radiated power
(exactly how game-audio cones behave, and what a user comparing on-axis
loudness expects).

Everything is pure jnp and jit-friendly; a Directivity is a static
(hashable) dataclass so tracer jits key on it like they do on Config.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

N_BANDS = 4


@dataclass(frozen=True)
class Directivity:
    """axis: emission axis (unit-normalized on use). alpha/order: per-band
    pattern parameters (broadcast from scalars)."""

    axis: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    alpha: Tuple[float, float, float, float] = (0.5, 0.5, 0.5, 0.5)
    order: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)

    def __post_init__(self):
        ax = tuple(float(v) for v in self.axis)
        if len(ax) != 3 or sum(v * v for v in ax) < 1e-12:
            raise ValueError(f"axis must be a nonzero 3-vector, got {self.axis}")
        al = self.alpha if hasattr(self.alpha, "__len__") else (self.alpha,) * N_BANDS
        od = self.order if hasattr(self.order, "__len__") else (self.order,) * N_BANDS
        al = tuple(float(v) for v in al)
        od = tuple(float(v) for v in od)
        if len(al) != N_BANDS or len(od) != N_BANDS:
            raise ValueError(f"alpha/order need {N_BANDS} bands (or a scalar)")
        if not all(0.0 <= v <= 1.0 for v in al):
            raise ValueError(f"alpha out of [0,1]: {al}")
        if not all(v >= 0.0 for v in od):
            raise ValueError(f"order must be >= 0: {od}")
        object.__setattr__(self, "axis", ax)
        object.__setattr__(self, "alpha", al)
        object.__setattr__(self, "order", od)


OMNI = Directivity(alpha=(1.0,) * N_BANDS)

DIRECTIVITY_PRESETS = {
    "omni": OMNI,
    "cardioid": Directivity(alpha=(0.5,) * N_BANDS),
    "supercardioid": Directivity(alpha=(0.37,) * N_BANDS),
    "figure8": Directivity(alpha=(0.0,) * N_BANDS),
    # highs beam, lows stay wide — the generic instrument/speaker shape
    "speaker": Directivity(alpha=(0.9, 0.7, 0.5, 0.35),
                           order=(1.0, 1.0, 1.5, 2.0)),
    "voice": Directivity(alpha=(0.9, 0.8, 0.6, 0.5),
                         order=(1.0, 1.0, 1.0, 1.5)),
}


def directivity_gain(dirs, directivity: Directivity, axis=None):
    """Per-band amplitude gains for emission directions.

    dirs: (..., 3), need not be normalized. Returns (..., N_BANDS) in
    [0, 1]. Degenerate (zero) directions get on-axis gain 1 (matches the
    co-located-source fades elsewhere in the framework).

    axis: optional DYNAMIC (..., 3) emission axis overriding the
    Directivity's static one (a rotating source under jit — the pattern
    shape stays static, the axis is data).
    """
    if directivity is None:
        raise ValueError("directivity is None — call sites gate on None")
    d = jnp.asarray(dirs, jnp.float32)
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    axis = (
        jnp.asarray(directivity.axis, jnp.float32)
        if axis is None
        else jnp.asarray(axis, jnp.float32)
    )
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12
    )
    cos_t = jnp.sum(jnp.where(n > 1e-9, d / jnp.maximum(n, 1e-9), axis) * axis,
                    axis=-1)
    a = jnp.asarray(directivity.alpha, jnp.float32)
    p = jnp.asarray(directivity.order, jnp.float32)
    base = jnp.abs(a + (1.0 - a) * cos_t[..., None])  # (..., 4)
    return jnp.clip(base, 0.0, 1.0) ** p
