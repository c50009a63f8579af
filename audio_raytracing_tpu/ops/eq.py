"""4-band attenuation equalizer (cascade of LR2-style one-pole pairs).

Port of the reference Equalizer (src/sound_system.zig:565-596): four
parallel first-order sections with hardcoded coefficients (band breakpoints
~128/768/4608 Hz per the source comment), band signals formed as
differences of neighbouring filter outputs with alternating signs, one gain
per band.

Per-sample recurrence (DF2-transposed first order, per band):
    y[i] = b0 * x[i] + z[i]
    z[i+1] = b1 * x[i] - a * y[i]
    out[i] = g0*y0 - g1*(y1 - y2) + g2*(y2 - y3) - g3*y3

On TPU the only sequential dependency is the length-1 state z, so a block
of 128 samples runs as one `lax.scan` over the sample axis vectorized over
(voices, bands) — the reference's 4-lane SIMD loop becomes a (V, 4) lane
update per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# coefficients from sound_system.zig:567-573
EQ_A = np.asarray(
    [-0.9977229806593002, -0.9977229806593002, -0.9641755363925378, -0.5380310834985628],
    np.float32,
)
EQ_B0 = np.asarray(
    [0.0011385096703499323, 0.9988614903296501, 0.982087768196269, 0.7690155417492813],
    np.float32,
)
EQ_B1 = np.asarray(
    [0.0011385096703499323, -0.9988614903296501, -0.982087768196269, -0.7690155417492813],
    np.float32,
)
EQ_FREQS = np.asarray([4.0, 64.0, 1024.0, 16384.0], np.float32)
EQ_BAND_SIGNS = np.asarray([1.0, -1.0, 1.0, -1.0], np.float32)


def eq_gains(dist, occlusion, air_absorption: float = 1e-5):
    """Air-absorption + distance + occlusion attenuation per band
    (sound_system.zig:229-238): clamp(1 - 1e-5*dist*(occl+1)*freqs, 0, 1)
    / (dist+1) / (occl+1). dist, occlusion: (...,); returns (..., 4)."""
    d = dist[..., None]
    o = occlusion[..., None]
    g = jnp.clip(1.0 - air_absorption * d * (o + 1.0) * EQ_FREQS, 0.0, 1.0)
    return g / (d + 1.0) / (o + 1.0)


def eq_apply_block(x, z, gains, step_mask=None):
    """Run the EQ over a block.

    x: (V, N) input samples; z: (V, 4) filter state; gains: (V, 4).
    step_mask: optional (V, N) bool — where False the filter state does NOT
    advance and the output is the unfiltered response of current state
    (used by the one-shot path, which only steps the EQ for in-bounds
    samples, sound_system.zig:355-374). Masked outputs are zeroed by the
    caller anyway.
    Returns (y: (V, N), z_new: (V, 4)).
    """
    if step_mask is None:
        step_mask = jnp.ones(x.shape, dtype=bool)

    def step(z_c, inp):
        xs, m = inp  # (V,), (V,)
        xv = xs[:, None]
        ys = EQ_B0 * xv + z_c
        z_n = EQ_B1 * xv - EQ_A * ys
        z_c = jnp.where(m[:, None], z_n, z_c)
        shifted = jnp.concatenate(
            [jnp.zeros_like(ys[:, :1]), ys[:, 2:4], jnp.zeros_like(ys[:, :1])], axis=1
        )
        bands = ys - shifted  # [y0, y1-y2, y2-y3, y3]
        out = jnp.sum(bands * EQ_BAND_SIGNS * gains, axis=1)
        return z_c, out

    z_new, ys = jax.lax.scan(step, z, (x.T, step_mask.T))
    return ys.T, z_new


def eq_band_signals(x, z=None):
    """Split signals into the equalizer's four band components.

    x: (V, N). Returns (bands: (V, 4, N), z_new: (V, 4)) where band k is
    exactly the signal that gain g_k multiplies in eq_apply_block (the
    alternating signs folded in), so summing over the band axis equals
    eq_apply_block's output at unit gains. Used by the measured-IR
    analysis (models/inverse.py::measured_ir_to_energy): band-splitting
    a measured impulse response with the SAME filterbank the engine
    mixes with keeps analysis and synthesis on one spectral convention.
    """
    if z is None:
        z = jnp.zeros((x.shape[0], 4), jnp.float32)

    def step(z_c, xs):
        xv = xs[:, None]
        ys = EQ_B0 * xv + z_c
        z_n = EQ_B1 * xv - EQ_A * ys
        shifted = jnp.concatenate(
            [jnp.zeros_like(ys[:, :1]), ys[:, 2:4], jnp.zeros_like(ys[:, :1])], axis=1
        )
        return z_n, (ys - shifted) * EQ_BAND_SIGNS

    z_new, bands = jax.lax.scan(step, z, x.T)  # (N, V, 4)
    return jnp.transpose(bands, (1, 2, 0)), z_new


def eq_apply_oracle(x, z, gains, step_mask=None):
    """NumPy scalar port for differential tests (sound_system.zig:578-595)."""
    x = np.asarray(x, np.float32)
    z = np.array(z, np.float32, copy=True)
    gains = np.asarray(gains, np.float32)
    V, N = x.shape
    out = np.zeros((V, N), np.float32)
    if step_mask is None:
        step_mask = np.ones((V, N), bool)
    for v in range(V):
        for i in range(N):
            if not step_mask[v, i]:
                continue
            ys = EQ_B0 * x[v, i] + z[v]
            z[v] = EQ_B1 * x[v, i] - EQ_A * ys
            bands = ys - np.asarray([0.0, ys[2], ys[3], 0.0], np.float32)
            out[v, i] = float(np.sum(bands * EQ_BAND_SIGNS * gains[v]))
    return out, z
