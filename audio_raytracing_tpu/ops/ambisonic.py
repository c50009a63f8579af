"""First-order ambisonic encode / rotate / binaural decode.

Port of the reference's spatialization core:
  * sh_encode — N3D-normalized first-order spherical-harmonic encode with
    the rotated coordinate convention +x front / +y up / +z right and the
    sub-threshold fade to nondirectional (src/sound_system.zig:190-212):
    norm = 0 if len < 1e-6, sqrt(3)/0.1 if len < 0.1, else sqrt(3)/len;
    sh = [1, norm*dx, norm*dy, norm*dz].
  * rotate_ambisonic — channels 1..3 rotated as an xyz vector by the
    listener quaternion (zig:480-492), batched over the sample axis.
  * ambisonic_to_stereo — the MagLS HRTF decode: 8 convolutions (4
    ambisonic channels x L/R) with 128-tap IRs, overlap-added into a
    2x-block stereo buffer (zig:501-524). The reference's direct O(N*M)
    convolve loop becomes a dense (4, N) x (4, M) correlation that XLA
    lowers to MXU matmuls; `hrtf_decode_fft` provides the equivalent
    frequency-domain path used by the partitioned-convolution renderer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import quat

# audio-path contractions are tiny; full f32 accuracy costs nothing and the
# TPU default (bf16 matmul passes) audibly degrades the decode
_HI = jax.lax.Precision.HIGHEST

SQRT3 = 1.7320508075688772
SH_NEAR_EPS = 1e-6
SH_NEAR_T = 0.1


def sh_encode(rel_pos):
    """Encode direction(s) listener->source into first-order SH gains.

    rel_pos: (..., 3) = source_pos - listener. Returns (sh (..., 4), dist).
    """
    d2 = jnp.sum(rel_pos * rel_pos, axis=-1)
    length = jnp.sqrt(d2)
    norm = jnp.where(
        length < SH_NEAR_EPS,
        0.0,
        SQRT3 / jnp.maximum(length, SH_NEAR_T),
    )
    sh = jnp.concatenate(
        [jnp.ones_like(length)[..., None], norm[..., None] * rel_pos], axis=-1
    )
    return sh, length


def rotate_ambisonic(amb, orientation):
    """amb: (4, N); orientation: quaternion (4,) xyzw. Rotates channels
    1..3 per sample (zig:480-492)."""
    xyz = amb[1:4].T  # (N, 3)
    rotated = quat.rotate(orientation[None, :], xyz)
    return jnp.concatenate([amb[:1], rotated.T], axis=0)


def convolve_full(x, ir):
    """Direct 'full' convolution: x (..., N) * ir (M,) -> (..., N+M-1).
    Same math as the reference's convolve (zig:516-524)."""
    n = x.shape[-1]
    m = ir.shape[-1]
    # zero-pad and correlate: out[t] = sum_i x[i] * ir[t - i]
    xpad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(m - 1, m - 1)])
    idx = jnp.arange(n + m - 1)[:, None] + jnp.arange(m)[None, :]  # windows
    windows = xpad[..., idx]  # (..., N+M-1, M)
    return jnp.einsum("...tm,m->...t", windows, ir[::-1], precision=_HI)


def ambisonic_to_stereo(amb, irs_l, irs_r):
    """MagLS decode: amb (4, N) -> stereo 'full' conv result (N+M-1, 2).

    irs_l/irs_r: (4, M). The 4-channel sum happens in the einsum, so the
    whole decode is two (N+M-1, M) x (M,) contractions per ear fused into
    one batched op.
    """
    n = amb.shape[-1]
    m = irs_l.shape[-1]
    xpad = jnp.pad(amb, [(0, 0), (m - 1, m - 1)])
    idx = jnp.arange(n + m - 1)[:, None] + jnp.arange(m)[None, :]
    windows = xpad[:, idx]  # (4, N+M-1, M)
    left = jnp.einsum("ctm,cm->t", windows, irs_l[:, ::-1], precision=_HI)
    right = jnp.einsum("ctm,cm->t", windows, irs_r[:, ::-1], precision=_HI)
    return jnp.stack([left, right], axis=-1)


def hrtf_decode_fft(amb, irs_l, irs_r):
    """Frequency-domain equivalent of ambisonic_to_stereo (rfft-based),
    for long signals / the offline renderer."""
    n = amb.shape[-1]
    m = irs_l.shape[-1]
    size = n + m - 1
    fft_n = 1
    while fft_n < size:
        fft_n *= 2
    A = jnp.fft.rfft(amb, fft_n, axis=-1)
    L = jnp.fft.rfft(irs_l, fft_n, axis=-1)
    R = jnp.fft.rfft(irs_r, fft_n, axis=-1)
    left = jnp.fft.irfft(jnp.sum(A * L, axis=0), fft_n)[:size]
    right = jnp.fft.irfft(jnp.sum(A * R, axis=0), fft_n)[:size]
    return jnp.stack([left, right], axis=-1)
