"""Higher-order ambisonics (orders 0-5): encode, rotate, truncate, decode.

The reference is strictly first order — a 4-channel N3D bed
(sound_system.zig:190-212), rotated as an xyz vector (zig:480-492) and
MagLS-decoded to stereo (zig:501-524). This module generalizes the whole
spatial chain to arbitrary order <= MAX_ORDER while staying exactly
compatible with that first-order pipeline:

  * channels are ACN-ordered, N3D-normalized real spherical harmonics
    evaluated in the framework's listener frame (+x front / +y up /
    +z right, the reference's convention) by mapping to the ambisonic
    frame (x_a, y_a, z_a) = (front, left, up) = (dx, -dz, dy);
  * ACN 0..3 relate to the reference's [W, X=dx, Y=dy, Z=dz] channels by
    [W, X, Y, Z] = [acn0, acn3, acn2, -acn1] (same sqrt(3) N3D scale);
  * the reference's sub-threshold distance fade (norm = sqrt(3) *
    len/max(len, 0.1), zig:203-208) generalizes to scaling order-l
    channels by fade^l — the solid-harmonic evaluation at fade * u, so a
    source collapsing onto the listener fades smoothly to pure W at every
    order.

Rotation does not hand-roll the Ivanic-Ruedenberg recurrence: since SH of
order <= O form a closed rotation-invariant space, the per-order rotation
matrix solves Y(R u_k) = R_sh Y(u_k) over a fixed well-spread direction
set u_k, whose basis pseudoinverse is a compile-time constant. That keeps
the trace-time work one small matmul per call and makes the construction
obviously correct (tested against direct evaluation).

TPU mapping: everything here is a handful of (C, C) / (C, N) matmuls at
HIGHEST precision — tiny next to the tracing kernels; XLA fuses the basis
polynomial evaluation.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import quat

_HI = jax.lax.Precision.HIGHEST

MAX_ORDER = 5

SQRT3 = np.sqrt(3.0)
SH_NEAR_EPS = 1e-6
SH_NEAR_T = 0.1  # sub-threshold fade distance (sound_system.zig:205)


def n_sh(order: int) -> int:
    return (order + 1) ** 2


def _check_order(order: int):
    if not 0 <= order <= MAX_ORDER:
        raise ValueError(f"order must be in [0, {MAX_ORDER}], got {order}")


def sh_basis(dirs, order: int):
    """Real SH (ACN order, N3D norm) at unit directions.

    dirs: (..., 3) unit vectors in the framework frame (+x front, +y up,
    +z right). Returns (..., (order+1)^2). Order-l explicit polynomials in
    the ambisonic frame (x front, y left, z up); N3D = SN3D * sqrt(2l+1).
    """
    _check_order(order)
    dirs = jnp.asarray(dirs)
    # framework -> ambisonic frame
    x = dirs[..., 0]
    y = -dirs[..., 2]
    z = dirs[..., 1]
    one = jnp.ones_like(x)
    chans = [one]  # ACN0
    if order >= 1:
        chans += [SQRT3 * y, SQRT3 * z, SQRT3 * x]  # ACN 1-3
    if order >= 2:
        s5 = np.sqrt(5.0)
        chans += [
            s5 * SQRT3 * x * y,  # ACN4 (2,-2): sqrt(15) xy
            s5 * SQRT3 * y * z,  # ACN5 (2,-1)
            s5 * 0.5 * (3.0 * z * z - 1.0),  # ACN6 (2,0)
            s5 * SQRT3 * x * z,  # ACN7 (2,1)
            s5 * (SQRT3 / 2.0) * (x * x - y * y),  # ACN8 (2,2)
        ]
    if order >= 3:
        s7 = np.sqrt(7.0)
        chans += [
            s7 * np.sqrt(5.0 / 8.0) * y * (3.0 * x * x - y * y),  # ACN9
            s7 * np.sqrt(15.0) * x * y * z,  # ACN10
            s7 * np.sqrt(3.0 / 8.0) * y * (5.0 * z * z - 1.0),  # ACN11
            s7 * 0.5 * z * (5.0 * z * z - 3.0),  # ACN12
            s7 * np.sqrt(3.0 / 8.0) * x * (5.0 * z * z - 1.0),  # ACN13
            s7 * (np.sqrt(15.0) / 2.0) * z * (x * x - y * y),  # ACN14
            s7 * np.sqrt(5.0 / 8.0) * x * (x * x - 3.0 * y * y),  # ACN15
        ]
    for ell in range(4, order + 1):
        chans += _degree_channels(x, y, z, ell)
    return jnp.stack(chans, axis=-1)


@lru_cache(maxsize=None)
def _degree_coeffs(ell: int):
    """Closed-form real-SH building blocks for degree ell (orders 4+;
    0-3 stay as the hand-written polynomials above for exact bit
    compatibility): per |m|, the z-polynomial Q_l^m = d^m P_l / dz^m
    (so P_l^m = sin^m(theta) Q_l^m without Condon-Shortley) and the N3D
    scale K = sqrt(2l+1) * sqrt((2 - delta_m0) (l-m)!/(l+m)!). The
    sectoral factors cos/sin(m phi) sin^m(theta) are Re/Im[(x+iy)^m].
    Verified to reproduce the explicit degree-1..3 channels exactly."""
    from math import factorial

    out = []
    p_l = np.polynomial.legendre.Legendre.basis(ell).convert(
        kind=np.polynomial.Polynomial
    )
    for m in range(ell + 1):
        q = p_l.deriv(m) if m else p_l
        k = np.sqrt(2.0 * ell + 1.0) * np.sqrt(
            (2.0 if m else 1.0) * factorial(ell - m) / factorial(ell + m)
        )
        out.append((k, tuple(float(c) for c in q.coef)))
    return out


def _degree_channels(x, y, z, ell: int):
    """ACN channels l^2 .. l^2+2l for degree ell >= 4 (m = -l .. +l)."""
    kq = _degree_coeffs(ell)

    def horner(coefs, zz):
        acc = jnp.zeros_like(zz) + coefs[-1]
        for c in coefs[-2::-1]:
            acc = acc * zz + c
        return acc

    # sectoral pair (A_m, B_m) = (Re, Im)[(x + iy)^m] by recurrence
    a_m, b_m = [jnp.ones_like(x)], [jnp.zeros_like(x)]
    for m in range(1, ell + 1):
        a_m.append(a_m[-1] * x - b_m[-1] * y)
        b_m.append(a_m[-2] * y + b_m[-1] * x)
    chans = []
    for m in range(-ell, ell + 1):
        k, coefs = kq[abs(m)]
        q = horner(coefs, z)
        sec = b_m[-m] if m < 0 else a_m[m]
        chans.append(k * sec * q)
    return chans


def acn_orders(order: int) -> np.ndarray:
    """Per-channel SH degree l, shape ((order+1)^2,)."""
    return np.repeat(np.arange(order + 1), 2 * np.arange(order + 1) + 1)


def sh_encode_hoa(rel_pos, order: int):
    """Encode direction(s) listener->source into order-N SH gains with the
    reference's sub-threshold fade generalized per order.

    rel_pos: (..., 3). Returns (sh (..., n_sh), dist). At order 1 the
    channels [acn0, acn3, acn2, -acn1] reproduce ops/ambisonic.sh_encode
    exactly."""
    _check_order(order)
    rel_pos = jnp.asarray(rel_pos)
    d2 = jnp.sum(rel_pos * rel_pos, axis=-1)
    length = jnp.sqrt(d2)
    safe = jnp.maximum(length, SH_NEAR_EPS)
    u = rel_pos / safe[..., None]
    fade = jnp.where(
        length < SH_NEAR_EPS, 0.0, length / jnp.maximum(length, SH_NEAR_T)
    )
    y = sh_basis(u, order)
    fade_l = fade[..., None] ** jnp.asarray(acn_orders(order), jnp.float32)
    return y * fade_l, length


@lru_cache(maxsize=None)
def _basis_pinv(order: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed sample directions (K, 3) + pinv of their SH basis (C, K)."""
    k = 4 * n_sh(order)
    i = np.arange(k, dtype=np.float64) + 0.5
    golden = (1.0 + 5.0**0.5) / 2.0
    phi = 2.0 * np.pi * i / golden
    cos_t = 1.0 - 2.0 * i / k
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - cos_t * cos_t))
    dirs = np.stack(
        [np.cos(phi) * sin_t, cos_t, np.sin(phi) * sin_t], axis=1
    ).astype(np.float32)
    # may be reached first from inside a jit trace (e.g. the streaming
    # renderer's jitted respectra): force eager evaluation of the constant
    with jax.ensure_compile_time_eval():
        basis = np.asarray(sh_basis(dirs, order), np.float64)  # (K, C)
    pinv = np.linalg.pinv(basis)  # (C, K)
    cond = np.linalg.cond(basis)
    assert cond < 50.0, cond  # well-spread dirs: comfortably conditioned
    return dirs, pinv.astype(np.float32)


def sh_rotation_matrix(orientation, order: int):
    """(C, C) SH rotation matrix for a quaternion (xyzw), solving
    Y(R u_k) = R_sh Y(u_k) over fixed directions (pinv precomputed)."""
    _check_order(order)
    dirs, pinv = _basis_pinv(order)
    rotated = quat.rotate(
        jnp.broadcast_to(jnp.asarray(orientation), (dirs.shape[0], 4)),
        jnp.asarray(dirs),
    )  # (K, 3)
    b_rot = sh_basis(rotated, order)  # (K, C)
    # R_sh^T = pinv(B) @ B_rot
    return jnp.matmul(jnp.asarray(pinv), b_rot, precision=_HI).T


def rotate_hoa(amb, orientation, order: int | None = None):
    """amb: (C, N) ACN/N3D channels; rotates every sample by the listener
    quaternion (the order-N generalization of rotateAmbisonic,
    sound_system.zig:480-492)."""
    amb = jnp.asarray(amb)
    if order is None:
        order = int(round(np.sqrt(amb.shape[0]))) - 1
    if n_sh(order) != amb.shape[0]:
        raise ValueError(f"channel count {amb.shape[0]} is not (order+1)^2")
    r = sh_rotation_matrix(orientation, order)
    return jnp.matmul(r, amb, precision=_HI)


def max_re_weights(order: int) -> np.ndarray:
    """Per-channel max-rE weights ((order+1)^2,): Legendre P_l at the
    max-rE limit angle cos(137.9 deg / (order + 1.51)) — the standard
    psychoacoustic truncation/decode weighting (Zotter & Frank 2012)."""
    _check_order(order)
    e = np.cos(np.radians(137.9) / (order + 1.51))
    gains = [np.polynomial.legendre.Legendre.basis(l)(e) for l in range(order + 1)]
    return np.asarray(gains, np.float32)[acn_orders(order)]


def hoa_truncate(amb, order_out: int, weighting: str | None = "max_re"):
    """Truncate (C_in, N) HOA channels to order_out. max-rE weights are
    applied ONLY when channels are actually dropped (they tame truncation
    sidelobes); an already-order_out bed passes through unchanged, keeping
    order-1 beds exactly compatible with the reference pipeline."""
    amb = jnp.asarray(amb)
    c_out = n_sh(order_out)
    if amb.shape[0] < c_out:
        raise ValueError("cannot truncate upward")
    truncating = amb.shape[0] > c_out
    out = amb[:c_out]
    if weighting == "max_re":
        if truncating:
            out = out * jnp.asarray(max_re_weights(order_out))[:, None]
    elif weighting is not None:
        raise ValueError(f"unknown weighting {weighting!r}")
    return out


def hoa_first_order_to_reference(amb4):
    """ACN/N3D first-order block (4, N) -> the reference's channel order
    [W, X=front, Y=up, Z=right] (4, N) consumed by ops/ambisonic.py."""
    return jnp.stack([amb4[0], amb4[3], amb4[2], -amb4[1]], axis=0)


def hoa_to_reference_foa(amb, weighting: str | None = "max_re"):
    """Any-order bed (C, N) -> the reference's [W, x, y, z] (4, N):
    higher orders max-rE-truncate, order 1 passes through exactly, order 0
    pads silent XYZ (a pure-W omni bed)."""
    amb = jnp.asarray(amb)
    if amb.shape[0] < 4:
        amb4 = jnp.concatenate(
            [amb, jnp.zeros((4 - amb.shape[0],) + amb.shape[1:], amb.dtype)],
            axis=0,
        )
    else:
        amb4 = hoa_truncate(amb, 1, weighting)
    return hoa_first_order_to_reference(amb4)


def hoa_to_stereo(amb, irs_l, irs_r, weighting: str | None = "max_re"):
    """Binaural decode of an HOA bed through the reference's first-order
    MagLS HRTF bank: truncate/pad to order 1 (hoa_to_reference_foa), remap
    channels, convolve (ops/ambisonic.ambisonic_to_stereo). Higher-order
    content contributes through the truncation only — the MagLS bank is
    4-channel (src/hrtf.zon). Returns (N + taps - 1, 2)."""
    from .ambisonic import ambisonic_to_stereo

    return ambisonic_to_stereo(hoa_to_reference_foa(amb, weighting), irs_l, irs_r)


def speaker_decoder(speaker_dirs, order: int, weighting: str | None = "max_re"):
    """Mode-matching decoder matrix D (S, C): feeds = D @ amb.

    speaker_dirs: (S, 3) unit directions in the framework frame. D is the
    pseudoinverse of the speakers' SH sampling matrix, so re-encoding the
    feeds reproduces the bed (exactly when S >= C and the rig spans the
    basis). Optional max-rE weighting tapers high orders."""
    _check_order(order)
    b = np.asarray(sh_basis(np.asarray(speaker_dirs, np.float32), order))
    d = np.linalg.pinv(b.T)  # (S, C)
    if weighting == "max_re":
        d = d * max_re_weights(order)[None, :]
    elif weighting is not None:
        raise ValueError(f"unknown weighting {weighting!r}")
    return jnp.asarray(d.astype(np.float32))


def speaker_decoder_foa_reference(speaker_dirs, weighting: str | None = None):
    """(S, 4) mode-matching decoder for first-order beds in the REFERENCE
    channel order [W, x=front, y=up, z=right] (the engine/IR pipeline's
    native layout): exactly speaker_decoder(dirs, 1) with its columns
    remapped by the signed ACN<->reference permutation
    ([W, X, Y, Z] = [acn0, acn3, acn2, -acn1])."""
    d = np.asarray(speaker_decoder(speaker_dirs, 1, weighting))
    return jnp.asarray(
        np.stack([d[:, 0], d[:, 3], d[:, 2], -d[:, 1]], axis=1)
    )


def decode_to_speakers(amb, speaker_dirs, weighting: str | None = "max_re"):
    """amb (C, N) -> speaker feeds (S, N)."""
    amb = jnp.asarray(amb)
    order = int(round(np.sqrt(amb.shape[0]))) - 1
    d = speaker_decoder(speaker_dirs, order, weighting)
    return jnp.matmul(d, amb, precision=_HI)


@lru_cache(maxsize=None)
def hoa_binaural_bank(order: int, bank=None):
    """Order-N binaural decoder FIRs ((C, taps) left, (C, taps) right) from
    a MagLS bank npz — by default the rigid-sphere model
    (data/hrtf_hoa_sphere.npz, built by tools/make_hoa_hrtf.py — Duda &
    Martens spherical-head HRTF, MagLS fit per order); `bank` points at
    any npz with the same irs_{l,r}_oN keys, e.g. a MEASURED human set
    converted from a SOFA file by tools/convert_sofa.py. Unlike
    hoa_to_stereo's max-rE truncation through the reference's 4-channel
    bank, this decodes EVERY channel of an order-N bed. Channels are
    ACN/N3D in the framework frame."""
    from pathlib import Path

    _check_order(order)
    if order == 0:
        raise ValueError("order-0 beds have no spatial content to decode; "
                         "use hoa_to_stereo")
    path = (
        Path(bank) if bank is not None
        else Path(__file__).resolve().parents[2] / "data"
        / "hrtf_hoa_sphere.npz"
    )
    with np.load(path) as z:
        if f"irs_l_o{order}" not in z:
            raise ValueError(
                f"bank {path} has no order-{order} decoder (keys: "
                f"{sorted(k for k in z.files if k.startswith('irs_l'))})"
            )
        return (
            jnp.asarray(z[f"irs_l_o{order}"]),
            jnp.asarray(z[f"irs_r_o{order}"]),
        )


def hoa_to_stereo_sphere(amb, order: int | None = None, bank=None):
    """Full-order binaural decode of an ACN/N3D HOA bed (C, N) through the
    rigid-sphere MagLS bank: every spherical-harmonic channel convolves
    with its own decoder FIR (no truncation). Returns (N + taps - 1, 2)."""
    from .ambisonic import ambisonic_to_stereo

    amb = jnp.asarray(amb)
    if order is None:
        order = int(round(np.sqrt(amb.shape[0]))) - 1
    if n_sh(order) != amb.shape[0]:
        raise ValueError(f"channel count {amb.shape[0]} is not (order+1)^2")
    irs_l, irs_r = hoa_binaural_bank(order, bank=bank)
    # ambisonic_to_stereo's einsum is generic in the channel count
    return ambisonic_to_stereo(amb, irs_l, irs_r)
