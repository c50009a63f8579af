"""Quaternion math (xyzw layout), NumPy/JAX polymorphic.

Mirrors the zmath conventions the reference relies on:
  - quat_from_roll_pitch_yaw matches zmath quatFromRollPitchYaw(pitch, yaw,
    roll) / DirectXMath XMQuaternionRotationRollPitchYaw, used at
    src/main.zig:529-533 with roll=0.
  - rotate(q, v) matches zmath.rotate (v + 2*(w*(u x v) + u x (u x v))),
    used to rotate the ambisonic XYZ channels at src/sound_system.zig:480-492.

All functions accept either np or jnp arrays; the array namespace is taken
from the inputs so the same code runs in the NumPy oracle and inside jit.
"""

from __future__ import annotations

import numpy as np


def _xp(*arrays):
    for a in arrays:
        if type(a).__module__.startswith("jax"):
            import jax.numpy as jnp

            return jnp
    return np


def quat_identity(xp=np):
    return xp.asarray([0.0, 0.0, 0.0, 1.0], dtype=xp.float32)


def quat_from_roll_pitch_yaw(pitch, yaw, roll=0.0, xp=np):
    """DirectXMath-convention quaternion from Euler angles (xyzw).

    Rotation order: roll (z), then pitch (x), then yaw (y) — the convention
    zmath inherits from DirectXMath and the reference uses for the listener
    orientation (src/main.zig:529-533).
    """
    hp, hy, hr = pitch * 0.5, yaw * 0.5, roll * 0.5
    sp, cp = xp.sin(hp), xp.cos(hp)
    sy, cy = xp.sin(hy), xp.cos(hy)
    sr, cr = xp.sin(hr), xp.cos(hr)
    x = cr * sp * cy + sr * cp * sy
    y = cr * cp * sy - sr * sp * cy
    z = sr * cp * cy - cr * sp * sy
    w = cr * cp * cy + sr * sp * sy
    return xp.stack([x, y, z, w], axis=-1).astype(xp.float32)


def quat_mul(a, b):
    xp = _xp(a, b)
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return xp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q):
    xp = _xp(q)
    return q * xp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q: v' = q v q^-1.

    Implemented as v + 2*(w*(u x v) + u x (u x v)) matching zmath.rotate.
    Broadcasts over leading dims.
    """
    xp = _xp(q, v)
    u = q[..., :3]
    w = q[..., 3:4]
    uv = xp.cross(u, v)
    return v + 2.0 * (w * uv + xp.cross(u, uv))


def normalize(v, eps=0.0):
    xp = _xp(v)
    n = xp.sqrt(xp.sum(v * v, axis=-1, keepdims=True))
    if eps:
        n = xp.maximum(n, eps)
    return v / n
