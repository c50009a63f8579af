"""Counter-based hash RNG usable INSIDE Pallas kernels.

The stochastic-scattering model family needs per-(ray, bounce) uniforms.
jax.random (threefry) is unavailable inside a Mosaic kernel, and
pltpu.prng_seed/prng_random_bits have no CPU-interpret lowering — a
kernel using them could never be differentially tested by this repo's
CPU suite. So: a stateless integer hash written in plain jnp int32 ops,
which traces identically into the Mosaic kernel, the XLA tracer and the
interpret-mode tests — bit-identical uniforms everywhere.

The mix is lowbias32 (Ellard's improved 32-bit finalizer — the same
xorshift-multiply family as Murmur3's fmix32, chosen for its published
low avalanche bias). int32 multiplies wrap in XLA/Mosaic (two's
complement), which is exactly what the hash wants.

Counters must be unique per draw: callers build them as
  seed ^ (ray_index * K + bounce * 3 + draw)
style linear layouts (see models/ir.py and ops/pallas_trace.py — the two
MUST use the same layout for their outputs to match).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x7FEB352D).astype(np.int32)
_M2 = np.uint32(0x846CA68B).astype(np.int32)


def hash_u32(x):
    """lowbias32 finalizer over int32 counters (wrapping arithmetic)."""
    x = jnp.asarray(x, jnp.int32)
    # arithmetic >> then mask = logical >> (int32 has no unsigned shift)
    x = x ^ (jnp.right_shift(x, 16) & 0xFFFF)
    x = x * _M1
    x = x ^ (jnp.right_shift(x, 15) & 0x1FFFF)
    x = x * _M2
    x = x ^ (jnp.right_shift(x, 16) & 0xFFFF)
    return x


def uniform01(counter):
    """U[0, 1) floats from int32 counters: top 23 mixed bits -> mantissa.
    Same shape as counter, f32."""
    h = hash_u32(counter)
    mant = jnp.right_shift(h, 8) & 0x7FFFFF  # 23 positive bits
    return mant.astype(jnp.float32) * jnp.float32(1.0 / 8388608.0)


def hash_u32_py(x: int) -> int:
    """Pure-python mirror of hash_u32 for host-side (trace-time) seeds —
    e.g. the Pallas kernel folds hash_u32_py(seed) into its counter
    constants at compile time. Tested bit-equal to hash_u32."""
    m1 = 0x7FEB352D
    m2 = 0x846CA68B
    x &= 0xFFFFFFFF
    x ^= x >> 16
    x = (x * m1) & 0xFFFFFFFF
    x ^= x >> 15
    x = (x * m2) & 0xFFFFFFFF
    x ^= x >> 16
    # as a SIGNED int32 (matching jnp's int32 value)
    return x - 0x100000000 if x >= 0x80000000 else x
