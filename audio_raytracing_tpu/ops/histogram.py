"""Delay-histogram scatter strategies.

Binning millions of (bin, payload) contributions per bounce into a
~32k-bin histogram is the IR tracer's second hot spot after intersection.
Two strategies:

  * segment — jax.ops.segment_sum (XLA scatter-add). Exact f32; on TPU the
    scatter lowering serializes updates and dominates trace time for large
    ray counts.
  * matmul — two-level one-hot contraction on the MXU: split the bin index
    into (coarse, fine) digits, build one-hot factors, and compute
    H[coarse, fine, c] = sum_r A[r, coarse] * (fine_onehot * payload_c)[r, fine]
    as C matmuls of shape (n_coarse, R) @ (R, n_fine). One-hot factors are
    exact in bf16; payloads are bf16-rounded at MXU input (f32 accumulate),
    so expect ~1e-3 relative error — fine for energy histograms, selected
    explicitly. With precision=HIGHEST the payload side stays f32-accurate
    at ~6x the MXU passes, still far faster than scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bin_segment(payload, bins, n_bins: int):
    """payload (R, C) f32, bins (R,) int32 in [0, n_bins] (== n_bins drops).
    Returns (n_bins, C)."""
    return jax.ops.segment_sum(payload, bins, num_segments=n_bins + 1)[:-1]


def bin_matmul(payload, bins, n_bins: int, n_fine: int = 128,
               precision=jax.lax.Precision.DEFAULT):
    """MXU two-level binning. n_bins must be a multiple of n_fine.

    bins == n_bins (the drop sentinel) maps outside both one-hot ranges and
    contributes nothing.

    DEFAULT precision feeds the MXU bf16-rounded payloads with f32
    accumulation: ~4e-3 relative rounding per contribution, far below the
    Monte-Carlo noise floor of the histogram itself, at full systolic-array
    rate (the one-hot side is exact in bf16). Pass HIGHEST for exact-f32
    comparisons in tests.
    """
    assert n_bins % n_fine == 0, (n_bins, n_fine)
    n_coarse = n_bins // n_fine
    coarse = bins // n_fine  # (R,)
    fine = bins - coarse * n_fine
    default = precision == jax.lax.Precision.DEFAULT
    # DEFAULT runs the MXU in bf16 anyway; materializing the (R, Nf*C)
    # one-hot product in bf16 halves its HBM traffic (the binner is
    # bandwidth-bound, not flops-bound)
    dt = jnp.bfloat16 if default else jnp.float32
    # drop sentinel: coarse == n_coarse -> no one-hot column matches
    a = (coarse[:, None] == jnp.arange(n_coarse)[None, :]).astype(dt)  # (R, Nc)
    f1 = (fine[:, None] == jnp.arange(n_fine)[None, :]).astype(dt)  # (R, Nf)
    C = payload.shape[1]
    # one (Nc, R) @ (R, Nf*C) contraction: B[r, f*C + c] = fine_onehot * payload
    b = (f1[:, :, None] * payload.astype(dt)[:, None, :]).reshape(
        payload.shape[0], n_fine * C
    )
    h = jnp.dot(a.T, b, precision=precision, preferred_element_type=jnp.float32)
    return h.reshape(n_bins, C).astype(jnp.float32)
