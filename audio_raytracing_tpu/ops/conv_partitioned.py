"""Uniformly partitioned overlap-save convolution (streaming, crossfaded).

The reference renders spatialization with 128-tap direct convolutions
(8 x O(N*M) MACs per block, sound_system.zig:501-524) — fine for 128 taps,
hopeless for the second-long impulse responses the IR tracer produces.
This module implements the standard real-time partitioned convolution:

  * the IR is split into P blocks of B samples; each block's rFFT (size
    2B) is precomputed: H (P, F) complex;
  * per audio block, the newest input rFFT is pushed into a frequency-
    domain delay line X (P, F); the output block is
    irfft(sum_p X[p] * H[p])[B:] — one complex multiply-accumulate over
    the partition axis, which XLA fuses into a single batched op;
  * swapping IRs (a moving listener re-traces every frame — BASELINE
    config 4) renders one block with both old and new spectra and
    crossfades linearly, the block-level generalization of the
    reference's prev_dist lerping (sound_system.zig:213-225, 468-476).

Complexity per block: O(P * F) MAC vs O(L * B) direct — for L = 44100,
B = 128 that is ~180x fewer operations, and it is all large dense
elementwise work the VPU eats.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def partition_ir(ir, block: int):
    """ir: (..., L) -> spectra (..., P, F) complex64, F = block + 1."""
    L = ir.shape[-1]
    P = -(-L // block)
    pad = P * block - L
    irp = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, pad)])
    parts = irp.reshape(ir.shape[:-1] + (P, block))
    return jnp.fft.rfft(parts, 2 * block, axis=-1)


class ConvState(NamedTuple):
    """Streaming state for one convolver lane set."""

    fdl: jnp.ndarray  # (..., P, F) complex64 frequency-domain delay line
    prev_input: jnp.ndarray  # (..., B) last input block (overlap-save)


def conv_init(shape_prefix: tuple, n_partitions: int, block: int) -> ConvState:
    F = block + 1
    return ConvState(
        fdl=jnp.zeros(shape_prefix + (n_partitions, F), jnp.complex64),
        prev_input=jnp.zeros(shape_prefix + (block,), jnp.float32),
    )


def conv_block(x, state: ConvState, spectra):
    """Process one block.

    x: (..., B) input; spectra: (..., P, F). Returns (y (..., B), state).
    """
    B = x.shape[-1]
    seg = jnp.concatenate([state.prev_input, x], axis=-1)  # (..., 2B)
    X = jnp.fft.rfft(seg, axis=-1)  # (..., F)
    fdl = jnp.concatenate([X[..., None, :], state.fdl[..., :-1, :]], axis=-2)
    Y = jnp.sum(fdl * spectra, axis=-2)
    y = jnp.fft.irfft(Y, 2 * B, axis=-1)[..., B:]
    return y, ConvState(fdl=fdl, prev_input=x)


def conv_block_crossfade(x, state: ConvState, spectra_old, spectra_new):
    """One block rendered under both IRs, linearly crossfaded old->new.
    Use when the IR was just swapped; afterwards continue with
    conv_block(x, state, spectra_new)."""
    B = x.shape[-1]
    seg = jnp.concatenate([state.prev_input, x], axis=-1)
    X = jnp.fft.rfft(seg, axis=-1)
    fdl = jnp.concatenate([X[..., None, :], state.fdl[..., :-1, :]], axis=-2)
    y_old = jnp.fft.irfft(jnp.sum(fdl * spectra_old, axis=-2), 2 * B, axis=-1)[..., B:]
    y_new = jnp.fft.irfft(jnp.sum(fdl * spectra_new, axis=-2), 2 * B, axis=-1)[..., B:]
    w = (jnp.arange(B, dtype=jnp.float32) + 1.0) / B
    y = y_old * (1.0 - w) + y_new * w
    return y, ConvState(fdl=fdl, prev_input=x)


def convolve_offline(x, ir):
    """'Full' FFT convolution for offline rendering: x (..., N), ir (..., L)
    -> (..., N + L - 1) (broadcasting over leading dims)."""
    n = x.shape[-1]
    L = ir.shape[-1]
    size = n + L - 1
    fft_n = 1
    while fft_n < size:
        fft_n *= 2
    X = jnp.fft.rfft(x, fft_n, axis=-1)
    H = jnp.fft.rfft(ir, fft_n, axis=-1)
    return jnp.fft.irfft(X * H, fft_n, axis=-1)[..., :size]


def binaural_ir_spectra(amb_ir, orientation, hrtf_l, hrtf_r, block: int):
    """Fold listener rotation + HRTF decode into per-ear partitioned spectra.

    amb_ir: (4, L) world-space ambisonic IR. Rotating the listener only
    rotates the IR's XYZ channels (rotation commutes with convolution), and
    the MagLS decode is channel-wise convolution — so the whole
    IR -> rotate -> HRTF chain collapses into TWO stereo IRs combined in
    the time domain (one cheap on-device FFT conv per update), then
    partitioned. Exact: no per-partition circular-aliasing shortcut.

    Returns (2, P, F) complex64 (ear-major).
    """
    from ..utils import quat

    xyz = amb_ir[1:4].T  # (L, 3)
    # listener rotation applied to the world-space directional channels
    rot = quat.rotate(orientation[None, :], xyz).T
    amb_rot = jnp.concatenate([amb_ir[:1], rot], axis=0)
    left = jnp.sum(convolve_offline(amb_rot, hrtf_l), axis=0)  # (L + m - 1,)
    right = jnp.sum(convolve_offline(amb_rot, hrtf_r), axis=0)
    return partition_ir(jnp.stack([left, right], axis=0), block)
