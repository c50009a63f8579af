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

import jax
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


# ---------------------------------------------------------------------------
# Real-arithmetic path (split re/im, DFT as matmul).
#
# Some TPU runtimes (including the axon backend this repo benches on) do not
# implement complex64 at all — no jnp.fft, no complex arithmetic. For the
# short transforms of streaming partitioned convolution (2B = 256 points)
# the DFT is a pair of small dense matmuls, which the MXU eats; the FDL
# complex multiply becomes four real multiplies. Numerically equivalent to
# the complex path (differentially tested).
# ---------------------------------------------------------------------------


def _dft_matrices(block: int):
    """Forward rFFT as matmul: X_re = seg @ CR, X_im = seg @ CI with
    seg (2B,); inverse: y = X_re @ IR + X_im @ II giving (2B,)."""
    import numpy as np  # host-side constant construction

    N = 2 * block
    F = block + 1
    n = np.arange(N)[:, None]
    k = np.arange(F)[None, :]
    ang = 2.0 * np.pi * n * k / N
    CR = np.cos(ang).astype(np.float32)  # (N, F)
    CI = (-np.sin(ang)).astype(np.float32)
    w = np.full(F, 2.0, np.float32)
    w[0] = w[-1] = 1.0
    ang_i = 2.0 * np.pi * k.T * np.arange(N)[None, :] / N  # (F, N)
    IR = (w[:, None] * np.cos(ang_i) / N).astype(np.float32)
    II = (-w[:, None] * np.sin(ang_i) / N).astype(np.float32)
    return jnp.asarray(CR), jnp.asarray(CI), jnp.asarray(IR), jnp.asarray(II)


def partition_ir_real(ir, block: int):
    """ir (..., L) -> (H_re, H_im) each (..., P, F) float32."""
    L = ir.shape[-1]
    P = -(-L // block)
    pad = P * block - L
    irp = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, pad)])
    parts = irp.reshape(ir.shape[:-1] + (P, block))
    parts = jnp.concatenate([parts, jnp.zeros_like(parts)], axis=-1)  # zero-pad 2B
    CR, CI, _, _ = _dft_matrices(block)
    hi = jax.lax.Precision.HIGHEST
    return (
        jnp.einsum("...pn,nf->...pf", parts, CR, precision=hi),
        jnp.einsum("...pn,nf->...pf", parts, CI, precision=hi),
    )


class RealConvState(NamedTuple):
    fdl_re: jnp.ndarray  # (..., P, F)
    fdl_im: jnp.ndarray
    prev_input: jnp.ndarray  # (..., B)


def conv_init_real(shape_prefix: tuple, n_partitions: int, block: int) -> RealConvState:
    F = block + 1
    return RealConvState(
        fdl_re=jnp.zeros(shape_prefix + (n_partitions, F), jnp.float32),
        fdl_im=jnp.zeros(shape_prefix + (n_partitions, F), jnp.float32),
        prev_input=jnp.zeros(shape_prefix + (block,), jnp.float32),
    )


def conv_block_real(x, state: RealConvState, h_re, h_im):
    """Streaming block, real arithmetic. x (..., B); h_* (..., P, F)."""
    B = x.shape[-1]
    CR, CI, IR, II = _dft_matrices(B)
    hi = jax.lax.Precision.HIGHEST
    seg = jnp.concatenate([state.prev_input, x], axis=-1)  # (..., 2B)
    x_re = jnp.einsum("...n,nf->...f", seg, CR, precision=hi)
    x_im = jnp.einsum("...n,nf->...f", seg, CI, precision=hi)
    fdl_re = jnp.concatenate([x_re[..., None, :], state.fdl_re[..., :-1, :]], axis=-2)
    fdl_im = jnp.concatenate([x_im[..., None, :], state.fdl_im[..., :-1, :]], axis=-2)
    y_re = jnp.sum(fdl_re * h_re - fdl_im * h_im, axis=-2)
    y_im = jnp.sum(fdl_re * h_im + fdl_im * h_re, axis=-2)
    y = (
        jnp.einsum("...f,fn->...n", y_re, IR, precision=hi)
        + jnp.einsum("...f,fn->...n", y_im, II, precision=hi)
    )[..., B:]
    return y, RealConvState(fdl_re=fdl_re, fdl_im=fdl_im, prev_input=x)


def conv_block_crossfade_real(x, state: RealConvState, old, new):
    """Crossfaded swap, real arithmetic. old/new: (h_re, h_im) pairs."""
    B = x.shape[-1]
    CR, CI, IR, II = _dft_matrices(B)
    hi = jax.lax.Precision.HIGHEST
    seg = jnp.concatenate([state.prev_input, x], axis=-1)
    x_re = jnp.einsum("...n,nf->...f", seg, CR, precision=hi)
    x_im = jnp.einsum("...n,nf->...f", seg, CI, precision=hi)
    fdl_re = jnp.concatenate([x_re[..., None, :], state.fdl_re[..., :-1, :]], axis=-2)
    fdl_im = jnp.concatenate([x_im[..., None, :], state.fdl_im[..., :-1, :]], axis=-2)

    def out(h):
        h_re, h_im = h
        y_re = jnp.sum(fdl_re * h_re - fdl_im * h_im, axis=-2)
        y_im = jnp.sum(fdl_re * h_im + fdl_im * h_re, axis=-2)
        return (
            jnp.einsum("...f,fn->...n", y_re, IR, precision=hi)
            + jnp.einsum("...f,fn->...n", y_im, II, precision=hi)
        )[..., B:]

    w = (jnp.arange(B, dtype=jnp.float32) + 1.0) / B
    y = out(old) * (1.0 - w) + out(new) * w
    return y, RealConvState(fdl_re=fdl_re, fdl_im=fdl_im, prev_input=x)


def convolve_direct(x, ir):
    """'Full' convolution via lax.conv (real arithmetic, TPU-safe for any
    runtime; use for offline combines where jnp.fft may be unavailable).
    x (..., N), ir (..., L) broadcasting on leading dims -> (..., N+L-1)."""
    xb = jnp.broadcast_arrays(x[..., :1], ir[..., :1])[0].shape[:-1]
    n = x.shape[-1]
    L = ir.shape[-1]
    xf = jnp.broadcast_to(x, xb + (n,)).reshape(-1, 1, n)
    irf = jnp.broadcast_to(ir, xb + (L,)).reshape(-1, 1, L)
    xp = jnp.pad(xf, ((0, 0), (0, 0), (L - 1, L - 1)))
    # grouped conv: each batch row convolves with its own kernel
    out = jax.lax.conv_general_dilated(
        xp.reshape(1, -1, n + 2 * L - 2),
        jnp.flip(irf, -1).transpose(1, 0, 2).reshape(-1, 1, L),
        window_strides=(1,),
        padding="VALID",
        feature_group_count=xf.shape[0],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(xb + (n + L - 1,))


# ---------------------------------------------------------------------------
# Two-level non-uniform partitioning (real arithmetic).
#
# A uniform partitioning of an L-sample IR costs P = L/B spectra MACs per
# block. The standard real-time convolver upgrade splits the IR into a
# B-partitioned HEAD (the first K*B samples — latency-critical) and a
# (K*B)-partitioned TAIL run once every K blocks: amortized tail cost drops
# by ~K while the per-block latency stays B. Alignment is chosen so the
# tail chunk computed at the end of input group g is EXACTLY the tail
# contribution to output group g+1 (head covers taps [0, K*B), tail taps
# [K*B, L) delayed one group), so the only extra state is one K*B input
# accumulator and one K*B output buffer — no ring arithmetic.
# ---------------------------------------------------------------------------


class NUPConvState(NamedTuple):
    head: RealConvState  # B-block convolver over the first K*B taps
    tail: RealConvState  # (K*B)-block convolver over the remaining taps
    inbuf: jnp.ndarray  # (..., K*B) current input group accumulator
    outbuf: jnp.ndarray  # (..., K*B) tail output for the CURRENT group
    step: jnp.ndarray  # () int32 block counter


def nup_partition_ir_real(ir, block: int, k: int = 8):
    """ir (..., L) -> (head (h_re, h_im) with K partitions of `block`,
    tail (h_re, h_im) with ceil((L - K*block)/(K*block)) partitions of
    K*block). L may be shorter than K*block (tail is a zero partition)."""
    kb = k * block
    L = ir.shape[-1]
    lead = [(0, 0)] * (ir.ndim - 1)
    head_ir = ir[..., :kb]
    head_ir = jnp.pad(head_ir, lead + [(0, max(0, kb - L))])
    tail_ir = ir[..., kb:]
    if tail_ir.shape[-1] == 0:
        tail_ir = jnp.zeros(ir.shape[:-1] + (kb,), ir.dtype)
    return (
        partition_ir_real(head_ir, block),
        partition_ir_real(tail_ir, kb),
    )


def nup_init_real(shape_prefix: tuple, n_tail_partitions: int, block: int,
                  k: int = 8) -> NUPConvState:
    kb = k * block
    return NUPConvState(
        head=conv_init_real(shape_prefix, k, block),
        tail=conv_init_real(shape_prefix, n_tail_partitions, kb),
        inbuf=jnp.zeros(shape_prefix + (kb,), jnp.float32),
        outbuf=jnp.zeros(shape_prefix + (kb,), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


def conv_block_nup_real(x, state: NUPConvState, head, tail):
    """One streaming block through the two-level convolver.

    x: (..., B); head/tail: (h_re, h_im) spectra pairs from
    nup_partition_ir_real. Returns (y (..., B), state). Output is
    bit-equivalent to the uniform convolver (same DFT matmuls, same taps),
    at ~1/k of the tail's frequency-domain MAC cost per block."""
    B = x.shape[-1]
    k = state.head.fdl_re.shape[-2]
    y_head, head_state = conv_block_real(x, state.head, *head)
    r = state.step % k
    # the tail contribution to THIS block, computed at the last group edge
    y_tail = jax.lax.dynamic_slice_in_dim(state.outbuf, r * B, B, axis=-1)
    inbuf = jax.lax.dynamic_update_slice_in_dim(state.inbuf, x, r * B, axis=-1)

    def run_tail(op):
        inbuf, tail_state = op
        out, new_tail = conv_block_real(inbuf, tail_state, *tail)
        return out, new_tail, jnp.zeros_like(inbuf)

    def keep_tail(op):
        inbuf, tail_state = op
        return state.outbuf, tail_state, inbuf

    outbuf, tail_state, inbuf = jax.lax.cond(
        r == k - 1, run_tail, keep_tail, (inbuf, state.tail)
    )
    return y_head + y_tail, NUPConvState(
        head=head_state, tail=tail_state, inbuf=inbuf, outbuf=outbuf,
        step=state.step + 1,
    )


def binaural_ir_spectra_real(amb_ir, orientation, hrtf_l, hrtf_r, block: int):
    """Real-arithmetic variant of binaural_ir_spectra: time-domain combine
    via lax.conv, then DFT-matmul partitioning. Returns ((2, P, F) re,
    (2, P, F) im)."""
    from ..utils import quat

    xyz = amb_ir[1:4].T
    rot = quat.rotate(orientation[None, :], xyz).T
    amb_rot = jnp.concatenate([amb_ir[:1], rot], axis=0)  # (4, L)
    left = jnp.sum(convolve_direct(amb_rot, hrtf_l), axis=0)
    right = jnp.sum(convolve_direct(amb_rot, hrtf_r), axis=0)
    return partition_ir_real(jnp.stack([left, right], axis=0), block)
