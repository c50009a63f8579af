"""Delay-axis sharded partitioned convolution — the sequence-parallel
analogue (SURVEY.md §5 "long-context").

Very long impulse responses (seconds of reverb tail = thousands of
partitions) can exceed one chip's appetite; here the partition axis of the
frequency-domain delay line (FDL) and the IR spectra is sharded over a
mesh axis ("delay"). Per audio block:

  * every device computes the new input spectrum locally (one rfft of the
    replicated input block — cheaper than broadcasting it);
  * the FDL shifts one slot: each device passes its oldest slot to its
    right neighbour with a single `ppermute` of one (F,) spectrum — the
    only inter-chip traffic besides
  * one `psum` of the (F,) spectral partial sums over ICI.

The result is bit-equivalent (up to reduction order) to the unsharded
streaming convolver (ops/conv_partitioned.py), verified on the virtual
8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.conv_partitioned import ConvState


def shard_spectra(spectra, mesh: Mesh, axis: str = "delay"):
    """Pad the partition axis to the mesh axis size and return the padded
    spectra plus an initial sharded-ready ConvState. spectra: (P, F)."""
    n = mesh.shape[axis]
    Pn, F = spectra.shape
    pad = (-Pn) % n
    spectra = jnp.pad(spectra, ((0, pad), (0, 0)))
    state = ConvState(
        fdl=jnp.zeros((Pn + pad, F), jnp.complex64),
        prev_input=jnp.zeros((F - 1,), jnp.float32),
    )
    return spectra, state


def conv_block_sharded(x, state: ConvState, spectra, mesh: Mesh, axis: str = "delay"):
    """One streaming block with the partition axis sharded over `axis`.

    x: (B,) replicated input block; state.fdl/spectra: (P, F) sharded on
    the partition dim; state.prev_input: (B,) replicated.
    Returns (y (B,), new state).
    """
    B = x.shape[-1]

    def shard_fn(x, prev, fdl_local, spectra_local):
        idx = jax.lax.axis_index(axis)
        n = jax.lax.axis_size(axis)
        seg = jnp.concatenate([prev, x], axis=-1)
        X = jnp.fft.rfft(seg, axis=-1)  # every device computes it (cheap)
        # oldest local slot moves to the right neighbour
        boundary = fdl_local[-1]
        recv = jax.lax.ppermute(
            boundary, axis, [(i, (i + 1) % n) for i in range(n)]
        )
        insert = jnp.where(idx == 0, X, recv)
        fdl_local = jnp.concatenate([insert[None, :], fdl_local[:-1]], axis=0)
        y_spec = jax.lax.psum(jnp.sum(fdl_local * spectra_local, axis=0), axis)
        y = jnp.fft.irfft(y_spec, 2 * B, axis=-1)[B:]
        return y, fdl_local

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )
    y, fdl = fn(x, state.prev_input, state.fdl, spectra)
    return y, ConvState(fdl=fdl, prev_input=x)
