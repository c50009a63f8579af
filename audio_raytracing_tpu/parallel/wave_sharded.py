"""Multi-chip FDTD wave solver: x-slab domain decomposition.

The classic stencil decomposition over an ICI mesh (the wave-solver
counterpart of the ray sharding in parallel/sharding.py): the pressure
and velocity grids are sharded into contiguous x-slabs, one per device,
and each leapfrog step exchanges exactly two (Ny, Nz) boundary planes
with the neighbor shards via ``jax.lax.ppermute`` —
  * the velocity half-step needs the NEXT shard's first pressure plane
    (face i sits between cells i and i+1, models/wave.py layout), and
  * the pressure step needs the PREVIOUS shard's last velocity plane
    (the divergence looks back one face).
Non-cyclic permutes deliver zeros past the chain ends, which is exactly
the rigid-outer-boundary convention of the unsharded solver (the last
global face carries all-zero coefficients), so the sharded run is
numerically identical to models/wave.py::wave_run — asserted by
tests/test_wave_sharded.py on an 8-device CPU mesh.

Everything inside the ``lax.scan`` is elementwise + two plane permutes:
per-step communication is O(Ny*Nz) while compute is O(Nx*Ny*Nz / D), so
slabs scale on ICI until Nx/D approaches the plane cost.

The source is injected and the listener read through one-hot masks
(sharded like the grid) rather than indices: the owning shard is then a
data question, not a control-flow question, and the per-step readout is
a psum of a masked sum.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.wave import (
    WaveDomain,
    WaveIR,
    _face_terms,
    _shift_down_zero,
    _shift_up_zero,
    check_courant,
    courant_dt,
    source_pulse,
    wall_impedance_coefficients,
)


def _pad_x_to_multiple(occ: np.ndarray, d: int) -> np.ndarray:
    """Pad the x axis with solid cells to a multiple of the shard count
    (solid padding is inert: zero pressure, zero-coefficient faces)."""
    nx = occ.shape[0]
    pad = (-nx) % d
    if pad == 0:
        return occ
    return np.concatenate([occ, np.zeros((pad,) + occ.shape[1:], occ.dtype)])


def wave_run_sharded(
    domain: WaveDomain,
    src_cell: tuple,
    lst_cell: tuple,
    n_steps: int,
    mesh: Mesh,
    axis: str = "x",
    c: float = 350.0,
    alpha: float = 0.1,
    cfl: float = 0.999,
    fc: float | None = None,
    pulse=None,
    dt: float | None = None,
    kernel: str = "auto",
    block: int | None = None,
    block_y: int | None = None,
    pallas_interpret: bool = False,
) -> WaveIR:
    """Sharded twin of models/wave.py::wave_run over ``mesh[axis]``.

    Numerically identical to the unsharded solver (same coefficients,
    same rigid outer boundary); the grid's x extent is padded with solid
    cells to a multiple of the shard count.

    kernel: "xla" (the elementwise shard step above), "pallas" (each
    shard's slab steps through the fused grid-pipelined slab kernel —
    ops/pallas_wave.py::make_shard_step — with the same one-plane
    ppermute halos; this is where the kernel's single-chip win composes
    with slab scaling on real multi-chip hardware), or "auto" (pallas
    under the same measured rule as models/wave.py::wave_run: >= ~12M
    cells per SHARD on a TPU backend and a plane that fits scoped
    VMEM). The two paths are numerically equivalent (the shard-boundary
    face is recomputed from the identical inputs in the identical op
    order); tests/test_wave_sharded.py pins pallas-vs-unsharded on the
    8-device CPU mesh in interpret mode."""
    if kernel not in ("auto", "xla", "pallas"):
        raise ValueError(f"kernel must be auto/xla/pallas, got {kernel!r}")
    d_shards = mesh.shape[axis]
    occ_np = _pad_x_to_multiple(np.asarray(domain.occ, np.float32), d_shards)
    dx = float(domain.dx)
    if dt is None:
        dt = courant_dt(dx, c, cfl)
    check_courant(dt, dx, c)
    for name, cell in (("src", src_cell), ("lst", lst_cell)):
        if float(occ_np[tuple(cell)]) != 1.0:
            raise ValueError(f"{name} cell {tuple(cell)} is not an air cell")
    if fc is None:
        fc = c / (16.0 * dx)
    if pulse is None:
        pulse, t0 = source_pulse(n_steps, dt, fc)
    else:
        pulse = jnp.asarray(pulse, jnp.float32)
        t0 = float(np.argmax(np.abs(np.asarray(pulse)))) * dt
    kp = c * c * dt / dx
    k = dt / dx
    a_w, b_w = wall_impedance_coefficients(alpha, c, dt, dx)

    fwd = [(r, r + 1) for r in range(d_shards - 1)]  # to the next shard
    bwd = [(r + 1, r) for r in range(d_shards - 1)]  # to the previous

    use_pallas = kernel == "pallas"
    if kernel == "auto":
        from ..ops.pallas_wave import grid_kernel_feasible

        cells_per_shard = int(np.prod(occ_np.shape)) // d_shards
        use_pallas = (
            cells_per_shard >= 12_000_000
            # shard planes larger than scoped VMEM now TILE along y
            # inside make_shard_step; only an enormous z extent is
            # infeasible
            and grid_kernel_feasible(occ_np.shape)
            and jax.default_backend() == "tpu"
        )
    if use_pallas:
        from ..ops.pallas_wave import _round_up, make_shard_step

        nx, ny0, nz0 = occ_np.shape
        ny_p, nz_p = _round_up(ny0, 8), _round_up(nz0, 128)
        occ_pp = np.zeros((nx, ny_p, nz_p), np.float32)
        occ_pp[:, :ny0, :nz0] = occ_np
        Sx = nx // d_shards
        step_fn, _B = make_shard_step(
            Sx, ny_p, nz_p, block=block, interpret=pallas_interpret,
            block_y=block_y,
        )
        si, sj, sk = (int(x) for x in src_cell)
        li, lj, lk = (int(x) for x in lst_cell)
        kf = jnp.float32(k)
        awf = jnp.float32(a_w)
        bwf = jnp.float32(b_w)
        kpf = jnp.float32(kp)
        z32 = jnp.float32(0.0)

        def local_pl(occ_l, pulse_r):
            r = jax.lax.axis_index(axis)
            occ_prev = jax.lax.ppermute(occ_l[-1], axis, fwd)
            occ_next = jax.lax.ppermute(occ_l[0], axis, bwd)
            not_first = (r != 0).astype(jnp.float32)
            si_l = jnp.where(si // Sx == r, jnp.int32(si % Sx),
                             jnp.int32(-1))
            li_l = jnp.where(li // Sx == r, jnp.int32(li % Sx),
                             jnp.int32(-1))
            io = jnp.stack([
                si_l, jnp.int32(sj), jnp.int32(sk), jnp.int32(0),
                li_l, jnp.int32(lj), jnp.int32(lk), jnp.int32(0),
            ]).reshape(1, 8)

            def step(state, s_t):
                p, vx, vy, vz = state
                # both halos in ONE up-front exchange pair per step: the
                # neighbor's NEW last vx face is recomputed in-kernel
                # from (p_prev, vx_prev, occ halos) — bit-identical
                p_next = jax.lax.ppermute(p[0], axis, bwd)
                both_prev = jax.lax.ppermute(
                    jnp.stack([p[-1], vx[-1]]), axis, fwd
                )
                coef = jnp.stack([
                    kf, awf, bwf, kpf, s_t, not_first, z32, z32,
                ]).reshape(1, 8)
                p, vx, vy, vz, rec = step_fn(
                    coef, io, p, occ_l, vx, vy, vz,
                    both_prev[0], p_next, occ_prev, occ_next,
                    both_prev[1],
                )
                return (p, vx, vy, vz), jax.lax.psum(rec, axis)

            zero = jnp.zeros_like(occ_l)
            _, rec = jax.lax.scan(step, (zero, zero, zero, zero), pulse_r)
            return rec

        spec = P(axis)
        # check_vma=False: pallas_call's ShapeDtypeStructs carry no
        # varying-mesh-axes annotation, which the default vma checker
        # rejects inside shard_map
        fn = jax.shard_map(
            local_pl, mesh=mesh, in_specs=(spec, P()), out_specs=P(),
            check_vma=False,
        )
        sharding = NamedSharding(mesh, spec)
        rec = fn(
            jax.device_put(jnp.asarray(occ_pp), sharding), pulse
        )
        return WaveIR(pressure=rec, dt=float(dt), pulse=pulse, t0=t0)

    occ = jnp.asarray(occ_np)
    src_mask = np.zeros(occ_np.shape, np.float32)
    src_mask[tuple(int(i) for i in src_cell)] = 1.0
    lst_mask = np.zeros(occ_np.shape, np.float32)
    lst_mask[tuple(int(i) for i in lst_cell)] = 1.0


    def local(occ_l, src_l, lst_l, pulse_r):
        # the x-face occupancy halo is static: exchange it once, outside
        # the scan (face-update coefficients are computed on the fly from
        # occupancy each step — see models/wave.py::_face_terms)
        occ_next = jax.lax.ppermute(occ_l[0], axis, bwd)
        occ_hi_x = jnp.concatenate([occ_l[1:], occ_next[None]], axis=0)
        ax, blx, brx = _face_terms(occ_l, occ_hi_x, a_w, b_w, k)

        def step(state, s_t):
            p, vx, vy, vz = state
            # halo 1: next shard's first pressure plane (zeros past end)
            p_next = jax.lax.ppermute(p[0], axis, bwd)
            px = jnp.concatenate([p[1:], p_next[None]], axis=0)
            vx_n = ax * vx + blx * p + brx * px
            ay, bly, bry = _face_terms(occ_l, _shift_down_zero(occ_l, 1),
                                       a_w, b_w, k)
            vy_n = ay * vy + bly * p + bry * _shift_down_zero(p, 1)
            az, blz, brz = _face_terms(occ_l, _shift_down_zero(occ_l, 2),
                                       a_w, b_w, k)
            vz_n = az * vz + blz * p + brz * _shift_down_zero(p, 2)
            # halo 2: previous shard's last velocity plane (zeros at rank 0)
            vx_prev = jax.lax.ppermute(vx_n[-1], axis, fwd)
            div = (
                (vx_n - jnp.concatenate([vx_prev[None], vx_n[:-1]], axis=0))
                + (vy_n - _shift_up_zero(vy_n, 1))
                + (vz_n - _shift_up_zero(vz_n, 2))
            )
            p = (p - kp * div) * occ_l + s_t * src_l
            rec = jax.lax.psum(jnp.sum(p * lst_l), axis)
            return (p, vx_n, vy_n, vz_n), rec

        zero = jnp.zeros_like(occ_l)
        _, rec = jax.lax.scan(step, (zero, zero, zero, zero), pulse_r)
        return rec

    spec = P(axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=P(),
    )
    sharding = NamedSharding(mesh, spec)
    put = lambda a: jax.device_put(a, sharding)
    rec = fn(
        put(occ),
        put(jnp.asarray(src_mask)),
        put(jnp.asarray(lst_mask)),
        pulse,
    )
    return WaveIR(pressure=rec, dt=float(dt), pulse=pulse, t0=t0)
