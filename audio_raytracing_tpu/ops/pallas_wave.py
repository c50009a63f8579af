"""Fused Pallas FDTD leapfrog step — the wave solver's hot kernel.

The XLA form of the leapfrog step (models/wave.py::_leapfrog_step) is
HBM-bandwidth-bound with a minimal-traffic model of 36 B/cell/step
(read p, vx, vy, vz, occ; write p, vx, vy, vz), but XLA's emitted code
materializes the six shift pads and splits the step into multiple
passes: measured ~2.2x minimal traffic at 2.1M cells decaying to ~5.6x
at 16.8M (benchmarks/RESULTS.md "FDTD wave solver"). This kernel fuses
the whole step into ONE pass over x-slabs held in VMEM — every state
array is read once and written once per step, shifts along x come from
explicit 1-plane DMA halos and shifts along y/z from in-VMEM rolls with
edge masks, so achieved traffic is ~(36 + halo) B/cell.

Domain layout (differs from models/wave.py only by padding):
  - x (leading, untiled): 1 solid pad plane low + solid fill high so the
    real planes tile into ``block`` x-slabs; slab DMAs read one halo
    plane each side.
  - y (sublane) rounded up to 8, z (lane) rounded up to 128 with solid
    fill (occ = 0). Fill cells behave exactly like wall cells, so no
    result changes.
  - Boundary semantics are matched to the XLA solver exactly: a
    "missing" low face (the zero-filled shift_up in _leapfrog_step) is
    reproduced by masking the axis-0 face / the wrapped roll entry to
    zero, and the high domain edge gets the air-solid wall treatment
    via a masked o_hi — both bit-match the unpadded zero-shift
    semantics (see test_pallas_wave.py interpret-mode equality).

All masks are f32 multiplies (Mosaic cannot carry i1 vectors, CLAUDE.md).
Scalar coefficients (k, a_w, b_w, kp) and the per-step source amplitude
arrive via one (1, 8) SMEM row so one compiled executable serves any
timestep / wall impedance on a given grid shape.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.wave import (
    WaveDomain,
    WaveIR,
    _face_terms,
    check_courant,
    courant_dt,
    source_pulse,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block(plane_bytes: int, budget_bytes: int = 6 * 2**20) -> int:
    """Largest power-of-two slab thickness for the manual-DMA kernel
    whose VMEM footprint fits the budget. Declared scratch is 9B + 6 f32
    planes (p/occ (B+2) each, vx (B+1), vy/vz (B), four output slabs
    (B), one zero plane); the body additionally materializes ~8-10
    slab-sized temporaries (edge masks, vxe on B+1 planes, face terms),
    so the estimate doubles the scratch count and the default budget is
    half of v1's 12 MB — same auto picks on the bench grids, honest
    accounting (r2 ADVICE item 2)."""
    b = 1
    while 2 * (9 * (2 * b) + 6) * plane_bytes <= budget_bytes and b < 64:
        b *= 2
    return b


def _pick_block_grid(plane_bytes: int, budget_bytes: int = 10 * 2**20) -> int:
    """Slab thickness for the grid-pipelined kernel: the pipeline
    double-buffers the (5B + 6 planes) of inputs and 4B of outputs
    (= 18B + 12), and the body holds ~12B planes of live temporaries."""
    b = 1
    while (30 * (2 * b) + 12) * plane_bytes <= budget_bytes and b < 128:
        b *= 2
    return b


# Mosaic's scoped-VMEM limit is 16 MB; at B=1 the grid kernel's measured
# footprint is ~27 padded planes (the 400^3 compile reported 21.88M
# scoped at plane=819 KB -> 26.7 planes), so planes past ~16M/27 cannot
# compile AT ANY slab thickness. 320^3 (plane 491 KB -> ~13M) is the
# largest bench grid that fits at full planes; BIGGER planes now tile
# along y (r5: _step_kernel_grid_ytiled — the r4 VERDICT's named lift),
# so 256x512x512 and 512^3 engage the kernel instead of silently
# falling back to XLA.
_GRID_KERNEL_MAX_PLANE_BYTES = (16 * 2**20) // 27

# y-tiled kernel: target tile-plane size. The tiled kernel's measured
# scoped-VMEM footprint is ~37 tile-planes at B=1 (the 256x512x512
# Ty=256 compile reported 18.76M at tile-plane 512 KB — the y-halo
# band concats add ~10 plane-units of temporaries over the untiled
# kernel's 27), so the hard cap is ~16M/37 = 440 KB; 320 KB targets
# comfortable margin. Tiles re-fetch 2 8-row halo bands of p/occ + 1
# of vy per Ty rows, so bigger tiles cost less halo traffic.
_YTILE_TARGET_PLANE_BYTES = 320 * 2**10


def grid_kernel_feasible(shape) -> bool:
    """Can the grid-pipelined kernel compile for this domain shape?
    With y tiling the per-block plane is (Ty >= 8, nz_pad); only a
    z extent so large that even an 8-row tile plane exceeds the
    scoped-VMEM budget is infeasible — wave_run's auto mode then stays
    on the XLA solver instead of dying in Mosaic."""
    _, ny, nz = shape
    nz_p = _round_up(nz, 128)
    return 8 * nz_p * 4 <= _GRID_KERNEL_MAX_PLANE_BYTES


def _roll(x, shift: int, axis: int):
    """Circular shift; pltpu.roll only accepts non-negative shifts, and a
    -1 roll is the same rotation as size-1."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _mask_ne(shape, axis: int, idx, offset=0):
    """f32 mask: 1.0 where (iota along axis + offset) != idx."""
    i = jax.lax.broadcasted_iota(jnp.int32, shape, axis) + offset
    return jnp.where(i != idx, 1.0, 0.0).astype(jnp.float32)


def _step_kernel(
    coef_ref,  # (1, 8) SMEM: k, a_w, b_w, kp, pulse_t
    p_hbm, vx_hbm, vy_hbm, vz_hbm, occ_hbm,  # ANY (HBM), padded shapes
    p_out, vx_out, vy_out, vz_out,  # ANY (HBM)
    rec_ref,  # (1, 1) SMEM out: p at the listener after this step
    p_s, occ_s, vx_s, vy_s, vz_s,  # VMEM scratch, slab-sized
    pn_s, vxn_s, vyn_s, vzn_s,  # VMEM scratch, output slabs
    zero_s,  # (1, ny, nz) VMEM scratch, stays zero: pad-plane writes
    in_sems, out_sems, pad_sems,
    *, B: int, n_blocks: int, src, lst, ny: int, nz: int,
):
    k = coef_ref[0, 0]
    a_w = coef_ref[0, 1]
    b_w = coef_ref[0, 2]
    kp = coef_ref[0, 3]
    pulse_t = coef_ref[0, 4]
    si, sj, sk = src
    li, lj, lk = lst

    ext_shape = (B + 1, ny, nz)
    mid_shape = (B, ny, nz)
    # static edge masks (y/z rolls wrap; the wrapped entry is masked off)
    m_ylast = _mask_ne(mid_shape, 1, ny - 1)
    m_zlast = _mask_ne(mid_shape, 2, nz - 1)
    m_y0 = _mask_ne(mid_shape, 1, 0)
    m_z0 = _mask_ne(mid_shape, 2, 0)

    nx_p = n_blocks * B + 2

    def body(b, acc):
        i0 = b * B + 1

        # the x pad planes are halo-read next step but never computed:
        # keep them zero in the (otherwise uninitialized) output buffers.
        # p needs both ends (p halo spans [i0-1, i0+B+1)); vx only the
        # low end (its halo spans [i0-1, i0+B)).
        @pl.when(b == 0)
        def _():
            zero_s[:] = jnp.zeros_like(zero_s)
            pads = (
                pltpu.make_async_copy(zero_s, p_out.at[pl.ds(0, 1)], pad_sems.at[0]),
                pltpu.make_async_copy(zero_s, vx_out.at[pl.ds(0, 1)], pad_sems.at[1]),
                pltpu.make_async_copy(
                    zero_s, p_out.at[pl.ds(nx_p - 1, 1)], pad_sems.at[2]
                ),
            )
            for c in pads:
                c.start()
            for c in pads:
                c.wait()

        copies = (
            pltpu.make_async_copy(
                p_hbm.at[pl.ds(i0 - 1, B + 2)], p_s, in_sems.at[0]
            ),
            pltpu.make_async_copy(
                occ_hbm.at[pl.ds(i0 - 1, B + 2)], occ_s, in_sems.at[1]
            ),
            pltpu.make_async_copy(
                vx_hbm.at[pl.ds(i0 - 1, B + 1)], vx_s, in_sems.at[2]
            ),
            pltpu.make_async_copy(
                vy_hbm.at[pl.ds(i0, B)], vy_s, in_sems.at[3]
            ),
            pltpu.make_async_copy(
                vz_hbm.at[pl.ds(i0, B)], vz_s, in_sems.at[4]
            ),
        )
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        P = p_s[:]
        O = occ_s[:]
        Pm = P[1 : B + 1]
        Om = O[1 : B + 1]

        # x faces at global planes [i0-1, i0+B): halo plane low, slab high
        a, bl, br = _face_terms(O[0 : B + 1], O[1 : B + 2], a_w, b_w, k)
        vxe = a * vx_s[:] + bl * P[0 : B + 1] + br * P[1 : B + 2]
        # the face at padded-x index 0 does not exist in the unpadded
        # solver (rigid low boundary) — mask it off in block 0
        vxe = vxe * _mask_ne(ext_shape, 0, 0, offset=i0 - 1)
        div = vxe[1:] - vxe[:-1]

        # y faces: shift via roll; domain edge (last row) is a wall
        o_hi = _roll(Om, -1, 1) * m_ylast
        a, bl, br = _face_terms(Om, o_hi, a_w, b_w, k)
        vyn = a * vy_s[:] + bl * Pm + br * _roll(Pm, -1, 1)
        div = div + (vyn - _roll(vyn, 1, 1) * m_y0)

        # z faces
        o_hi = _roll(Om, -1, 2) * m_zlast
        a, bl, br = _face_terms(Om, o_hi, a_w, b_w, k)
        vzn = a * vz_s[:] + bl * Pm + br * _roll(Pm, -1, 2)
        div = div + (vzn - _roll(vzn, 1, 2) * m_z0)

        pn = (Pm - kp * div) * Om
        pn_s[:] = pn

        # source injection / listener pickup in the (statically known)
        # block that holds the cell. Mosaic cannot store/load scalars
        # to/from VMEM, so both touch one (ny, nz) plane with an iota
        # mask — full-FIELD masks measured ~40% of the kernel's VPU time
        # at 128^3; one plane per step is noise.
        src_block, src_l = divmod(si - 1, B)
        lst_block, lst_l = divmod(li - 1, B)

        def _plane_mask(j, k):
            return jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0) == j)
                & (jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1) == k),
                jnp.float32(1.0), jnp.float32(0.0),
            )

        @pl.when(b == src_block)
        def _():
            pn_s[src_l] = pn_s[src_l] + pulse_t * _plane_mask(sj, sk)

        acc = acc + jnp.where(
            b == lst_block,
            jnp.sum(pn_s[lst_l] * _plane_mask(lj, lk)),
            jnp.float32(0.0),
        )
        vxn_s[:] = vxe[1:]
        vyn_s[:] = vyn
        vzn_s[:] = vzn
        outs = (
            pltpu.make_async_copy(pn_s, p_out.at[pl.ds(i0, B)], out_sems.at[0]),
            pltpu.make_async_copy(vxn_s, vx_out.at[pl.ds(i0, B)], out_sems.at[1]),
            pltpu.make_async_copy(vyn_s, vy_out.at[pl.ds(i0, B)], out_sems.at[2]),
            pltpu.make_async_copy(vzn_s, vz_out.at[pl.ds(i0, B)], out_sems.at[3]),
        )
        for c in outs:
            c.start()
        for c in outs:
            c.wait()
        return acc

    rec_ref[0, 0] = jax.lax.fori_loop(0, n_blocks, body, jnp.float32(0.0))


def _pad_domain(occ: np.ndarray, block: int | None):
    """(occ_padded, B, n_blocks, offset) — x gets 1 low pad plane + solid
    fill to a block multiple; y/z round up to the (8, 128) tile."""
    nx, ny, nz = occ.shape
    ny_p = _round_up(ny, 8)
    nz_p = _round_up(nz, 128)
    plane_bytes = ny_p * nz_p * 4
    B = block if block is not None else _pick_block(plane_bytes)
    n_blocks = -(-nx // B)
    nx_p = n_blocks * B + 2
    occ_p = np.zeros((nx_p, ny_p, nz_p), np.float32)
    occ_p[1 : nx + 1, :ny, :nz] = occ
    return occ_p, B, n_blocks


@functools.partial(
    jax.jit,
    static_argnames=(
        "B", "n_blocks", "src", "lst", "interpret",
    ),
)
def _run_scan_pallas(
    occ_p, pulse, k, a_w, b_w, kp, *, B, n_blocks, src, lst, interpret
):
    """The whole simulation as one lax.scan of the fused step kernel.
    Shapes are padded (see _pad_domain); src/lst are padded indices."""
    shape = occ_p.shape
    _, ny, nz = shape
    kernel = functools.partial(
        _step_kernel, B=B, n_blocks=n_blocks, src=src, lst=lst, ny=ny, nz=nz
    )
    f32 = jnp.float32
    step_call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B + 2, ny, nz), f32),
            pltpu.VMEM((B + 2, ny, nz), f32),
            pltpu.VMEM((B + 1, ny, nz), f32),
            pltpu.VMEM((B, ny, nz), f32),
            pltpu.VMEM((B, ny, nz), f32),
            pltpu.VMEM((B, ny, nz), f32),
            pltpu.VMEM((B, ny, nz), f32),
            pltpu.VMEM((B, ny, nz), f32),
            pltpu.VMEM((B, ny, nz), f32),
            pltpu.VMEM((1, ny, nz), f32),
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )

    def step(state, s_t):
        p, vx, vy, vz = state
        coef = jnp.stack([k, a_w, b_w, kp, s_t, 0.0, 0.0, 0.0]).reshape(1, 8)
        p, vx, vy, vz, rec = step_call(coef, p, vx, vy, vz, occ_p)
        return (p, vx, vy, vz), rec[0, 0]

    zero = jnp.zeros(shape, f32)
    return jax.lax.scan(step, (zero, zero, zero, zero), pulse)


def _step_kernel_grid(
    coef_ref,  # (1, 8) SMEM: k, a_w, b_w, kp, pulse_t
    p_mid, p_lo, p_hi, occ_mid, occ_lo, occ_hi, vx_mid, vx_lo,
    vy_mid, vz_mid,  # VMEM blocks, pipeline-managed
    p_out, vx_out, vy_out, vz_out,  # VMEM output blocks
    rec_ref,  # (1, 1) SMEM out: accumulated listener pickup
    *, B: int, src, lst, ny: int, nz: int,
):
    """One x-slab of the leapfrog step, grid-pipelined (v2).

    The manual-DMA kernel (_step_kernel) start()s and immediately
    wait()s every copy, so DMA and compute never overlap (measured
    0.75-1.08x the XLA solver — r2 ADVICE item 3). Here the x-slab loop
    IS the pallas grid and the pipeline double-buffers every block;
    halo planes arrive as separate (1, ny, nz) inputs so p/occ/vx are
    not re-fetched whole. Pad blocks (grid steps 0 and n_blocks+1, all
    solid zeros) run the same code and compute zeros — no branches.

    Boundary semantics are the manual kernel's exactly: the face
    between the low pad and the first real plane (global face B-1) is
    masked to zero (the unpadded solver's rigid zero-shift), y/z wrap
    rolls are edge-masked, the high x fill is solid (air-solid
    impedance treatment). Interpret-mode equality tests pin all three.
    """
    k = coef_ref[0, 0]
    a_w = coef_ref[0, 1]
    b_w = coef_ref[0, 2]
    kp = coef_ref[0, 3]
    pulse_t = coef_ref[0, 4]
    si, sj, sk = src
    li, lj, lk = lst
    i = pl.program_id(0)
    i0 = i * B  # first plane of this block in padded coordinates

    ext_shape = (B + 1, ny, nz)
    mid_shape = (B, ny, nz)
    m_ylast = _mask_ne(mid_shape, 1, ny - 1)
    m_zlast = _mask_ne(mid_shape, 2, nz - 1)
    m_y0 = _mask_ne(mid_shape, 1, 0)
    m_z0 = _mask_ne(mid_shape, 2, 0)

    @pl.when(i == 0)
    def _():
        rec_ref[0, 0] = jnp.float32(0.0)

    P = jnp.concatenate([p_lo[...], p_mid[...], p_hi[...]], axis=0)
    O = jnp.concatenate([occ_lo[...], occ_mid[...], occ_hi[...]], axis=0)
    VX = jnp.concatenate([vx_lo[...], vx_mid[...]], axis=0)
    Pm = P[1 : B + 1]
    Om = O[1 : B + 1]

    # x faces [i0-1, i0+B]: vxe[f] sits between planes i0-1+f and i0+f
    a, bl, br = _face_terms(O[0 : B + 1], O[1 : B + 2], a_w, b_w, k)
    vxe = a * VX + bl * P[0 : B + 1] + br * P[1 : B + 2]
    # rigid low-x boundary: the face between the solid pad and the first
    # real plane (global face index B-1) is the unpadded solver's
    # zero-filled shift — mask it off (pad-internal faces are zero by
    # solid-solid coefficients already)
    vxe = vxe * _mask_ne(ext_shape, 0, B - 1, offset=i0 - 1)
    div = vxe[1:] - vxe[:-1]

    o_hi = _roll(Om, -1, 1) * m_ylast
    a, bl, br = _face_terms(Om, o_hi, a_w, b_w, k)
    vyn = a * vy_mid[...] + bl * Pm + br * _roll(Pm, -1, 1)
    div = div + (vyn - _roll(vyn, 1, 1) * m_y0)

    o_hi = _roll(Om, -1, 2) * m_zlast
    a, bl, br = _face_terms(Om, o_hi, a_w, b_w, k)
    vzn = a * vz_mid[...] + bl * Pm + br * _roll(Pm, -1, 2)
    div = div + (vzn - _roll(vzn, 1, 2) * m_z0)

    pn = (Pm - kp * div) * Om

    src_block, src_l = divmod(si, B)
    lst_block, lst_l = divmod(li, B)

    def _plane_mask(j, kk):
        return jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 0) == j)
            & (jax.lax.broadcasted_iota(jnp.int32, (ny, nz), 1) == kk),
            jnp.float32(1.0), jnp.float32(0.0),
        )

    p_out[...] = pn
    vx_out[...] = vxe[1:]
    vy_out[...] = vyn
    vz_out[...] = vzn

    @pl.when(i == src_block)
    def _():
        p_out[src_l] = p_out[src_l] + pulse_t * _plane_mask(sj, sk)

    @pl.when(i == lst_block)
    def _():
        rec_ref[0, 0] = rec_ref[0, 0] + jnp.sum(
            p_out[lst_l] * _plane_mask(lj, lk)
        )


def _step_kernel_grid_ytiled(
    coef_ref,  # (1, 8) SMEM: k, a_w, b_w, kp, pulse_t
    p_mid, p_xlo, p_xhi, p_ylo, p_yhi,
    occ_mid, occ_xlo, occ_xhi, occ_ylo, occ_yhi,
    vx_mid, vx_xlo, vy_mid, vy_ylo, vz_mid,  # VMEM blocks
    p_out, vx_out, vy_out, vz_out,  # VMEM output blocks
    rec_ref,  # (1, 1) SMEM out
    *, B: int, Ty: int, ny_p: int, src, lst, nz: int,
):
    """One (x-slab, y-tile) block of the leapfrog step — the grid
    kernel for planes too large for scoped VMEM (r4 VERDICT #3: the
    (512, 512) plane cap). Identical update rules to _step_kernel_grid;
    the y shifts that were in-VMEM rolls with wrap masks become
    explicit halo rows (p/occ: one row each side of the tile; vy: the
    low row), with the two degenerate halos handled by GLOBAL-index
    masks exactly like the x pad face:

      * the row BELOW the domain (the index map clamps tile 0's low
        halo onto row 0): vyn there is the unpadded solver's
        zero-filled shift -> masked to 0 (global row == -1),
      * the row ABOVE the last (clamp duplicates row ny_p-1): o_hi is
        masked to 0 (global row == ny_p-1), reproducing the domain-edge
        wall — the same mask the untiled kernel applies to its wrapped
        roll entry.

    Interpret-mode equality vs the XLA solver pins all of it
    (tests/test_pallas_wave.py y-tiled cases)."""
    k = coef_ref[0, 0]
    a_w = coef_ref[0, 1]
    b_w = coef_ref[0, 2]
    kp = coef_ref[0, 3]
    pulse_t = coef_ref[0, 4]
    si, sj, sk = src
    li, lj, lk = lst
    i = pl.program_id(0)
    j = pl.program_id(1)
    i0 = i * B
    j0 = j * Ty

    ext_shape = (B + 1, Ty, nz)
    mid_shape = (B, Ty, nz)
    m_zlast = _mask_ne(mid_shape, 2, nz - 1)
    m_z0 = _mask_ne(mid_shape, 2, 0)

    @pl.when((i == 0) & (j == 0))
    def _():
        rec_ref[0, 0] = jnp.float32(0.0)

    P = jnp.concatenate([p_xlo[...], p_mid[...], p_xhi[...]], axis=0)
    O = jnp.concatenate([occ_xlo[...], occ_mid[...], occ_xhi[...]], axis=0)
    VX = jnp.concatenate([vx_xlo[...], vx_mid[...]], axis=0)
    Pm = P[1 : B + 1]
    Om = O[1 : B + 1]

    # x faces (mid rows only — the x halos never need y halos)
    a, bl, br = _face_terms(O[0 : B + 1], O[1 : B + 2], a_w, b_w, k)
    vxe = a * VX + bl * P[0 : B + 1] + br * P[1 : B + 2]
    vxe = vxe * _mask_ne(ext_shape, 0, B - 1, offset=i0 - 1)
    div = vxe[1:] - vxe[:-1]

    # y faces for rows [j0-1, j0+Ty): halo-extended arrays instead of
    # rolls; the shifted difference then needs no wrap mask. The halo
    # arrives as an 8-ROW BAND (Mosaic requires sublane block dims
    # divisible by 8): the low band is the previous tile's last 8 rows
    # (needed row = band row 7), the high band the next tile's first 8
    # (row 0); at the domain edges the clamped bands carry garbage
    # rows whose use is global-index-masked below, exactly like the
    # clamped single-row maps were.
    Py = jnp.concatenate(
        [p_ylo[:, 7:8], Pm, p_yhi[:, 0:1]], axis=1
    )
    Oy = jnp.concatenate(
        [occ_ylo[:, 7:8], Om, occ_yhi[:, 0:1]], axis=1
    )
    VY = jnp.concatenate([vy_ylo[:, 7:8], vy_mid[...]], axis=1)
    yext = (B, Ty + 1, nz)
    o_hi = Oy[:, 1 : Ty + 2] * _mask_ne(yext, 1, ny_p - 1, offset=j0 - 1)
    a, bl, br = _face_terms(Oy[:, 0 : Ty + 1], o_hi, a_w, b_w, k)
    vyn = a * VY + bl * Py[:, 0 : Ty + 1] + br * Py[:, 1 : Ty + 2]
    vyn = vyn * _mask_ne(yext, 1, -1, offset=j0 - 1)
    div = div + (vyn[:, 1:] - vyn[:, :-1])

    # z faces (full extent in-block, rolls + wrap masks as before)
    o_hi = _roll(Om, -1, 2) * m_zlast
    a, bl, br = _face_terms(Om, o_hi, a_w, b_w, k)
    vzn = a * vz_mid[...] + bl * Pm + br * _roll(Pm, -1, 2)
    div = div + (vzn - _roll(vzn, 1, 2) * m_z0)

    pn = (Pm - kp * div) * Om

    src_block, src_l = divmod(si, B)
    src_tile, src_r = divmod(sj, Ty)
    lst_block, lst_l = divmod(li, B)
    lst_tile, lst_r = divmod(lj, Ty)

    def _plane_mask(r, kk):
        return jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (Ty, nz), 0) == r)
            & (jax.lax.broadcasted_iota(jnp.int32, (Ty, nz), 1) == kk),
            jnp.float32(1.0), jnp.float32(0.0),
        )

    p_out[...] = pn
    vx_out[...] = vxe[1:]
    vy_out[...] = vyn[:, 1:]
    vz_out[...] = vzn

    @pl.when((i == src_block) & (j == src_tile))
    def _():
        p_out[src_l] = p_out[src_l] + pulse_t * _plane_mask(src_r, sk)

    @pl.when((i == lst_block) & (j == lst_tile))
    def _():
        rec_ref[0, 0] = rec_ref[0, 0] + jnp.sum(
            p_out[lst_l] * _plane_mask(lst_r, lk)
        )


@functools.partial(
    jax.jit,
    static_argnames=("B", "Ty", "n_blocks", "src", "lst", "interpret"),
)
def _run_scan_pallas_grid_ytiled(
    occ_p, pulse, k, a_w, b_w, kp, *, B, Ty, n_blocks, src, lst, interpret
):
    """One lax.scan of the y-tiled grid-pipelined step over the whole
    simulation. Grid = (x blocks incl. 2 pad blocks, y tiles)."""
    shape = occ_p.shape
    nx_p, ny_p, nz = shape
    n_tiles = ny_p // Ty
    kernel = functools.partial(
        _step_kernel_grid_ytiled, B=B, Ty=Ty, ny_p=ny_p, src=src, lst=lst,
        nz=nz,
    )
    f32 = jnp.float32
    mid = pl.BlockSpec((B, Ty, nz), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    xlo = pl.BlockSpec(
        (1, Ty, nz), lambda i, j: (jnp.maximum(i * B - 1, 0), j, 0),
        memory_space=pltpu.VMEM,
    )
    xhi = pl.BlockSpec(
        (1, Ty, nz),
        lambda i, j: (jnp.minimum((i + 1) * B, nx_p - 1), j, 0),
        memory_space=pltpu.VMEM,
    )
    # y halo BANDS: 8-row blocks (Mosaic sublane constraint), indexed
    # in 8-row units — the previous tile's last band / the next tile's
    # first band; kernel uses band rows 7 / 0
    t8 = Ty // 8
    ylo = pl.BlockSpec(
        (B, 8, nz), lambda i, j: (i, jnp.maximum(j * t8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    yhi = pl.BlockSpec(
        (B, 8, nz),
        lambda i, j: (i, jnp.minimum((j + 1) * t8, ny_p // 8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    step_call = pl.pallas_call(
        kernel,
        grid=(n_blocks + 2, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            mid, xlo, xhi, ylo, yhi,  # p
            mid, xlo, xhi, ylo, yhi,  # occ
            mid, xlo,  # vx
            mid, ylo,  # vy
            mid,  # vz
        ],
        out_specs=(
            mid, mid, mid, mid,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        interpret=interpret,
    )

    def step(state, s_t):
        p, vx, vy, vz = state
        coef = jnp.stack([k, a_w, b_w, kp, s_t, 0.0, 0.0, 0.0]).reshape(1, 8)
        p, vx, vy, vz, rec = step_call(
            coef,
            p, p, p, p, p,
            occ_p, occ_p, occ_p, occ_p, occ_p,
            vx, vx, vy, vy, vz,
        )
        return (p, vx, vy, vz), rec[0, 0]

    zero = jnp.zeros(shape, f32)
    return jax.lax.scan(step, (zero, zero, zero, zero), pulse)


def _pad_domain_grid(occ: np.ndarray, block: int | None,
                     ty: int | None = None):
    """(occ_padded, B, n_blocks): x gets one all-solid pad BLOCK below,
    solid fill + one all-solid pad block above; y/z round to (8, 128).
    ty (y-tiled kernel): round y up to a tile multiple and budget the
    slab thickness for the (Ty, nz_pad) TILE plane, not the full one."""
    nx, ny, nz = occ.shape
    ny_p = _round_up(ny, ty if ty is not None else 8)
    nz_p = _round_up(nz, 128)
    plane_bytes = (ty if ty is not None else ny_p) * nz_p * 4
    B = block if block is not None else _pick_block_grid(plane_bytes)
    n_blocks = -(-nx // B)
    nx_p = (n_blocks + 2) * B
    occ_p = np.zeros((nx_p, ny_p, nz_p), np.float32)
    occ_p[B : B + nx, :ny, :nz] = occ
    return occ_p, B, n_blocks


@functools.partial(
    jax.jit,
    static_argnames=("B", "n_blocks", "src", "lst", "interpret"),
)
def _run_scan_pallas_grid(
    occ_p, pulse, k, a_w, b_w, kp, *, B, n_blocks, src, lst, interpret
):
    """The whole simulation as one lax.scan of the grid-pipelined step."""
    shape = occ_p.shape
    nx_p, ny, nz = shape
    kernel = functools.partial(
        _step_kernel_grid, B=B, src=src, lst=lst, ny=ny, nz=nz,
    )
    f32 = jnp.float32
    mid = pl.BlockSpec((B, ny, nz), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    lo_plane = pl.BlockSpec(
        (1, ny, nz), lambda i: (jnp.maximum(i * B - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    hi_plane = pl.BlockSpec(
        (1, ny, nz),
        lambda i: (jnp.minimum((i + 1) * B, nx_p - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    step_call = pl.pallas_call(
        kernel,
        grid=(n_blocks + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            mid, lo_plane, hi_plane,  # p
            mid, lo_plane, hi_plane,  # occ
            mid, lo_plane,  # vx
            mid,  # vy
            mid,  # vz
        ],
        out_specs=(
            mid, mid, mid, mid,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct(shape, f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        interpret=interpret,
    )

    def step(state, s_t):
        p, vx, vy, vz = state
        coef = jnp.stack([k, a_w, b_w, kp, s_t, 0.0, 0.0, 0.0]).reshape(1, 8)
        p, vx, vy, vz, rec = step_call(
            coef, p, p, p, occ_p, occ_p, occ_p, vx, vx, vy, vz
        )
        return (p, vx, vy, vz), rec[0, 0]

    zero = jnp.zeros(shape, f32)
    return jax.lax.scan(step, (zero, zero, zero, zero), pulse)


def _step_kernel_shard(
    coef_ref,  # (1, 8) SMEM f32: k, a_w, b_w, kp, pulse_t, not_first
    io_ref,  # (1, 8) SMEM i32: si_loc, sj, sk, _, li_loc, lj, lk, _
    p_mid, p_xlo, p_xhi, p_prev, p_next, p_ylo, p_yhi,
    occ_mid, occ_xlo, occ_xhi, occ_prev, occ_next, occ_ylo, occ_yhi,
    vx_mid, vx_xlo, vx_prev,
    vy_mid, vy_ylo, vz_mid,
    p_out, vx_out, vy_out, vz_out,
    rec_ref,  # (1, 1) SMEM out: this shard's listener pickup
    *, B: int, n_blocks: int, Ty: int, ny_p: int, nz: int,
):
    """One (x-slab, y-tile) block of one leapfrog step on ONE SHARD of
    a domain-decomposed grid (parallel/wave_sharded.py kernel="pallas").

    The x direction is the _step_kernel_grid shard variant: block 0's
    low halo and block n_blocks-1's high halo come from the NEIGHBOR
    SHARDS (p_prev/p_next/occ_prev/occ_next/vx_prev, exchanged by one
    up-front ppermute pair per step — non-cyclic, so chain ends get
    zeros = the rigid outer boundary); interior blocks read in-array
    planes via clamped index maps, selected per-block with jnp.where.
    The previous shard's NEW last vx face is recomputed locally from
    (occ_prev, occ[0], p_prev, p[0], vx_prev) — identical inputs,
    identical op order, so the value is bit-identical to the
    neighbor's own computation. Rank 0 masks the face below global
    plane 0 via the not_first coefficient.

    The y direction is the _step_kernel_grid_ytiled machinery (8-row
    halo BANDS, degenerate edge halos global-index-masked to the
    exact wall / zero-shift semantics), so shard planes larger than
    scoped VMEM tile instead of falling back to XLA; a single tile
    (Ty = ny_p) reproduces the untiled shard kernel.

    source/listener are TRACED local indices in SMEM (iota-mask
    compare per block; -1 = not owned -> mask is all zero), because
    which shard owns them is a data question under shard_map.
    """
    k = coef_ref[0, 0]
    a_w = coef_ref[0, 1]
    b_w = coef_ref[0, 2]
    kp = coef_ref[0, 3]
    pulse_t = coef_ref[0, 4]
    not_first = coef_ref[0, 5]
    si = io_ref[0, 0]
    sj = io_ref[0, 1]
    sk = io_ref[0, 2]
    li = io_ref[0, 4]
    lj = io_ref[0, 5]
    lk = io_ref[0, 6]
    i = pl.program_id(0)
    j = pl.program_id(1)
    i0 = i * B
    j0 = j * Ty

    ext_shape = (B + 1, Ty, nz)
    mid_shape = (B, Ty, nz)
    m_zlast = _mask_ne(mid_shape, 2, nz - 1)
    m_z0 = _mask_ne(mid_shape, 2, 0)

    @pl.when((i == 0) & (j == 0))
    def _():
        rec_ref[0, 0] = jnp.float32(0.0)

    lo_p = jnp.where(i == 0, p_prev[...], p_xlo[...])
    hi_p = jnp.where(i == n_blocks - 1, p_next[...], p_xhi[...])
    lo_o = jnp.where(i == 0, occ_prev[...], occ_xlo[...])
    hi_o = jnp.where(i == n_blocks - 1, occ_next[...], occ_xhi[...])
    lo_vx = jnp.where(i == 0, vx_prev[...], vx_xlo[...])
    P = jnp.concatenate([lo_p, p_mid[...], hi_p], axis=0)
    O = jnp.concatenate([lo_o, occ_mid[...], hi_o], axis=0)
    VX = jnp.concatenate([lo_vx, vx_mid[...]], axis=0)
    Pm = P[1 : B + 1]
    Om = O[1 : B + 1]

    # x faces [i0-1, i0+B): vxe[0] is the previous shard's last face
    # (recomputed); on rank 0 it is the below-domain face -> zero
    a, bl, br = _face_terms(O[0 : B + 1], O[1 : B + 2], a_w, b_w, k)
    vxe = a * VX + bl * P[0 : B + 1] + br * P[1 : B + 2]
    vxe = vxe * jnp.maximum(
        not_first, _mask_ne(ext_shape, 0, -1, offset=i0 - 1)
    )
    div = vxe[1:] - vxe[:-1]

    # y faces via 8-row halo bands (see _step_kernel_grid_ytiled)
    Py = jnp.concatenate(
        [p_ylo[:, 7:8], Pm, p_yhi[:, 0:1]], axis=1
    )
    Oy = jnp.concatenate(
        [occ_ylo[:, 7:8], Om, occ_yhi[:, 0:1]], axis=1
    )
    VY = jnp.concatenate([vy_ylo[:, 7:8], vy_mid[...]], axis=1)
    yext = (B, Ty + 1, nz)
    o_hi = Oy[:, 1 : Ty + 2] * _mask_ne(yext, 1, ny_p - 1, offset=j0 - 1)
    a, bl, br = _face_terms(Oy[:, 0 : Ty + 1], o_hi, a_w, b_w, k)
    vyn = a * VY + bl * Py[:, 0 : Ty + 1] + br * Py[:, 1 : Ty + 2]
    vyn = vyn * _mask_ne(yext, 1, -1, offset=j0 - 1)
    div = div + (vyn[:, 1:] - vyn[:, :-1])

    o_hi = _roll(Om, -1, 2) * m_zlast
    a, bl, br = _face_terms(Om, o_hi, a_w, b_w, k)
    vzn = a * vz_mid[...] + bl * Pm + br * _roll(Pm, -1, 2)
    div = div + (vzn - _roll(vzn, 1, 2) * m_z0)

    pn = (Pm - kp * div) * Om

    # traced-index one-hot masks (local x / global y, z; -1 = unowned)
    xm = jax.lax.broadcasted_iota(jnp.int32, mid_shape, 0) + i0
    ym = jax.lax.broadcasted_iota(jnp.int32, mid_shape, 1) + j0
    zm = jax.lax.broadcasted_iota(jnp.int32, mid_shape, 2)
    src_m = jnp.where(
        (xm == si) & (ym == sj) & (zm == sk), jnp.float32(1.0),
        jnp.float32(0.0),
    )
    pn = pn + pulse_t * src_m
    lst_m = jnp.where(
        (xm == li) & (ym == lj) & (zm == lk), jnp.float32(1.0),
        jnp.float32(0.0),
    )
    rec_ref[0, 0] = rec_ref[0, 0] + jnp.sum(pn * lst_m)

    p_out[...] = pn
    vx_out[...] = vxe[1:]
    vy_out[...] = vyn[:, 1:]
    vz_out[...] = vzn


def _pick_ytile_divisor(ny_p: int, nz: int,
                        divisors_only: bool = False) -> int:
    """Best y-tile under the VMEM target, trading PADDING against TILE
    COUNT: candidates are exact divisors of ny_p (8*d — zero padding)
    and padded power-of-two tiles (ny rounds up to the tile). A
    pure-divisor pick degenerates to Ty=8 when ny_p/8 is prime (e.g.
    ny=1016 -> 127 8-row tiles, ~16x the per-tile halo/grid overhead),
    while a pure power-of-two pick pads awkward shapes by up to ~47%
    dead solid rows. Cost model: computed rows (incl. padding) plus
    ~24 row-equivalents of halo refetch + grid overhead per tile;
    minimize, tie-break to the larger tile."""
    cap_rows = max(8, (_YTILE_TARGET_PLANE_BYTES // (nz * 4)) // 8 * 8)
    m = ny_p // 8
    cands = []
    for d in range(1, m + 1):
        if m % d == 0 and 8 * d <= cap_rows:
            ty = 8 * d
            cands.append((ny_p, ty))
    if not divisors_only:
        # the single-chip path pads ny up to the tile; the SHARD path
        # cannot (its ny is fixed by the sharding) and passes
        # divisors_only=True
        ty = 8
        while ty <= cap_rows:
            cands.append((_round_up(ny_p, ty), ty))
            ty *= 2
    best_ty, best_cost = 8, None
    for padded, ty in cands:
        cost = padded + 24 * (padded // ty)
        if best_cost is None or cost < best_cost or (
            cost == best_cost and ty > best_ty
        ):
            best_ty, best_cost = ty, cost
    return best_ty


def make_shard_step(Sx: int, ny: int, nz: int, block: int | None = None,
                    interpret: bool = False, block_y: int | None = None):
    """Build the per-shard, per-step pallas call for
    parallel/wave_sharded.py kernel="pallas".

    Returns (step_fn, B). step_fn(coef (1,8) f32, io (1,8) i32,
    p, occ, vx, vy, vz  [local (Sx, ny, nz)],
    p_prev, p_next, occ_prev, occ_next, vx_prev [(ny, nz) halo planes])
    -> (p_n, vx_n, vy_n, vz_n, rec scalar).

    ny/nz must already be padded to the (8, 128) tile (solid fill);
    B is the largest power-of-two divisor of Sx within the VMEM
    budget. Planes larger than the scoped-VMEM target TILE along y
    (Ty = the largest 8*d divisor of ny under the target; block_y
    forces it for tests), so sharded 512^3-class domains run the
    kernel too.
    """
    if 8 * nz * 4 > _GRID_KERNEL_MAX_PLANE_BYTES:
        raise ValueError(
            f"shard plane ({ny}, {nz}): even an 8-row y-tile exceeds "
            "the scoped-VMEM budget; use kernel='xla'"
        )
    if block_y is not None:
        Ty = block_y
        if Ty % 8 or ny % Ty:
            raise ValueError(
                f"block_y={Ty} must be a multiple of 8 dividing ny={ny}"
            )
    elif ny * nz * 4 <= _YTILE_TARGET_PLANE_BYTES:
        Ty = ny
    else:
        Ty = _pick_ytile_divisor(ny, nz, divisors_only=True)
    n_tiles = ny // Ty
    B = block if block is not None else _pick_block_grid(Ty * nz * 4)
    while Sx % B:
        B //= 2
    B = max(B, 1)
    n_blocks = Sx // B
    kernel = functools.partial(
        _step_kernel_shard, B=B, n_blocks=n_blocks, Ty=Ty, ny_p=ny,
        nz=nz,
    )
    f32 = jnp.float32
    mid = pl.BlockSpec((B, Ty, nz), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    xlo = pl.BlockSpec(
        (1, Ty, nz), lambda i, j: (jnp.maximum(i * B - 1, 0), j, 0),
        memory_space=pltpu.VMEM,
    )
    xhi = pl.BlockSpec(
        (1, Ty, nz),
        lambda i, j: (jnp.minimum((i + 1) * B, Sx - 1), j, 0),
        memory_space=pltpu.VMEM,
    )
    halo = pl.BlockSpec((1, Ty, nz), lambda i, j: (0, j, 0),
                        memory_space=pltpu.VMEM)
    t8 = Ty // 8
    ylo = pl.BlockSpec(
        (B, 8, nz), lambda i, j: (i, jnp.maximum(j * t8 - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    yhi = pl.BlockSpec(
        (B, 8, nz),
        lambda i, j: (i, jnp.minimum((j + 1) * t8, ny // 8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    step_call = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            mid, xlo, xhi, halo, halo, ylo, yhi,  # p
            mid, xlo, xhi, halo, halo, ylo, yhi,  # occ
            mid, xlo, halo,  # vx
            mid, ylo,  # vy
            mid,  # vz
        ],
        out_specs=(
            mid, mid, mid, mid,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Sx, ny, nz), f32),
            jax.ShapeDtypeStruct((Sx, ny, nz), f32),
            jax.ShapeDtypeStruct((Sx, ny, nz), f32),
            jax.ShapeDtypeStruct((Sx, ny, nz), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        interpret=interpret,
    )

    def step_fn(coef, io, p, occ, vx, vy, vz,
                p_prev, p_next, occ_prev, occ_next, vx_prev):
        p_n, vx_n, vy_n, vz_n, rec = step_call(
            coef, io,
            p, p, p, p_prev[None], p_next[None], p, p,
            occ, occ, occ, occ_prev[None], occ_next[None], occ, occ,
            vx, vx, vx_prev[None],
            vy, vy,
            vz,
        )
        return p_n, vx_n, vy_n, vz_n, rec[0, 0]

    return step_fn, B


def wave_run_pallas(
    domain: WaveDomain,
    src_cell: tuple,
    lst_cell: tuple,
    n_steps: int,
    c: float = 350.0,
    alpha: float = 0.1,
    cfl: float = 0.999,
    fc: float | None = None,
    pulse=None,
    dt: float | None = None,
    block: int | None = None,
    interpret: bool = False,
    return_state: bool = False,
    mode: str = "grid",
    block_y: int | None = None,
):
    """models/wave.py::wave_run on the fused Pallas step kernel.

    Identical update rules and boundary semantics (equality-tested in
    interpret mode); the padded solid fill around the domain changes no
    result. return_state returns the padded-state tuple cropped back to
    the domain shape.

    mode="grid" (default): the grid-pipelined kernel — the x-slab loop
    is the pallas grid, Mosaic double-buffers every block, and halo
    planes arrive as separate (1, ny, nz) inputs (~44-56 B/cell of HBM
    traffic). When one (ny_pad, nz_pad) plane exceeds the scoped-VMEM
    cap (~606 KB — the r4 (512, 512)-plane wall), the plane TILES along
    y (grid = (x blocks, y tiles); p/occ fetch one halo row per side,
    vy one low row) so 256x512x512 and 512^3 engage the kernel.
    block_y forces a tile height (testing; must be a multiple of 8).
    mode="dma": the r2 manual-DMA kernel (start/wait per slab,
    no compute/DMA overlap — measured 0.75-1.08x the XLA solver; kept
    for A/Bs).
    """
    if mode not in ("grid", "dma"):
        raise ValueError(f"mode must be 'grid' or 'dma', got {mode!r}")
    from ..models.wave import wall_impedance_coefficients

    occ = np.asarray(domain.occ, np.float32)
    dx = float(domain.dx)
    if dt is None:
        dt = courant_dt(dx, c, cfl)
    check_courant(dt, dx, c)
    for name, cell in (("src", src_cell), ("lst", lst_cell)):
        if float(occ[tuple(cell)]) != 1.0:
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
    if mode == "grid" and not grid_kernel_feasible(occ.shape):
        raise ValueError(
            f"grid kernel cannot compile for domain {occ.shape}: one "
            "padded 8-row (8, nz) f32 tile plane exceeds Mosaic's "
            "scoped-VMEM budget even at slab thickness 1 "
            f"(max ~{_GRID_KERNEL_MAX_PLANE_BYTES // 1024} KB/plane); "
            "use the XLA solver (models/wave.py::wave_run(kernel='xla'))"
        )
    if mode == "grid":
        nx, ny, nz = occ.shape
        ny_p8 = _round_up(ny, 8)
        nz_p = _round_up(nz, 128)
        tiled = block_y is not None or (
            ny_p8 * nz_p * 4 > _GRID_KERNEL_MAX_PLANE_BYTES
        )
        if not tiled:
            occ_p, B, n_blocks = _pad_domain_grid(occ, block)
            run = _run_scan_pallas_grid
        else:
            # divisor-aware pick: a power-of-two tile would force
            # _pad_domain_grid to round ny up to the tile (+23-47%
            # dead solid rows on awkward shapes); the largest 8*d
            # divisor of the 8-rounded ny pads nothing extra
            ty = block_y if block_y is not None else _pick_ytile_divisor(
                _round_up(ny, 8), nz_p
            )
            if ty % 8 or ty * nz_p * 4 > _GRID_KERNEL_MAX_PLANE_BYTES:
                raise ValueError(
                    f"block_y={ty} must be a multiple of 8 with a "
                    "(block_y, nz_pad) plane under "
                    f"~{_GRID_KERNEL_MAX_PLANE_BYTES // 1024} KB"
                )
            occ_p, B, n_blocks = _pad_domain_grid(occ, block, ty=ty)
            run = functools.partial(_run_scan_pallas_grid_ytiled, Ty=ty)
        x_off = B
        src = (int(src_cell[0]) + B, int(src_cell[1]), int(src_cell[2]))
        lst = (int(lst_cell[0]) + B, int(lst_cell[1]), int(lst_cell[2]))
    else:
        occ_p, B, n_blocks = _pad_domain(occ, block)
        x_off = 1
        src = (int(src_cell[0]) + 1, int(src_cell[1]), int(src_cell[2]))
        lst = (int(lst_cell[0]) + 1, int(lst_cell[1]), int(lst_cell[2]))
        run = _run_scan_pallas
    state, rec = run(
        jnp.asarray(occ_p),
        pulse,
        jnp.float32(k), jnp.float32(a_w), jnp.float32(b_w), jnp.float32(kp),
        B=B, n_blocks=n_blocks, src=src, lst=lst, interpret=interpret,
    )
    wir = WaveIR(pressure=rec, dt=float(dt), pulse=pulse, t0=t0)
    if return_state:
        nx, ny, nz = occ.shape
        crop = tuple(s[x_off : x_off + nx, :ny, :nz] for s in state)
        return wir, crop
    return wir
