"""Low-frequency FDTD wave solver — the wave-based member of the acoustic
model family (no reference analogue; the reference is ray-only).

Geometric ray tracing (models/ir.py) is a high-frequency approximation:
below a room's Schroeder frequency the sound field is dominated by
standing-wave modes and diffraction that rays cannot represent (the
reference's lowest EQ band nominally covers exactly this regime,
sound_system.zig:565-596). Production room-acoustics engines therefore
pair a wave solver — exact linear acoustics, cost ~ volume * f_max^4, so
affordable only at low frequency — with a ray/ISM tail for the rest of
the spectrum. This module is that wave solver, designed TPU-first:

 - staggered-grid (Yee) leapfrog FDTD of the linear acoustic equations
       dp/dt = -rho c^2 div v        dv/dt = -(1/rho) grad p
   where every timestep is a handful of fused elementwise stencil passes
   (shift + multiply-add, no gathers, no data-dependent control flow)
   inside ONE ``lax.scan`` — static shapes, HBM-bandwidth-bound, the
   regime XLA compiles well (benchmarks/bench_wave.py measures achieved
   cell-updates/s against the HBM roofline);
 - geometry enters as a voxel occupancy mask rasterized from the triangle
   soup (``voxelize_triangles``); walls are locally-reacting impedance
   faces with a frequency-independent specific impedance derived from an
   energy-absorption coefficient (semi-implicit face update, exactly
   rigid in the ``alpha -> 0`` limit);
 - multi-chip: x-slab domain decomposition with one ``ppermute`` halo
   exchange per leapfrog half-step (parallel/wave_sharded.py) — the
   classic stencil decomposition over an ICI mesh.

Units: ``rho = 1`` (normalized); pressure and velocity are in consistent
normalized units. Absolute scale is arbitrary and is calibrated away when
splicing with traced IRs (``hybrid_wave_ir`` matches per-band
direct-arrival energy against the tracer's own convention).

Face-update convention shared with parallel/wave_sharded.py: the
velocity array of axis ``a`` has THE SAME shape as the pressure grid —
face ``i`` sits between cell ``i`` and cell ``i+1`` along ``a``, and the
last face (between the last cell and the beyond-domain void) carries
all-zero coefficients, i.e. the outer domain boundary is rigid. This
even, cell-aligned layout is what makes x-slab sharding a pure
``ppermute`` of one boundary plane per step.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, Config


class WaveDomain(NamedTuple):
    """Voxelized simulation domain.

    occ: (Nx, Ny, Nz) float32 — 1.0 in air cells, 0.0 in solid cells.
    dx: cell edge length in meters.
    origin: world-space position of the CENTER of cell (0, 0, 0).
    """

    occ: object
    dx: float
    origin: tuple

    @property
    def shape(self):
        return tuple(self.occ.shape)

    def cell_of(self, pos) -> tuple:
        """Grid index of the cell containing world position ``pos``."""
        pos = np.asarray(pos, np.float64)
        idx = np.round((pos - np.asarray(self.origin)) / self.dx)
        return tuple(int(i) for i in idx)


class WaveIR(NamedTuple):
    """Result of a wave run: the band-limited pressure response at the
    listener cell.

    pressure: (n_steps,) f32 at the simulation rate 1/dt.
    dt: timestep in seconds.
    pulse: (n_steps,) f32 — the injected source signal (band-limited
        differentiated Gaussian); the response IS the room IR convolved
        with this pulse.
    t0: the pulse's peak time in seconds — subtract it when aligning
        arrival delays against ray-traced IRs.
    """

    pressure: object
    dt: float
    pulse: object
    t0: float


def courant_dt(dx: float, c: float, cfl: float = 0.999) -> float:
    """Largest stable leapfrog timestep: c dt / dx <= cfl / sqrt(3)."""
    return cfl * dx / (c * math.sqrt(3.0))


def check_courant(dt: float, dx: float, c: float) -> None:
    limit = dx / (c * math.sqrt(3.0))
    if dt > limit * (1.0 + 1e-9):
        raise ValueError(
            f"unstable timestep: dt={dt:.3e} exceeds the 3-D Courant "
            f"limit dx/(c*sqrt(3)) = {limit:.3e}"
        )


def source_pulse(n_steps: int, dt: float, fc: float):
    """Differentiated-Gaussian pulse (zero DC, spectral peak at ``fc``),
    normalized to unit peak amplitude. Returns (pulse (n_steps,), t0)."""
    sigma = 1.0 / (2.0 * math.pi * fc)
    t0 = 6.0 * sigma
    t = np.arange(n_steps, dtype=np.float64) * dt
    s = -(t - t0) / sigma * np.exp(-((t - t0) ** 2) / (2.0 * sigma**2))
    peak = np.max(np.abs(s))
    if peak > 0:
        s = s / peak
    return jnp.asarray(s.astype(np.float32)), float(t0)


def _triangle_surface_points(
    tris: np.ndarray, spacing: float, return_ids: bool = False
):
    """Sample points covering each triangle at ~``spacing`` resolution
    (barycentric grid incl. edges/vertices), for conservative voxel
    rasterization. Vectorized over triangles sharing a subdivision level.
    return_ids additionally yields each point's source-triangle index
    (the voxel->material map rides the rasterization for free)."""
    tris = np.asarray(tris, np.float64)
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    edge = np.maximum(
        np.linalg.norm(b - a, axis=1),
        np.maximum(np.linalg.norm(c - a, axis=1), np.linalg.norm(c - b, axis=1)),
    )
    n_sub = np.maximum(1, np.ceil(edge / spacing).astype(np.int64))
    out = []
    ids = []
    for n in np.unique(n_sub):
        sel = n_sub == n
        i, j = np.meshgrid(np.arange(n + 1), np.arange(n + 1), indexing="ij")
        keep = (i + j) <= n
        u = (i[keep] / n)[None, :, None]  # (1, P, 1)
        v = (j[keep] / n)[None, :, None]
        pts = (
            a[sel][:, None, :] * (1.0 - u - v)
            + b[sel][:, None, :] * u
            + c[sel][:, None, :] * v
        )
        out.append(pts.reshape(-1, 3))
        if return_ids:
            ids.append(np.repeat(np.nonzero(sel)[0], int(keep.sum())))
    pts = np.concatenate(out, axis=0)
    if return_ids:
        return pts, np.concatenate(ids, axis=0)
    return pts


def voxelize_triangles(
    tris: np.ndarray,
    dx: float,
    pad_cells: int = 2,
    bounds: tuple | None = None,
    return_tri_ids: bool = False,
):
    """Rasterize a triangle soup into a solid-voxel occupancy mask.

    Every voxel whose cube is touched by a triangle (conservatively, via
    surface supersampling at dx/2) becomes solid; the surface therefore
    forms a watertight >= 1-cell shell for any watertight mesh. The
    domain is the mesh's AABB expanded by ``pad_cells`` cells (those
    outer cells are air but sealed off by the shell; the outermost
    domain boundary is rigid regardless).

    return_tri_ids: also return an (Nx, Ny, Nz) int32 map of each solid
    voxel's owning triangle (-1 for air / untouched solids) — the
    voxel->material assignment for per-face wall admittance
    (``material_alpha_cells``). Where several triangles touch one voxel
    the LAST rasterized point wins (deterministic; material boundaries
    move by at most one voxel, below the solver's geometric resolution).
    """
    tris = np.asarray(tris, np.float64).reshape(-1, 3, 3)
    if bounds is None:
        lo = tris.reshape(-1, 3).min(axis=0) - pad_cells * dx
        hi = tris.reshape(-1, 3).max(axis=0) + pad_cells * dx
    else:
        lo, hi = (np.asarray(b, np.float64) for b in bounds)
    shape = np.maximum(1, np.ceil((hi - lo) / dx).astype(np.int64)) + 1
    occ = np.ones(tuple(shape), np.float32)
    pts_ids = _triangle_surface_points(tris, 0.5 * dx, return_ids=return_tri_ids)
    pts = pts_ids[0] if return_tri_ids else pts_ids
    idx = np.round((pts - lo[None]) / dx).astype(np.int64)
    idx = np.clip(idx, 0, shape[None] - 1)
    occ[idx[:, 0], idx[:, 1], idx[:, 2]] = 0.0
    dom = WaveDomain(occ=occ, dx=float(dx), origin=tuple(lo))
    if return_tri_ids:
        tid = np.full(tuple(shape), -1, np.int32)
        tid[idx[:, 0], idx[:, 1], idx[:, 2]] = pts_ids[1].astype(np.int32)
        return dom, tid
    return dom


def material_alpha_cells(
    tri_ids: np.ndarray,
    absorption: np.ndarray,
    band: int | None = None,
    default: float = 0.1,
) -> np.ndarray:
    """Per-cell wall energy absorption from the voxel->triangle map.

    tri_ids: (Nx, Ny, Nz) int32 from ``voxelize_triangles(...,
    return_tri_ids=True)``. absorption: (T, n_bands). band: which band's
    alpha to take (None = mean over bands, for a single broadband
    solve). Cells not owned by a triangle get ``default``. Generalizes
    the single absorption law of the reference
    (sound_system.zig:229-238) to per-surface materials on the wave
    path, matching what every ray family already honors."""
    ab = np.asarray(absorption, np.float64)
    per_tri = ab.mean(axis=1) if band is None else ab[:, int(band)]
    out = np.full(tri_ids.shape, float(default), np.float32)
    owned = tri_ids >= 0
    out[owned] = per_tri[tri_ids[owned]].astype(np.float32)
    return out


def _face_terms(occ, m_hi, a_w: float, b_w: float, k: float):
    """Per-face update coefficients for ``v_new = a*v + bl*p_lo + br*p_hi``.

    Face ``i`` along an axis sits between cell ``i`` (occupancy ``occ``)
    and cell ``i+1`` (occupancy ``m_hi``); a face past the domain end
    (m_hi = 0 from the zero-filled shift) gets the air-solid treatment —
    i.e. the outer boundary behaves like a wall. Interior air-air faces
    carry the leapfrog gradient (a=1, bl=+k, br=-k); air-solid faces the
    semi-implicit impedance update (a=a_w, +-b_w); solid-solid faces
    zeros.

    Computed ON THE FLY from the occupancy each step rather than
    precomputed as fields: the step is HBM-bandwidth-bound and the nine
    (a, bl, br) x 3-axis fields would double its memory traffic — the
    ~6 extra VPU flops per face are free (measured 1.29x on a v5e at
    256x192x192). The mask arithmetic is exact in f32 (0/1 values), so
    this is bit-identical to precomputed coefficients."""
    both = occ * m_hi
    a = both + (occ + m_hi - 2.0 * both) * a_w
    bl = k * both + b_w * (occ - both)
    br = -k * both - b_w * (m_hi - both)
    return a, bl, br


def _face_terms_var(occ, m_hi, aw, aw_hi, bw, bw_hi, k):
    """Per-face coefficients with PER-CELL impedance fields (aw, bw):
    the wall side of an air-solid face supplies its own coefficients —
    (occ - both) = 1 means lo air / hi solid, so the face takes the HI
    cell's (aw_hi, bw_hi); (m_hi - both) = 1 takes the LO cell's.
    Reduces exactly to ``_face_terms`` for spatially-constant fields."""
    both = occ * m_hi
    lo_air = occ - both  # hi cell is the wall
    hi_air = m_hi - both  # lo cell is the wall
    a = both + lo_air * aw_hi + hi_air * aw
    bl = k * both + bw_hi * lo_air
    br = -k * both - bw * hi_air
    return a, bl, br


def wall_impedance_field(alpha, c: float, dt: float, dx: float):
    """Vectorized ``wall_impedance_coefficients``: per-cell (a_w, b_w)
    f32 fields from a per-cell energy-absorption field (numpy, host-side
    once per run). alpha <= 0 cells are rigid (0, 0)."""
    alpha = np.clip(np.asarray(alpha, np.float64), 0.0, 1.0)
    k = dt / dx
    r = np.sqrt(np.maximum(1.0 - alpha, 0.0))
    live = (alpha > 0.0) & (r < 1.0 - 1e-12)
    r_safe = np.where(live, r, 0.0)
    zeta = (1.0 + r_safe) / np.maximum(1.0 - r_safe, 1e-30)
    g = zeta * c * dt / dx
    a_w = np.where(live, (1.0 - g) / (1.0 + g), 0.0)
    b_w = np.where(live, 2.0 * k / (1.0 + g), 0.0)
    return a_w.astype(np.float32), b_w.astype(np.float32)


def _shift_down_zero(x, axis: int):
    """x[i] <- x[i+1] along axis, zero-filled at the end."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, 1)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(1, None)
    return jnp.pad(x[tuple(idx)], pad)


def _shift_up_zero(x, axis: int):
    """x[i] <- x[i-1] along axis, zero-filled at the start."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, -1)
    return jnp.pad(x[tuple(idx)], pad)


def wall_impedance_coefficients(alpha: float, c: float, dt: float, dx: float):
    """Semi-implicit locally-reacting wall-face update coefficients.

    alpha is the wall's energy absorption coefficient (normal incidence):
    reflection R = sqrt(1 - alpha), specific impedance ratio
    zeta = (1+R)/(1-R), face update
        v+ = a_w v- +- b_w p_cell,
    a_w = (1-g)/(1+g), b_w = 2(dt/dx)/(1+g), g = zeta c dt / dx.
    alpha <= 0 is exactly rigid (v = 0 on wall faces)."""
    k = dt / dx
    if alpha <= 0.0:
        return 0.0, 0.0
    alpha = min(float(alpha), 1.0)
    r = math.sqrt(max(1.0 - alpha, 0.0))
    if r >= 1.0 - 1e-12:
        return 0.0, 0.0
    zeta = (1.0 + r) / (1.0 - r)
    g = zeta * c * dt / dx
    return (1.0 - g) / (1.0 + g), 2.0 * k / (1.0 + g)


def _leapfrog_step(p, vx, vy, vz, occ, k, a_w, b_w, kp):
    """One leapfrog step (velocity half-step then pressure step), all
    fused elementwise stencils. Returns updated (p, vx, vy, vz).

    a_w/b_w may be scalars (one impedance everywhere — reference-law
    parity) or per-cell fields (per-face material admittance; each
    air-solid face takes its wall cell's coefficients). The zero-filled
    field shift makes beyond-domain faces rigid in field mode — the
    voxelized shell seals the domain before that boundary ever sees
    air, so the choice is unobservable in practice."""

    def upd(v, axis):
        occ_hi = _shift_down_zero(occ, axis)
        if jnp.ndim(a_w) == 0:
            a, bl, br = _face_terms(occ, occ_hi, a_w, b_w, k)
        else:
            a, bl, br = _face_terms_var(
                occ, occ_hi, a_w, _shift_down_zero(a_w, axis),
                b_w, _shift_down_zero(b_w, axis), k,
            )
        return a * v + bl * p + br * _shift_down_zero(p, axis)

    vx = upd(vx, 0)
    vy = upd(vy, 1)
    vz = upd(vz, 2)
    div = (
        (vx - _shift_up_zero(vx, 0))
        + (vy - _shift_up_zero(vy, 1))
        + (vz - _shift_up_zero(vz, 2))
    )
    p = (p - kp * div) * occ
    return p, vx, vy, vz


@functools.partial(
    jax.jit, static_argnames=("si", "sj", "sk", "li", "lj", "lk")
)
def _run_scan(occ, pulse, k, a_w, b_w, kp, si, sj, sk, li, lj, lk):
    """The whole simulation as ONE jitted dispatch: lax.scan of the
    leapfrog step over the pulse. Module-level with scalar coefficients
    traced (not closed over) so repeated runs on the same grid shape —
    any alpha, any dt — reuse one executable (and the persistent
    compilation cache makes that survive across processes)."""

    def step(state, s_t):
        p, vx, vy, vz = state
        p, vx, vy, vz = _leapfrog_step(p, vx, vy, vz, occ, k, a_w, b_w, kp)
        p = p.at[si, sj, sk].add(s_t)
        return (p, vx, vy, vz), p[li, lj, lk]

    zero = jnp.zeros_like(occ)
    return jax.lax.scan(step, (zero, zero, zero, zero), pulse)


@functools.partial(
    jax.jit, static_argnames=("si", "sj", "sk", "li", "lj", "lk")
)
def _run_scan_banded(occ, pulse, k, a_w, b_w, kp, si, sj, sk, li, lj, lk):
    """All bands' material-field solves in ONE dispatch: vmap of the
    leapfrog scan over the stacked (B, Nx, Ny, Nz) wall-impedance
    fields (occ/pulse/coefficients broadcast). The per-band arithmetic
    is the exact elementwise program _run_scan runs — outputs bit-match
    the B sequential dispatches (asserted in test_wave_materials) while
    the device walks the grids once per step instead of B times
    serially. Returns the (B, T) listener pressures only (the final
    field states would be B full grids of HBM for no consumer)."""

    def one(aw, bw):
        def step(state, s_t):
            p, vx, vy, vz = state
            p, vx, vy, vz = _leapfrog_step(p, vx, vy, vz, occ, k, aw, bw, kp)
            p = p.at[si, sj, sk].add(s_t)
            return (p, vx, vy, vz), p[li, lj, lk]

        zero = jnp.zeros_like(occ)
        _, rec = jax.lax.scan(step, (zero, zero, zero, zero), pulse)
        return rec

    return jax.vmap(one)(a_w, b_w)


def wave_run(
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
    return_state: bool = False,
    alpha_cell=None,
    kernel: str = "auto",
):
    """Run the FDTD simulation and record pressure at the listener cell.

    kernel: "xla" (the fused-elementwise lax.scan solver), "pallas" (the
    grid-pipelined slab kernel, ops/pallas_wave.py), or "auto" — pallas
    only where it measured faster than XLA (>= ~12M cells on the v5e:
    1.11x at 256^3; it LOSES below — 0.85x at 128^3 — see
    benchmarks/RESULTS.md r3) and only for capabilities it supports
    (scalar alpha, no return_state, TPU backend).

    src_cell / lst_cell: integer grid indices (see WaveDomain.cell_of);
    both must be air cells. alpha: wall energy absorption (0 = rigid).
    alpha_cell: optional (Nx, Ny, Nz) PER-CELL absorption field (from
    ``material_alpha_cells``) — each air-solid face then uses its wall
    cell's impedance instead of the global alpha, making the wave model
    honor per-surface materials like every ray family does.
    fc: source-pulse spectral peak (defaults to c/(16 dx), half the
    ~8-points-per-wavelength usable band edge). Returns a WaveIR (and
    the final (p, vx, vy, vz) state when return_state=True, for the
    energy-conservation diagnostics)."""
    if kernel not in ("auto", "xla", "pallas"):
        raise ValueError(f"kernel must be auto/xla/pallas, got {kernel!r}")
    use_pallas = kernel == "pallas"
    if kernel == "auto":
        from ..ops.pallas_wave import grid_kernel_feasible

        shape = np.asarray(domain.occ).shape
        cells = int(np.prod(shape))
        use_pallas = (
            cells >= 12_000_000
            and alpha_cell is None
            and not return_state
            and jax.default_backend() == "tpu"
            # huge y/z planes exceed Mosaic's scoped VMEM even at slab
            # thickness 1 (e.g. 400^3) — stay on the XLA solver there
            and grid_kernel_feasible(shape)
        )
    if use_pallas:
        if alpha_cell is not None or return_state:
            raise ValueError(
                "kernel='pallas' supports scalar alpha without "
                "return_state; use kernel='xla' for those"
            )
        from ..ops.pallas_wave import wave_run_pallas

        return wave_run_pallas(
            domain, src_cell, lst_cell, n_steps, c=c, alpha=alpha,
            cfl=cfl, fc=fc, pulse=pulse, dt=dt,
        )
    occ = jnp.asarray(domain.occ, jnp.float32)
    dx = float(domain.dx)
    if dt is None:
        dt = courant_dt(dx, c, cfl)
    check_courant(dt, dx, c)
    for name, cell in (("src", src_cell), ("lst", lst_cell)):
        if float(np.asarray(domain.occ)[tuple(cell)]) != 1.0:
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
    if alpha_cell is not None:
        aw_np, bw_np = wall_impedance_field(alpha_cell, c, dt, dx)
        a_w, b_w = jnp.asarray(aw_np), jnp.asarray(bw_np)
    else:
        aws, bws = wall_impedance_coefficients(alpha, c, dt, dx)
        a_w, b_w = jnp.float32(aws), jnp.float32(bws)
    si, sj, sk = (int(i) for i in src_cell)
    li, lj, lk = (int(i) for i in lst_cell)
    state, rec = _run_scan(
        occ, pulse,
        jnp.float32(k), a_w, b_w, jnp.float32(kp),
        si=si, sj=sj, sk=sk, li=li, lj=lj, lk=lk,
    )
    wir = WaveIR(pressure=rec, dt=float(dt), pulse=pulse, t0=t0)
    if return_state:
        return wir, state
    return wir


def field_energy(state, c: float = 350.0) -> jnp.ndarray:
    """Total acoustic field energy sum(p^2)/(2 c^2) + sum(|v|^2)/2
    (rho = 1). Exactly conserved (up to leapfrog time-staggering ripple)
    with rigid walls once the source pulse has ended."""
    p, vx, vy, vz = state
    return (
        0.5 * jnp.sum(p * p) / (c * c)
        + 0.5 * (jnp.sum(vx * vx) + jnp.sum(vy * vy) + jnp.sum(vz * vz))
    )


def _scene_triangles(scene_or_tris) -> tuple[np.ndarray, np.ndarray | None]:
    """(triangles (T,3,3), per-triangle absorption (T, n_bands) or None)
    from a Scene, a SceneArrays pytree, or a raw (T,3,3) array."""
    from .scene import Scene, SceneArrays

    if isinstance(scene_or_tris, Scene):
        ab = np.asarray(scene_or_tris.absorption, np.float64)
        tris = np.asarray(scene_or_tris.triangles)
        return tris, ab[: tris.shape[0]]
    if isinstance(scene_or_tris, SceneArrays):
        v0 = np.asarray(scene_or_tris.v0, np.float64)
        v1 = np.asarray(scene_or_tris.v1, np.float64)
        v2 = np.asarray(scene_or_tris.v2, np.float64)
        area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
        real = area > 1e-12  # padding triangles are degenerate
        tris = np.stack([v0[real], v1[real], v2[real]], axis=1)
        ab = np.asarray(scene_or_tris.absorption, np.float64)[real]
        return tris, ab
    return np.asarray(scene_or_tris, np.float64).reshape(-1, 3, 3), None


def wave_ir(
    scene_or_tris,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    dx: float = 0.08,
    duration: float = 0.25,
    alpha: float | None = None,
    fc: float | None = None,
    pad_cells: int = 2,
    cfl: float = 0.999,
    materials: bool = False,
    band: int | None = None,
) -> WaveIR:
    """High-level wave-based IR: voxelize the scene, run the FDTD solver,
    return the band-limited pressure response at the listener.

    The usable bandwidth is ~c/(8 dx) Hz (8 points per wavelength);
    dx = 0.08 m covers the engine's two lowest physical bands
    (AIR_BAND_HZ 64/313.5 Hz, models/ir.py). alpha defaults to the
    scene's mean absorption (or 0.1 for raw triangle input).

    materials=True: per-face wall admittance — every solid voxel takes
    its rasterizing triangle's absorption (``band``'s value, or the
    band mean when band is None) instead of one global alpha. Requires
    a Scene/SceneArrays input (raw triangles carry no materials)."""
    tris, tri_ab = _scene_triangles(scene_or_tris)
    if alpha is None:
        alpha = float(tri_ab.mean()) if tri_ab is not None else 0.1
    alpha_cell = None
    if materials:
        if tri_ab is None:
            raise ValueError(
                "materials=True needs a Scene/SceneArrays input (raw "
                "triangles carry no per-surface absorption)"
            )
        domain, tid = voxelize_triangles(
            tris, dx, pad_cells=pad_cells, return_tri_ids=True
        )
        alpha_cell = material_alpha_cells(
            tid, tri_ab, band=band, default=float(alpha)
        )
    else:
        domain = voxelize_triangles(tris, dx, pad_cells=pad_cells)
    c = float(cfg.speed_of_sound)
    dt = courant_dt(domain.dx, c, cfl)
    n_steps = int(math.ceil(duration / dt))
    return wave_run(
        domain,
        domain.cell_of(source),
        domain.cell_of(listener),
        n_steps,
        c=c,
        alpha=float(alpha),
        cfl=cfl,
        fc=fc,
        dt=dt,
        alpha_cell=alpha_cell,
    )


def wave_ir_bands(
    scene_or_tris,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    bands: tuple = (0,),
    dx: float = 0.08,
    duration: float = 0.25,
    alpha: float | None = None,
    fc: float | None = None,
    pad_cells: int = 2,
    cfl: float = 0.999,
) -> list[WaveIR]:
    """Per-band material-admittance wave IRs in ONE device dispatch.

    Equivalent to ``[wave_ir(..., materials=True, band=b) for b in
    bands]`` — bit-matching pressures per band — but the grids are
    voxelized once and the B solves run as one vmapped scan, so the
    device dispatches once and each step walks all band grids together
    (the per-band fields differ only in their wall-impedance values).
    hybrid_wave_ir(wave_materials=True) routes here."""
    tris, tri_ab = _scene_triangles(scene_or_tris)
    if tri_ab is None:
        raise ValueError(
            "wave_ir_bands needs a Scene/SceneArrays input (raw "
            "triangles carry no per-surface absorption)"
        )
    if alpha is None:
        alpha = float(tri_ab.mean())
    domain, tid = voxelize_triangles(
        tris, dx, pad_cells=pad_cells, return_tri_ids=True
    )
    c = float(cfg.speed_of_sound)
    dt = courant_dt(domain.dx, c, cfl)
    check_courant(dt, domain.dx, c)
    n_steps = int(math.ceil(duration / dt))
    src_cell = domain.cell_of(source)
    lst_cell = domain.cell_of(listener)
    for name, cell in (("src", src_cell), ("lst", lst_cell)):
        if float(np.asarray(domain.occ)[tuple(cell)]) != 1.0:
            raise ValueError(f"{name} cell {tuple(cell)} is not an air cell")
    if fc is None:
        fc = c / (16.0 * domain.dx)
    pulse, t0 = source_pulse(n_steps, dt, fc)
    aws, bws = [], []
    for b in bands:
        ac = material_alpha_cells(tid, tri_ab, band=int(b),
                                  default=float(alpha))
        aw, bw = wall_impedance_field(ac, c, dt, domain.dx)
        aws.append(aw)
        bws.append(bw)
    a_w = jnp.asarray(np.stack(aws))
    b_w = jnp.asarray(np.stack(bws))
    occ = jnp.asarray(domain.occ, jnp.float32)
    kp = c * c * dt / domain.dx
    k = dt / domain.dx
    si, sj, sk = (int(i) for i in src_cell)
    li, lj, lk = (int(i) for i in lst_cell)
    rec = _run_scan_banded(
        occ, pulse, jnp.float32(k), a_w, b_w, jnp.float32(kp),
        si=si, sj=sj, sk=sk, li=li, lj=lj, lk=lk,
    )
    return [
        WaveIR(pressure=rec[i], dt=float(dt), pulse=pulse, t0=t0)
        for i in range(len(bands))
    ]


def resample_pressure(wir: WaveIR, sample_rate: int) -> np.ndarray:
    """Linearly resample the recorded pressure from the simulation rate
    1/dt to ``sample_rate`` (band-limited far below either Nyquist)."""
    p = np.asarray(wir.pressure, np.float64)
    t_end = (len(p) - 1) * wir.dt
    n_out = int(math.floor(t_end * sample_rate)) + 1
    t_out = np.arange(n_out, dtype=np.float64) / sample_rate
    src_t = np.arange(len(p), dtype=np.float64) * wir.dt
    return np.interp(t_out, src_t, p).astype(np.float32)


def wave_ir_energy(wir: WaveIR, cfg: Config = DEFAULT_CONFIG) -> jnp.ndarray:
    """(n_bands, n_bins) energy histogram of the wave response in the
    tracer's convention: resample to cfg.sample_rate, align the pulse
    peak to t = 0 (so bin k is delay k samples, like trace_ir), band-split
    with the engine's own LR2 filterbank and square per sample
    (models/inverse.py::measured_ir_to_energy). Bands above the grid's
    resolved bandwidth carry (physically correct) near-zero energy."""
    from .inverse import measured_ir_to_energy

    p = resample_pressure(wir, cfg.sample_rate)
    shift = int(round(wir.t0 * cfg.sample_rate))
    p = p[shift:] if shift < len(p) else p[:0]
    return measured_ir_to_energy(p, cfg=cfg)


def hybrid_wave_ir(
    arrays,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    crossover_band: int = 1,
    wave: WaveIR | None = None,
    wave_kwargs: dict | None = None,
    wave_materials: bool = False,
    **trace_kwargs,
):
    """Wave/ray hybrid impulse response: FDTD physics for the bands below
    ``crossover_band``, the ray tracer for the rest.

    The wave bands are level-calibrated per band against the tracer's own
    energy convention over the direct-arrival window (the wave solver's
    normalized-pressure scale is arbitrary; the direct path's energy is
    the one feature both models share exactly), then spliced into the
    traced ImpulseResponse row-wise. dir_sum/sh_moments stay the
    tracer's: the wave field carries no arrival directions, and the
    low-frequency bed is the least directional part of the mix.
    Returns (ImpulseResponse, WaveIR).

    wave_materials=True: one wave solve PER crossover band with
    per-face admittance from the scene's per-surface absorption at that
    band (``wave_ir(materials=True, band=b)``) — the wave bands then
    honor the same material map as the ray bands, instead of one scalar
    alpha across all walls. The returned WaveIR is band 0's."""
    from .ir import ImpulseResponse, trace_ir

    ray = trace_ir(arrays, source, listener, cfg=cfg, **trace_kwargs)
    n_bins = ray.energy.shape[1]

    def _fit(e):
        return (
            e[:, :n_bins]
            if e.shape[1] >= n_bins
            else jnp.pad(e, ((0, 0), (0, n_bins - e.shape[1])))
        )

    if wave is not None:
        e_all = _fit(wave_ir_energy(wave, cfg=cfg))
        e_of = lambda b: e_all[b]  # noqa: E731
    elif wave_materials:
        # all crossover bands' material-grid solves in ONE dispatch
        # (bit-matching the sequential per-band wave_ir calls)
        waves = wave_ir_bands(
            arrays, source, listener, cfg=cfg,
            bands=tuple(range(int(crossover_band))), **(wave_kwargs or {}),
        )
        e_per = [_fit(wave_ir_energy(w, cfg=cfg)) for w in waves]
        e_of = lambda b: e_per[b][b]  # noqa: E731
        wave = waves[0]
    else:
        wave = wave_ir(arrays, source, listener, cfg=cfg, **(wave_kwargs or {}))
        e_all = _fit(wave_ir_energy(wave, cfg=cfg))
        e_of = lambda b: e_all[b]  # noqa: E731
    d = float(np.linalg.norm(np.asarray(source) - np.asarray(listener)))
    k0 = int(round(d / cfg.speed_of_sound * cfg.sample_rate))
    half = max(int(round(wave.t0 * cfg.sample_rate)), 8)
    w_lo, w_hi = max(0, k0 - half), min(n_bins, k0 + half + 1)
    energy = ray.energy
    for b in range(int(crossover_band)):
        e_b = e_of(b)
        ray_win = jnp.sum(ray.energy[b, w_lo:w_hi])
        wav_win = jnp.sum(e_b[w_lo:w_hi])
        scale = jnp.where(wav_win > 0, ray_win / jnp.maximum(wav_win, 1e-30), 0.0)
        energy = energy.at[b].set(e_b * scale)
    return ImpulseResponse(energy, ray.dir_sum, ray.sh_moments), wave
