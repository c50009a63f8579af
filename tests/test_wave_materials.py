"""Per-face wall admittance from scene materials (r2 VERDICT item 3).

The wave solver's walls were one scalar alpha; every ray family honors
per-surface materials. models/wave.py now maps each solid voxel to its
rasterizing triangle (voxelize_triangles(return_tri_ids=True)) and each
air-solid face to its wall cell's impedance (alpha_cell / _face_terms_var).
Validation, per the verdict's done-criteria:
  * field mode with a CONSTANT alpha field is bit-identical to the
    scalar path (the _face_terms_var reduction),
  * an impedance-tube reflection coefficient matches the analytic
    normal-incidence R = sqrt(1 - alpha) of the locally-reacting wall,
  * a two-material box's decay sits between its all-low/all-high
    bounds and near Sabine's area-weighted prediction,
  * hybrid_wave_ir(wave_materials=True) consumes Scene materials
    directly (one solve per crossover band, band-indexed alpha).
"""

import dataclasses
import math

import numpy as np
import pytest

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models import wave as W

C = 350.0


def _shell_box(nx, ny, nz, dx=0.1):
    occ = np.zeros((nx + 2, ny + 2, nz + 2), np.float32)
    occ[1:-1, 1:-1, 1:-1] = 1.0
    return W.WaveDomain(occ=occ, dx=dx, origin=(0.0, 0.0, 0.0))


def test_constant_field_matches_scalar_bitwise():
    dom = _shell_box(14, 10, 12)
    alpha = 0.27
    kw = dict(c=C, n_steps=120)
    a = W.wave_run(dom, (4, 5, 6), (10, 5, 6), **kw, alpha=alpha)
    field = np.full(dom.shape, alpha, np.float32)
    b = W.wave_run(dom, (4, 5, 6), (10, 5, 6), **kw, alpha=999.0,
                   alpha_cell=field)
    assert np.array_equal(np.asarray(a.pressure), np.asarray(b.pressure))


@pytest.mark.parametrize("alpha_cap", [0.19, 0.5, 0.75])
def test_impedance_tube_reflection_coefficient(alpha_cap):
    """Rigid duct with an absorbing end cap: the reflected pulse's peak
    over the incident pulse's peak approximates the analytic
    normal-incidence amplitude coefficient R = sqrt(1 - alpha) of the
    locally-reacting impedance wall (wall_impedance_coefficients maps
    alpha -> zeta = (1+R)/(1-R), so this closes the loop).

    Geometry keeps the pulse below the duct's first cross-mode cutoff
    (0.6 m duct -> 292 Hz; fc = 146 Hz) so incidence at the cap is
    normal — a wider/faster setup measured R inflated by oblique
    cross modes. Measured discrete bias at this dx: +0.06-0.08 absolute
    (staggered half-cell face position), dt-independent (0.562 at
    cfl 0.999 vs 0.557 at 0.5 for analytic 0.5)."""
    dx = 0.1
    nx = 260
    dom = _shell_box(nx, 6, 6, dx)
    # rigid everywhere except the high-x cap plane
    alpha_cell = np.zeros(dom.shape, np.float32)
    alpha_cell[-1, :, :] = alpha_cap
    src = (140, 3, 3)
    lst = (220, 3, 3)
    w = W.wave_run(dom, src, lst, 900, c=C, alpha=0.0,
                   alpha_cell=alpha_cell, fc=C / (24 * dx))
    p = np.asarray(w.pressure, np.float64)
    # arrival times in steps (dt = Courant): incident at (lst-src) cells,
    # cap reflection at (2*end - src - lst); the left-wall reflection
    # arrives much later by construction (src + lst >> 2*end - src - lst)
    steps_per_cell = 1.0 / (0.999 / math.sqrt(3.0))
    t0 = w.t0 / w.dt
    t_inc = t0 + (lst[0] - src[0]) * steps_per_cell
    t_ref = t0 + (2 * (nx + 1) - src[0] - lst[0]) * steps_per_cell
    half = int((t_ref - t_inc) / 2)
    win_inc = p[int(t_inc) - half : int(t_inc) + half]
    win_ref = p[int(t_ref) - half : int(t_ref) + half]
    r_meas = np.max(np.abs(win_ref)) / np.max(np.abs(win_inc))
    r_ana = math.sqrt(1.0 - alpha_cap)
    assert abs(r_meas - r_ana) < 0.1, (r_meas, r_ana)


def test_two_material_box_decay_between_bounds():
    """A box whose z walls are absorptive (0.45) and x/y walls near-rigid
    (0.04): T30 sits strictly between the all-0.04 and all-0.45 uniform
    boxes', and within a factor ~2 of Sabine's area-weighted mean."""
    from audio_raytracing_tpu.models.metrics import rt60

    dx = 0.1
    nx, ny, nz = 30, 26, 22
    dom = _shell_box(nx, ny, nz, dx)
    a_lo, a_hi = 0.04, 0.45
    mixed = np.full(dom.shape, a_lo, np.float32)
    mixed[:, :, 0] = a_hi
    mixed[:, :, -1] = a_hi
    n_steps = 3200
    kw = dict(c=C, fc=120.0)
    src, lst = (5, 4, 3), (24, 19, 14)

    def t60_of(alpha=None, field=None):
        w = W.wave_run(dom, src, lst, n_steps, alpha=alpha or 0.0,
                       alpha_cell=field, **kw)
        cfg_sim = dataclasses.replace(
            DEFAULT_CONFIG, sample_rate=int(round(1.0 / w.dt))
        )
        p = np.asarray(w.pressure, np.float64)
        return float(rt60(p**2, cfg=cfg_sim, method="t30"))

    t_mixed = t60_of(field=mixed)
    t_lo = t60_of(alpha=a_hi)   # all walls absorptive -> SHORT decay
    t_hi = t60_of(alpha=a_lo)   # all walls near-rigid -> LONG decay
    assert t_lo < t_mixed < t_hi, (t_lo, t_mixed, t_hi)

    L = (nx * dx, ny * dx, nz * dx)
    vol = L[0] * L[1] * L[2]
    s_z = 2 * L[0] * L[1]
    s_xy = 2 * (L[0] * L[2] + L[1] * L[2])
    mean_a = (s_z * a_hi + s_xy * a_lo) / (s_z + s_xy)
    sabine = 24 * math.log(10) / C * vol / ((s_z + s_xy) * mean_a)
    assert 0.4 * sabine < t_mixed < 2.5 * sabine, (t_mixed, sabine)


def test_voxel_tri_ids_and_alpha_cells():
    tris = np.array([
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        [[0, 0, 2], [1, 0, 2], [0, 1, 2]],
    ], np.float64)
    dom, tid = W.voxelize_triangles(tris, 0.25, return_tri_ids=True)
    assert tid.shape == dom.shape
    solid = np.asarray(dom.occ) == 0.0
    assert np.all(tid[solid] >= 0) and np.all(tid[~solid] == -1)
    # the two triangles sit at z=0 and z=2: ownership splits by height
    zs0 = np.nonzero(tid == 0)[2]
    zs1 = np.nonzero(tid == 1)[2]
    assert zs0.max() < zs1.min()
    ab = np.array([[0.1, 0.2], [0.6, 0.8]], np.float64)
    cells = W.material_alpha_cells(tid, ab, band=1, default=0.5)
    assert np.isclose(cells[tid == 0].mean(), 0.2)
    assert np.isclose(cells[tid == 1].mean(), 0.8)
    assert np.isclose(cells[tid == -1].mean(), 0.5)
    mean_cells = W.material_alpha_cells(tid, ab, band=None)
    assert np.isclose(mean_cells[tid == 0].mean(), 0.15)


def test_wave_ir_bands_bitmatches_sequential():
    """wave_ir_bands runs every crossover band's material-grid solve in
    ONE vmapped dispatch; the per-band pressures must BIT-match the
    sequential wave_ir(materials=True, band=b) dispatches (the vmap adds
    a batch axis but the per-band elementwise program is unchanged)."""
    from audio_raytracing_tpu.models.scene import Scene, box_room

    tris = box_room(size=(2.4, 2.0, 1.8))
    ab = np.tile(np.array([[0.08, 0.5, 0.3, 0.3]], np.float32),
                 (tris.shape[0], 1))
    scene = Scene.from_triangles(tris, absorption=ab)
    src, lst = np.array([0.6, 0.5, 0.4]), np.array([-0.8, -0.6, -0.5])
    kw = dict(dx=0.12, duration=0.05)
    batched = W.wave_ir_bands(scene, src, lst, bands=(0, 1), **kw)
    for b, wb in enumerate(batched):
        ws = W.wave_ir(scene, src, lst, materials=True, band=b, **kw)
        assert np.array_equal(np.asarray(wb.pressure),
                              np.asarray(ws.pressure)), f"band {b}"
        assert wb.dt == ws.dt and wb.t0 == ws.t0


@pytest.mark.slow
def test_hybrid_wave_materials_per_band():
    """hybrid_wave_ir(wave_materials=True) runs one per-band-material
    solve per crossover band, consuming Scene absorption directly; with
    band-dependent materials the two wave bands decay differently."""
    from audio_raytracing_tpu.models.scene import Scene, box_room

    tris = box_room(size=(3.2, 2.6, 2.4))
    # band-dependent absorption: heavy in band 1, light in band 0
    ab = np.tile(np.array([[0.06, 0.55, 0.3, 0.3]], np.float32),
                 (tris.shape[0], 1))
    scene = Scene.from_triangles(tris, absorption=ab)
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192,
                              rays_per_source=2048)
    ir, wav = W.hybrid_wave_ir(
        scene.device_arrays(), np.array([0.8, 0.7, 0.6]),
        np.array([-1.2, -0.9, -0.8]),
        cfg=cfg, crossover_band=2, wave_materials=True,
        wave_kwargs=dict(duration=0.22, dx=0.1),
        n_rays=2048,
    )
    e = np.asarray(ir.energy)
    assert e.shape[0] == 4 and np.all(np.isfinite(e))
    # band 1's walls absorb ~9x band 0's: its late tail must decay
    # faster relative to its own early energy
    k0 = int(np.argmax(e[0] > 0))
    early = slice(k0, k0 + 800)
    late = slice(k0 + 3000, k0 + 6000)
    r0 = e[0, late].sum() / max(e[0, early].sum(), 1e-30)
    r1 = e[1, late].sum() / max(e[1, early].sum(), 1e-30)
    assert r1 < r0, (r0, r1)
