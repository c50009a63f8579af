"""Edge diffraction: topology extraction, shadow-zone gating, Fresnel
physics (band ordering, screen-depth monotonicity), delay placement."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.diffraction import (
    diffraction_ir,
    extract_edges,
    kurze_anderson_db,
)
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096)


def screen(half_h=1.0, half_w=4.0, x=0.0):
    """A thin rectangular screen in the x=const plane, top edge at y=half_h."""
    return np.float32([
        [[x, -half_h, -half_w], [x, half_h, -half_w], [x, half_h, half_w]],
        [[x, -half_h, -half_w], [x, half_h, half_w], [x, -half_h, half_w]],
    ])


def test_extract_edges_topology():
    # box room: 12 tris; 18 edges total, 12 are creases (90 deg), 6 are the
    # coplanar diagonals of the quads -> dropped
    e_room = extract_edges(box_room())
    assert e_room.shape == (12, 2, 3)
    # a 2-triangle screen: 4 boundary edges + 1 coplanar diagonal (dropped)
    e_screen = extract_edges(screen())
    assert e_screen.shape == (4, 2, 3)


def test_kurze_anderson_monotone():
    n = jnp.asarray([1e-6, 0.1, 1.0, 10.0, 100.0])
    a = np.asarray(kurze_anderson_db(n))
    assert (np.diff(a) > 0).all()
    assert abs(a[0] - 5.0) < 0.1  # grazing incidence ~5 dB


def _setup(half_h=1.0):
    tris = screen(half_h=half_h)
    scene = Scene.from_triangles(tris, CFG)
    edges = extract_edges(tris)
    return scene.device_arrays(), edges


def test_shadow_zone_gating_and_delay():
    arrays, edges = _setup()
    src = jnp.asarray([2.0, 0.0, 0.0])
    lst_shadow = jnp.asarray([-2.0, 0.0, 0.0])  # behind the screen
    lst_lit = jnp.asarray([-2.0, 3.0, 0.0])  # sees the source over the top

    ir = diffraction_ir(arrays, edges, src, lst_shadow, cfg=CFG)
    e = np.asarray(ir.energy)
    assert e.sum() > 0
    # shortest path over the top edge (y=1): via (0, 1, 0)
    d = float(np.linalg.norm([2.0, -1.0, 0.0]) + np.linalg.norm([2.0, 1.0, 0.0]))
    b = int(round(d * CFG.samples_per_meter))
    assert e[:, b].sum() > 0
    # lit listener: gated off entirely
    ir_lit = diffraction_ir(arrays, edges, src, lst_lit, cfg=CFG)
    assert float(ir_lit.energy.sum()) == 0.0


def test_band_and_depth_physics():
    """Higher bands diffract less (larger Fresnel N); a taller screen
    (deeper shadow) attenuates more."""
    arrays, edges = _setup(half_h=1.0)
    src = jnp.asarray([2.0, 0.0, 0.0])
    lst = jnp.asarray([-2.0, 0.0, 0.0])
    ir = diffraction_ir(arrays, edges, src, lst, cfg=CFG)
    e_band = np.asarray(ir.energy).sum(axis=1)
    assert e_band[0] > e_band[1] > e_band[2] > e_band[3] > 0

    arrays_tall, edges_tall = _setup(half_h=2.0)
    ir_tall = diffraction_ir(arrays_tall, edges_tall, src, lst, cfg=CFG)
    assert float(ir_tall.energy.sum()) < float(ir.energy.sum())


def test_additive_with_tracer():
    """In the shadow zone the specular tracer's direct term is zero, so the
    diffraction field adds the missing arrival without double counting."""
    from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir

    arrays, edges = _setup()
    src = jnp.asarray([2.0, 0.0, 0.0])
    lst = jnp.asarray([-2.0, 0.0, 0.0])
    traced = trace_ir(arrays, src, lst, cfg=CFG, max_bounces=2,
                      dirs=jnp.asarray(fibonacci_sphere(512)))
    d_direct = float(jnp.linalg.norm(src - lst))
    b_direct = int(round(d_direct * CFG.samples_per_meter))
    assert np.asarray(traced.energy)[:, b_direct].sum() == 0.0  # occluded
    diff = diffraction_ir(arrays, edges, src, lst, cfg=CFG)
    total = np.asarray(traced.energy) + np.asarray(diff.energy)
    assert total.sum() > np.asarray(traced.energy).sum()


# ---------------------------------------------------------------------------
# UTD wedge coefficient
# ---------------------------------------------------------------------------

def test_extract_wedges_geometry():
    from audio_raytracing_tpu.models.diffraction import extract_wedges

    # thin screen: 4 boundary edges, all n_w = 2 (half-plane limit)
    w_scr = extract_wedges(screen())
    assert w_scr.edges.shape == (4, 2, 3)
    np.testing.assert_allclose(w_scr.n_w, 2.0)
    # box room (inward winding): 12 inside corners, air sector = pi/2
    w_room = extract_wedges(box_room())
    assert w_room.edges.shape == (12, 2, 3)
    np.testing.assert_allclose(w_room.n_w, 0.5, atol=1e-5)
    # frames are orthonormal and yhat sweeps from the o-face tangent
    for W in (w_scr, w_room):
        np.testing.assert_allclose(
            np.sum(W.xhat * W.yhat, axis=-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(
            np.linalg.norm(W.xhat, axis=-1), 1.0, atol=1e-5)


def _top_edge_bin(lst):
    d = float(np.linalg.norm([2.0, -1.0, 0.0])
              + np.linalg.norm(np.asarray(lst) - np.asarray([0.0, 1.0, 0.0])))
    return d, int(d * CFG.samples_per_meter + 0.5)


def test_utd_knife_edge_matches_kurze_anderson():
    """For a thin screen (n_w = 2) the UTD coefficient must agree with the
    Kurze-Anderson knife-edge fit: within ~1 dB where the fit is good
    (N >~ 0.1), within a few dB at near-zero Fresnel numbers where K-A's
    +5 dB floor is known to overshoot (UTD is the rigorous one there)."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd, extract_wedges)

    tris = screen()
    arrays = Scene.from_triangles(tris, CFG).device_arrays()
    edges = extract_edges(tris)
    wedges = extract_wedges(tris)
    src = jnp.asarray([2.0, 0.0, 0.0])
    for lst in ([-2.0, 0.0, 0.0], [-2.0, -0.5, 0.0], [-4.0, 0.3, 0.0]):
        l = jnp.asarray(lst)
        e_ka = np.asarray(diffraction_ir(arrays, edges, src, l, cfg=CFG).energy)
        e_ut = np.asarray(
            diffraction_ir_utd(arrays, wedges, src, l, cfg=CFG).energy)
        _, b = _top_edge_bin(lst)
        w = slice(max(0, b - 1), b + 2)
        ka = e_ka[:, w].sum(axis=1)
        ut = e_ut[:, w].sum(axis=1)
        # skip bands the air-absorption clamp already silenced (0/0)
        live = ka > 1e-20
        db = 10.0 * np.log10(ut[live] / ka[live])
        assert np.abs(db[1:]).max() < 2.0, db
        assert abs(db[0]) < 4.0, db


def test_utd_shadow_boundary_half_field():
    """Just inside the shadow boundary the diffracted field approaches half
    the incident field (total-field continuity across the boundary) — the
    singular cot x F limit at work. Checked at the bands whose wavelength
    is short against the geometry (the low bands are still mid-transition,
    physically)."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd, extract_wedges)
    from audio_raytracing_tpu.ops.eq import EQ_FREQS

    tris = screen()
    arrays = Scene.from_triangles(tris, CFG).device_arrays()
    wedges = extract_wedges(tris)
    src = jnp.asarray([2.0, 0.0, 0.0])
    lst = [-2.0, 2.0 - 0.02, 0.0]  # boundary passes through (-2, 2, 0)
    e = np.asarray(
        diffraction_ir_utd(arrays, wedges, src, jnp.asarray(lst), cfg=CFG).energy)
    d, b = _top_edge_bin(lst)
    air = np.clip(1.0 - CFG.air_absorption * d * EQ_FREQS, 0.0, 1.0)
    gain = np.sqrt(e[:, max(0, b - 1): b + 2].sum(axis=1)) * (d + 1.0) / air
    assert 0.35 < gain[2] < 0.65, gain
    assert 0.35 < gain[3] < 0.65, gain


def test_utd_terms_match_gtd_identity():
    """In the F -> 1 regime (kL large, away from boundaries) the two
    incidence cotangent terms must collapse to Keller's closed-form GTD
    wedge factor: cot((pi+b)/2n) + cot((pi-b)/2n)
    = 2 sin(pi/n) / (cos(b/n) - cos(pi/n))."""
    from audio_raytracing_tpu.models.diffraction import _utd_term

    kl = jnp.full((1, 1), 1.0e4)
    for n in (0.7, 1.5, 2.0):
        nn = jnp.asarray([n])
        for b in (0.3, 1.1, 2.0, 2.6):
            if abs(abs(b) - np.pi) < 0.3:
                continue  # near a boundary, F != 1 by design
            r1, i1 = _utd_term(jnp.asarray(np.pi + b), nn, kl)
            r2, i2 = _utd_term(jnp.asarray(np.pi - b), nn, kl)
            got = float(r1[0, 0] + r2[0, 0])
            want = 2.0 * np.sin(np.pi / n) / (np.cos(b / n) - np.cos(np.pi / n))
            np.testing.assert_allclose(got, want, rtol=5e-2)
            # F ~ 1: imaginary parts are asymptotically small
            assert abs(float(i1[0, 0] + i2[0, 0])) < 0.1 * abs(got) + 0.05


def test_utd_wedge_scene_shadow():
    """A 90-degree outside corner (wall + roof, n_w = 1.5): a listener in
    the wedge's shadow sector (between the shadow boundary and the roof
    face) hears a finite attenuated arrival at the apex delay; a listener
    outside it hears nothing from this model."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd, extract_wedges)
    from audio_raytracing_tpu.ops.eq import EQ_FREQS

    z = 4.0
    wall = np.float32([
        [[0, -3, -z], [0, 1, -z], [0, 1, z]],
        [[0, -3, -z], [0, 1, z], [0, -3, z]],
    ])
    roof = np.float32([
        [[-3, 1, -z], [-3, 1, z], [0, 1, z]],
        [[-3, 1, -z], [0, 1, z], [0, 1, -z]],
    ])
    tris = np.concatenate([wall, roof])
    arrays = Scene.from_triangles(tris, CFG).device_arrays()
    W = extract_wedges(tris)
    # the corner edge was classified as a 3/2-wedge
    corner = [i for i in range(len(W.n_w))
              if np.allclose(W.edges[i, :, 1], 1.0)
              and np.allclose(W.edges[i, :, 0], 0.0)]
    assert corner and abs(W.n_w[corner[0]] - 1.5) < 1e-5

    src = jnp.asarray([2.0, 0.0, 0.0])
    # shadow sector for this src spans listener directions between the
    # shadow boundary (incident continuation) and the roof; (-2.9, 1.78)
    # sits mid-sector, above the roof plane (in air)
    lst = jnp.asarray([-2.9, 1.78, 0.0])
    e = np.asarray(diffraction_ir_utd(arrays, W, src, lst, cfg=CFG).energy)
    d = float(np.linalg.norm([2.0, -1.0, 0.0])
              + np.linalg.norm(np.asarray([-2.9, 0.78, 0.0])))
    b = int(d * CFG.samples_per_meter + 0.5)
    band_e = e[:, max(0, b - 1): b + 2].sum(axis=1)
    assert (band_e > 0).all() and np.isfinite(band_e).all()
    # attenuated relative to free field at the diffracted distance
    air = np.clip(1.0 - CFG.air_absorption * d * EQ_FREQS, 0.0, 1.0)
    gain = np.sqrt(band_e) * (d + 1.0) / np.maximum(air, 1e-9)
    # bands with kL >~ 1 attenuate; the 4 Hz band (kL ~ 0.1) is below
    # UTD's asymptotic validity — its overlapping shadow+reflection
    # transition regions may push slightly past unity, bounded here
    assert (gain[1:] < 1.0).all(), gain
    assert gain[0] < 2.0, gain
    # a lit listener (direct path clear) gets nothing
    e_lit = np.asarray(diffraction_ir_utd(
        arrays, W, src, jnp.asarray([2.0, 3.0, 0.0]), cfg=CFG).energy)
    assert float(e_lit.sum()) == 0.0


def test_utd_reciprocity():
    """Swapping source and listener leaves every arrival's energy unchanged
    (the UTD coefficient is symmetric in phi/phi0 and s/s')."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd, extract_wedges)

    tris = screen()
    arrays = Scene.from_triangles(tris, CFG).device_arrays()
    wedges = extract_wedges(tris)
    a = jnp.asarray([2.0, 0.3, 0.5])
    b = jnp.asarray([-2.5, -0.4, -0.8])
    e1 = np.asarray(diffraction_ir_utd(arrays, wedges, a, b, cfg=CFG).energy)
    e2 = np.asarray(diffraction_ir_utd(arrays, wedges, b, a, cfg=CFG).energy)
    assert e1.sum() > 0
    np.testing.assert_allclose(e1, e2, rtol=1e-4, atol=1e-12)


# ---- second-order (edge-to-edge) UTD ------------------------------------

def _double_screen_setup():
    """Two thin screens both blocking the direct path; every FIRST-order
    apex leg is blocked by the other screen (the taller far screen kills
    the over-A path, the near screen kills the over-B path), so only the
    edge-to-edge path over both tops remains."""
    from audio_raytracing_tpu.models.diffraction import extract_wedges

    tris = np.concatenate([
        screen(half_h=1.0, half_w=6.0, x=-1.0),
        screen(half_h=1.5, half_w=6.0, x=1.0),
    ])
    # raise the second screen's bottom to -1.5 is unnecessary; both reach
    # below the source/listener line (y=0) and block the direct ray
    scene = Scene.from_triangles(tris, CFG)
    return scene.device_arrays(), extract_wedges(tris)


def test_utd2_double_screen_path():
    """First order is silent across a double barrier; second order carries
    the over-both-tops arrival at the correct delay."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd,
        diffraction_ir_utd2,
    )

    arrays, wedges = _double_screen_setup()
    src = jnp.asarray([-3.0, 0.0, 0.0])
    lst = jnp.asarray([3.0, 0.0, 0.0])
    ir1 = diffraction_ir_utd(arrays, wedges, src, lst, cfg=CFG)
    ir2 = diffraction_ir_utd2(arrays, wedges, src, lst, cfg=CFG)
    e1 = float(jnp.sum(ir1.energy))
    e2 = float(jnp.sum(ir2.energy))
    assert e1 < 1e-12  # every first-order apex leg is blocked
    assert e2 > 1e-12

    # delay: the shortest double path src->(-1,1,0)->(1,1.5,0)->lst
    p1 = np.float32([-1.0, 1.0, 0.0])
    p2 = np.float32([1.0, 1.5, 0.0])
    d = (np.linalg.norm(p1 - np.float32([-3, 0, 0]))
         + np.linalg.norm(p2 - p1)
         + np.linalg.norm(np.float32([3, 0, 0]) - p2))
    expect_bin = int(round(d * CFG.samples_per_meter * CFG.ir_bins_per_sample))
    peak = int(np.argmax(np.asarray(ir2.energy).sum(axis=0)))
    assert abs(peak - expect_bin) <= 3

    # physics: higher bands lose more over a double edge
    e_bands = np.asarray(ir2.energy).sum(axis=1)
    assert e_bands[0] > e_bands[1] > e_bands[2] > e_bands[3]


def test_utd2_reciprocity():
    from audio_raytracing_tpu.models.diffraction import diffraction_ir_utd2

    arrays, wedges = _double_screen_setup()
    src = jnp.asarray([-3.0, 0.2, 0.5])
    lst = jnp.asarray([2.5, -0.1, -0.3])
    a = float(jnp.sum(diffraction_ir_utd2(arrays, wedges, src, lst, cfg=CFG).energy))
    b = float(jnp.sum(diffraction_ir_utd2(arrays, wedges, lst, src, cfg=CFG).energy))
    assert a > 0.0
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_utd2_double_barrier_attenuates_more_than_single():
    """Insertion loss of two screens > one screen (same endpoints)."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd,
        diffraction_ir_utd2,
        extract_wedges,
    )

    src = jnp.asarray([-3.0, 0.0, 0.0])
    lst = jnp.asarray([3.0, 0.0, 0.0])
    single = screen(half_h=1.0, half_w=6.0, x=-1.0)
    e_single = float(jnp.sum(diffraction_ir_utd(
        Scene.from_triangles(single, CFG).device_arrays(),
        extract_wedges(single), src, lst, cfg=CFG,
    ).energy))
    arrays, wedges = _double_screen_setup()
    e_double = float(jnp.sum(
        diffraction_ir_utd2(arrays, wedges, src, lst, cfg=CFG).energy
    ))
    assert 0.0 < e_double < e_single


def test_utd2_strip_double_diffraction_below_first_order():
    """A single finite screen IS Keller's strip problem: its top->bottom
    edge pairs are genuine stationary double-diffracted rays. They must
    contribute — at a longer delay than the first-order apexes and below
    the first-order energy (a correction term, not the leading field)."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd,
        diffraction_ir_utd2,
        extract_wedges,
    )

    tris = screen(half_h=1.0, half_w=6.0)
    arrays = Scene.from_triangles(tris, CFG).device_arrays()
    wedges = extract_wedges(tris)
    src = jnp.asarray([-2.0, 0.0, 0.0])
    lst = jnp.asarray([2.0, 0.0, 0.0])
    ir1 = diffraction_ir_utd(arrays, wedges, src, lst, cfg=CFG)
    ir2 = diffraction_ir_utd2(arrays, wedges, src, lst, cfg=CFG)
    e1 = float(jnp.sum(ir1.energy))
    e2 = float(jnp.sum(ir2.energy))
    assert 0.0 < e2 < e1
    # the double path detours over an edge AND along the sheet: later
    # than every first-order arrival
    onset1 = int(np.argmax(np.asarray(ir1.energy).sum(axis=0) > 0))
    onset2 = int(np.argmax(np.asarray(ir2.energy).sum(axis=0) > 0))
    assert onset2 > onset1


def test_physical_band_model():
    """cfg.diffraction_band_model="physical" evaluates wavenumbers at
    AIR_BAND_HZ (real LR2 band centers) instead of the reference's
    pseudo-frequency EQ constants: band 0 moves 4 Hz -> 64 Hz, bands 1-3
    move too, so the spectra differ while staying finite, gated, and
    reciprocal (r1 ADVICE low)."""
    import pytest

    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd, extract_wedges)

    tris = screen()
    scene = Scene.from_triangles(tris, CFG)
    W = extract_wedges(tris)
    src = jnp.asarray([2.0, 0.0, 0.0])
    lst = jnp.asarray([-2.0, 0.0, 0.0])
    cfg_phys = dataclasses.replace(CFG, diffraction_band_model="physical")

    e_pseudo = np.asarray(
        diffraction_ir_utd(scene.device_arrays(), W, src, lst, cfg=CFG).energy
    )
    e_phys = np.asarray(
        diffraction_ir_utd(
            scene.device_arrays(), W, src, lst, cfg=cfg_phys
        ).energy
    )
    assert np.isfinite(e_phys).all() and float(e_phys.sum()) > 0
    # every band's wavenumber moved, so every band's energy moves
    for b in range(4):
        assert not np.allclose(e_pseudo[b], e_phys[b]), b

    # reciprocity holds under the physical model too
    e_rev = np.asarray(
        diffraction_ir_utd(
            scene.device_arrays(), W, lst, src, cfg=cfg_phys
        ).energy
    )
    np.testing.assert_allclose(e_phys, e_rev, rtol=1e-4, atol=1e-10)

    # knife-edge Kurze-Anderson rides the same flag
    edges = extract_edges(tris)
    ka_pseudo = np.asarray(
        diffraction_ir(scene.device_arrays(), edges, src, lst, cfg=CFG).energy
    )
    ka_phys = np.asarray(
        diffraction_ir(
            scene.device_arrays(), edges, src, lst, cfg=cfg_phys
        ).energy
    )
    assert np.isfinite(ka_phys).all() and float(ka_phys.sum()) > 0
    assert not np.allclose(ka_pseudo, ka_phys)

    with pytest.raises(ValueError, match="diffraction_band_model"):
        diffraction_ir_utd(
            scene.device_arrays(), W, src, lst,
            cfg=dataclasses.replace(CFG, diffraction_band_model="nope"),
        )


def _triple_screen_setup():
    """Three ascending screens: every first- AND second-order path is
    blocked (each skip-a-screen connecting leg passes below the skipped
    screen's top), so only the over-all-three-tops triple remains.
    Geometry (x, top height): (-2, 1.5), (0, 2.5), (2, 3.0) with
    src=(-4,0,0), lst=(4,0,0); e.g. the A->C leg (-2,1.5)->(2,3.0)
    crosses x=0 at y=2.25 < 2.5 (blocked by B), and src->B-top crosses
    x=-2 at y=1.25 < 1.5 (blocked by A)."""
    from audio_raytracing_tpu.models.diffraction import extract_wedges

    tris = np.concatenate([
        screen(half_h=1.5, half_w=6.0, x=-2.0),
        screen(half_h=2.5, half_w=6.0, x=0.0),
        screen(half_h=3.0, half_w=6.0, x=2.0),
    ])
    scene = Scene.from_triangles(tris, CFG)
    return scene.device_arrays(), extract_wedges(tris)


def test_utd3_triple_screen_path():
    """Orders 1-2 are silent across the triple barrier; third order
    carries the over-all-tops arrival at the correct delay with
    physical band ordering."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd,
        diffraction_ir_utd2,
        diffraction_ir_utd3,
    )

    arrays, wedges = _triple_screen_setup()
    src = jnp.asarray([-4.0, 0.0, 0.0])
    lst = jnp.asarray([4.0, 0.0, 0.0])
    e1 = float(jnp.sum(diffraction_ir_utd(arrays, wedges, src, lst, cfg=CFG).energy))
    e2 = float(jnp.sum(diffraction_ir_utd2(arrays, wedges, src, lst, cfg=CFG).energy))
    ir3 = diffraction_ir_utd3(arrays, wedges, src, lst, cfg=CFG)
    e3 = float(jnp.sum(ir3.energy))
    assert e1 < 1e-12
    assert e2 < 1e-12
    assert e3 > 1e-12

    p1 = np.float32([-2.0, 1.5, 0.0])
    p2 = np.float32([0.0, 2.5, 0.0])
    p3 = np.float32([2.0, 3.0, 0.0])
    d = (np.linalg.norm(p1 - np.float32([-4, 0, 0]))
         + np.linalg.norm(p2 - p1) + np.linalg.norm(p3 - p2)
         + np.linalg.norm(np.float32([4, 0, 0]) - p3))
    expect_bin = int(round(d * CFG.samples_per_meter * CFG.ir_bins_per_sample))
    peak = int(np.argmax(np.asarray(ir3.energy).sum(axis=0)))
    assert abs(peak - expect_bin) <= 3

    e_bands = np.asarray(ir3.energy).sum(axis=1)
    assert e_bands[0] > e_bands[1] > e_bands[2] > e_bands[3]


def test_utd3_reciprocity():
    from audio_raytracing_tpu.models.diffraction import diffraction_ir_utd3

    arrays, wedges = _triple_screen_setup()
    src = jnp.asarray([-4.0, 0.2, 0.3])
    lst = jnp.asarray([4.0, -0.1, -0.4])
    a = float(jnp.sum(diffraction_ir_utd3(arrays, wedges, src, lst, cfg=CFG).energy))
    b = float(jnp.sum(diffraction_ir_utd3(arrays, wedges, lst, src, cfg=CFG).energy))
    assert a > 0
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_utd3_weaker_than_utd2_on_double_screen():
    """On the double-screen scene the third order lands below the second
    (each extra edge attenuates). The ratio is only ~0.4, not tens of
    dB: the floorless screens admit strong strip bounces (top->bottom
    in-plane legs, the same Keller-strip convention utd2 documents) and
    around-the-side triples, all genuine stationary paths."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd2,
        diffraction_ir_utd3,
    )

    arrays, wedges = _double_screen_setup()
    src = jnp.asarray([-3.0, 0.0, 0.0])
    lst = jnp.asarray([3.0, 0.0, 0.0])
    e2 = float(jnp.sum(diffraction_ir_utd2(arrays, wedges, src, lst, cfg=CFG).energy))
    e3 = float(jnp.sum(diffraction_ir_utd3(arrays, wedges, src, lst, cfg=CFG).energy))
    assert 0.0 < e3 < 0.6 * e2
