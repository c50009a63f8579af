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
