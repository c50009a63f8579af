"""Per-band sound transmission through occluders.

The reference's shadow rays hard-block (main.zig:683-702: any nearer hit
kills the reflection; occlusion adds attenuation by path length only).
This framework adds the standard game-audio/room-acoustics split: each
surface carries a per-band energy transmission tau
(models/materials.py::AcousticMaterial.transmission) and every
shadow/occlusion segment is attenuated by prod(sqrt(tau)) over the
surfaces it crosses — computed as one MXU matmul
exp(crossings @ 0.5 log tau) (models/ir.py::_transmission_log_amp /
_segment_crossings). Path rays still always reflect; refraction and
added delay through materials are ignored (documented divergence).
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import direct_ir, trace_ir
from audio_raytracing_tpu.models.materials import (
    MATERIAL_PRESETS,
    AcousticMaterial,
    mesh_surface_tables,
)
from audio_raytracing_tpu.models.scene import Scene
from audio_raytracing_tpu.ops.eq import EQ_FREQS

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)


def quad(center, half_u, half_v):
    """Two triangles spanning center +- half_u +- half_v, (2, 3, 3)."""
    c = np.asarray(center, np.float32)
    u = np.asarray(half_u, np.float32)
    v = np.asarray(half_v, np.float32)
    a, b, d, e = c - u - v, c + u - v, c + u + v, c - u + v
    return np.stack([np.stack([a, b, d]), np.stack([a, d, e])])


def wall_scene(tau):
    """A single x=0 wall between source (x=-2) and listener (x=+2).

    tau: per-band energy transmission of the wall (None = opaque scene
    without a transmission table)."""
    tris = quad([0.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0])
    trans = None if tau is None else np.tile(np.asarray(tau, np.float32), (2, 1))
    return Scene.from_triangles(tris, CFG, transmission=trans)


SRC = jnp.asarray([-2.0, 0.1, 0.2])
LST = jnp.asarray([2.0, -0.1, 0.3])


def test_material_transmission_validation():
    with pytest.raises(ValueError, match="transmission"):
        AcousticMaterial((0.1,) * 4, transmission=(0.2, 0.0, 0.0, 0.0))
    with pytest.raises(ValueError, match="transmission"):
        AcousticMaterial((0.1,) * 4, transmission=(0.05, 0.05, 0.05))
    m = AcousticMaterial((0.3,) * 4, transmission=(0.1, 0.2, 0.3, 0.3))
    assert m.transmission == (0.1, 0.2, 0.3, 0.3)
    # every preset satisfies its own constraint (construction validates)
    for m in MATERIAL_PRESETS.values():
        assert all(t <= a + 1e-9 for t, a in zip(m.transmission, m.absorption))
    assert any(any(m.transmission) for m in MATERIAL_PRESETS.values())


def test_direct_through_transmissive_wall():
    """Direct path through one wall = unoccluded amplitude x sqrt(tau)."""
    tau = np.asarray([0.25, 0.09, 0.04, 0.01], np.float32)
    arrays = wall_scene(tau).device_arrays()
    ir = direct_ir(arrays, SRC, LST, cfg=CFG)
    d = float(jnp.linalg.norm(LST - SRC))
    air = np.clip(1.0 - CFG.air_absorption * d * np.asarray(EQ_FREQS), 0.0, 1.0)
    expect = tau * (air / (d + 1.0)) ** 2  # energy: amp^2
    got = np.asarray(ir.energy).sum(axis=1)  # (n_bands,)
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    # opaque wall (no transmission table): fully blocked, and the
    # transmission path with tau=0 agrees (energy ~1e-38 = none)
    ir0 = direct_ir(wall_scene(None).device_arrays(), SRC, LST, cfg=CFG)
    assert float(jnp.sum(ir0.energy)) == 0.0
    irz = direct_ir(wall_scene([0.0] * 4).device_arrays(), SRC, LST, cfg=CFG)
    assert float(jnp.sum(irz.energy)) < 1e-30


def test_direct_two_walls_compound():
    """Two walls in series multiply their transmissions."""
    tau1 = np.asarray([0.25, 0.16, 0.09, 0.04], np.float32)
    tau2 = np.asarray([0.36, 0.25, 0.16, 0.09], np.float32)
    tris = np.concatenate([
        quad([-0.5, 0, 0], [0, 4, 0], [0, 0, 4]),
        quad([0.5, 0, 0], [0, 4, 0], [0, 0, 4]),
    ])
    trans = np.concatenate([np.tile(tau1, (2, 1)), np.tile(tau2, (2, 1))])
    arrays = Scene.from_triangles(tris, CFG, transmission=trans).device_arrays()
    ir = direct_ir(arrays, SRC, LST, cfg=CFG)
    d = float(jnp.linalg.norm(LST - SRC))
    air = np.clip(1.0 - CFG.air_absorption * d * np.asarray(EQ_FREQS), 0.0, 1.0)
    expect = tau1 * tau2 * (air / (d + 1.0)) ** 2
    np.testing.assert_allclose(
        np.asarray(ir.energy).sum(axis=1), expect, rtol=1e-5
    )


def _floor_screen_scene(tau_screen):
    """Reflective floor at y=-1; screen quad between the floor's bounce
    region and the listener. Rays are aimed at the floor only; the screen
    is crossed by the vertex->listener shadow segments.

    tau_screen=1 makes the screen acoustically absent for shadows (but
    still a path obstacle, which the aimed rays never hit)."""
    floor = quad([0.0, -1.0, 0.0], [4.0, 0.0, 0.0], [0.0, 0.0, 4.0])
    screen = quad([1.0, 0.0, 0.0], [0.0, 0.6, 0.0], [0.0, 0.0, 2.0])
    tris = np.concatenate([floor, screen])
    trans = np.concatenate([
        np.ones((2, 4), np.float32),  # floor: never crossed by shadows
        np.tile(np.asarray(tau_screen, np.float32), (2, 1)),
    ])
    return Scene.from_triangles(
        tris, CFG, absorption=np.full((4, 4), 0.1, np.float32),
        transmission=trans,
    )


def _aimed_dirs():
    """A small fan of rays from SRC2 down at the floor around x=0."""
    targets = np.stack(
        np.meshgrid(np.linspace(-0.8, 0.2, 4), np.linspace(-0.6, 0.6, 4)),
        axis=-1,
    ).reshape(-1, 2)
    pts = np.concatenate(
        [targets[:, :1], np.full((16, 1), -1.0), targets[:, 1:]], axis=1
    )
    d = pts - np.asarray(SRC2)
    return jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)


SRC2 = np.asarray([-2.0, 0.5, 0.0], np.float32)
LST2 = jnp.asarray([2.5, 0.3, 0.0])


@pytest.mark.parametrize("intersector", ["mt", "mxu"])
def test_reflection_shadow_through_screen(intersector):
    """First-bounce NEE segments cross the screen: energies scale by
    exactly tau per band relative to a fully transparent screen."""
    tau = np.asarray([0.5, 0.25, 0.1, 0.04], np.float32)
    dirs = _aimed_dirs()
    kw = dict(
        cfg=CFG, dirs=dirs, max_bounces=1, include_direct=False,
        intersector=intersector,
    )
    ir_open = trace_ir(
        _floor_screen_scene([1.0] * 4).device_arrays(), jnp.asarray(SRC2),
        LST2, **kw,
    )
    ir_tau = trace_ir(
        _floor_screen_scene(tau).device_arrays(), jnp.asarray(SRC2),
        LST2, **kw,
    )
    e_open = np.asarray(ir_open.energy).sum(axis=1)
    e_tau = np.asarray(ir_tau.energy).sum(axis=1)
    assert e_open.min() > 0.0  # the bounce fan actually reaches the listener
    np.testing.assert_allclose(e_tau, tau * e_open, rtol=1e-4)


def test_mt_mxu_agree_with_transmission():
    tau = np.asarray([0.5, 0.25, 0.1, 0.04], np.float32)
    arrays = _floor_screen_scene(tau).device_arrays()
    dirs = _aimed_dirs()
    kw = dict(cfg=CFG, dirs=dirs, max_bounces=2, include_direct=True)
    a = trace_ir(arrays, jnp.asarray(SRC2), LST2, intersector="mt", **kw)
    b = trace_ir(arrays, jnp.asarray(SRC2), LST2, intersector="mxu", **kw)
    np.testing.assert_allclose(
        np.asarray(a.energy), np.asarray(b.energy), rtol=2e-3, atol=1e-10
    )


def test_unsupported_backends_raise():
    """bih traversal cannot enumerate all occluders -> explicit error
    (the fused Pallas kernel supports transmission: tests/test_pallas_trace
    has the parity tests)."""
    tau = np.asarray([0.5, 0.25, 0.1, 0.04], np.float32)
    scene = _floor_screen_scene(tau)
    arrays = scene.device_arrays()
    with pytest.raises(ValueError, match="transmission"):
        trace_ir(
            arrays, jnp.asarray(SRC2), LST2, cfg=CFG, intersector="bih",
            bih_arena=scene.device_bih(), n_rays=16,
        )


def test_all_zero_transmission_table_is_dropped():
    """A transmission table of zeros = every surface opaque: Scene keeps
    the fast (hard-block) path and results match transmission=None."""
    tris = quad([0.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0])
    s = Scene.from_triangles(tris, CFG, transmission=np.zeros((2, 4), np.float32))
    assert s.transmission is None


def test_scene_from_mesh_plumbs_transmission():
    obj = """
v -1 0 -1
v 1 0 -1
v 1 0 1
v -1 0 1
vt 0 0
usemtl Curtain
f 1/1 2/1 3/1
f 1/1 3/1 4/1
"""
    from audio_raytracing_tpu.utils.obj import parse_obj

    mesh = parse_obj(obj)
    scene = Scene.from_mesh(mesh, CFG, materials={"Curtain": "curtain"})
    expect = MATERIAL_PRESETS["curtain"].transmission
    np.testing.assert_allclose(scene.transmission[:2], np.tile(expect, (2, 1)))
    arrays = scene.device_arrays()
    assert arrays.transmission is not None
    # padding rows are opaque
    np.testing.assert_allclose(np.asarray(arrays.transmission)[2:], 0.0)


# ---- image-source family ------------------------------------------------

def _ism_floor_screen(tau_screen):
    """Floor at y=-1 (the only real reflector) + a screen at x=1.5 sized
    to cross ONLY the listener->reflection-point leg of the order-1
    floor path (not the p->source leg, not the direct)."""
    floor = quad([0.0, -1.0, 0.0], [6.0, 0.0, 0.0], [0.0, 0.0, 6.0])
    screen = quad([1.5, -0.35, 0.0], [0.0, 0.45, 0.0], [0.0, 0.0, 1.0])
    tris = np.concatenate([floor, screen])
    trans = np.concatenate([
        np.ones((2, 4), np.float32),
        np.tile(np.asarray(tau_screen, np.float32), (2, 1)),
    ])
    return Scene.from_triangles(
        tris, CFG, absorption=np.full((4, 4), 0.1, np.float32),
        transmission=trans,
    )


def test_ism_leg_through_screen():
    """Order-1 image-source arrival through the screen scales by exactly
    tau per band (one crossing on one leg)."""
    from audio_raytracing_tpu.models.ism import image_source_ir

    tau = np.asarray([0.5, 0.25, 0.1, 0.04], np.float32)
    kw = dict(cfg=CFG, order=1, include_direct=False)
    e_open = np.asarray(image_source_ir(
        _ism_floor_screen([1.0] * 4).device_arrays(),
        jnp.asarray(SRC2), LST2, **kw,
    ).energy).sum(axis=1)
    e_tau = np.asarray(image_source_ir(
        _ism_floor_screen(tau).device_arrays(),
        jnp.asarray(SRC2), LST2, **kw,
    ).energy).sum(axis=1)
    assert e_open.min() > 1e-12
    np.testing.assert_allclose(e_tau, tau * e_open, rtol=1e-4)


def test_ism_opaque_parity_with_hard_block():
    """tau ~ 0 on the screen reproduces the hard-block result (the
    transmission path's finite floor is inaudible), and the no-table
    scene keeps the boolean leg path."""
    from audio_raytracing_tpu.models.ism import image_source_ir

    kw = dict(cfg=CFG, order=2, include_direct=True)
    scene_hard = _ism_floor_screen([1.0] * 4)
    scene_hard.transmission = None  # opaque boolean-leg path
    e_hard = np.asarray(image_source_ir(
        scene_hard.device_arrays(), jnp.asarray(SRC2), LST2, **kw
    ).energy)
    e_soft = np.asarray(image_source_ir(
        _ism_floor_screen([0.0] * 4).device_arrays(),
        jnp.asarray(SRC2), LST2, **kw,
    ).energy)
    np.testing.assert_allclose(e_soft, e_hard, rtol=1e-5, atol=1e-20)


@pytest.mark.slow
def test_hybrid_transition_ignores_phantom_arrivals():
    """hybrid_ir's auto transition must not treat the ~1e-30-amplitude
    residue of an opaque-blocked image path as the last ISM arrival: with
    a tau=0 screen it must reproduce the hard-block (no-table) hybrid —
    same transition bin, same surviving Monte-Carlo tail."""
    import jax

    from audio_raytracing_tpu.models.ism import hybrid_ir, image_source_ir

    kw = dict(cfg=CFG, order=1, n_rays=512, max_bounces=4, scattering=0.3,
              key=jax.random.PRNGKey(0))
    soft = hybrid_ir(
        _ism_floor_screen([0.0] * 4).device_arrays(), jnp.asarray(SRC2),
        LST2, **kw,
    )
    scene_hard = _ism_floor_screen([1.0] * 4)
    scene_hard.transmission = None
    hard = hybrid_ir(
        scene_hard.device_arrays(), jnp.asarray(SRC2), LST2, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(soft.energy), np.asarray(hard.energy), rtol=1e-4,
        atol=1e-20,
    )
    # and the tail genuinely exists beyond the ISM arrivals
    ism = image_source_ir(
        _ism_floor_screen([0.0] * 4).device_arrays(), jnp.asarray(SRC2),
        LST2, cfg=CFG, order=1, include_direct=True,
    )
    assert float(jnp.sum(soft.energy)) > float(jnp.sum(ism.energy))


def test_multi_listener_transmission_and_directivity_parity():
    """trace_ir_multi_listener's shared-path NEE applies the same
    transmission + directivity laws as per-listener trace_ir."""
    from audio_raytracing_tpu.models.directivity import Directivity
    from audio_raytracing_tpu.models.ir import trace_ir_multi_listener

    tau = np.asarray([0.5, 0.25, 0.1, 0.04], np.float32)
    arrays = _floor_screen_scene(tau).device_arrays()
    dirs = _aimed_dirs()
    d = Directivity(axis=(1.0, -0.5, 0.0), alpha=0.5)
    lsts = jnp.asarray([[2.5, 0.3, 0.0], [1.5, 0.8, 0.5]])
    multi = trace_ir_multi_listener(
        arrays, jnp.asarray(SRC2), lsts, cfg=CFG, dirs=dirs, max_bounces=2,
        src_directivity=d,
    )
    for i in range(2):
        want = trace_ir(
            arrays, jnp.asarray(SRC2), lsts[i], cfg=CFG, dirs=dirs,
            max_bounces=2, src_directivity=d,
        )
        np.testing.assert_allclose(
            np.asarray(multi.energy[i]), np.asarray(want.energy),
            rtol=1e-4, atol=1e-12,
        )
