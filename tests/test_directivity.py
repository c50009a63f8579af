"""Source directivity (models/directivity.py): pattern math and its
first-leg weighting in every model family. The reference radiates omni
only (a voice has just a position, sound_system.zig:550-563)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.directivity import (
    DIRECTIVITY_PRESETS,
    OMNI,
    Directivity,
    directivity_gain,
)
from audio_raytracing_tpu.models.ir import direct_ir, trace_ir
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)


def test_pattern_math():
    card = Directivity(axis=(1, 0, 0), alpha=0.5)
    dirs = jnp.asarray([[1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, 0, 0]], jnp.float32)
    g = np.asarray(directivity_gain(dirs, card))
    np.testing.assert_allclose(g[0], 1.0, atol=1e-6)   # on axis
    np.testing.assert_allclose(g[1], 0.5, atol=1e-6)   # 90 deg
    np.testing.assert_allclose(g[2], 0.0, atol=1e-6)   # rear null
    np.testing.assert_allclose(g[3], 1.0, atol=1e-6)   # degenerate -> on-axis

    fig8 = Directivity(axis=(0, 1, 0), alpha=0.0)
    g8 = np.asarray(directivity_gain(jnp.asarray([[1.0, 0, 0]]), fig8))
    np.testing.assert_allclose(g8[0], 0.0, atol=1e-6)  # side null

    sharp = Directivity(axis=(1, 0, 0), alpha=0.5, order=2.0)
    g2 = np.asarray(directivity_gain(jnp.asarray([[0.0, 1, 0]]), sharp))
    np.testing.assert_allclose(g2[0], 0.25, atol=1e-6)  # 0.5^2

    # per-band: the "speaker" preset beams highs more than lows at 90 deg
    gs = np.asarray(directivity_gain(
        jnp.asarray([[0.0, 1.0, 0.0]]), DIRECTIVITY_PRESETS["speaker"]
    ))[0]
    assert gs[0] > gs[1] > gs[2] > gs[3]

    g_omni = np.asarray(directivity_gain(dirs, OMNI))
    np.testing.assert_allclose(g_omni, 1.0, atol=1e-6)


def test_validation():
    with pytest.raises(ValueError, match="axis"):
        Directivity(axis=(0, 0, 0))
    with pytest.raises(ValueError, match="alpha"):
        Directivity(alpha=(1.5, 0, 0, 0))
    with pytest.raises(ValueError, match="order"):
        Directivity(order=-1.0)
    # scalar broadcast
    d = Directivity(alpha=0.3, order=2)
    assert d.alpha == (0.3,) * 4 and d.order == (2.0,) * 4


def test_trace_omni_equals_none():
    scene = Scene.from_triangles(box_room(), CFG)
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    a = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=512,
                 max_bounces=3)
    b = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=512,
                 max_bounces=3, src_directivity=OMNI)
    np.testing.assert_allclose(np.asarray(a.energy), np.asarray(b.energy),
                               rtol=1e-6)


def test_direct_cardioid_nulls_behind():
    scene = Scene.from_triangles(box_room(size=(20.0, 10.0, 20.0)), CFG)
    src = jnp.asarray([0.0, 0.0, 0.0])
    lst = jnp.asarray([3.0, 0.0, 0.0])
    toward = direct_ir(scene.device_arrays(), src, lst, cfg=CFG,
                       src_directivity=Directivity(axis=(1, 0, 0), alpha=0.5))
    away = direct_ir(scene.device_arrays(), src, lst, cfg=CFG,
                     src_directivity=Directivity(axis=(-1, 0, 0), alpha=0.5))
    omni = direct_ir(scene.device_arrays(), src, lst, cfg=CFG)
    np.testing.assert_allclose(np.asarray(toward.energy).sum(axis=1),
                               np.asarray(omni.energy).sum(axis=1), rtol=1e-5)
    assert float(jnp.sum(away.energy)) < 1e-12  # rear null


def test_ism_first_leg_weighting():
    """Single-floor order-1 image: cardioid energy = g(first leg)^2 x omni
    (one arrival, exact)."""
    from audio_raytracing_tpu.models.ism import image_source_ir

    floor = np.float32([
        [[-6, -1, -6], [6, -1, -6], [6, -1, 6]],
        [[-6, -1, -6], [6, -1, 6], [-6, -1, 6]],
    ])
    scene = Scene.from_triangles(floor, CFG)
    src = jnp.asarray([-1.0, 0.5, 0.0])
    lst = jnp.asarray([2.0, 0.3, 0.0])
    kw = dict(cfg=CFG, order=1, include_direct=False)
    omni_ir = image_source_ir(scene.device_arrays(), src, lst, **kw)
    d = Directivity(axis=(0.3, -1.0, 0.2), alpha=0.5)
    card_ir = image_source_ir(scene.device_arrays(), src, lst,
                              src_directivity=d, **kw)
    # first-leg direction: src -> reflection point on y=-1 (mirror math)
    img = np.float32([-1.0, -2.5, 0.0])  # src mirrored across y=-1
    t = (0.3 + 1.0) / (0.3 + 2.5)  # lst.y to plane over total drop
    p = np.asarray(lst) + (img - np.asarray(lst)) * t
    g = np.asarray(directivity_gain(jnp.asarray(p - np.asarray(src)), d))
    e_omni = np.asarray(omni_ir.energy).sum(axis=1)
    e_card = np.asarray(card_ir.energy).sum(axis=1)
    assert e_omni.min() > 0
    np.testing.assert_allclose(e_card, g * g * e_omni, rtol=1e-4)


def test_diffraction_source_leg_weighting():
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd,
        extract_wedges,
    )

    tris = np.float32([
        [[0, -1, -6], [0, 1, -6], [0, 1, 6]],
        [[0, -1, -6], [0, 1, 6], [0, -1, 6]],
    ])
    arrays = Scene.from_triangles(tris, CFG).device_arrays()
    wedges = extract_wedges(tris)
    src = jnp.asarray([-2.0, 0.0, 0.0])
    lst = jnp.asarray([2.0, 0.0, 0.0])
    omni_e = np.asarray(diffraction_ir_utd(
        arrays, wedges, src, lst, cfg=CFG).energy)
    # axis up toward the top edge: over-the-top arrivals keep most gain;
    # rear-facing axis kills everything
    away = np.asarray(diffraction_ir_utd(
        arrays, wedges, src, lst, cfg=CFG,
        src_directivity=Directivity(axis=(-1, 0, 0), alpha=0.5, order=4.0),
    ).energy)
    assert omni_e.sum() > 0
    assert away.sum() < omni_e.sum() * 0.05


def test_hybrid_passthrough():
    import jax

    from audio_raytracing_tpu.models.ism import hybrid_ir

    scene = Scene.from_triangles(box_room(), CFG)
    ir = hybrid_ir(
        scene.device_arrays(), jnp.asarray([1.0, 0.5, 0.5]),
        jnp.asarray([-1.0, -0.5, -1.0]), cfg=CFG, order=1, n_rays=256,
        max_bounces=2, key=jax.random.PRNGKey(0),
        src_directivity=DIRECTIVITY_PRESETS["voice"],
    )
    assert np.isfinite(np.asarray(ir.energy)).all()
    assert float(jnp.sum(ir.energy)) > 0


def test_sharded_directivity_matches_single_device():
    """Directivity + transmission both ride the sharded path (8-device
    CPU mesh) identically to the single-device trace."""
    import jax
    from jax.sharding import Mesh

    from audio_raytracing_tpu.parallel.sharding import trace_ir_sharded

    screen = np.float32([
        [[0.5, -1.2, -2.0], [0.5, 1.2, -2.0], [0.5, 1.2, 2.0]],
        [[0.5, -1.2, -2.0], [0.5, 1.2, 2.0], [0.5, -1.2, 2.0]],
    ])
    tris = np.concatenate([box_room(size=(6.0, 3.0, 5.0)), screen])
    trans = np.concatenate([
        np.zeros((12, 4), np.float32),
        np.tile(np.float32([0.5, 0.25, 0.1, 0.04]), (2, 1)),
    ])
    scene = Scene.from_triangles(tris, CFG, transmission=trans)
    src = jnp.asarray([1.5, 0.5, 0.5])
    lst = jnp.asarray([-1.5, -0.5, -1.0])
    d = Directivity(axis=(-1.0, 0.0, -0.3), alpha=0.5)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("rays",))
    got = trace_ir_sharded(
        scene.device_arrays(), src, lst, mesh, cfg=CFG, n_rays=1024,
        max_bounces=3, src_directivity=d,
    )
    from audio_raytracing_tpu.models.ir import fibonacci_sphere

    want = trace_ir(
        scene.device_arrays(), src, lst, cfg=CFG,
        dirs=jnp.asarray(fibonacci_sphere(1024)), max_bounces=3,
        src_directivity=d,
    )
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(want.energy), rtol=2e-4, atol=1e-10
    )
