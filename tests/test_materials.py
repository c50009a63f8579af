"""Acoustic materials: usemtl tracking, preset tables, per-surface
scattering in the stochastic tracer."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir
from audio_raytracing_tpu.models.materials import (
    DEFAULT_MATERIAL,
    MATERIAL_PRESETS,
    AcousticMaterial,
    mesh_surface_tables,
    resolve_material,
)
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.utils.obj import parse_obj

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)

OBJ_TEXT = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
f 1/1 2/1 3/1
usemtl Carpet
f 2/1 4/1 3/1
f 1/1 4/1 2/1
usemtl Glass
f 1/1 3/1 4/1
usemtl Carpet
f 1/1 2/1 4/1
"""


def test_parse_obj_tracks_usemtl():
    mesh = parse_obj(OBJ_TEXT)
    assert mesh.material_names == ("", "Carpet", "Glass")
    np.testing.assert_array_equal(mesh.material_ids, [0, 1, 1, 2, 1])
    assert mesh.triangle_material_names() == [
        "", "Carpet", "Carpet", "Glass", "Carpet"
    ]


def test_world_obj_has_material(world_obj_path):
    from audio_raytracing_tpu.utils.obj import load_obj

    mesh = load_obj(world_obj_path)
    assert "Material" in mesh.material_names
    assert mesh.mtllib == "world.mtl"


def test_material_validation():
    with pytest.raises(ValueError):
        AcousticMaterial((0.1, 0.2, 0.3, 1.5))
    with pytest.raises(ValueError):
        AcousticMaterial((0.1, 0.2, 0.3, 0.4), scattering=-0.1)
    with pytest.raises(KeyError):
        resolve_material("no_such_preset")
    for name, m in MATERIAL_PRESETS.items():
        assert resolve_material(name) is m


def test_mesh_surface_tables_mapping_and_default():
    mesh = parse_obj(OBJ_TEXT)
    absorb, scatter, transmit = mesh_surface_tables(
        mesh, {"Carpet": "carpet", "Glass": AcousticMaterial((0.2, 0.1, 0.05, 0.05))}
    )
    assert absorb.shape == (5, 4) and scatter.shape == (5,)
    assert transmit.shape == (5, 4)
    np.testing.assert_allclose(transmit[3], 0.0)  # explicit material: opaque default
    np.testing.assert_allclose(absorb[0], DEFAULT_MATERIAL.absorption)
    np.testing.assert_allclose(absorb[1], MATERIAL_PRESETS["carpet"].absorption)
    np.testing.assert_allclose(absorb[3], [0.2, 0.1, 0.05, 0.05])
    assert scatter[0] == 0.0
    assert scatter[1] == MATERIAL_PRESETS["carpet"].scattering
    assert scatter[3] == 0.0


def test_scene_from_mesh_materials():
    mesh = parse_obj(OBJ_TEXT)
    scene = Scene.from_mesh(mesh, CFG, materials={"Carpet": "carpet"})
    arrays = scene.device_arrays()
    np.testing.assert_allclose(
        np.asarray(arrays.absorption)[1], MATERIAL_PRESETS["carpet"].absorption
    )
    s = np.asarray(arrays.scattering)
    assert s[1] == MATERIAL_PRESETS["carpet"].scattering
    assert s[0] == 0.0
    # padding rows keep zero scattering
    assert (s[scene.n_triangles:] == 0.0).all()
    with pytest.raises(ValueError):
        Scene.from_mesh(mesh, CFG, absorption=np.zeros((5, 4)), materials={})


def _scene_with_scatter(s: float):
    tris = box_room(size=(6.0, 3.0, 5.0))
    return Scene.from_triangles(
        tris, CFG, scattering=np.full(len(tris), s, np.float32)
    )


def test_material_scattering_limits_match_global():
    """Per-surface scattering at 0/1 must reproduce the global-constant
    model exactly (same PRNG stream)."""
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    dirs = jnp.asarray(fibonacci_sphere(512))
    key = jax.random.PRNGKey(7)

    spec = trace_ir(_scene_with_scatter(0.0).device_arrays(), src, lst,
                    cfg=CFG, max_bounces=3, dirs=dirs)
    mat0 = trace_ir(_scene_with_scatter(0.0).device_arrays(), src, lst,
                    cfg=CFG, max_bounces=3, dirs=dirs,
                    material_scattering=True, key=key)
    np.testing.assert_allclose(
        np.asarray(mat0.energy), np.asarray(spec.energy), rtol=1e-6, atol=1e-12
    )

    glob1 = trace_ir(_scene_with_scatter(1.0).device_arrays(), src, lst,
                     cfg=CFG, max_bounces=3, dirs=dirs, scattering=1.0,
                     key=key)
    mat1 = trace_ir(_scene_with_scatter(1.0).device_arrays(), src, lst,
                    cfg=CFG, max_bounces=3, dirs=dirs,
                    material_scattering=True, key=key)
    np.testing.assert_allclose(
        np.asarray(mat1.energy), np.asarray(glob1.energy), rtol=1e-6, atol=1e-12
    )
    # and the diffuse field really differs from the specular one
    assert float(jnp.abs(mat1.energy - spec.energy).sum()) > 1e-6


def test_material_scattering_requires_key():
    scene = _scene_with_scatter(0.5)
    with pytest.raises(ValueError):
        trace_ir(scene.device_arrays(), jnp.zeros(3), jnp.ones(3), cfg=CFG,
                 max_bounces=1, dirs=jnp.asarray(fibonacci_sphere(64)),
                 material_scattering=True)
