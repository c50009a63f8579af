"""Differential tests: batched acoustic policy (sim/probe.py) vs the
NumPy oracle (sim/oracle.py), on the box room and on world.obj."""

import dataclasses

import numpy as np
import pytest

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.sim.oracle import acoustic_update_oracle
from audio_raytracing_tpu.sim.probe import (
    SPHERE_PATTERN,
    acoustic_update,
    environment_probe,
    occlusion_lengths,
)


@pytest.fixture(scope="module")
def room():
    tris = box_room(size=(10.0, 4.0, 8.0))
    return Scene.from_triangles(tris), tris


def test_sphere_pattern_opposite_pairs():
    # the paired-distance reverb estimate depends on this ordering
    p = SPHERE_PATTERN.reshape(-1, 2, 3)
    np.testing.assert_array_equal(p[:, 0], -p[:, 1])


def test_probe_against_oracle_box(room):
    scene, tris = room
    listener = np.float32([1.0, 0.5, -2.0])
    probe = environment_probe(scene.device_arrays(), listener)
    o = acoustic_update_oracle(tris, listener, np.zeros((1, 3)))
    np.testing.assert_array_equal(np.asarray(probe.hit), o["hit"])
    np.testing.assert_allclose(np.asarray(probe.dist), o["dist"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(probe.point), o["point"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probe.normal), o["normal"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(probe.capped_mean_dist), o["capped_mean_dist"], rtol=1e-4
    )


def test_occlusion_simple_geometry():
    # wall at x=0 (two triangles spanning y/z); source behind the wall
    wall = np.float32(
        [
            [[0, -5, -5], [0, 5, -5], [0, 5, 5]],
            [[0, -5, -5], [0, 5, 5], [0, -5, 5]],
        ]
    )
    scene = Scene.from_triangles(wall)
    listener = np.float32([-2, 0, 0])
    pos = np.float32([[3, 0, 0]])
    occ = np.asarray(occlusion_lengths(scene.device_arrays(), listener, pos))
    # L->S hits wall at 2, S->L hits at 3, |L-S| = 5 => occlusion 0
    np.testing.assert_allclose(occ, [0.0], atol=1e-5)

    # two parallel walls at x=0 and x=1: occluded region in between
    walls = np.concatenate([wall, wall + np.float32([1, 0, 0])])
    scene2 = Scene.from_triangles(walls)
    occ = np.asarray(occlusion_lengths(scene2.device_arrays(), listener, pos))
    # d0 = 2 (to x=0), d1 = 2 (from x=3 back to x=1), occ = 5 - 4 = 1
    np.testing.assert_allclose(occ, [1.0], atol=1e-5)


def test_full_update_against_oracle_box(room):
    scene, tris = room
    listener = np.float32([0.5, -0.5, 1.0])
    positions = np.float32([[2.0, 0.0, -1.0], [-3.0, 1.0, 2.5], [0.5, -0.5, 1.0]])
    V = positions.shape[0]
    params = acoustic_update(
        scene.device_arrays(), listener, positions, np.ones(V, bool)
    )
    o = acoustic_update_oracle(tris, listener, positions)
    np.testing.assert_allclose(np.asarray(params.occlusion), o["occlusion"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(params.refl_dist), o["refl_dist"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(params.refl_lam), o["refl_lam"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(params.feedback_gain), o["feedback_gain"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(params.wet), o["wet"], rtol=1e-4)


def test_full_update_against_oracle_world(world_obj_path, rng):
    scene = Scene.from_obj(world_obj_path)
    tris = np.stack([scene.v0, scene.v1, scene.v2], axis=1)[: scene.n_triangles]
    listener = np.float32([0.0, 0.0, 0.0])  # camera spawn (main.zig:950)
    positions = np.float32([[0.0, 0.0, 0.0], [2.0, 0.5, 3.0]])
    V = positions.shape[0]
    params = acoustic_update(scene.device_arrays(), listener, positions, np.ones(V, bool))
    o = acoustic_update_oracle(tris, listener, positions)
    np.testing.assert_allclose(np.asarray(params.occlusion), o["occlusion"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(params.refl_dist), o["refl_dist"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(params.refl_lam), o["refl_lam"], rtol=1e-3, atol=1e-3)


def test_quirk_flags_change_results(room):
    scene, tris = room
    listener = np.float32([1.0, 0.5, -2.0])
    positions = np.float32([[2.0, 0.0, -1.0]])
    fixed_cfg = dataclasses.replace(
        DEFAULT_CONFIG, quirk_capped_mean_overwrite=False, quirk_zbin_ld0=False
    )
    p_q = acoustic_update(scene.device_arrays(), listener, positions, np.ones(1, bool))
    p_f = acoustic_update(
        scene.device_arrays(), listener, positions, np.ones(1, bool), cfg=fixed_cfg
    )
    # fixed mode accumulates all 7 pairs -> different coupling
    assert float(p_q.feedback_gain[0]) != float(p_f.feedback_gain[0])
    # and the oracle agrees in fixed mode too
    o = acoustic_update_oracle(tris, listener, positions, cfg=fixed_cfg)
    np.testing.assert_allclose(np.asarray(p_f.feedback_gain), o["feedback_gain"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_f.refl_lam), o["refl_lam"], rtol=1e-3, atol=1e-4)


def test_inactive_voices_zeroed(room):
    scene, _ = room
    listener = np.float32([0.0, 0.0, 0.0])
    positions = np.float32([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    active = np.asarray([True, False])
    params = acoustic_update(scene.device_arrays(), listener, positions, active)
    assert float(params.wet[1]) == 0.0
    assert np.all(np.asarray(params.refl_lam)[1] == 0.0)


def test_open_scene_reflections_no_nan():
    """Open scenes (missed probe rays carry dist=inf) must not poison the
    reflection bins: batched result matches the oracle, which skips misses
    (regression: 0 * inf = NaN zeroed every reflection)."""
    tris = box_room(size=(6.0, 3.0, 5.0))
    tris = tris[:-2]  # remove the ceiling: some probe rays escape
    scene = Scene.from_triangles(tris)
    listener = np.float32([0.0, 0.0, 0.0])
    positions = np.float32([[2.0, 0.5, 1.0]])
    params = acoustic_update(scene.device_arrays(), listener, positions, np.ones(1, bool))
    o = acoustic_update_oracle(tris, listener, positions)
    assert np.isfinite(np.asarray(params.refl_lam)).all()
    assert np.asarray(params.refl_lam).max() > 0  # reflections survive
    np.testing.assert_allclose(np.asarray(params.refl_dist), o["refl_dist"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(params.refl_lam), o["refl_lam"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(params.occlusion), o["occlusion"], atol=1e-4)
