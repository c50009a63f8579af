"""OBJ loading, scene construction, and BIH build/query differential tests.

Mirrors the reference's test strategy: randomized build + raycast vs a
brute-force oracle (the pattern of `test "fuzz raycastCapacity"`,
/root/reference/src/raytracer.zig:568-628), plus structural checks the
reference does with comptime asserts.
"""

import numpy as np
import pytest

from audio_raytracing_tpu.models.bih import (
    build_bih,
    raycast_bih,
    raycast_brute,
    slab_entry_distances,
)
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.utils.obj import load_obj, parse_obj


def test_parse_obj_minimal():
    mesh = parse_obj(
        """
# comment
v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
f 1/1 2/2 3/3
"""
    )
    assert mesh.n_triangles == 1
    np.testing.assert_allclose(mesh.positions, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(mesh.uvs, [[0, 0], [1, 0], [0, 1]])


def test_parse_obj_rejects_quads():
    with pytest.raises(ValueError):
        parse_obj("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nvt 0 0\nf 1/1 2/1 3/1 4/1\n")


def test_world_obj_counts(world_obj_path):
    # data/world.obj: 114 triangles, 72 vertices, 116 uvs (SURVEY.md)
    mesh = load_obj(world_obj_path)
    assert mesh.n_triangles == 114
    assert mesh.positions.shape == (342, 3)


def test_scene_padding_and_normals(world_obj_path):
    scene = Scene.from_obj(world_obj_path)
    assert scene.n_triangles == 114
    assert scene.v0.shape[0] % 128 == 0
    # padded triangles are degenerate
    assert np.all(scene.v0[114:] == 0)
    # normals unit length on real triangles
    n = np.linalg.norm(scene.normals[:114], axis=1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)


def test_scene_triangles_roundtrip():
    """Scene.triangles returns the unpadded (T, 3, 3) stack and
    roundtrips through from_triangles (the host-analysis input surface:
    extract_edges / extract_wedges consume it)."""
    tris = box_room(size=(3.0, 2.0, 4.0))
    scene = Scene.from_triangles(tris)
    got = scene.triangles
    assert got.shape == (12, 3, 3)
    np.testing.assert_array_equal(got, tris.astype(np.float32))
    again = Scene.from_triangles(scene.triangles)
    np.testing.assert_array_equal(again.triangles, got)


def test_box_room_normals_inward():
    tris = box_room(size=(2.0, 2.0, 2.0))
    scene = Scene.from_triangles(tris)
    # each triangle's normal should point toward the room center (origin)
    centers = tris.mean(axis=1)
    dots = np.sum(scene.normals[:12] * (0.0 - centers), axis=1)
    assert np.all(dots > 0)


def _random_boxes(rng, n):
    c = (rng.random((n, 3), dtype=np.float32) - 0.5) * 20
    d = rng.random((n, 3), dtype=np.float32) * 5
    return (c - d).astype(np.float32), (c + d).astype(np.float32)


def test_slab_entry_distance_basics():
    low = np.array([[1.0, -1.0, -1.0]], np.float32)
    high = np.array([[2.0, 1.0, 1.0]], np.float32)
    d = slab_entry_distances(low, high, np.zeros(3, np.float32), np.array([1, 0, 0], np.float32))
    np.testing.assert_allclose(d, [1.0])
    # behind the origin -> negative tmin reported (caller skips <0)
    d = slab_entry_distances(low, high, np.zeros(3, np.float32), np.array([-1, 0, 0], np.float32))
    assert d[0] < 0
    # miss entirely
    d = slab_entry_distances(low, high, np.zeros(3, np.float32), np.array([0, 1, 0], np.float32))
    np.testing.assert_allclose(d, [-1.0])


def test_bih_fuzz_vs_brute(rng):
    """BIH results must be a subset of the brute-force oracle's with
    identical distances (cf. raytracer.zig:568-628)."""
    for _ in range(20):
        n = int(rng.integers(5, 120))
        low, high = _random_boxes(rng, n)
        values = np.arange(n, dtype=np.int32)
        arena = build_bih(low, high, values, max_leaf_size=8)
        assert arena.n_prims == n
        # prim reorder is a permutation
        assert sorted(arena.values.tolist()) == list(range(n))

        for _ in range(20):
            src = (rng.random(3, dtype=np.float32) - 0.5) * 20
            d = rng.random(3, dtype=np.float32) - 0.5
            if np.linalg.norm(d) < 1e-3:
                continue
            vals_b, dists_b = raycast_brute(low, high, values, src, d, capacity=128)
            vals_t, dists_t = raycast_bih(arena, src, d, capacity=128)
            # sorted ascending
            assert np.all(np.diff(dists_t) >= 0)
            # subset with matching distances
            brute = {int(v): float(t) for v, t in zip(vals_b, dists_b)}
            for v, t in zip(vals_t, dists_t):
                assert int(v) in brute
                np.testing.assert_allclose(t, brute[int(v)], rtol=1e-5, atol=1e-5)


def test_bih_degenerate_centroids():
    # identical centroids would recurse forever with the raw reference
    # policy; the builder must fall back to an even split
    n = 32
    low = np.tile(np.float32([-1, -1, -1]), (n, 1))
    high = np.tile(np.float32([1, 1, 1]), (n, 1))
    arena = build_bih(low, high, np.arange(n), max_leaf_size=4)
    assert arena.depth() >= 3
    vals, dists = raycast_bih(arena, np.float32([-5, 0, 0]), np.float32([1, 0, 0]), 128)
    assert len(vals) == n
    np.testing.assert_allclose(dists, 4.0, rtol=1e-6)


def test_bih_save_load(tmp_path, rng):
    low, high = _random_boxes(rng, 50)
    arena = build_bih(low, high, np.arange(50, dtype=np.int32))
    p = tmp_path / "arena.npz"
    arena.save(p)
    from audio_raytracing_tpu.models.bih import BIHArena

    arena2 = BIHArena.load(p)
    src = np.float32([0, 0, 0])
    d = np.float32([1, 0.2, -0.3])
    v1, d1 = raycast_bih(arena, src, d)
    v2, d2 = raycast_bih(arena2, src, d)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(d1, d2)


def test_exact_tail_lane_semantics():
    """exact_tail=True reproduces the reference's per-lane split: within a
    leaf run, tail boxes (beyond the last full 8-lane chunk) use the scalar
    clamped slab test — a box containing the ray origin is reported at
    distance 0 — while full chunks keep the SoA semantics (dropped)."""
    from audio_raytracing_tpu.models.bih import (
        build_bih,
        raycast_bih,
        slab_entry_distances_scalar,
    )

    # 9 coincident boxes around the origin in ONE leaf: positions 0..7 are
    # the SIMD chunk, position 8 is the scalar tail
    n = 9
    low = np.tile(np.float32([-1, -1, -1]), (n, 1))
    high = np.tile(np.float32([1, 1, 1]), (n, 1))
    vals = np.arange(n, dtype=np.int32)
    arena = build_bih(low, high, vals, max_leaf_size=16)
    src = np.float32([0.0, 0.0, 0.0])
    d = np.float32([1.0, 0.0, 0.0])

    v_soa, _ = raycast_bih(arena, src, d)
    assert v_soa.size == 0  # SoA: origin-inside boxes skipped everywhere

    v_ex, d_ex = raycast_bih(arena, src, d, exact_tail=True)
    assert v_ex.size == 1 and d_ex[0] == 0.0  # the single tail lane reports
    assert int(v_ex[0]) == int(arena.values[8])  # ...the 9th box of the run

    # scalar semantics: behind-the-origin boxes still miss
    behind = slab_entry_distances_scalar(
        np.float32([[-5, -1, -1]]), np.float32([[-3, 1, 1]]), src, d
    )
    assert behind[0] == -1.0


def test_rigid_transform_arrays_invariance():
    """Tracing a rigidly moved scene from a moved source/listener equals
    tracing the original from the original pose (full invariance of the
    device-side transform, incl. the closed-form Woop update)."""
    import dataclasses

    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir
    from audio_raytracing_tpu.models.scene import (
        Scene,
        box_room,
        rigid_transform_arrays,
    )

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(
        box_room(size=(6.0, 3.0, 5.0)), cfg,
        absorption=np.full(12, 0.2, np.float32),
    )
    arrays = scene.device_arrays()
    # a non-trivial rotation (about y then z) + translation
    a, b = 0.6, -0.35
    ry = np.float32([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    rz = np.float32([[np.cos(b), -np.sin(b), 0], [np.sin(b), np.cos(b), 0], [0, 0, 1]])
    r = rz @ ry
    t = np.float32([3.0, -1.0, 2.0])
    moved = rigid_transform_arrays(arrays, r, t)

    src = np.float32([1.0, 0.5, 0.5])
    lst = np.float32([-1.0, -0.5, -1.0])
    dirs = fibonacci_sphere(512)
    base = trace_ir(arrays, jnp.asarray(src), jnp.asarray(lst), cfg=cfg,
                    max_bounces=3, dirs=jnp.asarray(dirs))
    # rays must rotate with the frame for path-identical sampling
    got = trace_ir(moved, jnp.asarray(src @ r.T + t), jnp.asarray(lst @ r.T + t),
                   cfg=cfg, max_bounces=3, dirs=jnp.asarray(dirs @ r.T))
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(base.energy), rtol=1e-3, atol=1e-7
    )
    # arrival directions rotate with the frame: rotate back and compare
    ds = np.asarray(got.dir_sum)  # (3, n_bins)
    np.testing.assert_allclose(
        (r.T @ ds), np.asarray(base.dir_sum), rtol=1e-3, atol=1e-7
    )
    # MXU (Woop closed-form) path agrees too
    got_mxu = trace_ir(moved, jnp.asarray(src @ r.T + t),
                       jnp.asarray(lst @ r.T + t), cfg=cfg, max_bounces=3,
                       dirs=jnp.asarray(dirs @ r.T), intersector="mxu")
    np.testing.assert_allclose(
        np.asarray(got_mxu.energy), np.asarray(base.energy), rtol=1e-3, atol=1e-6
    )


def test_rigid_transform_masked_subset():
    """mask moves only the selected triangles: a door sliding inside a
    static room changes occlusion while the room is untouched."""
    import dataclasses

    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir
    from audio_raytracing_tpu.models.scene import (
        Scene,
        box_room,
        rigid_transform_arrays,
    )

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    # room + a small blocking panel between source and listener
    room = box_room(size=(8.0, 3.0, 6.0))
    panel = np.float32([
        [[0.0, -1.0, -1.0], [0.0, 1.0, -1.0], [0.0, 1.0, 1.0]],
        [[0.0, -1.0, -1.0], [0.0, 1.0, 1.0], [0.0, -1.0, 1.0]],
    ])
    scene = Scene.from_triangles(np.concatenate([room, panel]), cfg)
    arrays = scene.device_arrays()
    T = arrays.v0.shape[0]
    mask = np.zeros(T, bool)
    mask[12:14] = True  # just the panel

    # slide the panel far away along +y (out through the ceiling region)
    moved = rigid_transform_arrays(arrays, np.eye(3, dtype=np.float32),
                                   np.float32([0.0, 50.0, 0.0]), mask=mask)
    # room triangles untouched bit-for-bit
    np.testing.assert_array_equal(np.asarray(moved.v0)[:12], np.asarray(arrays.v0)[:12])
    np.testing.assert_array_equal(np.asarray(moved.woop_d)[:, :12],
                                  np.asarray(arrays.woop_d)[:, :12])

    src = jnp.asarray([1.5, 0.0, 0.0])
    lst = jnp.asarray([-1.5, 0.0, 0.0])
    dirs = jnp.asarray(fibonacci_sphere(512))
    blocked = trace_ir(arrays, src, lst, cfg=cfg, max_bounces=1, dirs=dirs)
    open_ = trace_ir(moved, src, lst, cfg=cfg, max_bounces=1, dirs=dirs)
    d = float(jnp.linalg.norm(src - lst))
    b = int(round(d * cfg.samples_per_meter))
    # with the panel in place the direct path is occluded; moved away it is not
    assert np.asarray(blocked.energy)[:, b].sum() == 0.0
    assert np.asarray(open_.energy)[:, b].sum() > 0.0


def test_refit_unchanged_is_identical(rng):
    """Refitting with the original boxes reproduces the arena bit-exactly."""
    from audio_raytracing_tpu.models.bih import refit_bih

    low, high = _random_boxes(rng, 60)
    arena = build_bih(low, high, np.arange(60, dtype=np.int32), max_leaf_size=8)
    re = refit_bih(arena, arena.aabb_low, arena.aabb_high)
    np.testing.assert_array_equal(re.left_max, arena.left_max)
    np.testing.assert_array_equal(re.right_min, arena.right_min)
    np.testing.assert_array_equal(re.values, arena.values)


def test_refit_fuzz_vs_brute(rng):
    """After moving a random subset of boxes and refitting, queries keep the
    reference-oracle guarantees (subset of brute force, exact distances,
    ascending order) against the MOVED boxes."""
    from audio_raytracing_tpu.models.bih import refit_bih

    for _ in range(8):
        n = int(rng.integers(8, 100))
        low, high = _random_boxes(rng, n)
        values = np.arange(n, dtype=np.int32)
        arena = build_bih(low, high, values, max_leaf_size=8)
        # move ~third of the prims (arena order) by a random offset
        m = rng.random(n) < 0.35
        shift = (rng.random((n, 3), dtype=np.float32) - 0.5) * 6.0
        new_low = arena.aabb_low + np.where(m[:, None], shift, 0.0)
        new_high = arena.aabb_high + np.where(m[:, None], shift, 0.0)
        arena2 = refit_bih(arena, new_low, new_high)
        # brute oracle over the moved boxes in arena order
        for _ in range(10):
            src = (rng.random(3, dtype=np.float32) - 0.5) * 20
            d = rng.random(3, dtype=np.float32) - 0.5
            if np.linalg.norm(d) < 1e-3:
                continue
            vals_b, dists_b = raycast_brute(
                new_low, new_high, arena2.values, src, d, capacity=128
            )
            vals_t, dists_t = raycast_bih(arena2, src, d, capacity=128)
            assert np.all(np.diff(dists_t) >= 0)
            brute = {int(v): float(t) for v, t in zip(vals_b, dists_b)}
            for v, t in zip(vals_t, dists_t):
                assert int(v) in brute
                np.testing.assert_allclose(t, brute[int(v)], rtol=1e-5, atol=1e-5)


def test_space_refit_transform_translation():
    """Space parity API: translate one box, refit, and the query follows it;
    pure translations keep exact AABBs."""
    from audio_raytracing_tpu.models.space import SpaceBuilder

    b = SpaceBuilder()
    b.add([0.0, -1.0, -1.0], [0.5, 1.0, 1.0], 7)   # target, at x ~ 0
    b.add([5.0, -1.0, -1.0], [5.5, 1.0, 1.0], 9)   # bystander at x ~ 5
    s = b.finish()
    vals, dists = s.raycast(np.float32([-3, 0, 0]), np.float32([1, 0, 0]))
    assert list(vals) == [7, 9]
    # move box 7 (insertion index 0) to x ~ 10
    s.refit_transform(np.eye(3), [10.0, 0.0, 0.0], mask=[True, False])
    vals, dists = s.raycast(np.float32([-3, 0, 0]), np.float32([1, 0, 0]))
    assert list(vals) == [9, 7]
    np.testing.assert_allclose(dists[1], 13.0, rtol=1e-6)  # -3 -> 10
    # off-axis ray no longer sees the moved box at the old spot
    vals2, _ = s.raycast(np.float32([0.25, 0.0, -5.0]), np.float32([0, 0, 1.0]))
    assert 7 not in list(vals2)
