"""Möller–Trumbore differential tests: JAX batched op vs NumPy oracle.

The oracle is a direct NumPy port of the reference semantics
(rayTriangleIntersection, /root/reference/src/main.zig:1041-1079): dir
normalized, eps 1e-6, strict |det| test, u/v/t bounds. The batched TPU op
must agree hit-for-hit and distance-for-distance.
"""

import numpy as np

from audio_raytracing_tpu.models.scene import Scene
from audio_raytracing_tpu.ops.intersect import (
    intersect_pairs,
    nearest_hit,
    reflect,
    triangle_normals,
)


def oracle_ray_triangle(src, dir_, v0, v1, v2, eps=1e-6):
    """Scalar NumPy port of main.zig:1041-1079. Returns t or None."""
    src = np.asarray(src, np.float32)
    d = np.asarray(dir_, np.float32)
    d = d / np.float32(np.sqrt(d @ d))
    a, b, c = (np.asarray(v, np.float32) for v in (v0, v1, v2))
    ab, ac = b - a, c - a
    h = np.cross(d, ac)
    det = np.float32(ab @ h)
    if -eps < det < eps:
        return None
    f = np.float32(1.0) / det
    s = src - a
    u = f * np.float32(s @ h)
    if u < 0.0 or u > 1.0:
        return None
    q = np.cross(s, ab)
    v = f * np.float32(d @ q)
    if v < 0.0 or u + v > 1.0:
        return None
    t = f * np.float32(ac @ q)
    if t < eps:
        return None
    return float(t)


def oracle_nearest_hit(src, dir_, tris):
    best_t, best_i = np.inf, -1
    for i, tri in enumerate(tris):
        t = oracle_ray_triangle(src, dir_, *tri)
        if t is not None and t < best_t:
            best_t, best_i = t, i
    return best_t, best_i


def test_single_triangle_hit():
    tri = np.float32([[0, 0, 1], [1, 0, 1], [0, 1, 1]])
    t, idx, hit = nearest_hit(
        np.float32([[0.2, 0.2, 0]]),
        np.float32([[0, 0, 1]]),
        tri[None, 0], tri[None, 1], tri[None, 2],
    )
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)
    assert int(idx[0]) == 0


def test_miss_behind_and_parallel():
    tri = np.float32([[0, 0, 1], [1, 0, 1], [0, 1, 1]])
    v0, v1, v2 = tri[None, 0], tri[None, 1], tri[None, 2]
    # behind
    _, _, hit = nearest_hit(np.float32([[0.2, 0.2, 2]]), np.float32([[0, 0, 1]]), v0, v1, v2)
    assert not bool(hit[0])
    # parallel (in-plane direction)
    _, _, hit = nearest_hit(np.float32([[0.2, 0.2, 0]]), np.float32([[1, 0, 0]]), v0, v1, v2)
    assert not bool(hit[0])


def test_degenerate_padding_never_hits():
    z = np.zeros((4, 3), np.float32)
    t, idx, hit = nearest_hit(np.float32([[0, 0, 0]]), np.float32([[0, 0, 1]]), z, z, z)
    assert not bool(hit[0]) and int(idx[0]) == -1


def test_fuzz_vs_oracle(rng, world_obj_path):
    scene = Scene.from_obj(world_obj_path)
    tris = np.stack([scene.v0, scene.v1, scene.v2], axis=1)[: scene.n_triangles]
    n_rays = 64
    src = (rng.random((n_rays, 3), dtype=np.float32) - 0.5) * 10
    d = rng.random((n_rays, 3), dtype=np.float32) - 0.5
    keep = np.linalg.norm(d, axis=1) > 1e-3
    src, d = src[keep], d[keep]
    t, idx, hit = nearest_hit(
        src, d, scene.v0, scene.v1, scene.v2
    )
    t, idx, hit = np.asarray(t), np.asarray(idx), np.asarray(hit)
    for i in range(len(src)):
        ot, oi = oracle_nearest_hit(src[i], d[i], tris)
        if oi < 0:
            assert not hit[i], f"ray {i}: op hit {idx[i]} oracle missed"
        else:
            assert hit[i], f"ray {i}: op missed, oracle hit {oi}"
            np.testing.assert_allclose(t[i], ot, rtol=1e-4, atol=1e-5)
            # index may differ only on (near-)ties
            if idx[i] != oi:
                t2 = oracle_ray_triangle(src[i], d[i], *tris[idx[i]])
                assert t2 is not None and abs(t2 - ot) < 1e-4


def test_front_back_faces():
    tri = np.float32([[0, 0, 1], [1, 0, 1], [0, 1, 1]])
    # normal = cross(ab, ac) = (0,0,1)x... ab=(1,0,0), ac=(0,1,0) -> n=(0,0,1)
    # ray along +z meets the back side (dir . n > 0) => det < 0
    _, front, valid = intersect_pairs(
        np.float32([0.2, 0.2, 0]), np.float32([0, 0, 1]), tri[0], tri[1], tri[2]
    )
    assert bool(valid) and not bool(front)
    _, front, valid = intersect_pairs(
        np.float32([0.2, 0.2, 2]), np.float32([0, 0, -1]), tri[0], tri[1], tri[2]
    )
    assert bool(valid) and bool(front)


def test_reflect_and_normals():
    n = triangle_normals(
        np.float32([[0, 0, 0]]), np.float32([[1, 0, 0]]), np.float32([[0, 1, 0]])
    )
    np.testing.assert_allclose(np.asarray(n), [[0, 0, 1]], atol=1e-7)
    d = np.float32([[0.70710678, 0, -0.70710678]])
    r = reflect(d, np.float32([[0, 0, 1]]))
    np.testing.assert_allclose(np.asarray(r), [[0.70710678, 0, 0.70710678]], rtol=1e-6)
