"""BIH-traversal nearest hit vs dense nearest hit on randomized scenes."""

import numpy as np

import jax.numpy as jnp

from audio_raytracing_tpu.models.bih import build_bih
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.ops.intersect import nearest_hit
from audio_raytracing_tpu.ops.traverse import device_arena, nearest_hit_bih


def random_tris(rng, n):
    c = (rng.random((n, 3), dtype=np.float32) - 0.5) * 20
    e1 = (rng.random((n, 3), dtype=np.float32) - 0.5) * 2
    e2 = (rng.random((n, 3), dtype=np.float32) - 0.5) * 2
    return np.stack([c, c + e1, c + e2], axis=1)


def _check(tris, origins, dirs, leaf=8):
    low = tris.min(axis=1)
    high = tris.max(axis=1)
    arena = build_bih(low, high, np.arange(len(tris), dtype=np.int32) * 3, leaf)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    dev = device_arena(arena, v0, v1, v2, leaf)
    t_b, i_b, h_b = (np.asarray(x) for x in nearest_hit_bih(dev, jnp.asarray(origins), jnp.asarray(dirs), leaf_cap=leaf))
    t_d, i_d, h_d = (np.asarray(x) for x in nearest_hit(jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)))
    np.testing.assert_array_equal(h_b, h_d)
    ok = h_d
    np.testing.assert_allclose(t_b[ok], t_d[ok], rtol=1e-5, atol=1e-6)
    # indices agree except on exact-distance ties
    diff = ok & (i_b != i_d)
    if diff.any():
        np.testing.assert_allclose(t_b[diff], t_d[diff], rtol=1e-5)


def test_traversal_matches_dense_random(rng):
    tris = random_tris(rng, 300)
    origins = (rng.random((64, 3), dtype=np.float32) - 0.5) * 20
    dirs = rng.random((64, 3), dtype=np.float32) - 0.5
    _check(tris, origins, dirs)


def test_traversal_matches_dense_box_room(rng):
    tris = box_room(size=(8.0, 3.0, 6.0))
    origins = (rng.random((64, 3), dtype=np.float32) - 0.5) * 2
    dirs = rng.random((64, 3), dtype=np.float32) - 0.5
    _check(tris, origins, dirs, leaf=2)


def test_traversal_inside_aabb_hits():
    """Rays starting inside triangle AABBs must still hit (the reference's
    origin-only SoA pruning would drop these; ours must not)."""
    tris = box_room(size=(4.0, 4.0, 4.0))
    origins = np.zeros((6, 3), np.float32)
    dirs = np.float32(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]]
    )
    _check(tris, origins, dirs, leaf=2)


def test_trace_ir_bih_backend_matches_dense():
    import dataclasses

    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import trace_ir

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), cfg)
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    a = trace_ir(scene.device_arrays(), src, lst, cfg=cfg, n_rays=512, max_bounces=3)
    b = trace_ir(
        scene.device_arrays(), src, lst, cfg=cfg, n_rays=512, max_bounces=3,
        intersector="bih", bih_arena=scene.device_bih(),
        bih_leaf_cap=int(scene.bih.leaf_count.max()),
    )
    np.testing.assert_allclose(
        np.asarray(b.energy), np.asarray(a.energy), rtol=1e-4, atol=1e-8
    )
