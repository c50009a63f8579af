"""Native C++ runtime parity tests: bit-identical BIH arenas, MT nearest
hit vs the NumPy oracle, OBJ parse vs the Python parser."""

import numpy as np
import pytest

from audio_raytracing_tpu import native
from audio_raytracing_tpu.models.bih import build_bih, raycast_bih
from audio_raytracing_tpu.utils.obj import load_obj

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler?)"
)


def test_native_bih_bit_identical(rng):
    for _ in range(10):
        n = int(rng.integers(3, 200))
        c = (rng.random((n, 3), dtype=np.float32) - 0.5) * 20
        d = rng.random((n, 3), dtype=np.float32) * 5
        low, high = c - d, c + d
        vals = np.arange(n, dtype=np.int32)
        a = build_bih(low, high, vals, max_leaf_size=8)
        b = native.build_bih_native(low, high, vals, max_leaf_size=8)
        assert b is not None
        for f in ("axis", "left_max", "right_min", "left", "right",
                  "leaf_start", "leaf_count", "aabb_low", "aabb_high", "values"):
            np.testing.assert_array_equal(
                getattr(a, f), getattr(b, f), err_msg=f
            )


def test_native_bih_degenerate_centroids():
    n = 32
    low = np.tile(np.float32([-1, -1, -1]), (n, 1))
    high = np.tile(np.float32([1, 1, 1]), (n, 1))
    a = build_bih(low, high, np.arange(n, dtype=np.int32), max_leaf_size=4)
    b = native.build_bih_native(low, high, np.arange(n, dtype=np.int32), max_leaf_size=4)
    np.testing.assert_array_equal(a.values, b.values)
    np.testing.assert_array_equal(a.axis, b.axis)
    # queries agree too
    va, da = raycast_bih(a, np.float32([-5, 0, 0]), np.float32([1, 0, 0]))
    vb, db = raycast_bih(b, np.float32([-5, 0, 0]), np.float32([1, 0, 0]))
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(da, db)


def test_native_nearest_hit_vs_oracle(rng, world_obj_path):
    from tests.test_intersect import oracle_nearest_hit

    mesh = load_obj(world_obj_path)
    tris = mesh.triangles()
    origins = ((rng.random((32, 3), dtype=np.float32) - 0.5) * 10).astype(np.float32)
    dirs = (rng.random((32, 3), dtype=np.float32) - 0.5).astype(np.float32)
    res = native.nearest_hit_native(tris, origins, dirs)
    assert res is not None
    t, idx = res
    for i in range(len(origins)):
        ot, oi = oracle_nearest_hit(origins[i], dirs[i], tris)
        if oi < 0:
            assert idx[i] == -1
        else:
            assert idx[i] >= 0
            np.testing.assert_allclose(t[i], ot, rtol=1e-4)


def test_native_obj_parse(world_obj_path):
    mesh = load_obj(world_obj_path)
    got = native.parse_obj_native(world_obj_path.read_text())
    assert got is not None
    np.testing.assert_allclose(got, mesh.triangles(), rtol=1e-6)
