"""Sharded FDTD (parallel/wave_sharded.py) vs the unsharded solver on the
8-device CPU mesh: x-slab domain decomposition with ppermute halo
exchange must be numerically equivalent (same stencil, same
coefficients, same rigid outer boundary)."""

import numpy as np

import jax

from audio_raytracing_tpu.models import wave as W
from audio_raytracing_tpu.parallel.mesh import make_mesh
from audio_raytracing_tpu.parallel.wave_sharded import wave_run_sharded

C = 350.0


def _box_domain(nx, ny, nz, dx=0.1):
    occ = np.zeros((nx, ny, nz), np.float32)
    occ[1:-1, 1:-1, 1:-1] = 1.0
    return W.WaveDomain(occ=occ, dx=dx, origin=(0.0, 0.0, 0.0))


def test_sharded_matches_unsharded():
    dom = _box_domain(32, 14, 12)  # 32 divides 8: no solid padding
    mesh = make_mesh(8, ("x",))
    src, lst = (5, 5, 5), (26, 9, 7)
    n_steps = 300
    ref = W.wave_run(dom, src, lst, n_steps, c=C, alpha=0.25, fc=120.0)
    sh = wave_run_sharded(dom, src, lst, n_steps, mesh, c=C, alpha=0.25,
                          fc=120.0)
    assert sh.dt == ref.dt and sh.t0 == ref.t0
    np.testing.assert_allclose(
        np.asarray(sh.pressure), np.asarray(ref.pressure), rtol=0, atol=3e-6
    )
    assert np.abs(np.asarray(ref.pressure)).max() > 1e-3  # non-trivial


def test_sharded_pads_nondivisible_x():
    dom = _box_domain(27, 12, 10)  # 27 % 8 != 0 -> solid x padding
    mesh = make_mesh(8, ("x",))
    src, lst = (4, 4, 4), (20, 8, 6)
    n_steps = 200
    ref = W.wave_run(dom, src, lst, n_steps, c=C, alpha=0.0, fc=120.0)
    sh = wave_run_sharded(dom, src, lst, n_steps, mesh, c=C, alpha=0.0,
                          fc=120.0)
    np.testing.assert_allclose(
        np.asarray(sh.pressure), np.asarray(ref.pressure), rtol=0, atol=3e-6
    )


def test_sharded_cross_boundary_source_listener():
    """Source and listener in different shards; wave crosses every shard
    boundary (travel spans the whole x extent)."""
    dom = _box_domain(48, 10, 10, dx=0.1)
    mesh = make_mesh(8, ("x",))
    src, lst = (2, 5, 5), (45, 5, 5)
    n_steps = 400
    ref = W.wave_run(dom, src, lst, n_steps, c=C, alpha=0.1, fc=150.0)
    sh = wave_run_sharded(dom, src, lst, n_steps, mesh, c=C, alpha=0.1,
                          fc=150.0)
    np.testing.assert_allclose(
        np.asarray(sh.pressure), np.asarray(ref.pressure), rtol=0, atol=3e-6
    )
    # the arrival actually made it across the mesh
    assert np.abs(np.asarray(sh.pressure)).max() > 1e-4


def test_sharded_pallas_kernel_matches_unsharded():
    """kernel="pallas": each shard steps through the fused slab kernel
    (ops/pallas_wave.py::make_shard_step, interpret mode) with one
    up-front ppermute halo exchange per step — must match the unsharded
    XLA solver like the elementwise shard step does. Source and
    listener in different shards; walls via the box boundary; ragged
    B (Sx=4 with block=4 -> 1 block, and block=1 -> 4 blocks)."""
    dom = _box_domain(32, 14, 12)
    mesh = make_mesh(8, ("x",))
    src, lst = (5, 5, 5), (26, 9, 7)
    n_steps = 200
    ref = W.wave_run(dom, src, lst, n_steps, c=C, alpha=0.25, fc=120.0)
    for blk in (4, 1):
        sh = wave_run_sharded(
            dom, src, lst, n_steps, mesh, c=C, alpha=0.25, fc=120.0,
            kernel="pallas", block=blk, pallas_interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(sh.pressure), np.asarray(ref.pressure),
            rtol=0, atol=3e-6,
        )
    assert np.abs(np.asarray(ref.pressure)).max() > 1e-3


def test_sharded_pallas_matches_xla_sharded_bitwise_path():
    """The pallas shard path vs the XLA shard path on the SAME mesh:
    the recomputed shard-boundary face must agree to f32 reassociation
    noise (the kernel recomputes the neighbor's last vx face from
    identical inputs in the identical op order)."""
    dom = _box_domain(24, 10, 12)
    mesh = make_mesh(8, ("x",))
    src, lst = (3, 4, 6), (20, 6, 5)
    n_steps = 150
    a = wave_run_sharded(dom, src, lst, n_steps, mesh, alpha=0.3,
                         fc=150.0, kernel="xla")
    b = wave_run_sharded(dom, src, lst, n_steps, mesh, alpha=0.3,
                         fc=150.0, kernel="pallas", pallas_interpret=True)
    np.testing.assert_allclose(
        np.asarray(b.pressure), np.asarray(a.pressure), rtol=0, atol=2e-7
    )


def test_sharded_pallas_ytiled_matches_unsharded():
    """block_y forces y tiling in the shard kernel (the path sharded
    512^3-class domains take): 16 rows at block_y=8 -> 2 y-tiles per
    shard, source and listener in different tiles AND different
    shards."""
    dom = _box_domain(32, 16, 12)
    mesh = make_mesh(8, ("x",))
    src, lst = (5, 3, 5), (26, 13, 7)
    n_steps = 200
    ref = W.wave_run(dom, src, lst, n_steps, c=C, alpha=0.2, fc=120.0)
    sh = wave_run_sharded(
        dom, src, lst, n_steps, mesh, c=C, alpha=0.2, fc=120.0,
        kernel="pallas", block=2, block_y=8, pallas_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh.pressure), np.asarray(ref.pressure),
        rtol=0, atol=3e-6,
    )
    assert np.abs(np.asarray(ref.pressure)).max() > 1e-3
