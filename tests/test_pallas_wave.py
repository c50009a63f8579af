"""Fused Pallas FDTD step kernel (ops/pallas_wave.py) vs the XLA solver.

Differential tests in interpret mode on the CPU backend: the kernel
implements the exact update rules of models/wave.py::_leapfrog_step
(same face coefficients, same boundary semantics via pad/fill masks),
so recorded traces and final fields must agree to f32 fused-multiply-add
reassociation noise (~1e-8 absolute on O(0.01) pressures)."""

import numpy as np
import pytest

from audio_raytracing_tpu.models.wave import WaveDomain, wave_run
from audio_raytracing_tpu.ops.pallas_wave import _pick_block, wave_run_pallas


def _domain(shape, seed=None):
    occ = np.zeros(shape, np.float32)
    occ[1:-1, 1:-1, 1:-1] = 1.0
    if seed is not None:
        rng = np.random.default_rng(seed)
        occ[rng.random(shape) < 0.08] = 0.0
    return WaveDomain(occ=occ, dx=0.1, origin=(0.0, 0.0, 0.0))


@pytest.mark.parametrize("alpha", [0.0, 0.3])
def test_pallas_wave_matches_xla(alpha):
    dom = _domain((12, 10, 9))
    src, lst = (3, 4, 4), (8, 6, 5)
    ref, rs = wave_run(dom, src, lst, 48, alpha=alpha, return_state=True)
    got, gs = wave_run_pallas(
        dom, src, lst, 48, alpha=alpha, interpret=True, block=4,
        return_state=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.pressure), np.asarray(ref.pressure), atol=2e-8
    )
    for a, b in zip(rs, gs):
        assert np.asarray(a).shape == np.asarray(b).shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-7)


def test_pallas_wave_exact_tile_dims_and_ragged_blocks():
    """y exactly a multiple of 8 and z exactly 128 exercise the roll wrap
    masks (no solid fill to hide a wrap bug); nx % block != 0 exercises
    the high-side x fill; src/lst sit against the domain walls."""
    dom = _domain((11, 16, 128), seed=0)
    occ = np.asarray(dom.occ)
    src, lst = (1, 1, 1), (9, 14, 20)
    occ[src] = 1.0
    occ[lst] = 1.0
    dom = WaveDomain(occ=occ, dx=0.1, origin=dom.origin)
    ref = wave_run(dom, src, lst, 60, alpha=0.25)
    got = wave_run_pallas(dom, src, lst, 60, alpha=0.25, interpret=True,
                          block=3)
    r = np.asarray(ref.pressure)
    assert np.abs(r).max() > 1e-4  # the wave actually arrived
    np.testing.assert_allclose(np.asarray(got.pressure), r, atol=2e-8)


def test_pallas_wave_ytiled_matches_xla():
    """The y-tiled grid kernel (the r4 VERDICT's (512,512)-plane lift)
    bit-matches the untiled semantics: block_y=8 forces 2 y-tiles on a
    16-row domain, with the source in tile 0 and the listener in tile 1
    (exercises the per-tile injection/pickup), scattered walls, and a
    ragged x block count."""
    dom = _domain((11, 16, 128), seed=0)
    occ = np.asarray(dom.occ)
    src, lst = (3, 2, 40), (8, 13, 48)
    occ[src] = 1.0
    occ[lst] = 1.0
    dom = WaveDomain(occ=occ, dx=0.1, origin=dom.origin)
    ref, rs = wave_run(dom, src, lst, 60, alpha=0.25, return_state=True)
    got, gs = wave_run_pallas(dom, src, lst, 60, alpha=0.25,
                              interpret=True, block=3, block_y=8,
                              return_state=True)
    r = np.asarray(ref.pressure)
    assert np.abs(r).max() > 1e-4
    np.testing.assert_allclose(np.asarray(got.pressure), r, atol=2e-8)
    for a, b in zip(rs, gs):
        assert np.asarray(a).shape == np.asarray(b).shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-7)


def test_pallas_wave_ytiled_ragged_y():
    """ny NOT a multiple of the tile (10 rows, block_y=8 -> 2 tiles with
    6 rows of solid fill): the fill rows and the tile-edge halos at the
    domain boundary must reproduce the wall semantics exactly; y-edge
    cells adjoin the boundary on both sides."""
    dom = _domain((9, 10, 128), seed=3)
    occ = np.asarray(dom.occ)
    src, lst = (2, 1, 5), (7, 8, 18)
    occ[src] = 1.0
    occ[lst] = 1.0
    dom = WaveDomain(occ=occ, dx=0.1, origin=dom.origin)
    ref = wave_run(dom, src, lst, 50, alpha=0.1)
    got = wave_run_pallas(dom, src, lst, 50, alpha=0.1, interpret=True,
                          block=4, block_y=8)
    r = np.asarray(ref.pressure)
    assert np.abs(r).max() > 1e-4
    np.testing.assert_allclose(np.asarray(got.pressure), r, atol=2e-8)


def test_ytile_picker_and_feasibility():
    from audio_raytracing_tpu.ops.pallas_wave import (
        _GRID_KERNEL_MAX_PLANE_BYTES,
        _pick_ytile_divisor,
        grid_kernel_feasible,
    )

    # 512^3: tile plane 128*512*4 = 256 KB under the 320 KB target
    # (the 512 KB Ty=256 tile measured 18.76M scoped VMEM on hardware
    # -> OOM past the 16M cap) -> Ty=128, 4 tiles
    assert _pick_ytile_divisor(512, 512) == 128
    # divisor-aware: non-power-of-two ny tiles WITHOUT extra padding
    # (520 = 8*65 -> candidates 8,40,104,520; 104*512*4 = 208 KB fits)
    assert _pick_ytile_divisor(520, 512) == 104
    # the r4-infeasible square planes are now feasible
    assert grid_kernel_feasible((256, 512, 512))
    assert grid_kernel_feasible((512, 512, 512))
    # only an enormous z extent is infeasible (8-row tile over budget)
    assert not grid_kernel_feasible((64, 64, 8 * 128 * 1024))
    assert 8 * 512 * 4 <= _GRID_KERNEL_MAX_PLANE_BYTES


def test_pick_block_respects_vmem_budget():
    # 256-ish plane (256 KB): B=1 -> 2*(9*2+6)*256KB = 12 MB > 6 MB stops
    # the doubling at 1 (the r2 estimate ignored the ~8-10 slab-sized
    # body temporaries; the model now doubles the declared scratch)
    assert _pick_block(256 * 1024) == 1
    # tiny plane: capped at 64
    assert _pick_block(1024) == 64
    # grid-pipelined model: (30*B + 12) planes vs 10 MB
    from audio_raytracing_tpu.ops.pallas_wave import _pick_block_grid

    assert _pick_block_grid(256 * 1024) == 1
    assert _pick_block_grid(64 * 1024) == 4
    assert _pick_block_grid(64) == 128
