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
