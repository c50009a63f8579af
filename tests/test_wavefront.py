"""Wavefront tracing (trace_ir_pallas(wavefront=True)): one state_io
kernel launch per bounce with per-ray state re-sorted by (direction
octant, origin morton) between bounces — the sg_cull reach test stays
tight at every depth (measured 1.8x at 49k tris; benchmarks/RESULTS.md
"Wavefront re-sorting"). Per-ray math including the hash-rng scattering
draws is BIT-IDENTICAL to the resident fused loop (the rng counter keys
on the original ray index carried through the permutations); only the
histogram accumulation order differs, so interpret-mode comparisons
against the resident kernel demand exact equality per (ray, bounce)
contribution — checked here through the summed histograms at f32."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
from audio_raytracing_tpu.models.scene import Scene, box_room_subdivided
from audio_raytracing_tpu.ops.pallas_trace import trace_ir_pallas

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096)


@pytest.fixture(autouse=True)
def _fresh_compile_caches():
    """See tests/test_pallas_trace.py: the XLA CPU compiler has segfaulted
    compiling large interpret programs against accumulated caches."""
    import jax

    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def scene():
    # k=8 -> 768 padded triangles: enough groups for group_fori+sg_cull
    return Scene.from_triangles(
        box_room_subdivided(size=(10.0, 4.0, 8.0), k=8), CFG
    )


SRC = jnp.asarray([1.0, 0.3, 0.5])
LST = jnp.asarray([-1.0, 0.0, -0.5])


def _trace(scene, wavefront, **kw):
    args = dict(
        cfg=CFG, max_bounces=3, dirs=jnp.asarray(fibonacci_sphere_sorted(1024)),
        fused_hist=True, flat_bands=True, interpret=True, group_fori=True,
        sg_cull=True, wavefront=wavefront,
    )
    args.update(kw)
    return trace_ir_pallas(scene.device_arrays(), SRC, LST, **args)


@pytest.mark.slow
def test_wavefront_matches_resident(scene):
    a = _trace(scene, False)
    b = _trace(scene, True)
    np.testing.assert_allclose(
        np.asarray(b.energy), np.asarray(a.energy), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(b.dir_sum), np.asarray(a.dir_sum), rtol=0, atol=1e-7
    )


@pytest.mark.slow
def test_wavefront_scattering_matches_resident(scene):
    """The permuted rng draws must follow the rays: counters key on the
    carried original index, so stochastic bounces are sample-identical."""
    a = _trace(scene, False, scattering=0.6, rng_seed=7)
    b = _trace(scene, True, scattering=0.6, rng_seed=7)
    rel = float(
        np.abs(np.asarray(a.energy) - np.asarray(b.energy)).sum()
        / np.abs(np.asarray(a.energy)).sum()
    )
    assert rel < 1e-6, rel


@pytest.mark.slow
def test_wavefront_directivity_matches_resident(scene):
    """src_weights fold into the initial amplitude state instead of extra
    kernel inputs; the result must match the resident weighted kernel."""
    from audio_raytracing_tpu.models.directivity import Directivity

    pat = Directivity(axis=(1.0, 0.0, 0.0), alpha=0.5)
    a = _trace(scene, False, src_directivity=pat)
    b = _trace(scene, True, src_directivity=pat)
    np.testing.assert_allclose(
        np.asarray(b.energy), np.asarray(a.energy), rtol=0, atol=1e-7
    )


@pytest.mark.slow
def test_wavefront_streamed_matches_resident(scene):
    """wavefront + stream_tris (the 196k+ large-scene mode): per-bounce
    (tiles, 1, 2, chunks) grids of the HBM-streamed kernel with state
    in/out refs must match the resident wavefront bit-for-bit, hash-rng
    scattering included."""
    a = _trace(scene, True, scattering=0.5, rng_seed=11)
    b = _trace(scene, True, scattering=0.5, rng_seed=11, stream_tris=256)
    np.testing.assert_allclose(
        np.asarray(b.energy), np.asarray(a.energy), rtol=0, atol=1e-7
    )


def test_wavefront_validation(scene):
    arrays = scene.device_arrays()
    dirs = jnp.asarray(fibonacci_sphere_sorted(1024))
    with pytest.raises(ValueError, match="fused_hist"):
        trace_ir_pallas(arrays, SRC, LST, cfg=CFG, dirs=dirs,
                        wavefront=True, interpret=True)
    with pytest.raises(ValueError, match="group_fori"):
        trace_ir_pallas(arrays, SRC, LST, cfg=CFG, dirs=dirs,
                        fused_hist=True, flat_bands=True, wavefront=True,
                        group_fori=False, interpret=True)
