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


@pytest.mark.slow
def test_wavefront_banded_matches_resident(scene):
    """flat_bands=False (the hybrid tail's configuration): the state
    carries N_BANDS amplitudes instead of one."""
    a = _trace(scene, False, flat_bands=False)
    b = _trace(scene, True, flat_bands=False)
    np.testing.assert_allclose(
        np.asarray(b.energy), np.asarray(a.energy), rtol=0, atol=1e-7
    )


@pytest.mark.slow
def test_wavefront_multi_source_scan(scene):
    """trace_irs_pallas_multi(wavefront=True): the per-bounce re-sort loop
    scans over sources (pure traced code), matching per-source calls."""
    from audio_raytracing_tpu.ops.pallas_trace import trace_irs_pallas_multi

    srcs = jnp.asarray([[1.0, 0.3, 0.5], [0.5, -0.3, 1.0]])
    kw = dict(
        cfg=CFG, max_bounces=2, dirs=jnp.asarray(fibonacci_sphere_sorted(1024)),
        fused_hist=True, flat_bands=True, interpret=True,
    )
    multi = trace_irs_pallas_multi(
        scene.device_arrays(), srcs, LST, wavefront=True, **kw
    )
    for i in range(2):
        single = trace_ir_pallas(
            scene.device_arrays(), srcs[i], LST, group_fori=True,
            sg_cull=True, wavefront=True, **kw
        )
        np.testing.assert_array_equal(
            np.asarray(multi.energy[i]), np.asarray(single.energy)
        )


@pytest.mark.slow
def test_offline_cli_tail_wavefront(tmp_path):
    """--tail-wavefront end to end through the offline CLI (hybrid model,
    pallas tail, interpret mode) on a scene big enough for the
    group_fori+sg_cull kernel."""
    from audio_raytracing_tpu.app.offline import main as offline_main
    from audio_raytracing_tpu.utils.wav import read_wav, write_wav

    tris = np.asarray(box_room_subdivided(size=(10.0, 4.0, 8.0), k=8))
    obj = tmp_path / "room.obj"
    with open(obj, "w") as f:
        # the loader demands the reference's `f v/vt v/vt v/vt` faces
        f.write("vt 0 0\n")
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(len(tris)):
            f.write(f"f {3 * i + 1}/1 {3 * i + 2}/1 {3 * i + 3}/1\n")
    dry = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2000) / 44100)).astype(
        np.float32
    )
    src_wav = tmp_path / "dry.wav"
    write_wav(src_wav, dry, 44100)
    out = tmp_path / "out_wf.wav"
    msg = offline_main([
        str(obj), str(out),
        "--source", str(src_wav), "2,0.5,1",
        "--listener", "0,0,0",
        "--rays", "1024", "--bounces", "2", "--ir-length", "2048",
        "--model", "hybrid", "--ism-order", "1",
        "--tail", "pallas", "--tail-interpret", "--tail-wavefront",
    ])
    assert "wrote" in msg
    audio, rate = read_wav(out)
    assert rate == 44100 and np.isfinite(audio).all()
    assert np.abs(audio).max() > 0 and audio.shape[1] == 2


def test_tail_wavefront_requires_pallas(tmp_path):
    from audio_raytracing_tpu.app.offline import main as offline_main

    with pytest.raises(SystemExit, match="tail pallas"):
        offline_main(["x.obj", "y.wav", "--source", "a.wav", "0,0,0",
                      "--tail-wavefront"])


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


@pytest.mark.slow
def test_ensemble_matches_manual_mean(scene):
    """trace_ir_pallas_ensemble = the exact mean of per-seed traces (one
    scanned dispatch; seeds fold rng_seed * K + e)."""
    from audio_raytracing_tpu.ops.pallas_trace import (
        trace_ir_pallas_ensemble,
    )

    kw = dict(
        cfg=CFG, max_bounces=2,
        dirs=jnp.asarray(fibonacci_sphere_sorted(1024)), fused_hist=True,
        flat_bands=True, interpret=True, scattering=0.7,
    )
    got = trace_ir_pallas_ensemble(
        scene.device_arrays(), SRC, LST, n_ensembles=2, rng_seed=3, **kw
    )
    singles = [
        trace_ir_pallas(
            scene.device_arrays(), SRC, LST, include_direct=False,
            rng_seed=3 * 2 + e, **kw,
        )
        for e in range(2)
    ]
    from audio_raytracing_tpu.models.ir import direct_ir

    want = 0.5 * (
        np.asarray(singles[0].energy) + np.asarray(singles[1].energy)
    ) + np.asarray(direct_ir(scene.device_arrays(), SRC, LST, cfg=CFG).energy)
    np.testing.assert_allclose(
        np.asarray(got.energy), want, rtol=0, atol=1e-6
    )
    # the two streams are genuinely different draws
    assert np.abs(
        np.asarray(singles[0].energy) - np.asarray(singles[1].energy)
    ).sum() > 0


@pytest.mark.slow
def test_wavefront_open_scene_matches_resident():
    """Escaped rays (open scene: no ceiling) freeze with alive=0 and ride
    the per-bounce sorts as dead payload — the wavefront must still match
    the resident loop exactly."""
    tris = np.asarray(box_room_subdivided(size=(10.0, 4.0, 8.0), k=8))
    # drop upward-facing triangles (ceiling): rays escape through the top
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    open_scene = Scene.from_triangles(tris[n[:, 1] > -1e-6], CFG)
    kw = dict(
        cfg=CFG, max_bounces=3,
        dirs=jnp.asarray(fibonacci_sphere_sorted(1024)), fused_hist=True,
        flat_bands=True, interpret=True, group_fori=True, sg_cull=True,
    )
    a = trace_ir_pallas(open_scene.device_arrays(), SRC, LST,
                        wavefront=False, **kw)
    b = trace_ir_pallas(open_scene.device_arrays(), SRC, LST,
                        wavefront=True, **kw)
    assert np.isfinite(np.asarray(b.energy)).all()
    np.testing.assert_allclose(
        np.asarray(b.energy), np.asarray(a.energy), rtol=0, atol=1e-7
    )
