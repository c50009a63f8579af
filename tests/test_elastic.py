"""Multi-slice mesh + checkpoint/resume (parallel/elastic.py), on the
8-virtual-device CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.parallel.elastic import (
    dcn_ray_mesh,
    trace_ir_checkpointed,
    trace_ir_multislice,
)

CFG = dataclasses.replace(
    DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_bounces=3
)
SRC = jnp.asarray([1.0, 0.5, 0.5])
LST = jnp.asarray([-1.0, -0.5, -1.0])


@pytest.fixture(scope="module")
def scene():
    return Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), CFG)


def _reference(scene):
    dirs = jnp.asarray(fibonacci_sphere(512))
    return trace_ir(scene.device_arrays(), SRC, LST, cfg=CFG, dirs=dirs)


def test_multislice_matches_single_device(scene):
    mesh = dcn_ray_mesh(8, n_slices=2)
    assert dict(mesh.shape) == {"dcn": 2, "rays": 4}
    got = trace_ir_multislice(scene.device_arrays(), SRC, LST, mesh, cfg=CFG)
    want = _reference(scene)
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(want.energy), rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.dir_sum), np.asarray(want.dir_sum), rtol=1e-4, atol=1e-9
    )


def test_checkpointed_matches_unchunked(scene, tmp_path):
    ck = tmp_path / "trace.npz"
    got = trace_ir_checkpointed(
        scene.device_arrays(), SRC, LST, ck, n_chunks=4, cfg=CFG
    )
    want = _reference(scene)
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(want.energy), rtol=1e-5, atol=1e-9
    )
    assert not ck.exists()  # cleaned up on completion


def test_checkpoint_resume_after_preemption(scene, tmp_path):
    ck = tmp_path / "trace.npz"
    calls = []

    class Preempted(RuntimeError):
        pass

    def tracer_dying_after(n):
        def tr(*args, **kwargs):
            if len(calls) >= n:
                raise Preempted()
            calls.append(kwargs["include_direct"])
            return trace_ir(*args, **kwargs)

        return tr

    with pytest.raises(Preempted):
        trace_ir_checkpointed(
            scene.device_arrays(), SRC, LST, ck, n_chunks=4, cfg=CFG,
            _trace_fn=tracer_dying_after(2),
        )
    assert ck.exists() and len(calls) == 2
    blob = np.load(ck)
    assert int(blob["next_chunk"]) == 2

    # resume: only the remaining 2 chunks run, result matches unchunked
    calls.clear()
    got = trace_ir_checkpointed(
        scene.device_arrays(), SRC, LST, ck, n_chunks=4, cfg=CFG,
        _trace_fn=tracer_dying_after(10),
    )
    assert len(calls) == 2
    assert calls == [False, False]  # direct term not re-added on resume
    want = _reference(scene)
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(want.energy), rtol=1e-5, atol=1e-9
    )
    assert not ck.exists()


def test_checkpoint_rejects_mismatched_parameters(scene, tmp_path):
    ck = tmp_path / "trace.npz"

    class Stop(RuntimeError):
        pass

    state = {"n": 0}

    def tr(*args, **kwargs):
        state["n"] += 1
        if state["n"] > 1:
            raise Stop()
        return trace_ir(*args, **kwargs)

    with pytest.raises(Stop):
        trace_ir_checkpointed(
            scene.device_arrays(), SRC, LST, ck, n_chunks=4, cfg=CFG, _trace_fn=tr
        )
    with pytest.raises(ValueError):
        trace_ir_checkpointed(
            scene.device_arrays(), SRC, jnp.asarray([9.0, 9.0, 9.0]), ck,
            n_chunks=4, cfg=CFG,
        )


@pytest.mark.slow
def test_checkpointed_pallas_matches_unchunked(scene, tmp_path):
    """intersector="pallas": preemptible tracing on the fused kernel —
    chunked+checkpointed accumulation must match one unchunked kernel
    call on the same sorted direction set (chunk sums reassociate the
    binning adds -> tiny f32 tolerance)."""
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
    from audio_raytracing_tpu.ops import pallas_trace as pt

    cfg = dataclasses.replace(CFG, rays_per_source=2048)
    orig = pt.trace_ir_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    pt.trace_ir_pallas = interp
    try:
        got = trace_ir_checkpointed(
            scene.device_arrays(), SRC, LST, tmp_path / "ck.npz",
            n_chunks=2, cfg=cfg, intersector="pallas",
        )
    finally:
        pt.trace_ir_pallas = orig
    want = orig(
        scene.device_arrays(), SRC, LST, cfg=cfg,
        dirs=jnp.asarray(fibonacci_sphere_sorted(2048)), fused_hist=True,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(want.energy), rtol=0, atol=2e-6
    )
