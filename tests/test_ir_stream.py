"""Streaming IR renderer (config 4): moving listener, re-trace, crossfade."""

import dataclasses

import numpy as np
import pytest

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.engine.ir_stream import IRStreamRenderer
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG = dataclasses.replace(
    DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_bounces=3
)


def make_scene():
    return Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )


def test_stream_renders_and_reacts_to_movement(rng):
    scene = make_scene()
    r = IRStreamRenderer(scene, CFG)
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / 44100)).astype(np.float32)
    r.add_source(tone, pos=[2.0, 0.0, 1.0])
    r.update([0.0, 0.0, 0.0])
    a = r.render(512)
    assert a.shape == (512, 2) and np.isfinite(a).all()
    assert np.abs(a).max() > 1e-6
    # moving much closer increases level after re-trace
    r.update([1.8, 0.0, 0.9])
    _ = r.render(1024)  # settle through the new IR's direct path
    b = r.render(1024)
    r.update([-3.0, -1.0, -2.5])
    _ = r.render(1024)
    c = r.render(1024)
    assert np.abs(b).mean() > np.abs(c).mean()


def test_rotation_only_update_skips_retrace():
    """Pure rotation reuses the cached ambisonic IRs (no re-trace) and
    produces exactly the spectra a full-trace update would."""
    scene = make_scene()
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / 44100)).astype(np.float32)

    a = IRStreamRenderer(scene, CFG)
    a.add_source(tone, pos=[2.0, 0.0, 1.0])
    a.update([0.0, 0.0, 0.0], yaw=0.0)
    assert a.last_update_retraced
    a.update([0.0, 0.0, 0.0], yaw=0.7)  # rotation only
    assert not a.last_update_retraced

    b = IRStreamRenderer(scene, CFG)
    b.add_source(tone, pos=[2.0, 0.0, 1.0])
    b.update([0.0, 0.0, 0.0], yaw=0.7)  # full trace at the same pose
    assert b.last_update_retraced
    for ga, gb in zip(a._spectra, b._spectra):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6, atol=1e-9)

    # identical pose+orientation: no-op, no crossfade scheduled
    a._pending_fade = False
    a.update([0.0, 0.0, 0.0], yaw=0.7)
    assert not a._pending_fade and not a.last_update_retraced

    # translation re-traces; moving a source re-traces too
    a.update([0.1, 0.0, 0.0], yaw=0.7)
    assert a.last_update_retraced
    a.set_source_pos(0, [1.0, 0.5, 0.5])
    a.update([0.1, 0.0, 0.0], yaw=0.7)
    assert a.last_update_retraced


def test_stream_matches_static_offline():
    """With a static pose, streamed blocks equal the offline IR render."""
    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    scene = make_scene()
    n = 1024
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [1.5, 0.5, 1.0]
    lst = [-1.0, 0.0, -1.0]

    r = IRStreamRenderer(scene, CFG)
    r.add_source(dry, pos=pos, loop=False)
    r.update(lst, yaw=0.4)
    got = r.render(n)

    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos}], lst, listener_yaw=0.4, cfg=CFG
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_crossfade_continuity():
    """An update mid-stream must not produce a discontinuity larger than
    the block-to-block variation of the signal itself."""
    scene = make_scene()
    r = IRStreamRenderer(scene, CFG)
    tone = (0.5 * np.sin(2 * np.pi * 220 * np.arange(4000) / 44100)).astype(np.float32)
    r.add_source(tone, pos=[2.0, 0.0, 1.0])
    r.update([0.0, 0.0, 0.0])
    pre = r.render(512)
    r.update([0.2, 0.0, 0.0])  # small move -> similar IR
    post = r.render(512)
    stream = np.concatenate([pre, post])
    jumps = np.abs(np.diff(stream[:, 0]))
    boundary = jumps[510:514].max()
    typical = np.percentile(jumps, 99)
    assert boundary < 10 * typical + 1e-4


def test_short_looping_source_wraps_at_own_length():
    """A looping source shorter than the arena must wrap at ITS length,
    not play the zero padding of the longest source (regression)."""
    scene = make_scene()
    r = IRStreamRenderer(scene, CFG)
    short = (0.5 * np.sin(2 * np.pi * 880 * np.arange(300) / 44100)).astype(np.float32)
    long_ = (0.3 * np.sin(2 * np.pi * 220 * np.arange(8000) / 44100)).astype(np.float32)
    r.add_source(short, pos=[2.0, 0.0, 1.0])
    r.add_source(long_, pos=[-2.0, 0.0, 1.0], gain=0.0)  # silent, sets arena len
    r.update([0.0, 0.0, 0.0])
    out = r.render(4096)
    # with the bug, samples beyond index 300 of each arena cycle are silent:
    # the window [512, 4096) would be ~all-zero; with the fix it is audible
    assert np.abs(out[512:]).max() > 1e-5


def test_speaker_rig_streaming():
    """speaker_dirs mode: (B, n_spk) feeds, loudest speaker faces the
    source, static-pose stream matches the offline speaker decode."""
    from audio_raytracing_tpu.models.ir import ambisonic_ir, fibonacci_sphere, trace_ir
    from audio_raytracing_tpu.ops.hoa import speaker_decoder_foa_reference

    import jax.numpy as jnp

    scene = make_scene()
    speakers = np.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float32,
    )
    r = IRStreamRenderer(scene, CFG, speaker_dirs=speakers)
    tone = (0.5 * np.sin(2 * np.pi * 330 * np.arange(4000) / 44100)).astype(np.float32)
    r.add_source(tone, pos=[2.5, 0.0, 0.0])  # straight ahead (+x)
    r.update([0.0, 0.0, 0.0])
    out = r.render(2048)
    assert out.shape == (2048, 6) and np.isfinite(out).all()
    energies = (out**2).sum(axis=0)
    assert int(np.argmax(energies)) == 0  # the +x speaker

    # static pose: streaming equals direct convolution of the dry signal
    # with the decoded speaker IRs
    ir = trace_ir(scene.device_arrays(), jnp.asarray([2.5, 0.0, 0.0]),
                  jnp.asarray([0.0, 0.0, 0.0]), cfg=CFG,
                  dirs=jnp.asarray(fibonacci_sphere(CFG.rays_per_source)))
    amb = np.asarray(ambisonic_ir(ir))
    d = np.asarray(speaker_decoder_foa_reference(speakers))
    spk_irs = d @ amb  # (6, L)
    # looped dry signal: reconstruct the first 2048 samples of the stream
    loop = np.tile(tone, 2048 // len(tone) + 2)[:2048]
    for k in range(6):
        want = np.convolve(loop, spk_irs[k])[:2048]
        np.testing.assert_allclose(out[:, k], want, atol=5e-4)


def test_hoa_stream_matches_static_offline():
    """sh_order=2 streaming: static-pose blocks equal the offline HOA
    render (binaural decode chain shared end to end)."""
    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    scene = make_scene()
    n = 1024
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [1.5, 0.5, 1.0]
    lst = [-1.0, 0.0, -1.0]

    r = IRStreamRenderer(scene, CFG, sh_order=2)
    r.add_source(dry, pos=pos, loop=False)
    r.update(lst, yaw=0.4)
    got = r.render(n)
    assert got.shape == (n, 2) and np.isfinite(got).all()

    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos}], lst, listener_yaw=0.4,
        cfg=CFG, sh_order=2,
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_hoa_speaker_stream_matches_static_offline():
    """sh_order=2 + speaker rig: order-2 mode-matching decode, feeds match
    the offline speaker render; rotation-only updates still skip re-trace."""
    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    scene = make_scene()
    speakers = np.asarray(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
         [0.577, 0.577, 0.577], [-0.577, 0.577, -0.577],
         [0.577, -0.577, -0.577]],
        np.float32,
    )
    n = 1024
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [2.0, 0.0, 0.5]
    lst = [0.0, 0.0, 0.0]

    r = IRStreamRenderer(scene, CFG, speaker_dirs=speakers, sh_order=2)
    r.add_source(dry, pos=pos, loop=False)
    r.update(lst, yaw=0.2)
    got = r.render(n)
    assert got.shape == (n, len(speakers)) and np.isfinite(got).all()

    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos}], lst, listener_yaw=0.2,
        cfg=CFG, sh_order=2, speaker_dirs=speakers,
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    # rotation-only: cached HOA IRs, spectra equal a fresh full trace
    r.update(lst, yaw=0.9)
    assert not r.last_update_retraced
    fresh = IRStreamRenderer(scene, CFG, speaker_dirs=speakers, sh_order=2)
    fresh.add_source(dry, pos=pos, loop=False)
    fresh.update(lst, yaw=0.9)
    for ga, gb in zip(r._spectra, fresh._spectra):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-6, atol=1e-9)


def test_stream_directivity_matches_offline_and_invalidates():
    """Per-source directivity flows into the stream trace (static-pose
    equivalence vs render_ir_offline) and changing it re-traces."""
    from audio_raytracing_tpu.engine.renderer import render_ir_offline
    from audio_raytracing_tpu.models.directivity import Directivity

    scene = make_scene()
    n = 1024
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [1.5, 0.5, 1.0]
    lst = [-1.0, 0.0, -1.0]
    d = Directivity(axis=(-1.0, 0.0, -0.5), alpha=0.5)

    r = IRStreamRenderer(scene, CFG)
    r.add_source(dry, pos=pos, loop=False, directivity=d)
    r.update(lst, yaw=0.4)
    got = r.render(n)
    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos, "directivity": d}], lst,
        listener_yaw=0.4, cfg=CFG,
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    # changing the pattern is a trace-cache invalidation (like motion)
    r.set_source_directivity(0, Directivity(axis=(1.0, 0.0, 0.5), alpha=0.5))
    r.update(lst, yaw=0.4)
    assert r.last_update_retraced
    # same pattern again: rotation-only path still works
    r.update(lst, yaw=0.5)
    assert not r.last_update_retraced


def test_stream_ir_fn_hybrid_matches_offline():
    """The ir_fn model hook streams alternate families: a hybrid-model
    stream equals the offline render with the same ir_fn."""
    import jax

    from audio_raytracing_tpu.engine.renderer import render_ir_offline
    from audio_raytracing_tpu.models.ism import hybrid_ir

    scene = make_scene()
    n = 1024
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [1.5, 0.5, 1.0]
    lst = [-1.0, 0.0, -1.0]

    def ir_fn(arrays, p, l):
        return hybrid_ir(arrays, p, l, cfg=CFG, order=1, n_rays=256,
                         max_bounces=2, scattering=0.3,
                         key=jax.random.PRNGKey(0))

    r = IRStreamRenderer(scene, CFG, ir_fn=ir_fn)
    r.add_source(dry, pos=pos, loop=False)
    r.update(lst, yaw=0.4)
    got = r.render(n)
    want = render_ir_offline(
        scene, [{"samples": dry, "pos": pos}], lst, listener_yaw=0.4,
        cfg=CFG, ir_fn=ir_fn,
    )[:n]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    # sh_order + ir_fn is rejected
    import pytest

    with pytest.raises(ValueError, match="ir_fn"):
        IRStreamRenderer(scene, CFG, ir_fn=ir_fn, sh_order=2)


@pytest.mark.slow
def test_stream_pallas_intersector():
    """intersector='pallas' streams through the fused kernel: static-pose
    output matches the mt stream within the bf16 binner tolerance."""
    scene = make_scene()
    n = 1024
    t = np.arange(n) / 44100
    dry = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    pos = [1.5, 0.5, 1.0]
    lst = [-1.0, 0.0, -1.0]
    import dataclasses as _dc

    cfg = _dc.replace(CFG, rays_per_source=1024)
    a = IRStreamRenderer(scene, cfg)
    a.add_source(dry, pos=pos, loop=False)
    a.update(lst, yaw=0.4)
    want = a.render(n)
    b = IRStreamRenderer(scene, cfg, intersector="pallas",
                         pallas_interpret=True)
    b.add_source(dry, pos=pos, loop=False)
    b.update(lst, yaw=0.4)
    got = b.render(n)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale)
    # sh_order is kernel-unsupported
    import pytest

    with pytest.raises(ValueError, match="pallas"):
        IRStreamRenderer(scene, cfg, intersector="pallas", sh_order=2)
