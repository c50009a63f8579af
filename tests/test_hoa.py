"""Higher-order ambisonics: basis orthonormality, rotation correctness,
first-order compatibility with the reference pipeline, traced SH moments,
decoders."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import (
    ambisonic_ir,
    ambisonic_ir_hoa,
    fibonacci_sphere,
    trace_ir,
)
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.ops import hoa
from audio_raytracing_tpu.ops.ambisonic import rotate_ambisonic, sh_encode
from audio_raytracing_tpu.utils import quat

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)


def _rand_quats(rng, n):
    q = rng.standard_normal((n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_sh_basis_orthonormal():
    """N3D: (1/N) sum Y_m Y_n over near-uniform dirs ~= identity — at
    order 5, which also validates the closed-form degree-4/5 channels
    (r2: generic Legendre-derivative construction) against the
    hand-written 0-3 prefix."""
    dirs = fibonacci_sphere(50000)
    y = np.asarray(hoa.sh_basis(dirs, 5))  # (N, 36)
    gram = y.T @ y / y.shape[0]
    np.testing.assert_allclose(gram, np.eye(36), atol=0.015)
    np.testing.assert_array_equal(
        y[:, :16], np.asarray(hoa.sh_basis(dirs, 3))
    )


def test_sh_encode_first_order_matches_reference():
    rng = np.random.default_rng(0)
    rel = np.concatenate(
        [
            rng.uniform(-5, 5, (64, 3)),
            rng.uniform(-0.05, 0.05, (16, 3)),  # sub-threshold fade region
            np.zeros((1, 3)),
        ]
    ).astype(np.float32)
    sh_ref, d_ref = sh_encode(jnp.asarray(rel))
    sh_h, d_h = hoa.sh_encode_hoa(jnp.asarray(rel), 1)
    np.testing.assert_allclose(np.asarray(d_h), np.asarray(d_ref), rtol=1e-6)
    remapped = np.stack(
        [
            np.asarray(sh_h)[:, 0],
            np.asarray(sh_h)[:, 3],
            np.asarray(sh_h)[:, 2],
            -np.asarray(sh_h)[:, 1],
        ],
        axis=1,
    )
    np.testing.assert_allclose(remapped, np.asarray(sh_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
def test_sh_rotation_matrix_property(order):
    """Y(R u) == R_sh Y(u) for random rotations and directions."""
    rng = np.random.default_rng(1)
    quats = _rand_quats(rng, 5)
    u = fibonacci_sphere(64)
    for q in quats:
        r_sh = np.asarray(hoa.sh_rotation_matrix(jnp.asarray(q), order))
        rotated = np.asarray(
            quat.rotate(jnp.broadcast_to(jnp.asarray(q), (64, 4)), jnp.asarray(u))
        )
        want = np.asarray(hoa.sh_basis(rotated, order))
        got = np.asarray(hoa.sh_basis(u, order)) @ r_sh.T
        np.testing.assert_allclose(got, want, atol=2e-5)
        # rotations are orthogonal in the N3D basis
        np.testing.assert_allclose(
            r_sh @ r_sh.T, np.eye(hoa.n_sh(order)), atol=2e-5
        )


def test_rotate_hoa_first_order_matches_reference_rotation():
    rng = np.random.default_rng(2)
    q = jnp.asarray(_rand_quats(rng, 1)[0])
    amb_ref = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
    # reference channels [W, x, y, z] -> ACN [W, -z, y, x]
    amb_acn = jnp.stack([amb_ref[0], -amb_ref[3], amb_ref[2], amb_ref[1]])
    got = hoa.hoa_first_order_to_reference(hoa.rotate_hoa(amb_acn, q))
    want = rotate_ambisonic(amb_ref, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_max_re_weights_taper():
    w = hoa.max_re_weights(3)
    assert w.shape == (16,)
    per_order = [w[0], w[1], w[4], w[9]]
    assert per_order[0] == pytest.approx(1.0, abs=1e-6)
    assert per_order[0] > per_order[1] > per_order[2] > per_order[3] > 0


def test_speaker_decode_plane_wave_peaks_at_speaker():
    speakers = fibonacci_sphere(32)
    for weighting in (None, "max_re"):
        d = np.asarray(hoa.speaker_decoder(speakers, 3, weighting))
        for k in (0, 7, 19):
            amb = np.asarray(hoa.sh_basis(speakers[k], 3))[:, None]  # (16, 1)
            feeds = d @ amb
            assert int(np.argmax(feeds[:, 0])) == k


def test_trace_ir_sh_moments_consistent_with_dir_sum():
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), CFG)
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    dirs = jnp.asarray(fibonacci_sphere(512))
    ir = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, max_bounces=3,
                  dirs=dirs, sh_order=2)
    assert ir.sh_moments.shape == (9, CFG.ir_n_bins)
    e_mean = np.mean(np.asarray(ir.energy), axis=0)
    np.testing.assert_allclose(
        np.asarray(ir.sh_moments)[0], e_mean, rtol=1e-5, atol=1e-10
    )
    s3 = np.sqrt(3.0)
    ds = np.asarray(ir.dir_sum)
    np.testing.assert_allclose(
        np.asarray(ir.sh_moments)[1], -s3 * ds[2], rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ir.sh_moments)[2], s3 * ds[1], rtol=1e-4, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ir.sh_moments)[3], s3 * ds[0], rtol=1e-4, atol=1e-9
    )
    # plain trace leaves the field empty
    ir0 = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, max_bounces=1,
                   dirs=dirs)
    assert ir0.sh_moments is None


def test_ambisonic_ir_hoa_first_order_block():
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), CFG)
    src = jnp.asarray([1.5, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    dirs = jnp.asarray(fibonacci_sphere(512))
    ir = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, max_bounces=2,
                  dirs=dirs, sh_order=3)
    amb_h = np.asarray(ambisonic_ir_hoa(ir))
    amb_1 = np.asarray(ambisonic_ir(ir))
    assert amb_h.shape == (16, CFG.ir_n_bins)
    np.testing.assert_allclose(amb_h[0], amb_1[0], rtol=1e-4, atol=1e-8)
    # first-order block matches (the moment-mean direction is <= unit norm,
    # so ambisonic_ir's clamp is inactive up to fp noise)
    np.testing.assert_allclose(amb_h[3], amb_1[1], rtol=1e-3, atol=2e-6)
    np.testing.assert_allclose(amb_h[2], amb_1[2], rtol=1e-3, atol=2e-6)
    np.testing.assert_allclose(-amb_h[1], amb_1[3], rtol=1e-3, atol=2e-6)


def test_render_ir_offline_hoa_and_speakers():
    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=1024)
    scene = Scene.from_triangles(box_room(size=(8.0, 3.0, 6.0)), cfg)
    rng = np.random.default_rng(4)
    snd = (0.2 * rng.standard_normal(512)).astype(np.float32)
    # a source to the listener's right (+z)
    sources = [{"samples": snd, "pos": (0.0, 0.0, 2.0), "gain": 1.0}]
    out = render_ir_offline(
        scene, sources, (0.0, 0.0, 0.0), cfg=cfg, n_rays=256, max_bounces=1,
        sh_order=2,
    )
    assert out.shape == (512 + 1024 - 1 + 127, 2)  # +127: HRTF taps - 1
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    # right ear should carry more energy than the left
    assert (out[:, 1] ** 2).sum() > (out[:, 0] ** 2).sum()

    speakers = fibonacci_sphere(16)
    feeds = render_ir_offline(
        scene, sources, (0.0, 0.0, 0.0), cfg=cfg, n_rays=256, max_bounces=1,
        sh_order=2, speaker_dirs=speakers,
    )
    assert feeds.shape == (512 + 1024 - 1, 16)
    # the loudest feed points toward the source (+z)
    loudest = int(np.argmax((feeds**2).sum(axis=0)))
    assert speakers[loudest][2] > 0.5


def test_hoa_to_stereo_shapes():
    rng = np.random.default_rng(3)
    amb = jnp.asarray(rng.standard_normal((16, 200)).astype(np.float32))
    irs_l = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    irs_r = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    out = hoa.hoa_to_stereo(amb, irs_l, irs_r)
    assert out.shape == (200 + 16 - 1, 2)


def test_hoa_truncate_weighting_only_when_dropping():
    """An order-1 bed passes through hoa_truncate(_, 1) unchanged (no
    spurious max-rE attenuation vs the reference pipeline); order-0 beds
    pad silent XYZ instead of raising."""
    rng = np.random.default_rng(5)
    amb1 = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(hoa.hoa_truncate(amb1, 1)), np.asarray(amb1)
    )
    amb3 = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    w = hoa.max_re_weights(1)
    np.testing.assert_allclose(
        np.asarray(hoa.hoa_truncate(amb3, 1)),
        np.asarray(amb3[:4]) * w[:, None], rtol=1e-6,
    )
    amb0 = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
    foa = np.asarray(hoa.hoa_to_reference_foa(amb0))
    np.testing.assert_array_equal(foa[0], np.asarray(amb0[0]))
    assert (foa[1:] == 0).all()


def test_render_ir_offline_order0_and_order1():
    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=1024)
    scene = Scene.from_triangles(box_room(size=(8.0, 3.0, 6.0)), cfg)
    snd = (0.2 * np.random.default_rng(6).standard_normal(256)).astype(np.float32)
    sources = [{"samples": snd, "pos": (0.0, 0.0, 2.0), "gain": 1.0}]
    # order 0: W-only omni bed renders (no crash), both ears equal
    out0 = render_ir_offline(scene, sources, (0.0, 0.0, 0.0), cfg=cfg,
                             n_rays=128, max_bounces=1, sh_order=0)
    assert np.isfinite(out0).all() and np.abs(out0).max() > 0
    # W-only bed: same-ballpark ear energies (the MagLS W filters are
    # per-ear optimized, not symmetric — measured ratio ~1.3)
    e_l, e_r = float((out0[:, 0] ** 2).sum()), float((out0[:, 1] ** 2).sum())
    assert 0.5 < e_l / e_r < 2.0
    # order 1 carries the same information as the default first-order path:
    # no max-rE attenuation applies (same trace, different bed assembly)
    out1 = render_ir_offline(scene, sources, (0.0, 0.0, 0.0), cfg=cfg,
                             n_rays=128, max_bounces=1, sh_order=1)
    outd = render_ir_offline(scene, sources, (0.0, 0.0, 0.0), cfg=cfg,
                             n_rays=128, max_bounces=1)
    e1 = float((out1**2).sum())
    ed = float((outd**2).sum())
    assert 0.9 < e1 / ed < 1.1


# ---------------------------------------------------------------------------
# rigid-sphere HOA binaural bank (data/hrtf_hoa_sphere.npz)
# ---------------------------------------------------------------------------

def test_sphere_bank_reconstructs_sphere_hrtf():
    """Decoding an encoded point source through the order-N bank must
    reproduce the analytic rigid-sphere transfer magnitude (< ~2 dB mean
    across the band at order 3 — the MagLS fit quality)."""
    import importlib.util as ilu
    from pathlib import Path

    from audio_raytracing_tpu.ops.hoa import hoa_binaural_bank, sh_basis

    tool = Path(__file__).parents[1] / "tools" / "make_hoa_hrtf.py"
    spec = ilu.spec_from_file_location("mkhrtf", tool)
    mk = ilu.module_from_spec(spec)
    spec.loader.exec_module(mk)

    freqs = np.fft.rfftfreq(mk.N_TAPS, 1.0 / mk.SAMPLE_RATE)
    mu = 2 * np.pi * np.maximum(freqs, 1.0) / mk.C_AIR * mk.HEAD_RADIUS
    az = np.radians(mk.EAR_AZ_DEG)
    e_l = np.array([np.cos(az), 0.0, -np.sin(az)])
    u = np.array([0.55, 0.2, -0.81])
    u /= np.linalg.norm(u)
    h_true = np.abs(mk.sphere_hrtf(mu, np.array([u @ e_l]))[0])

    for order, tol_mean in ((1, 1.5), (2, 1.0), (3, 1.0), (4, 1.0), (5, 1.0)):
        bl, _ = hoa_binaural_bank(order)
        y = np.asarray(sh_basis(u.astype(np.float32), order))
        ir = (y[:, None] * np.asarray(bl)).sum(axis=0)
        mag = np.abs(np.fft.rfft(ir))
        err = np.abs(20 * np.log10(np.maximum(mag[1:60], 1e-9) / h_true[1:60]))
        assert err.mean() < tol_mean, (order, err.mean(), err.max())


def test_sphere_bank_lateralization_and_symmetry():
    """A source on the right (+z) is louder in the right ear at every
    order, and mirroring the source across the median plane swaps ears."""
    from audio_raytracing_tpu.ops.hoa import hoa_to_stereo_sphere, sh_basis

    n = 512
    click = np.zeros(n, np.float32)
    click[0] = 1.0
    for order in (1, 2, 3):
        for u in ([0.0, 0.0, 1.0], [0.5, 0.3, 0.81]):
            u = np.asarray(u) / np.linalg.norm(u)
            y = np.asarray(sh_basis(u.astype(np.float32), order))
            amb = y[:, None] * click[None, :]
            out = np.asarray(hoa_to_stereo_sphere(amb, order))
            el, er = float(np.sum(out[:, 0] ** 2)), float(np.sum(out[:, 1] ** 2))
            assert er > el * 1.2, (order, u, el, er)
            # mirror: z -> -z swaps ears (to MagLS fit accuracy: the
            # fibonacci fit directions are not z-symmetric)
            um = u * np.asarray([1.0, 1.0, -1.0])
            ym = np.asarray(sh_basis(um.astype(np.float32), order))
            outm = np.asarray(hoa_to_stereo_sphere(ym[:, None] * click[None, :], order))
            np.testing.assert_allclose(outm[:, 0], out[:, 1], atol=5e-3)
            np.testing.assert_allclose(outm[:, 1], out[:, 0], atol=5e-3)


def test_sphere_bank_offline_and_stream_agree():
    """render_ir_offline(hoa_hrtf='sphere') is finite, differs from the
    truncated decode, and the streaming renderer reproduces it at a static
    pose."""
    import dataclasses

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.engine.ir_stream import IRStreamRenderer
    from audio_raytracing_tpu.engine.renderer import render_ir_offline
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_bounces=3
    )
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), cfg,
        absorption=np.full(12, 0.3, np.float32),
    )
    n = 1024
    dry = (0.4 * np.sin(2 * np.pi * 330 * np.arange(n) / 44100)).astype(np.float32)
    srcs = [{"samples": dry, "pos": [1.5, 0.5, 1.0]}]
    lst = [-1.0, 0.0, -1.0]

    sphere = render_ir_offline(scene, srcs, lst, listener_yaw=0.4, cfg=cfg,
                               sh_order=2, hoa_hrtf="sphere")
    trunc = render_ir_offline(scene, srcs, lst, listener_yaw=0.4, cfg=cfg,
                              sh_order=2)
    assert np.isfinite(sphere).all()
    assert np.abs(sphere).max() > 1e-4
    assert np.abs(sphere[: len(trunc)] - trunc).max() > 1e-4  # different decode

    r = IRStreamRenderer(scene, cfg, sh_order=2, hoa_hrtf="sphere")
    r.add_source(dry, pos=[1.5, 0.5, 1.0], loop=False)
    r.update(lst, yaw=0.4)
    got = r.render(n)
    np.testing.assert_allclose(got, sphere[:n], rtol=1e-3, atol=1e-5)


def test_render_ir_offline_order5_sphere_bank():
    """End-to-end smoke at the new top order: trace with sh_order=5,
    decode binaurally through the order-5 rigid-sphere MagLS bank
    (hoa_hrtf="sphere"), lateralization preserved."""
    from audio_raytracing_tpu.engine.renderer import render_ir_offline

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=1024)
    scene = Scene.from_triangles(box_room(size=(8.0, 3.0, 6.0)), cfg)
    rng = np.random.default_rng(5)
    snd = (0.2 * rng.standard_normal(512)).astype(np.float32)
    sources = [{"samples": snd, "pos": (0.0, 0.0, 2.0), "gain": 1.0}]
    out = render_ir_offline(
        scene, sources, (0.0, 0.0, 0.0), cfg=cfg, n_rays=256, max_bounces=1,
        sh_order=5, hoa_hrtf="sphere",
    )
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    assert (out[:, 1] ** 2).sum() > (out[:, 0] ** 2).sum()
