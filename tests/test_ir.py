"""IR tracer + partitioned convolution tests: analytic single-wall cases,
energy behavior, streaming-vs-offline convolution equivalence."""

import numpy as np

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import ambisonic_ir, band_irs, fibonacci_sphere, trace_ir
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.ops import conv_partitioned as cp
from audio_raytracing_tpu.ops.eq import EQ_FREQS

import dataclasses

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096, rays_per_source=512, max_bounces=3)


def wall_scene(x=3.0, absorption=0.1):
    tris = np.float32(
        [
            [[x, -50, -50], [x, 50, -50], [x, 50, 50]],
            [[x, -50, -50], [x, 50, 50], [x, -50, 50]],
        ]
    )
    return Scene.from_triangles(tris, CFG, absorption=np.full((2,), absorption, np.float32))


def test_fibonacci_sphere_uniform():
    d = fibonacci_sphere(1000)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-5)
    # near-zero mean for a uniform distribution
    assert np.linalg.norm(d.mean(axis=0)) < 0.01


def test_direct_path_energy_and_bin():
    scene = wall_scene()
    src = jnp.asarray([0.0, 0.0, 0.0])
    lst = jnp.asarray([1.0, 0.0, 0.0])
    ir = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=64, max_bounces=1)
    e = np.asarray(ir.energy)  # (4, n_bins)
    spm = CFG.samples_per_meter
    b_direct = int(1.0 * spm + 0.5)
    amp = 1.0 / 2.0 * np.clip(1.0 - 1e-5 * 1.0 * EQ_FREQS, 0, 1)
    np.testing.assert_allclose(e[:, b_direct], amp * amp, rtol=1e-4)
    # nothing earlier than the direct sound
    assert e[:, :b_direct].sum() == 0.0


def test_single_bounce_delay_floor():
    scene = wall_scene(x=3.0)
    src = jnp.asarray([0.0, 0.0, 0.0])
    lst = jnp.asarray([1.0, 0.0, 0.0])
    ir = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048, max_bounces=1)
    e = np.asarray(ir.energy).mean(axis=0)
    spm = CFG.samples_per_meter
    b_direct = int(1.0 * spm + 0.5)
    # shortest reflected path: 3 (to wall) + 2 (back to listener) = 5 m
    b_min_refl = int(5.0 * spm)
    mid = e[b_direct + 1 : b_min_refl - 2]
    assert mid.sum() < 1e-10  # silence between direct and first reflection
    assert e[b_min_refl - 2 :].sum() > 0  # reflections arrive


def test_absorption_scales_bounce_energy():
    src = jnp.asarray([0.0, 0.0, 0.0])
    lst = jnp.asarray([1.0, 0.0, 0.0])
    out = []
    for a in (0.0, 0.75):
        scene = wall_scene(absorption=a)
        ir = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=512, max_bounces=1)
        e = np.asarray(ir.energy).mean(axis=0)
        b_direct = int(1.0 * CFG.samples_per_meter + 0.5)
        out.append(e[b_direct + 4 :].sum())  # bounce-only energy
    # energy multiplier is (1 - a): 0.25 of the unabsorbed energy
    np.testing.assert_allclose(out[1] / out[0], 0.25, rtol=1e-3)


def test_direct_arrival_direction():
    scene = wall_scene()
    src = jnp.asarray([0.0, 0.0, 0.0])
    lst = jnp.asarray([1.0, 0.0, 0.0])
    ir = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=64, max_bounces=1)
    amb = np.asarray(ambisonic_ir(ir))
    b_direct = int(1.0 * CFG.samples_per_meter + 0.5)
    w = amb[0, b_direct]
    assert w > 0
    # source is at -x from the listener: X channel = -sqrt(3) * W
    np.testing.assert_allclose(amb[1, b_direct], -np.sqrt(3.0) * w, rtol=1e-4)
    np.testing.assert_allclose(amb[2:, b_direct], 0.0, atol=1e-7)


def test_box_room_reverb_tail_decays():
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), CFG,
                                 absorption=np.full(12, 0.3, np.float32))
    src = jnp.asarray([1.5, 0.5, 1.0])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    ir = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=4096, max_bounces=8)
    e = np.asarray(ir.energy).mean(axis=0)
    assert e.sum() > 0
    # later quarters carry less energy than the early ones
    q = e.reshape(4, -1).sum(axis=1)
    assert q[0] > q[2] > 0
    assert q[3] < q[1]
    b = np.asarray(band_irs(ir))
    assert b.shape == (4, CFG.ir_n_bins)


# ---------------------------------------------------------------------------
# partitioned convolution
# ---------------------------------------------------------------------------


def test_partitioned_conv_matches_numpy(rng):
    B = 128
    L = 1000
    ir = rng.standard_normal(L).astype(np.float32)
    x = rng.standard_normal(8 * B).astype(np.float32)
    spectra = cp.partition_ir(jnp.asarray(ir), B)
    state = cp.conv_init((), spectra.shape[0], B)
    got = []
    for b in range(8):
        y, state = cp.conv_block(jnp.asarray(x[b * B : (b + 1) * B]), state, spectra)
        got.append(np.asarray(y))
    got = np.concatenate(got)
    want = np.convolve(x, ir)[: 8 * B]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_partitioned_conv_batched_channels(rng):
    B = 64
    ir = rng.standard_normal((2, 300)).astype(np.float32)
    x = rng.standard_normal((2, 4 * B)).astype(np.float32)
    spectra = cp.partition_ir(jnp.asarray(ir), B)
    state = cp.conv_init((2,), spectra.shape[1], B)
    got = []
    for b in range(4):
        y, state = cp.conv_block(jnp.asarray(x[:, b * B : (b + 1) * B]), state, spectra)
        got.append(np.asarray(y))
    got = np.concatenate(got, axis=1)
    for c in range(2):
        want = np.convolve(x[c], ir[c])[: 4 * B]
        np.testing.assert_allclose(got[c], want, rtol=1e-3, atol=1e-4)


def test_crossfade_endpoints(rng):
    B = 128
    ir_a = rng.standard_normal(256).astype(np.float32)
    ir_b = rng.standard_normal(256).astype(np.float32)
    x = rng.standard_normal(B).astype(np.float32)
    sa = cp.partition_ir(jnp.asarray(ir_a), B)
    sb = cp.partition_ir(jnp.asarray(ir_b), B)
    state = cp.conv_init((), sa.shape[0], B)
    y_fade, _ = cp.conv_block_crossfade(jnp.asarray(x), state, sa, sb)
    y_a, _ = cp.conv_block(jnp.asarray(x), state, sa)
    y_b, _ = cp.conv_block(jnp.asarray(x), state, sb)
    y_fade, y_a, y_b = (np.asarray(v) for v in (y_fade, y_a, y_b))
    # fade starts (almost) at old IR and ends at new IR
    w = (np.arange(B) + 1.0) / B
    np.testing.assert_allclose(y_fade, y_a * (1 - w) + y_b * w, rtol=1e-4, atol=1e-6)


def test_binaural_ir_spectra_roundtrip(rng, ):
    # render an impulse through binaural spectra == offline amb conv + hrtf
    from audio_raytracing_tpu.engine.system import default_hrtf
    from audio_raytracing_tpu.utils import quat

    hl, hr = default_hrtf()
    B = 128
    amb_ir = rng.standard_normal((4, 512)).astype(np.float32) * np.exp(
        -np.arange(512, dtype=np.float32) / 100.0
    )
    orient = quat.quat_from_roll_pitch_yaw(0.2, 1.1, 0.0)
    spectra = cp.binaural_ir_spectra(
        jnp.asarray(amb_ir), jnp.asarray(orient), jnp.asarray(hl), jnp.asarray(hr), B
    )
    # stream an impulse + silence through it
    state = cp.conv_init((2,), spectra.shape[1], B)
    x = np.zeros((2, B), np.float32)
    x[:, 0] = 1.0
    got = []
    st = state
    blocks = 6
    for b in range(blocks):
        y, st = cp.conv_block(jnp.asarray(x if b == 0 else np.zeros_like(x)), st, spectra)
        got.append(np.asarray(y))
    got = np.concatenate(got, axis=1)  # (2, blocks*B) = the combined IR
    # reference: rotate channels then full conv with hrtf
    xyz = amb_ir[1:4].T
    rot = quat.rotate(np.asarray(orient)[None, :], xyz).T
    amb_rot = np.concatenate([amb_ir[:1], rot], axis=0)
    want_l = sum(np.convolve(amb_rot[c], hl[c]) for c in range(4))
    want_r = sum(np.convolve(amb_rot[c], hr[c]) for c in range(4))
    n = min(got.shape[1], len(want_l))
    np.testing.assert_allclose(got[0, :n], want_l[:n], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got[1, :n], want_r[:n], rtol=1e-3, atol=1e-4)


def test_intersector_backends_agree():
    """MXU Woop path vs exact MT path: same histograms (within fp tolerance)."""
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), CFG,
                                 absorption=np.full(12, 0.2, np.float32))
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    a = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048,
                 max_bounces=4, intersector="mt")
    b = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048,
                 max_bounces=4, intersector="mxu")
    ea, eb = np.asarray(a.energy), np.asarray(b.energy)
    # identical support and near-identical values (boundary-eps rays may
    # differ); compare total and per-bin with a small tolerance
    np.testing.assert_allclose(eb.sum(), ea.sum(), rtol=1e-3)
    np.testing.assert_allclose(eb, ea, rtol=1e-2, atol=1e-7)


def test_scatter_backends_agree():
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), CFG,
                                 absorption=np.full(12, 0.2, np.float32))
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    a = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048,
                 max_bounces=4, scatter="segment")
    b = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048,
                 max_bounces=4, scatter="matmul")
    # the matmul binner materializes its one-hot product in bf16 (documented
    # ~1% bound, far below the Monte-Carlo noise floor)
    np.testing.assert_allclose(
        np.asarray(b.energy), np.asarray(a.energy), rtol=2e-2, atol=1e-8
    )
    np.testing.assert_allclose(
        float(b.energy.sum()), float(a.energy.sum()), rtol=2e-3
    )


def test_diffuse_scattering_model():
    """The stochastic hybrid model: scattering=0 equals the specular path;
    scattering>0 is deterministic per key and redistributes (not destroys)
    energy."""
    import jax

    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), CFG,
                                 absorption=np.full(12, 0.2, np.float32))
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    spec = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048, max_bounces=4)
    spec0 = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048,
                     max_bounces=4, scattering=0.0, key=jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(spec.energy), np.asarray(spec0.energy))

    k = jax.random.key(7)
    d1 = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048,
                  max_bounces=4, scattering=0.7, key=k)
    d2 = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=2048,
                  max_bounces=4, scattering=0.7, key=k)
    np.testing.assert_array_equal(np.asarray(d1.energy), np.asarray(d2.energy))
    e_spec = float(spec.energy.sum())
    e_diff = float(d1.energy.sum())
    assert np.isfinite(e_diff) and e_diff > 0
    # same order of magnitude (scattering redirects, absorption unchanged)
    assert 0.2 < e_diff / e_spec < 5.0
    # but a different arrival-time distribution
    assert not np.allclose(np.asarray(d1.energy), np.asarray(spec.energy))


def test_golden_ir_world(world_obj_path):
    """Golden-IR regression on world.obj: guards the acoustic semantics
    against drift across refactors (regenerate deliberately via the
    snippet in tests/golden/ if the model is intentionally changed)."""
    from pathlib import Path

    golden_path = Path(__file__).parent / "golden" / "world_ir.npz"
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096,
                              rays_per_source=4096, max_bounces=4)
    scene = Scene.from_obj(world_obj_path, cfg)
    ir = trace_ir(scene.device_arrays(), jnp.asarray([2.0, 0.5, 1.0]),
                  jnp.asarray([0.0, 0.0, 0.0]), cfg=cfg)
    with np.load(golden_path) as z:
        np.testing.assert_allclose(np.asarray(ir.energy), z["energy"], rtol=1e-4, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ir.dir_sum), z["dir_sum"], rtol=1e-4, atol=1e-10)


def test_real_conv_path_matches_complex(rng):
    """The split-re/im DFT-matmul convolver (for TPU runtimes without
    complex64) must match the complex-FFT path."""
    import jax.numpy as jnp

    B = 128
    ir = (rng.standard_normal(1000) * np.exp(-np.arange(1000) / 300)).astype(np.float32)
    x = rng.standard_normal(6 * B).astype(np.float32)
    sp = cp.partition_ir(jnp.asarray(ir), B)
    hre, him = cp.partition_ir_real(jnp.asarray(ir), B)
    np.testing.assert_allclose(np.asarray(sp.real), np.asarray(hre), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sp.imag), np.asarray(him), rtol=1e-3, atol=1e-4)

    st_c = cp.conv_init((), sp.shape[0], B)
    st_r = cp.conv_init_real((), sp.shape[0], B)
    for b in range(6):
        blk = jnp.asarray(x[b * B : (b + 1) * B])
        yc, st_c = cp.conv_block(blk, st_c, sp)
        yr, st_r = cp.conv_block_real(blk, st_r, hre, him)
        np.testing.assert_allclose(np.asarray(yr), np.asarray(yc), rtol=1e-3, atol=2e-4)


def test_convolve_direct_matches_numpy(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((4, 300)).astype(np.float32)
    ir = rng.standard_normal((4, 128)).astype(np.float32)
    got = np.asarray(cp.convolve_direct(jnp.asarray(x), jnp.asarray(ir)))
    for c in range(4):
        np.testing.assert_allclose(
            got[c], np.convolve(x[c], ir[c]), rtol=1e-4, atol=1e-5
        )


def test_binaural_spectra_real_matches_complex(rng):
    import jax.numpy as jnp

    from audio_raytracing_tpu.engine.system import default_hrtf
    from audio_raytracing_tpu.utils import quat

    hl, hr = default_hrtf()
    amb = (rng.standard_normal((4, 512)) * 0.3).astype(np.float32)
    orient = jnp.asarray(quat.quat_from_roll_pitch_yaw(0.1, 0.7, 0.0))
    sp = cp.binaural_ir_spectra(jnp.asarray(amb), orient, jnp.asarray(hl), jnp.asarray(hr), 128)
    hre, him = cp.binaural_ir_spectra_real(
        jnp.asarray(amb), orient, jnp.asarray(hl), jnp.asarray(hr), 128
    )
    np.testing.assert_allclose(np.asarray(sp.real), np.asarray(hre), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sp.imag), np.asarray(him), rtol=1e-3, atol=1e-3)


def test_multi_listener_matches_per_listener():
    """Shared-path multi-listener trace vs independent trace_ir calls."""
    import dataclasses

    from audio_raytracing_tpu.models.ir import trace_ir_multi_listener

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), cfg)
    arrays = scene.device_arrays()
    src = jnp.asarray([1.0, 0.5, 0.5])
    listeners = jnp.asarray(
        [[-1.0, -0.5, -1.0], [0.5, 0.0, 1.5], [2.0, 1.0, -2.0]]
    )
    dirs = jnp.asarray(fibonacci_sphere(512))
    for intersector in ("mt", "mxu"):
        multi = trace_ir_multi_listener(
            arrays, src, listeners, cfg=cfg, max_bounces=3, dirs=dirs,
            intersector=intersector,
        )
        assert multi.energy.shape == (3, 4, cfg.ir_n_bins)
        # mxu (Woop) resolves a handful of edge-grazing ties differently
        # from the scalar MT formulation: tiny absolute floor for it
        atol = 1e-9 if intersector == "mt" else 1e-5
        for i in range(3):
            one = trace_ir(
                arrays, src, listeners[i], cfg=cfg, max_bounces=3, dirs=dirs,
                intersector="mt",
            )
            np.testing.assert_allclose(
                np.asarray(multi.energy[i]), np.asarray(one.energy),
                rtol=1e-4, atol=atol,
            )
            np.testing.assert_allclose(
                np.asarray(multi.dir_sum[i]), np.asarray(one.dir_sum),
                rtol=1e-4, atol=atol,
            )


def test_multi_listener_sh_order_matches_per_listener():
    """sh_order through the shared-path multi-listener trace (r5: lets
    HOA streams ride the batched serving coordinator) — the per-listener
    SH moments must match independent trace_ir(sh_order=N) calls."""
    import dataclasses

    from audio_raytracing_tpu.models.ir import trace_ir_multi_listener
    from audio_raytracing_tpu.ops.hoa import n_sh

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), cfg)
    arrays = scene.device_arrays()
    src = jnp.asarray([1.0, 0.5, 0.5])
    listeners = jnp.asarray([[-1.0, -0.5, -1.0], [0.5, 0.0, 1.5]])
    dirs = jnp.asarray(fibonacci_sphere(512))
    order = 2
    multi = trace_ir_multi_listener(
        arrays, src, listeners, cfg=cfg, max_bounces=3, dirs=dirs,
        sh_order=order,
    )
    assert multi.sh_moments.shape == (2, n_sh(order), cfg.ir_n_bins)
    for i in range(2):
        one = trace_ir(
            arrays, src, listeners[i], cfg=cfg, max_bounces=3, dirs=dirs,
            intersector="mt", sh_order=order,
        )
        np.testing.assert_allclose(
            np.asarray(multi.energy[i]), np.asarray(one.energy),
            rtol=1e-4, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(multi.sh_moments[i]), np.asarray(one.sh_moments),
            rtol=1e-4, atol=1e-9,
        )


def test_hash_rng_scattering_variant():
    """trace_ir(scattering_rng='hash'): deterministic per seed, key-free,
    statistically consistent with the threefry family."""
    import dataclasses as _dc

    from audio_raytracing_tpu.ops.hashrng import hash_u32, hash_u32_py, uniform01

    # the python mirror is bit-equal to the traced hash
    for s in (0, 1, 42, 123456, 2**31 - 1):
        assert int(jnp.asarray(hash_u32(jnp.int32(s)))) == hash_u32_py(s)
    u = np.asarray(uniform01(jnp.arange(1 << 16, dtype=jnp.int32)))
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 5e-3 and abs(u.std() - 0.2887) < 5e-3

    cfg = _dc.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(box_room(), cfg)
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    dirs = jnp.asarray(fibonacci_sphere(1024))
    kw = dict(cfg=cfg, max_bounces=4, dirs=dirs, scattering=0.5)
    a = trace_ir(scene.device_arrays(), src, lst, scattering_rng="hash",
                 rng_seed=3, **kw)
    b = trace_ir(scene.device_arrays(), src, lst, scattering_rng="hash",
                 rng_seed=3, **kw)
    np.testing.assert_array_equal(np.asarray(a.energy), np.asarray(b.energy))
    c = trace_ir(scene.device_arrays(), src, lst, scattering_rng="hash",
                 rng_seed=4, **kw)
    assert float(jnp.abs(a.energy - c.energy).sum()) > 0
    import jax as _jax

    th = trace_ir(scene.device_arrays(), src, lst,
                  key=_jax.random.PRNGKey(0), **kw)
    assert abs(float(a.energy.sum()) - float(th.energy.sum())) < 0.05 * float(
        th.energy.sum()
    )
