"""DSP op differential tests: JAX block-parallel ops vs per-sample oracles.

The reference has no DSP tests (SURVEY.md §4); these establish the pyramid:
EQ response vs scalar port, reverb block vs per-sample port, HRTF decode vs
np.convolve, ambisonic rotation vs quaternion math.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.ops import ambisonic as amb
from audio_raytracing_tpu.ops import eq as eqmod
from audio_raytracing_tpu.ops import reverb as rvmod
from audio_raytracing_tpu.ops.doppler import fetch_oneshot, fetch_repeat
from audio_raytracing_tpu.utils import quat


def test_eq_block_vs_oracle(rng):
    V, N = 3, 128
    x = rng.standard_normal((V, N)).astype(np.float32)
    z0 = rng.standard_normal((V, 4)).astype(np.float32) * 0.1
    gains = rng.random((V, 4)).astype(np.float32)
    y, z = eqmod.eq_apply_block(jnp.asarray(x), jnp.asarray(z0), jnp.asarray(gains))
    y_o, z_o = eqmod.eq_apply_oracle(x, z0, gains)
    np.testing.assert_allclose(np.asarray(y), y_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), z_o, rtol=1e-5, atol=1e-6)


def test_eq_masked_prefix(rng):
    V, N = 2, 128
    x = rng.standard_normal((V, N)).astype(np.float32)
    mask = np.zeros((V, N), bool)
    mask[0, :50] = True
    mask[1, :] = True
    z0 = np.zeros((V, 4), np.float32)
    g = np.ones((V, 4), np.float32)
    y, z = eqmod.eq_apply_block(jnp.asarray(x), jnp.asarray(z0), jnp.asarray(g), jnp.asarray(mask))
    y_o, z_o = eqmod.eq_apply_oracle(x, z0, g, mask)
    np.testing.assert_allclose(np.asarray(y)[mask], y_o[mask], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z), z_o, rtol=1e-5, atol=1e-6)


def test_eq_gains_formula():
    g = np.asarray(eqmod.eq_gains(jnp.float32([10.0]), jnp.float32([2.0])))
    expect = np.clip(1.0 - 1e-5 * 10.0 * 3.0 * eqmod.EQ_FREQS, 0, 1) / 11.0 / 3.0
    np.testing.assert_allclose(g[0], expect, rtol=1e-6)


def test_eq_dc_response_sums_to_unity():
    # with unit gains the 4 bands must reconstruct the input (allpass-ish
    # at DC after settle)
    V, N = 1, 4096
    x = np.ones((V, N), np.float32)
    y, _ = eqmod.eq_apply_block(jnp.asarray(x), jnp.zeros((V, 4)), jnp.ones((V, 4)))
    assert abs(float(np.asarray(y)[0, -1]) - 1.0) < 1e-3


@pytest.mark.parametrize("blocks", [1, 3])
def test_reverb_block_vs_oracle(rng, blocks):
    N = 128
    x = rng.standard_normal((blocks * N,)).astype(np.float32) * 0.5
    oracle = rvmod.ReverbOracle()
    oracle.feedback_gain = 0.85
    outs_o = np.concatenate([oracle.apply(x[b * N : (b + 1) * N]) for b in range(blocks)])

    state = rvmod.reverb_init(2)
    fg = jnp.asarray([0.85, 0.5], jnp.float32)
    outs = []
    for b in range(blocks):
        blk = jnp.broadcast_to(jnp.asarray(x[b * N : (b + 1) * N]), (2, N))
        o, state = rvmod.reverb_apply_block(blk, state, fg)
        outs.append(np.asarray(o))
    outs = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(outs[0], outs_o, rtol=1e-4, atol=1e-5)
    # voice 1 with different feedback gain diverges once feedback kicks in
    # (identical until the shortest FDN delay 2153 elapses)
    if blocks * N > 2153 + 128:
        assert not np.allclose(outs[0], outs[1])


def test_reverb_impulse_energy_decays():
    # impulse tail energy must decay with fg < 1 (longest FDN delay is
    # 6427 samples ~ 50 blocks, so compare windows several round trips
    # apart)
    import jax

    apply = jax.jit(rvmod.reverb_apply_block)
    state = rvmod.reverb_init(1)
    x = np.zeros((1, 128), np.float32)
    x[0, 0] = 1.0
    _, state = apply(jnp.asarray(x), state, jnp.asarray([0.7]))
    energies = []
    zero = jnp.zeros((1, 128))
    for _ in range(400):
        o, state = apply(zero, state, jnp.asarray([0.7]))
        energies.append(float(jnp.sum(o * o)))
    assert max(energies[:150]) > 0  # tail exists
    assert sum(energies[300:400]) < 0.25 * sum(energies[50:150])  # decaying


def test_doppler_repeat_static_distance_identity():
    # constant distance 0: reads cursor+len+i and cursor+len+i-1 with beta=0
    arena = jnp.asarray(np.arange(16, dtype=np.float32))
    out = fetch_repeat(
        arena,
        offset=jnp.asarray([0]),
        length=jnp.asarray([16]),
        cursor=jnp.asarray([0]),
        prev_dist=jnp.asarray([0.0]),
        dist=jnp.asarray([0.0]),
        frame_index=0,
        total_frames=1,
        n=8,
        sample_rate=44100.0,
        speed_of_sound=350.0,
    )
    np.testing.assert_allclose(np.asarray(out)[0], np.arange(8) % 16, atol=1e-6)


def test_doppler_repeat_offset_by_distance():
    # distance d delays playback by round(44100*d/350) samples
    arena = jnp.asarray(np.arange(1000, dtype=np.float32))
    d = 350.0 * 100.0 / 44100.0  # exactly 100 samples
    out = fetch_repeat(
        arena, jnp.asarray([0]), jnp.asarray([1000]), jnp.asarray([500]),
        jnp.asarray([d]), jnp.asarray([d]), 0, 1, 8, 44100.0, 350.0,
    )
    np.testing.assert_allclose(np.asarray(out)[0], 400 + np.arange(8), atol=1e-3)


def test_doppler_oneshot_bounds():
    arena = jnp.asarray(np.ones(100, dtype=np.float32))
    out, valid = fetch_oneshot(
        arena, jnp.asarray([0]), jnp.asarray([100]), jnp.asarray([96]),
        jnp.asarray([0.0]), jnp.asarray([0.0]), 0, 1, 8, 44100.0, 350.0,
    )
    v = np.asarray(valid)[0]
    assert v[:4].all() and not v[4:].any()  # end-begin = 100-96 = 4
    assert np.all(np.asarray(out)[0][4:] == 0.0)


def test_convolve_matches_numpy(rng):
    x = rng.standard_normal(128).astype(np.float32)
    ir = rng.standard_normal(128).astype(np.float32)
    got = np.asarray(amb.convolve_full(jnp.asarray(x), jnp.asarray(ir)))
    want = np.convolve(x, ir)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hrtf_decode_matches_direct(rng):
    a = rng.standard_normal((4, 128)).astype(np.float32)
    il = rng.standard_normal((4, 128)).astype(np.float32)
    ir = rng.standard_normal((4, 128)).astype(np.float32)
    st = np.asarray(amb.ambisonic_to_stereo(jnp.asarray(a), jnp.asarray(il), jnp.asarray(ir)))
    want_l = sum(np.convolve(a[c], il[c]) for c in range(4))
    want_r = sum(np.convolve(a[c], ir[c]) for c in range(4))
    np.testing.assert_allclose(st[:, 0], want_l, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(st[:, 1], want_r, rtol=1e-4, atol=1e-5)
    # fft path agrees with direct path
    st2 = np.asarray(amb.hrtf_decode_fft(jnp.asarray(a), jnp.asarray(il), jnp.asarray(ir)))
    np.testing.assert_allclose(st2, st, rtol=1e-3, atol=1e-4)


def test_sh_encode_convention():
    # source straight ahead (+x): sh = [1, sqrt3, 0, 0] at dist >= 0.1
    sh, dist = amb.sh_encode(jnp.asarray([2.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(sh), [1, amb.SQRT3 / 2.0 * 2.0 / 2.0 * 2.0, 0, 0], atol=1e-6)
    assert float(dist) == 2.0
    # sub-threshold: fades directional components via norm = sqrt3/0.1
    sh, _ = amb.sh_encode(jnp.asarray([0.05, 0.0, 0.0]))
    np.testing.assert_allclose(float(np.asarray(sh)[1]), amb.SQRT3 / 0.1 * 0.05, rtol=1e-6)
    # ~zero: fully nondirectional
    sh, _ = amb.sh_encode(jnp.asarray([1e-9, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(sh), [1, 0, 0, 0], atol=1e-7)


def test_rotate_ambisonic_yaw():
    # yaw rotation about +y by 90deg maps +x to ... (DirectXMath convention)
    q = quat.quat_from_roll_pitch_yaw(0.0, np.pi / 2, 0.0)
    a = jnp.zeros((4, 3)).at[1, :].set(1.0)  # unit x in channels
    r = np.asarray(amb.rotate_ambisonic(a, jnp.asarray(q)))
    v = quat.rotate(np.asarray(q), np.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(r[1:, 0], v, atol=1e-6)
    np.testing.assert_allclose(r[0], 1e0 * a[0], atol=1e-7)  # W untouched
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6


def test_nonuniform_partitioned_conv_matches_uniform():
    """Two-level (head B / tail K*B) convolver vs uniform streaming conv
    and np.convolve over several groups, odd IR length."""
    import jax.numpy as jnp

    from audio_raytracing_tpu.ops import conv_partitioned as cp

    rng = np.random.default_rng(11)
    B, k = 32, 4
    L = 700  # not a multiple of k*B; tail has a ragged final partition
    ir = rng.standard_normal(L).astype(np.float32) * np.exp(
        -np.arange(L, dtype=np.float32) / 200.0
    )
    n_blocks = 24
    x = rng.standard_normal(n_blocks * B).astype(np.float32)

    head, tail = cp.nup_partition_ir_real(jnp.asarray(ir), B, k)
    st = cp.nup_init_real((), tail[0].shape[-2], B, k)
    h_re, h_im = cp.partition_ir_real(jnp.asarray(ir), B)
    stu = cp.conv_init_real((), h_re.shape[-2], B)

    ref = np.convolve(x, ir)
    got_n, got_u = [], []
    for b in range(n_blocks):
        blk = jnp.asarray(x[b * B:(b + 1) * B])
        y_n, st = cp.conv_block_nup_real(blk, st, head, tail)
        y_u, stu = cp.conv_block_real(blk, stu, h_re, h_im)
        got_n.append(np.asarray(y_n))
        got_u.append(np.asarray(y_u))
    got_n = np.concatenate(got_n)
    got_u = np.concatenate(got_u)
    np.testing.assert_allclose(got_u, ref[: n_blocks * B], atol=2e-4)
    np.testing.assert_allclose(got_n, ref[: n_blocks * B], atol=2e-4)
    np.testing.assert_allclose(got_n, got_u, atol=2e-5)


def test_nonuniform_conv_short_ir_no_tail():
    """IR shorter than one group: tail is a zero partition, head carries
    everything."""
    import jax.numpy as jnp

    from audio_raytracing_tpu.ops import conv_partitioned as cp

    rng = np.random.default_rng(12)
    B, k = 16, 4
    ir = rng.standard_normal(40).astype(np.float32)
    x = rng.standard_normal(10 * B).astype(np.float32)
    head, tail = cp.nup_partition_ir_real(jnp.asarray(ir), B, k)
    st = cp.nup_init_real((), tail[0].shape[-2], B, k)
    out = []
    for b in range(10):
        y, st = cp.conv_block_nup_real(jnp.asarray(x[b * B:(b + 1) * B]), st, head, tail)
        out.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(out), np.convolve(x, ir)[: 10 * B], atol=2e-5
    )
