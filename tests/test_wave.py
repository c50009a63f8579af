"""FDTD wave solver (models/wave.py): analytic physics validation.

The wave family has no reference analogue (the reference is ray-only,
SURVEY.md §2) and no oracle port — instead it is tested directly against
closed-form acoustics: free-field propagation delay and 1/r spreading,
the complete low-mode spectrum of a rigid box room (the eigenfrequencies
c/2 * sqrt((l/Lx)^2 + (m/Ly)^2 + (n/Lz)^2)), leapfrog energy
conservation, and monotone absorption decay."""

import math

import numpy as np
import pytest

import jax

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models import wave as W
from audio_raytracing_tpu.models.scene import Scene, box_room

C = 350.0


def _rigid_box_domain(nx, ny, nz, dx):
    """Interior nx*ny*nz air cells inside a one-cell solid shell; the
    rigid-wall cavity has interior dimensions (nx*dx, ny*dx, nz*dx)."""
    occ = np.zeros((nx + 2, ny + 2, nz + 2), np.float32)
    occ[1:-1, 1:-1, 1:-1] = 1.0
    return W.WaveDomain(occ=occ, dx=dx, origin=(0.0, 0.0, 0.0))


def test_courant_guard():
    dom = W.WaveDomain(occ=np.ones((8, 8, 8), np.float32), dx=0.1,
                       origin=(0.0, 0.0, 0.0))
    bad_dt = 1.01 * 0.1 / (C * math.sqrt(3.0))
    with pytest.raises(ValueError, match="Courant"):
        W.wave_run(dom, (2, 2, 2), (5, 5, 5), 8, c=C, dt=bad_dt)
    # solid src/lst cells are rejected
    dom2 = _rigid_box_domain(6, 6, 6, 0.1)
    with pytest.raises(ValueError, match="air cell"):
        W.wave_run(dom2, (0, 0, 0), (3, 3, 3), 8, c=C)


def test_free_field_delay_and_spreading():
    """Peak arrival at d/c + t0 and ~1/r pressure decay, measured in the
    pre-reflection window of an open (all-air, rigid-boundary) domain."""
    dx = 0.05
    occ = np.ones((96, 64, 64), np.float32)
    dom = W.WaveDomain(occ=occ, dx=dx, origin=(0.0, 0.0, 0.0))
    src = (24, 32, 32)
    n = 100  # first wall images arrive ~step 140
    w1 = W.wave_run(dom, src, (34, 32, 32), n, c=C, alpha=0.0)  # 0.5 m
    w2 = W.wave_run(dom, src, (44, 32, 32), n, c=C, alpha=0.0)  # 1.0 m
    p1, p2 = np.asarray(w1.pressure), np.asarray(w2.pressure)
    k1, k2 = np.argmax(np.abs(p1)), np.argmax(np.abs(p2))
    exp1 = (w1.t0 + 0.5 / C) / w1.dt
    exp2 = (w2.t0 + 1.0 / C) / w2.dt
    assert abs(k1 - exp1) <= 3, (k1, exp1)
    assert abs(k2 - exp2) <= 3, (k2, exp2)
    ratio = np.abs(p1).max() / np.abs(p2).max()
    assert 1.6 < ratio < 2.4, ratio  # 1/r: expect ~2


def test_rigid_box_mode_spectrum():
    """Every spectral peak of a rigid-box impulse response sits on an
    analytic eigenfrequency, and the lowest three modes are all present.
    Box interior (3.5, 2.8, 2.4) m -> axial modes at 50.0/62.5/72.9 Hz."""
    dx = 0.1
    nx, ny, nz = 35, 28, 24
    dom = _rigid_box_domain(nx, ny, nz, dx)
    n_steps = 4096
    w = W.wave_run(dom, (5, 4, 3), (28, 20, 15), n_steps, c=C, alpha=0.0,
                   fc=80.0)
    p = np.asarray(w.pressure)
    spec = np.abs(np.fft.rfft(p * np.hanning(n_steps)))
    freqs = np.fft.rfftfreq(n_steps, w.dt)
    sel = (freqs > 35) & (freqs < 110)
    f, s = freqs[sel], spec[sel]
    peaks = [f[i] for i in range(1, len(s) - 1)
             if s[i] > s[i - 1] and s[i] > s[i + 1] and s[i] > 0.1 * s.max()]
    L = (nx * dx, ny * dx, nz * dx)
    analytic = sorted(
        C / 2 * math.sqrt((l / L[0]) ** 2 + (m / L[1]) ** 2 + (q / L[2]) ** 2)
        for l in range(3) for m in range(3) for q in range(3)
        if (l, m, q) != (0, 0, 0)
    )
    df = 1.0 / (n_steps * w.dt)
    # every detected peak is a real mode
    for pk in peaks:
        err = min(abs(pk - a) for a in analytic)
        assert err < max(2 * df, 1.5), (pk, err)
    # the three axial modes are all detected
    for a in analytic[:3]:
        err = min(abs(pk - a) for pk in peaks)
        assert err < max(2 * df, 1.5), (a, peaks)


def test_energy_conservation_rigid_and_absorption_decay():
    """Rigid walls conserve field energy after the pulse ends; impedance
    walls drain it monotonically with alpha."""
    dom = _rigid_box_domain(20, 16, 14, 0.1)
    src, lst = (5, 5, 5), (14, 10, 9)

    def energy_at(n_steps, alpha):
        _, state = W.wave_run(dom, src, lst, n_steps, c=C, alpha=alpha,
                              fc=100.0, return_state=True)
        return float(W.field_energy(state, c=C))

    # leapfrog energy (staggered-time reading) carries a bounded ripple of
    # a few percent; measured flat from 200 through 12800 steps
    e_mid, e_end = energy_at(400, 0.0), energy_at(1600, 0.0)
    assert abs(e_end - e_mid) < 0.05 * e_mid, (e_mid, e_end)
    e_soft = energy_at(1600, 0.3)
    e_softer = energy_at(1600, 0.7)
    assert e_soft < 0.5 * e_end, (e_soft, e_end)
    assert e_softer < e_soft, (e_softer, e_soft)


def test_absorbing_decay_matches_sabine_loosely():
    """T30 of the simulated decay within a factor ~2 of Sabine's formula
    (Sabine itself is only exact in the diffuse-field limit)."""
    import dataclasses

    from audio_raytracing_tpu.models.metrics import rt60

    dx = 0.1
    nx, ny, nz = 35, 28, 24
    dom = _rigid_box_domain(nx, ny, nz, dx)
    alpha = 0.3
    n_steps = 4000  # 0.66 s at the dx=0.1 Courant dt
    w = W.wave_run(dom, (5, 4, 3), (28, 20, 15), n_steps, c=C, alpha=alpha,
                   fc=120.0)
    p = np.asarray(w.pressure, np.float64)
    cfg_sim = dataclasses.replace(DEFAULT_CONFIG,
                                  sample_rate=int(round(1.0 / w.dt)))
    t60 = float(rt60(p**2, cfg=cfg_sim, method="t30"))
    L = (nx * dx, ny * dx, nz * dx)
    vol = L[0] * L[1] * L[2]
    surf = 2 * (L[0] * L[1] + L[0] * L[2] + L[1] * L[2])
    sabine = 24 * math.log(10) / C * vol / (surf * alpha)
    assert 0.4 * sabine < t60 < 2.5 * sabine, (t60, sabine)


def test_voxelize_box_room_shell():
    """box_room() voxelizes to a watertight solid shell: interior air,
    wall cells solid, and a wave started inside never escapes."""
    size = (4.0, 3.0, 3.5)
    dom = W.voxelize_triangles(box_room(size=size), dx=0.1, pad_cells=2)
    occ = np.asarray(dom.occ)
    center = dom.cell_of((0.0, 0.0, 0.0))  # box_room is origin-centered
    assert occ[center] == 1.0
    wall = dom.cell_of((size[0] / 2, 0.0, 0.0))
    assert occ[wall] == 0.0
    # watertight: flood-fill reachability from the center never crosses
    # to the domain's outer border
    from collections import deque

    seen = np.zeros_like(occ, bool)
    q = deque([center])
    seen[center] = True
    while q:
        i, j, k = q.popleft()
        for di, dj, dk in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                           (0, 0, 1), (0, 0, -1)):
            ni, nj, nk = i + di, j + dj, k + dk
            assert 0 < ni < occ.shape[0] - 1, "wave escaped the shell"
            assert 0 < nj < occ.shape[1] - 1
            assert 0 < nk < occ.shape[2] - 1
            if occ[ni, nj, nk] == 1.0 and not seen[ni, nj, nk]:
                seen[ni, nj, nk] = True
                q.append((ni, nj, nk))


def test_wave_ir_scene_input_and_alignment():
    """wave_ir accepts a Scene, and the t0-aligned energy histogram puts
    the direct arrival at delay d/c like the ray tracer."""
    import dataclasses

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192)
    scene = Scene.from_triangles(box_room(size=(5.0, 3.0, 4.0)), cfg)
    src = np.array([1.2, 0.4, 0.9])
    lst = np.array([-1.0, -0.3, -0.8])
    w = W.wave_ir(scene, src, lst, cfg=cfg, dx=0.1, duration=0.08)
    e = np.asarray(W.wave_ir_energy(w, cfg=cfg))
    assert e.shape == (cfg.n_bands, cfg.ir_n_bins)
    assert np.isfinite(e).all() and e.sum() > 0
    d = float(np.linalg.norm(src - lst))
    k0 = d / cfg.speed_of_sound * cfg.sample_rate
    # the FIRST significant arrival is the direct path (the global energy
    # peak need not be: a barely-absorbing box builds standing waves that
    # exceed the direct level); the pulse is several ms wide so allow its
    # half-width
    tot = e.sum(axis=0)
    half = int(round(w.t0 * cfg.sample_rate))
    first = int(np.argmax(tot > 0.05 * tot.max()))
    assert abs(first - k0) <= half, (first, k0, half)


def test_resample_pressure_roundtrip():
    w = W.WaveIR(
        pressure=np.sin(np.linspace(0, 20, 1000)).astype(np.float32),
        dt=1e-4, pulse=np.zeros(1000, np.float32), t0=0.0,
    )
    same = W.resample_pressure(w, 10000)  # same rate -> same samples
    np.testing.assert_allclose(same, np.asarray(w.pressure)[: len(same)],
                               atol=1e-6)
    up = W.resample_pressure(w, 44100)
    assert abs(len(up) - int(999 * 4.41)) <= 2


def test_hybrid_wave_ir_splices_bands():
    """Bands >= crossover are exactly the tracer's; replaced bands carry
    wave energy whose direct-window sum matches the tracer's own."""
    import dataclasses

    import jax.numpy as jnp

    from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192)
    scene = Scene.from_triangles(box_room(size=(5.0, 3.0, 4.0)), cfg)
    arrays = scene.device_arrays()
    src = np.array([1.2, 0.4, 0.9])
    lst = np.array([-1.0, -0.3, -0.8])
    dirs = jnp.asarray(fibonacci_sphere(2048))
    ray = trace_ir(arrays, src, lst, cfg=cfg, max_bounces=3, dirs=dirs)
    hyb, w = W.hybrid_wave_ir(
        arrays, src, lst, cfg=cfg, crossover_band=1,
        wave_kwargs=dict(dx=0.1, duration=0.08),
        max_bounces=3, dirs=dirs,
    )
    np.testing.assert_array_equal(np.asarray(hyb.energy[1:]),
                                  np.asarray(ray.energy[1:]))
    e0 = np.asarray(hyb.energy[0])
    assert np.isfinite(e0).all() and e0.sum() > 0
    assert not np.allclose(e0, np.asarray(ray.energy[0]))
    # direct-window calibration: band-0 window sums agree by construction
    d = float(np.linalg.norm(src - lst))
    k0 = int(round(d / cfg.speed_of_sound * cfg.sample_rate))
    half = max(int(round(w.t0 * cfg.sample_rate)), 8)
    win = slice(max(0, k0 - half), k0 + half + 1)
    np.testing.assert_allclose(
        e0[win].sum(), np.asarray(ray.energy[0])[win].sum(), rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(hyb.dir_sum),
                                  np.asarray(ray.dir_sum))
