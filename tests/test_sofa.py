"""SOFA measured-HRTF ingest (tools/convert_sofa.py): zero-egress
roundtrip validation — synthesize a SOFA file from the analytic
rigid-sphere head model, convert it, and require the fitted bank to
reconstruct the analytic transfer like the built-in sphere bank does.
Proves the FULL measured-set path (HDF5 read, SOFA->framework frame,
onset stripping, time-aliased frequency sampling, MagLS fit, bank-by-path
plumbing) without any external data."""

import importlib.util as ilu
from pathlib import Path

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

ROOT = Path(__file__).parents[1]


def _load(name):
    spec = ilu.spec_from_file_location(name, ROOT / "tools" / f"{name}.py")
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sofa_file(tmp_path_factory):
    """A synthetic SimpleFreeFieldHRIR set: 256 fibonacci directions of
    rigid-sphere HRIRs at 48 kHz (deliberately NOT the engine rate, so the
    resample path is exercised), 24 samples of bulk onset delay."""
    mk = _load("make_hoa_hrtf")
    fs = 48000.0
    n = 256  # taps in the synthetic measurement
    freqs = np.fft.rfftfreq(n, 1.0 / fs)
    mu = 2 * np.pi * np.maximum(freqs, 1.0) / mk.C_AIR * mk.HEAD_RADIUS
    dirs = mk.fibonacci_dirs(256)  # framework frame
    az = np.radians(mk.EAR_AZ_DEG)
    e_l = np.array([np.cos(az), 0.0, -np.sin(az)])
    e_r = np.array([np.cos(az), 0.0, +np.sin(az)])
    delay = np.exp(-2j * np.pi * freqs * (24.0 / fs))  # bulk onset
    irs = np.zeros((256, 2, n))
    for ei, e in ((0, e_l), (1, e_r)):
        h = mk.sphere_hrtf(mu, dirs @ e) * delay[None, :]
        h[:, 0] = delay[0].real
        irs[:, ei] = np.fft.irfft(h, n=n, axis=1)
    # framework (x, y, z) = (front, up, right) -> SOFA (front, left, up)
    sx, sy, sz = dirs[:, 0], -dirs[:, 2], dirs[:, 1]
    az_deg = np.degrees(np.arctan2(sy, sx))
    el_deg = np.degrees(np.arcsin(np.clip(sz, -1, 1)))
    pos = np.stack([az_deg, el_deg, np.full(256, 1.5)], axis=1)

    path = tmp_path_factory.mktemp("sofa") / "sphere_synth.sofa"
    with h5py.File(path, "w") as f:
        f.attrs["SOFAConventions"] = np.bytes_("SimpleFreeFieldHRIR")
        f.create_dataset("Data.IR", data=irs)
        f.create_dataset("Data.SamplingRate", data=np.asarray([fs]))
        sp = f.create_dataset("SourcePosition", data=pos)
        sp.attrs["Type"] = np.bytes_("spherical")
    return path


def test_sofa_convert_and_reconstruct(sofa_file, tmp_path):
    """Converted bank reproduces the analytic transfer magnitude within
    the sphere-bank tolerances (test_hoa.py's criterion)."""
    from audio_raytracing_tpu.ops.hoa import hoa_binaural_bank, sh_basis

    cs = _load("convert_sofa")
    mk = _load("make_hoa_hrtf")
    bank = tmp_path / "bank.npz"
    msg = cs.main([str(sofa_file), str(bank)])
    assert "orders" in msg

    freqs = np.fft.rfftfreq(mk.N_TAPS, 1.0 / mk.SAMPLE_RATE)
    mu = 2 * np.pi * np.maximum(freqs, 1.0) / mk.C_AIR * mk.HEAD_RADIUS
    az = np.radians(mk.EAR_AZ_DEG)
    e_l = np.array([np.cos(az), 0.0, -np.sin(az)])
    u = np.array([0.55, 0.2, -0.81])
    u /= np.linalg.norm(u)
    h_true = np.abs(mk.sphere_hrtf(mu, np.array([u @ e_l]))[0])

    for order, tol_mean in ((1, 1.6), (2, 1.2), (3, 1.2)):
        bl, br = hoa_binaural_bank(order, bank=str(bank))
        y = np.asarray(sh_basis(u.astype(np.float32), order))
        ir = (y[:, None] * np.asarray(bl)).sum(axis=0)
        mag = np.abs(np.fft.rfft(ir))
        err = np.abs(
            20 * np.log10(np.maximum(mag[1:60], 1e-9) / h_true[1:60])
        )
        assert err.mean() < tol_mean, (order, err.mean(), err.max())
    # lateralization survives the roundtrip: +z source louder on the right
    bl, br = hoa_binaural_bank(1, bank=str(bank))
    yz = np.asarray(sh_basis(np.float32([0.0, 0.0, 1.0]), 1))
    el = np.abs((yz[:, None] * np.asarray(bl)).sum(axis=0)).sum()
    er = np.abs((yz[:, None] * np.asarray(br)).sum(axis=0)).sum()
    assert er > 1.5 * el


def test_bank_by_path_through_renderer(sofa_file, tmp_path):
    """hoa_hrtf='<path>.npz' plumbs through render_ir_offline end to end."""
    import dataclasses

    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.engine.renderer import render_ir_offline
    from audio_raytracing_tpu.models.scene import Scene, box_room

    cs = _load("convert_sofa")
    bank = tmp_path / "bank.npz"
    cs.main([str(sofa_file), str(bank)])

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), cfg)
    dry = np.zeros(512, np.float32)
    dry[0] = 1.0
    out = render_ir_offline(
        scene,
        [{"samples": dry, "pos": np.float32([1.0, 0.0, 0.5])}],
        jnp.asarray([0.0, 0.0, 0.0]), cfg=cfg, n_rays=1024,
        max_bounces=2, sh_order=2, hoa_hrtf=str(bank),
    )
    assert out.shape[1] == 2 and np.isfinite(out).all()
    assert np.abs(out).max() > 0

    from audio_raytracing_tpu.ops.hoa import hoa_binaural_bank

    with pytest.raises(ValueError, match="no order-"):
        # a 3-order-capped bank must refuse higher-order decodes loudly
        cs2 = _load("convert_sofa")
        ir, fs, dirs = cs2.load_sofa(sofa_file)
        small = tmp_path / "bank_o3.npz"
        np.savez(small, **cs2.bank_from_measurements(ir, fs, dirs,
                                                     max_order=3))
        hoa_binaural_bank(4, bank=str(small))
