#!/usr/bin/env python
"""Convert a measured SOFA HRTF set into this framework's MagLS banks.

The synthesized rigid-sphere banks (tools/make_hoa_hrtf.py) exist because
this environment has zero egress; a MEASURED human set beats them the
moment one is available. SOFA (AES69, the standard HRTF container —
sofacoustics.org hosts hundreds of sets) is HDF5, so any
SimpleFreeFieldHRIR file drops in with no extra dependencies:

    python tools/convert_sofa.py subject.sofa data/hrtf_hoa_human.npz

then every HOA surface accepts the bank by path:

    render_ir_offline(..., sh_order=3, hoa_hrtf="data/hrtf_hoa_human.npz")
    IRStreamRenderer(..., sh_order=3, hoa_hrtf="data/hrtf_hoa_human.npz")
    offline CLI: --sh-order 3 --hoa-hrtf data/hrtf_hoa_human.npz

Pipeline (mirrors make_hoa_hrtf.py, swapping the analytic sphere target
for the measurements): read Data.IR (M, 2, N) + spherical SourcePosition,
map SOFA's frame (+x front, +y left, +z up) into the framework frame
(+x front, +y up, +z right), resample to 44.1 kHz if needed, strip the
shared bulk onset delay (keeping interaural differences), time-alias each
HRIR into 128 taps (frequency sampling at the FIR design grid), and fit
per-order MagLS decoders (orders 1..5, capped so the direction count
keeps the SH system overdetermined: M >= 2 (N+1)^2).

Reference context: src/hrtf.zon is the reference's own measured bank
(Sound Sphere 2, first order only); this tool generalizes that ingest to
any SOFA set at any supported order.
"""

from __future__ import annotations

import importlib.util as _ilu
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_spec = _ilu.spec_from_file_location("_mkhrtf", ROOT / "tools" / "make_hoa_hrtf.py")
_mk = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mk)

SAMPLE_RATE = _mk.SAMPLE_RATE
N_TAPS = _mk.N_TAPS
MAX_ORDER = _mk.MAX_ORDER
F_TRANSITION_PER_ORDER = _mk.F_TRANSITION_PER_ORDER
magls_fit = _mk.magls_fit


def _attr_str(ds, name, default):
    v = ds.attrs.get(name, default)
    return v.decode() if isinstance(v, bytes) else str(v)


def load_sofa(path):
    """(ir (M, 2, N) float64, fs float, dirs (M, 3) framework frame)."""
    import h5py

    with h5py.File(path, "r") as f:
        conv = _attr_str(f, "SOFAConventions", "SimpleFreeFieldHRIR")
        if "HRIR" not in conv:
            raise ValueError(
                f"unsupported SOFA convention {conv!r} (need a *HRIR* set)"
            )
        ir = np.asarray(f["Data.IR"], np.float64)  # (M, R, N)
        if ir.ndim != 3 or ir.shape[1] != 2:
            raise ValueError(f"expected (M, 2, N) Data.IR, got {ir.shape}")
        fs = float(np.ravel(np.asarray(f["Data.SamplingRate"]))[0])
        sp = np.asarray(f["SourcePosition"], np.float64)  # (M, C)
        sp_type = _attr_str(f["SourcePosition"], "Type", "spherical").lower()
    if sp_type.startswith("spherical"):
        az = np.radians(sp[:, 0])
        el = np.radians(sp[:, 1])
        # SOFA cartesian: +x front, +y left, +z up
        x = np.cos(el) * np.cos(az)
        y = np.cos(el) * np.sin(az)
        z = np.sin(el)
    elif sp_type.startswith("cartesian"):
        n = np.linalg.norm(sp[:, :3], axis=1, keepdims=True)
        x, y, z = (sp[:, :3] / np.maximum(n, 1e-12)).T
    else:
        raise ValueError(f"unknown SourcePosition Type {sp_type!r}")
    # framework frame: +x front, +y up, +z right = (x, z, -y)
    dirs = np.stack([x, z, -y], axis=1)
    return ir, fs, dirs


def bank_from_measurements(ir, fs, dirs, max_order: int = MAX_ORDER):
    """Fit per-order MagLS decoder FIRs from measured HRIRs.

    Returns {irs_{l,r}_o{n}: (n_sh, N_TAPS) f32} for each feasible order
    (direction count must keep the SH fit overdetermined: M >= 2 (n+1)^2).
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    from audio_raytracing_tpu.ops.hoa import n_sh, sh_basis

    if fs != SAMPLE_RATE:
        from fractions import Fraction

        from scipy.signal import resample_poly

        fr = Fraction(SAMPLE_RATE, int(round(fs))).limit_denominator(1000)
        ir = resample_poly(ir, fr.numerator, fr.denominator, axis=-1)
    # strip the SHARED bulk onset (measurement air gap), keeping
    # interaural/per-direction differences; land the earliest onset at
    # tap 8 so the 128-tap alias keeps the energy
    peak = np.abs(ir).max()
    hits = np.abs(ir) > 0.01 * peak
    onset = int(np.argmax(hits.any(axis=(0, 1))))
    shift = max(0, onset - 8)
    ir = ir[..., shift:]
    # frequency sampling at the 128-tap design grid == time-aliasing the
    # (longer) HRIR into 128 taps; measured sets keep > 99% of their
    # energy well inside 3 ms once the bulk delay is stripped
    M, _, n = ir.shape
    pad = (-n) % N_TAPS
    folded = np.pad(ir, ((0, 0), (0, 0), (0, pad))).reshape(
        M, 2, -1, N_TAPS
    ).sum(axis=2)
    h = np.fft.rfft(folded, axis=-1)  # (M, 2, F)
    freqs = np.fft.rfftfreq(N_TAPS, 1.0 / SAMPLE_RATE)

    out = {}
    for order in range(1, max_order + 1):
        if M < 2 * n_sh(order):
            print(
                f"order {order}: skipped ({M} directions < "
                f"{2 * n_sh(order)} needed for an overdetermined fit)",
                file=sys.stderr,
            )
            continue
        y = np.asarray(sh_basis(dirs.astype(np.float32), order), np.float64)
        for ear, ei in (("l", 0), ("r", 1)):
            d = magls_fit(
                h[:, ei], y, freqs, F_TRANSITION_PER_ORDER * order
            )
            out[f"irs_{ear}_o{order}"] = np.fft.irfft(
                d, n=N_TAPS, axis=1
            ).astype(np.float32)
    if not out:
        raise ValueError(f"no order fittable from {M} directions")
    return out


def main(argv=None) -> str:
    args = argv if argv is not None else sys.argv[1:]
    if len(args) != 2:
        raise SystemExit(
            "usage: python tools/convert_sofa.py in.sofa out_bank.npz"
        )
    src, dst = Path(args[0]), Path(args[1])
    ir, fs, dirs = load_sofa(src)
    out = bank_from_measurements(ir, fs, dirs)
    np.savez(
        dst, sample_rate=SAMPLE_RATE, source=str(src),
        n_measurements=ir.shape[0], **out,
    )
    orders = sorted(int(k.split("o")[-1]) for k in out if k.startswith("irs_l"))
    msg = (
        f"wrote {dst}: orders {orders} from {ir.shape[0]} measured "
        f"directions @ {fs:.0f} Hz"
    )
    print(msg)
    return msg


if __name__ == "__main__":
    main()
