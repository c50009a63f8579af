"""ISO 9613-1 atmospheric absorption (models/air.py) and the
Config.air_model switch in the IR pipeline.

The reference's clamp law hits exactly zero at d = 1e5/f meters
(sound_system.zig:229-234) — its top pseudo-band (f = 16384) goes silent
at ~6.1 m. The ISO model decays exponentially and never collapses, which
is the behavior large scenes need.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.air import iso9613_alpha
from audio_raytracing_tpu.models.ir import (
    AIR_BAND_HZ,
    _air_amplitude,
    direct_ir,
    fibonacci_sphere,
    trace_ir,
)
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG_REF = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192)
CFG_ISO = dataclasses.replace(CFG_REF, air_model="iso9613")


def test_iso9613_alpha_against_published_values():
    """Order-of-magnitude windows from the ISO 9613-1 tables (dB/km):
    20 C / 70% RH: 1 kHz ~ 5, 4 kHz ~ 23, 8 kHz ~ 78."""
    a = np.asarray(iso9613_alpha((125.0, 1000.0, 4000.0, 8000.0), 20.0, 70.0))
    a_km = a * 1000.0
    assert 0.2 < a_km[0] < 0.6
    assert 4.0 < a_km[1] < 6.0
    assert 18.0 < a_km[2] < 28.0
    assert 65.0 < a_km[3] < 95.0
    # monotone in frequency; all positive
    assert np.all(np.diff(a) > 0) and a[0] > 0


def test_iso_mode_does_not_collapse_bands():
    """At 30 m the reference law zeroes its upper pseudo-bands; ISO keeps
    every band positive (and still ordered: highs lose most)."""
    d = jnp.asarray([30.0])
    ref = np.asarray(_air_amplitude(d, CFG_REF))[0]
    iso = np.asarray(_air_amplitude(d, CFG_ISO))[0]
    assert ref[3] == 0.0  # clamp law: silent top band
    assert np.all(iso > 0.0)
    assert iso[0] > iso[1] > iso[2] > iso[3]
    # near field the two models agree loosely (both ~1)
    near = np.asarray(_air_amplitude(jnp.asarray([0.5]), CFG_ISO))[0]
    assert np.all(near > 0.99)


def test_iso_direct_analytic():
    """Direct path in ISO mode: amplitude = 10^(-alpha d / 20)/(d+1)."""
    scene = Scene.from_triangles(box_room(size=(80.0, 20.0, 80.0)), CFG_ISO)
    src = jnp.asarray([-15.0, 0.0, 0.0])
    lst = jnp.asarray([15.0, 0.0, 0.0])
    ir = direct_ir(scene.device_arrays(), src, lst, cfg=CFG_ISO)
    d = 30.0
    alpha = np.asarray(iso9613_alpha(
        AIR_BAND_HZ, CFG_ISO.air_temperature_c, CFG_ISO.air_humidity_pct,
        CFG_ISO.air_pressure_kpa,
    ))
    expect = (10.0 ** (-alpha * d / 20.0) / (d + 1.0)) ** 2
    np.testing.assert_allclose(
        np.asarray(ir.energy).sum(axis=1), expect, rtol=1e-4
    )


@pytest.mark.parametrize("intersector", ["mt", "mxu"])
def test_iso_trace_backends_agree(intersector):
    scene = Scene.from_triangles(box_room(size=(12.0, 5.0, 9.0)), CFG_ISO)
    src = jnp.asarray([3.0, 1.0, 2.0])
    lst = jnp.asarray([-3.0, -1.0, -2.0])
    dirs = jnp.asarray(fibonacci_sphere(1024))
    a = trace_ir(scene.device_arrays(), src, lst, cfg=CFG_ISO, max_bounces=3,
                 dirs=dirs, intersector="mt")
    b = trace_ir(scene.device_arrays(), src, lst, cfg=CFG_ISO, max_bounces=3,
                 dirs=dirs, intersector=intersector)
    np.testing.assert_allclose(
        np.asarray(a.energy), np.asarray(b.energy), rtol=2e-3, atol=1e-10
    )


@pytest.mark.parametrize("mode", ["fused", "flat"])
@pytest.mark.slow
def test_iso_pallas_matches_xla(mode):
    from audio_raytracing_tpu.ops.pallas_trace import trace_ir_pallas

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048,
                              air_model="iso9613")
    scene = Scene.from_triangles(box_room(size=(6.0, 3.0, 5.0)), cfg)
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    dirs = jnp.asarray(fibonacci_sphere(1024))
    a = trace_ir(scene.device_arrays(), src, lst, cfg=cfg, max_bounces=3,
                 dirs=dirs)
    kw = dict(cfg=cfg, max_bounces=3, dirs=dirs, interpret=True,
              fused_hist=True)
    if mode == "flat":
        kw.update(flat_bands=True)
    b = trace_ir_pallas(scene.device_arrays(), src, lst, **kw)
    np.testing.assert_allclose(
        np.asarray(b.energy)[:, :-1], np.asarray(a.energy)[:, :-1],
        rtol=2e-2, atol=1e-8,
    )


def test_iso_ism_and_diffraction_run():
    """ISM + diffraction families honor the air model (smoke + band order)."""
    from audio_raytracing_tpu.models.diffraction import (
        diffraction_ir_utd,
        extract_wedges,
    )
    from audio_raytracing_tpu.models.ism import image_source_ir

    scene = Scene.from_triangles(box_room(size=(12.0, 5.0, 9.0)), CFG_ISO)
    src = jnp.asarray([3.0, 1.0, 2.0])
    lst = jnp.asarray([-3.0, -1.0, -2.0])
    ir = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG_ISO, order=2)
    e = np.asarray(ir.energy).sum(axis=1)
    assert np.all(e > 0) and e[0] > e[3]

    screen = np.float32([
        [[0.0, -1.0, -6.0], [0.0, 2.5, -6.0], [0.0, 2.5, 6.0]],
        [[0.0, -1.0, -6.0], [0.0, 2.5, 6.0], [0.0, -1.0, 6.0]],
    ])
    sc2 = Scene.from_triangles(screen, CFG_ISO)
    w = extract_wedges(screen)
    di = diffraction_ir_utd(
        sc2.device_arrays(), w, jnp.asarray([-2.0, 0.0, 0.0]),
        jnp.asarray([2.0, 0.0, 0.0]), cfg=CFG_ISO,
    )
    assert float(jnp.sum(di.energy)) > 0
