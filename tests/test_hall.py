"""The generated multi-material hall scene (tools/make_hall_obj.py +
data/hall.obj): materials pipeline end to end on a non-trivial scene —
usemtl groups -> presets (absorption/scattering/transmission), audible
physics (curtain transmission, absorptive-hall decay)."""

import dataclasses
import importlib.util as ilu
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import direct_ir, trace_ir
from audio_raytracing_tpu.models.metrics import rt60
from audio_raytracing_tpu.models.scene import Scene

ROOT = Path(__file__).resolve().parent.parent
spec = ilu.spec_from_file_location("make_hall", ROOT / "tools" / "make_hall_obj.py")
make_hall = ilu.module_from_spec(spec)
spec.loader.exec_module(make_hall)

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=16384)


def test_generator_is_deterministic(tmp_path):
    out = tmp_path / "hall.obj"
    make_hall.build().write(out)
    assert out.read_text() == (ROOT / "data" / "hall.obj").read_text()


def test_hall_loads_with_materials():
    scene = Scene.from_obj(ROOT / "data" / "hall.obj", CFG,
                           materials=make_hall.HALL_MATERIALS)
    assert scene.n_triangles == 64
    assert scene.transmission is not None  # glass + curtain
    # audience rows got the audience preset's heavy top-band absorption
    from audio_raytracing_tpu.models.materials import MATERIAL_PRESETS
    from audio_raytracing_tpu.utils.obj import load_obj

    mesh = load_obj(ROOT / "data" / "hall.obj")
    aud_rows = [i for i, m in enumerate(mesh.material_ids)
                if mesh.material_names[m] == "Audience"]
    assert aud_rows
    np.testing.assert_allclose(
        scene.absorption[aud_rows],
        np.tile(MATERIAL_PRESETS["audience"].absorption, (len(aud_rows), 1)),
    )


def test_curtain_transmits_direct_path():
    """A listener behind the rear curtain still hears the direct sound at
    the curtain's per-band transmission (vs silence with opaque mapping).

    ISO air model: the reference clamp law would zero the top band at
    this 6.5 m distance regardless of the curtain. The curtain is a
    TWO-SIDED sheet (coincident flipped faces, so it reflects and
    diffracts from both sides), so the through-path crosses two faces
    and the energy scales as tau^2 — the documented cost of the
    double-sided modeling."""
    cfg = dataclasses.replace(CFG, air_model="iso9613")
    scene = Scene.from_obj(ROOT / "data" / "hall.obj", cfg,
                           materials=make_hall.HALL_MATERIALS)
    src = jnp.asarray([5.0, 1.6, 0.0])       # in front of the curtain
    lst = jnp.asarray([11.5, 1.6, 0.0])      # behind it
    ir = direct_ir(scene.device_arrays(), src, lst, cfg=cfg)
    e = np.asarray(ir.energy).sum(axis=1)
    assert e.min() > 1e-10  # audible through the curtain in every band
    # opaque mapping (no transmission): silent
    opaque = {k: v for k, v in make_hall.HALL_MATERIALS.items()
              if k not in ("Curtain", "Window")}
    scene0 = Scene.from_obj(ROOT / "data" / "hall.obj", cfg, materials=opaque)
    ir0 = direct_ir(scene0.device_arrays(), src, lst, cfg=cfg)
    assert float(jnp.sum(ir0.energy)) == 0.0
    # band shape follows the curtain preset's tau^2 (two crossings)
    from audio_raytracing_tpu.models.materials import MATERIAL_PRESETS

    tau = np.asarray(MATERIAL_PRESETS["curtain"].transmission)
    ratio = e / e.max()
    want = (tau / tau.max()) ** 2
    np.testing.assert_allclose(ratio, want, rtol=0.25)


def test_hall_reverberates_plausibly():
    scene = Scene.from_obj(ROOT / "data" / "hall.obj", CFG,
                           materials=make_hall.HALL_MATERIALS)
    ir = trace_ir(
        scene.device_arrays(), jnp.asarray([-9.0, 1.7, 0.0]),
        jnp.asarray([5.0, 1.6, 0.0]), cfg=CFG, n_rays=4096, max_bounces=8,
    )
    t60 = float(rt60(ir.energy, cfg=CFG))
    assert 0.2 < t60 < 2.5  # a furnished hall, not an anechoic void
