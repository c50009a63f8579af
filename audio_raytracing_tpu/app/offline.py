"""Offline IR-render CLI: scene + dry WAVs -> spatialized output.

The command-line face of the IR pipeline (render_ir_offline) the way
app/demo.py is the face of the interactive engine:

    python -m audio_raytracing_tpu.app.offline scene.obj out.wav \
        --source sound.wav 2,0.5,-1 [--source ...] \
        [--listener 0,0,0] [--yaw 0.4] [--pitch 0.0] \
        [--model trace|ism|hybrid] [--sh-order N] [--rays N] [--bounces N] \
        [--material NAME=PRESET ...] [--speakers N]

--material maps OBJ usemtl names to acoustic presets (models/materials.py)
— e.g. --material Floor=carpet --material Walls=brick. --speakers N writes
an N-channel speaker-rig WAV (fibonacci rig) instead of binaural stereo.
--model picks the acoustic model family: the Monte-Carlo specular tracer
(default), exact image sources (orders <= 4), the ISM+tail hybrid, or
"full" = hybrid + UTD edge diffraction (shadow-zone arrivals around
occluders, models/diffraction.py); --diffraction-order 2/3 adds the
edge-to-edge (double) UTD paths.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..config import DEFAULT_CONFIG
from ..utils.wav import load_sound, write_wav


def _vec3(s: str):
    parts = [float(x) for x in s.split(",")]
    if len(parts) != 3:
        raise argparse.ArgumentTypeError(f"expected x,y,z (got {s!r})")
    return parts


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="audio_raytracing_tpu.app.offline", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("scene", help="OBJ scene file")
    ap.add_argument("out", help="output WAV path")
    ap.add_argument("--source", nargs=2, action="append", required=True,
                    metavar=("WAV", "X,Y,Z"), help="dry sound + position")
    ap.add_argument("--gain", type=float, default=1.0)
    ap.add_argument("--listener", type=_vec3, default=[0.0, 0.0, 0.0])
    ap.add_argument("--yaw", type=float, default=0.0)
    ap.add_argument("--pitch", type=float, default=0.0)
    ap.add_argument("--model", choices=("trace", "ism", "hybrid", "full"),
                    default="trace")
    ap.add_argument("--sh-order", type=int, default=None,
                    help="higher-order ambisonic bed (trace model only)")
    ap.add_argument("--rays", type=int, default=None)
    ap.add_argument("--bounces", type=int, default=None)
    ap.add_argument("--ism-order", type=int, default=2)
    ap.add_argument("--ism-planes", action="store_true",
                    help="ISM/hybrid/full: enumerate image sources over the "
                         "scene's unique PLANES instead of triangle tuples "
                         "(exact; orders of magnitude faster on subdivided "
                         "architectural scenes, and required for "
                         "--ism-order 5/6)")
    ap.add_argument("--diffraction-order", type=int, choices=(1, 2, 3),
                    default=1,
                    help="--model full: 2 adds edge-to-edge (double) UTD "
                         "paths — thick barriers, double screens, strips")
    ap.add_argument("--directivity", default=None, metavar="PRESET[@X,Y,Z]",
                    help="source radiation pattern for all sources "
                         "(models/directivity.py presets: omni, cardioid, "
                         "supercardioid, figure8, speaker, voice), with an "
                         "optional emission axis — e.g. cardioid@0,0,-1")
    ap.add_argument("--seed", type=int, default=0, help="hybrid PRNG seed")
    ap.add_argument("--tail", choices=("xla", "pallas"), default="xla",
                    help="hybrid/full Monte-Carlo tail backend: 'pallas' "
                         "runs it on the fused kernel (~4x faster on TPU; "
                         "counter-hash RNG seeded by --seed)")
    ap.add_argument("--tail-interpret", action="store_true",
                    help=argparse.SUPPRESS)  # pallas interpret mode (CPU CI)
    ap.add_argument("--tail-wavefront", action="store_true",
                    help="per-bounce ray re-sorting on the pallas tail "
                         "(big scenes: 1.46x at 49k tris, 1.68x at 196k; "
                         "requires --tail pallas and a scene large enough "
                         "for the group_fori+sg_cull kernel)")
    ap.add_argument("--material", action="append", default=[],
                    metavar="NAME=PRESET",
                    help="map an OBJ usemtl name to an acoustic preset")
    ap.add_argument("--hoa-hrtf", default="magls4",
                    help="HOA binaural decoder: 'magls4' (max-rE "
                         "truncation through the reference 4-ch MagLS "
                         "bank), 'sphere' (full order-N rigid-sphere "
                         "bank), or a path to a converted MEASURED bank "
                         "npz (tools/convert_sofa.py ingests any "
                         "SimpleFreeFieldHRIR SOFA set)")
    ap.add_argument("--speakers", type=int, default=None,
                    help="decode to an N-speaker fibonacci rig instead of "
                         "binaural stereo (implies an HOA bed)")
    ap.add_argument("--ir-length", type=int, default=None,
                    help="impulse-response length in samples")
    ap.add_argument("--air", default=None, metavar="MODEL[@T_C,RH%]",
                    help="IR air-absorption model: 'reference' (default; "
                         "the clamp law) or 'iso9613' with optional "
                         "temperature/humidity — e.g. iso9613@10,80")
    return ap


def main(argv=None) -> str:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..engine.renderer import render_ir_offline
    from ..models.ir import fibonacci_sphere
    from ..models.scene import Scene

    args = build_parser().parse_args(argv)
    if args.tail_wavefront and args.tail != "pallas":
        raise SystemExit("--tail-wavefront requires --tail pallas")
    cfg = DEFAULT_CONFIG
    if args.ir_length is not None:
        if args.ir_length <= 0:
            raise SystemExit("--ir-length must be positive")
        cfg = dataclasses.replace(cfg, ir_length=args.ir_length)

    if args.air:
        name, _, cond = args.air.partition("@")
        if name not in ("reference", "iso9613"):
            raise SystemExit(f"unknown air model {name!r}")
        kw = {"air_model": name}
        if cond:
            try:
                t_c, rh = (float(x) for x in cond.split(","))
            except ValueError:
                raise SystemExit(f"--air conditions must be T_C,RH (got {cond!r})")
            kw.update(air_temperature_c=t_c, air_humidity_pct=rh)
        cfg = dataclasses.replace(cfg, **kw)

    materials = None
    if args.material:
        materials = {}
        for m in args.material:
            name, _, preset = m.partition("=")
            if not preset:
                raise SystemExit(f"--material needs NAME=PRESET (got {m!r})")
            materials[name] = preset
    scene = Scene.from_obj(args.scene, cfg, materials=materials)

    directivity = None
    if args.directivity:
        from ..models.directivity import DIRECTIVITY_PRESETS

        name, _, axis = args.directivity.partition("@")
        if name not in DIRECTIVITY_PRESETS:
            raise SystemExit(
                f"unknown directivity preset {name!r}; available: "
                f"{sorted(DIRECTIVITY_PRESETS)}"
            )
        directivity = DIRECTIVITY_PRESETS[name]
        if axis:
            directivity = dataclasses.replace(
                directivity, axis=tuple(_vec3(axis))
            )

    try:
        sources = [
            {"samples": load_sound(w, cfg.sample_rate), "pos": _vec3(p),
             "gain": args.gain}
            for w, p in args.source
        ]
    except argparse.ArgumentTypeError as e:
        raise SystemExit(f"--source position: {e}")

    ir_fn = None
    if args.model != "trace":
        # deterministic ISM / hybrid model families, sharing the renderer's
        # decode chain through its ir_fn hook
        from ..models.ism import hybrid_ir, image_source_ir, plane_groups

        if args.speakers is not None or args.sh_order is not None:
            raise SystemExit(
                "--speakers/--sh-order currently require --model trace"
            )
        pg = (
            plane_groups(scene.device_arrays()) if args.ism_planes else None
        )
        if args.ism_order > 4 and pg is None:
            raise SystemExit("--ism-order 5/6 requires --ism-planes")
        if args.model == "ism":
            ir_fn = lambda arrays, pos, lst: image_source_ir(  # noqa: E731
                arrays, pos, lst, cfg=cfg, order=args.ism_order,
                src_directivity=directivity, planes=pg,
            )
        elif args.model == "hybrid":
            # pallas tail uses the counter-hash RNG seeded by rng_seed; a
            # threefry key alongside it raises (hybrid_ir's contract)
            ir_fn = lambda arrays, pos, lst: hybrid_ir(  # noqa: E731
                arrays, pos, lst, cfg=cfg, order=args.ism_order,
                n_rays=args.rays, max_bounces=args.bounces,
                key=None if args.tail == "pallas"
                else jax.random.PRNGKey(args.seed),
                src_directivity=directivity,
                tail_backend=args.tail, rng_seed=args.seed,
                tail_interpret=args.tail_interpret, planes=pg,
                tail_wavefront=True if args.tail_wavefront else None,
            )
        else:  # full: ISM early + MC tail + UTD edge diffraction
            from ..models.diffraction import (
                diffraction_ir_utd,
                diffraction_ir_utd2,
                diffraction_ir_utd3,
                extract_wedges,
            )
            from ..models.ir import ImpulseResponse

            t = scene.n_triangles
            tris = np.stack([scene.v0[:t], scene.v1[:t], scene.v2[:t]], axis=1)
            wedges = extract_wedges(tris)

            def ir_fn(arrays, pos, lst):  # noqa: E731
                hy = hybrid_ir(
                    arrays, pos, lst, cfg=cfg, order=args.ism_order,
                    n_rays=args.rays, max_bounces=args.bounces,
                    key=None if args.tail == "pallas"
                    else jax.random.PRNGKey(args.seed),
                    src_directivity=directivity,
                    tail_backend=args.tail, rng_seed=args.seed,
                    tail_interpret=args.tail_interpret, planes=pg,
                    tail_wavefront=True if args.tail_wavefront else None,
                )
                di = diffraction_ir_utd(arrays, wedges, pos, lst, cfg=cfg,
                                        src_directivity=directivity)
                energy = hy.energy + di.energy
                dir_sum = hy.dir_sum + di.dir_sum
                if args.diffraction_order >= 2:
                    d2 = diffraction_ir_utd2(arrays, wedges, pos, lst, cfg=cfg,
                                             src_directivity=directivity)
                    energy = energy + d2.energy
                    dir_sum = dir_sum + d2.dir_sum
                if args.diffraction_order >= 3:
                    d3 = diffraction_ir_utd3(arrays, wedges, pos, lst, cfg=cfg,
                                             src_directivity=directivity)
                    energy = energy + d3.energy
                    dir_sum = dir_sum + d3.dir_sum
                return ImpulseResponse(energy=energy, dir_sum=dir_sum)
    speaker_dirs = (
        jnp.asarray(fibonacci_sphere(args.speakers))
        if args.speakers is not None else None
    )
    out = render_ir_offline(
        scene, sources, args.listener, listener_yaw=args.yaw,
        listener_pitch=args.pitch, cfg=cfg, n_rays=args.rays,
        max_bounces=args.bounces, sh_order=args.sh_order,
        speaker_dirs=speaker_dirs, ir_fn=ir_fn, hoa_hrtf=args.hoa_hrtf,
        src_directivity=directivity,
    )

    write_wav(args.out, out.astype(np.float32), cfg.sample_rate)
    peak = float(np.abs(out).max()) if out.size else 0.0
    msg = (f"wrote {args.out}: {out.shape[0]} samples x {out.shape[1]} ch, "
           f"peak {peak:.4f} (model={args.model})")
    print(msg)
    return msg


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
