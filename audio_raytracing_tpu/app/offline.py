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
(default), exact image sources (orders <= 2), or the ISM+tail hybrid.
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
    ap.add_argument("--model", choices=("trace", "ism", "hybrid"),
                    default="trace")
    ap.add_argument("--sh-order", type=int, default=None,
                    help="higher-order ambisonic bed (trace model only)")
    ap.add_argument("--rays", type=int, default=None)
    ap.add_argument("--bounces", type=int, default=None)
    ap.add_argument("--ism-order", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0, help="hybrid PRNG seed")
    ap.add_argument("--material", action="append", default=[],
                    metavar="NAME=PRESET",
                    help="map an OBJ usemtl name to an acoustic preset")
    ap.add_argument("--speakers", type=int, default=None,
                    help="decode to an N-speaker fibonacci rig instead of "
                         "binaural stereo (implies an HOA bed)")
    ap.add_argument("--ir-length", type=int, default=None,
                    help="impulse-response length in samples")
    return ap


def main(argv=None) -> str:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..engine.renderer import render_ir_offline
    from ..models.ir import ambisonic_ir, fibonacci_sphere
    from ..models.scene import Scene
    from ..ops.conv_partitioned import convolve_direct
    from ..utils import quat

    args = build_parser().parse_args(argv)
    cfg = DEFAULT_CONFIG
    if args.ir_length:
        cfg = dataclasses.replace(cfg, ir_length=args.ir_length)

    materials = None
    if args.material:
        materials = {}
        for m in args.material:
            name, _, preset = m.partition("=")
            if not preset:
                raise SystemExit(f"--material needs NAME=PRESET (got {m!r})")
            materials[name] = preset
    scene = Scene.from_obj(args.scene, cfg, materials=materials)

    sources = [
        {"samples": load_sound(w, cfg.sample_rate), "pos": _vec3(p),
         "gain": args.gain}
        for w, p in args.source
    ]

    if args.model == "trace":
        speaker_dirs = (
            jnp.asarray(fibonacci_sphere(args.speakers))
            if args.speakers else None
        )
        out = render_ir_offline(
            scene, sources, args.listener, listener_yaw=args.yaw,
            listener_pitch=args.pitch, cfg=cfg, n_rays=args.rays,
            max_bounces=args.bounces, sh_order=args.sh_order,
            speaker_dirs=speaker_dirs,
        )
    else:
        # deterministic ISM / hybrid models: build each source's first-order
        # ambisonic IR from the model family, then the same decode chain
        from ..engine.system import default_hrtf
        from ..models.ism import hybrid_ir, image_source_ir

        if args.speakers or args.sh_order:
            raise SystemExit(
                "--speakers/--sh-order currently require --model trace"
            )
        hl, hr = (jnp.asarray(h) for h in default_hrtf())
        arrays = scene.device_arrays()
        listener = jnp.asarray(args.listener, jnp.float32)
        orient = quat.quat_from_roll_pitch_yaw(
            np.float32(args.pitch), np.float32(args.yaw), np.float32(0.0)
        )
        n_max = max(len(s["samples"]) for s in sources)
        amb_total = None
        for s in sources:
            if args.model == "ism":
                ir = image_source_ir(arrays, jnp.asarray(s["pos"], jnp.float32),
                                     listener, cfg=cfg, order=args.ism_order)
            else:
                ir = hybrid_ir(arrays, jnp.asarray(s["pos"], jnp.float32),
                               listener, cfg=cfg, order=args.ism_order,
                               n_rays=args.rays, max_bounces=args.bounces,
                               key=jax.random.PRNGKey(args.seed))
            amb = ambisonic_ir(ir)
            dry = jnp.asarray(np.pad(s["samples"], (0, n_max - len(s["samples"]))))
            wet = convolve_direct(dry[None, :] * s["gain"], amb)
            amb_total = wet if amb_total is None else amb_total + wet
        xyz = amb_total[1:4].T
        rot = quat.rotate(jnp.asarray(orient)[None, :], xyz).T
        amb_rot = jnp.concatenate([amb_total[:1], rot], axis=0)
        left = jnp.sum(convolve_direct(amb_rot, hl), axis=0)
        right = jnp.sum(convolve_direct(amb_rot, hr), axis=0)
        out = np.asarray(jnp.stack([left, right], axis=-1))

    write_wav(args.out, out.astype(np.float32), cfg.sample_rate)
    peak = float(np.abs(out).max()) if out.size else 0.0
    msg = (f"wrote {args.out}: {out.shape[0]} samples x {out.shape[1]} ch, "
           f"peak {peak:.4f} (model={args.model})")
    print(msg)
    return msg


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
