#!/usr/bin/env python
"""FDTD wave-solver throughput (models/wave.py) on the current backend.

The leapfrog step is pure elementwise stencil work — the relevant
roofline is HBM bandwidth, not FLOPs. Per cell per step the
minimal-traffic model (perfect fusion, every array touched once;
face coefficients recomputed from occupancy on the fly) is
  reads:  p, vx, vy, vz, occ  = 5 x 4 B
  writes: p, vx, vy, vz       = 4 x 4 B
= 36 B/cell/step; est_hbm_bytes_per_sec = cells*steps*36/t against the
chip's HBM peak (~819 GB/s on a v5e) — measured/est > 1 means XLA is
making extra passes (pad materializations, unfused kernels), not that
the chip exceeds its roofline. One wave_run call scans all n_steps in a
single dispatch, so the relay round-trip amortizes away.

Usage: python benchmarks/bench_wave.py [--steps N] [--grid NX NY NZ]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--grid", type=int, nargs=3, default=None,
                    help="single grid size to run (default: sweep)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--pallas", action="store_true",
                    help="run the fused Pallas step kernel "
                    "(ops/pallas_wave.py) instead of the XLA solver")
    ap.add_argument("--block", type=int, default=None,
                    help="Pallas x-slab thickness (default: auto)")
    args = ap.parse_args()

    import jax

    from audio_raytracing_tpu.models import wave as W
    from audio_raytracing_tpu.utils.compile_cache import enable as _cc

    _cc(ROOT / "benchmarks" / ".jax_compile_cache")
    backend = jax.default_backend()

    grids = [tuple(args.grid)] if args.grid else [
        (128, 128, 128), (256, 192, 192),
    ]
    for shape in grids:
        occ = np.zeros(shape, np.float32)
        occ[1:-1, 1:-1, 1:-1] = 1.0
        dom = W.WaveDomain(occ=occ, dx=0.05, origin=(0.0, 0.0, 0.0))
        src = (5, shape[1] // 2, shape[2] // 2)
        lst = (shape[0] - 6, shape[1] // 2, shape[2] // 2)
        cells = int(np.prod(shape))

        if args.pallas:
            from audio_raytracing_tpu.ops.pallas_wave import wave_run_pallas

        def run(amp):
            # vary the pulse amplitude: the remote execution layer caches
            # byte-identical dispatches
            pulse, _ = W.source_pulse(args.steps, W.courant_dt(0.05, 350.0),
                                      350.0 / (16 * 0.05))
            if args.pallas:
                wir = wave_run_pallas(dom, src, lst, args.steps, c=350.0,
                                      alpha=0.2, pulse=pulse * amp,
                                      block=args.block)
            else:
                # kernel="xla" (not "auto"): this path benchmarks the XLA
                # solver specifically — auto would silently re-route big
                # grids to the pallas kernel and mislabel the result
                wir = W.wave_run(dom, src, lst, args.steps, c=350.0,
                                 alpha=0.2, pulse=pulse * amp,
                                 kernel="xla")
            return float(np.asarray(wir.pressure[-1]))

        run(1.0)  # warmup/compile
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            run(1.0 + 0.01 * (i + 1))
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        updates = cells * args.steps / t
        print(json.dumps({
            "metric": "wave_cell_updates_per_sec",
            "value": updates,
            "unit": "cell-updates/s",
            "extra": {
                "backend": backend,
                "kernel": "pallas" if args.pallas else "xla",
                "grid": list(shape),
                "cells": cells,
                "steps": args.steps,
                "wall_s": t,
                "est_hbm_bytes_per_sec": updates * 36.0,
                "ms_per_step": t / args.steps * 1e3,
            },
        }))


if __name__ == "__main__":
    main()
