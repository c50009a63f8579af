#!/usr/bin/env python
"""On-hardware cost attribution of the fused trace kernel by ablation.

The r2 roofline (tools/vpu_peak.py, benchmarks/vpu_roofline.json) says the
fused kernel reaches ~46% of the bare path-pass inner loop's speed of
light and asserts the rest "goes to winner selection, one-hot MXU
binning, emission math, reflection" — this script MEASURES that split.
Each variant removes one component via the kernel's `ablate` flag
(results numerically wrong, dataflow preserved so the compiler cannot
dead-code around the removal) and the timing delta against the full
kernel attributes its cost. The combined variant
(no_shadow+no_sweep+no_emit+no_hist) is the in-situ intersection-only
kernel: the path pass + reflection alone, in their real register/loop
context — a tighter algorithmic speed-of-light than the bare microbench.

Writes benchmarks/ablate_kernel.json and prints one JSON line per
variant. Run on the TPU (each Mosaic compile takes ~4 min through the
remote relay; ~30 min total for all variants).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

VARIANTS = [
    "",  # full kernel (the bench configuration)
    "no_sweep",
    "no_hist",
    "no_emit",
    "no_shadow",
    "no_sweep+no_emit+no_hist",
    "no_shadow+no_sweep+no_emit+no_hist",  # in-situ intersection only
]


def main(n_rays=1 << 20, bounces=8, iters=10, warmup=3):
    import jax
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
    from audio_raytracing_tpu.models.scene import Scene
    from audio_raytracing_tpu.ops.pallas_trace import (
        trace_contributions_pallas,
    )

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    arrays = scene.device_arrays()
    dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))
    lst = jnp.asarray([-1.0, 0.0, -0.5])
    srcs = [jnp.asarray([1.0 + 0.001 * i, 0.3, 0.5]) for i in range(16)]
    it = iter(range(10**9))

    results = {}
    t_full = None
    for ab in VARIANTS:
        fn = jax.jit(
            partial(
                trace_contributions_pallas,
                cfg=cfg, max_bounces=bounces, fused_hist=True,
                flat_bands=True, ablate=ab,
            ),
            static_argnames=(),
        )

        def step():
            h = fn(arrays, srcs[next(it) % 16], lst, dirs)
            float(jnp.sum(h))  # host transfer: the only reliable barrier

        t0 = time.perf_counter()
        step()
        compile_s = time.perf_counter() - t0
        for _ in range(warmup):
            step()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            step()
            ts.append(time.perf_counter() - t0)
        t_med = float(np.median(ts))
        name = ab or "full"
        if t_full is None:
            t_full = t_med
        row = {
            "variant": name,
            "ms": t_med * 1e3,
            "compile_s": compile_s,
            "saved_ms_vs_full": (t_full - t_med) * 1e3,
            "pct_of_full": 100.0 * t_med / t_full,
        }
        results[name] = row
        print(json.dumps(row), flush=True)

    out = {
        "n_rays": n_rays,
        "bounces": bounces,
        "backend": jax.default_backend(),
        "variants": results,
    }
    (ROOT / "benchmarks" / "ablate_kernel.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({"wrote": "benchmarks/ablate_kernel.json"}))


if __name__ == "__main__":
    main()
