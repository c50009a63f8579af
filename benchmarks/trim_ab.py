#!/usr/bin/env python
"""A/B the n_true padding trim (and other resident-kernel flags) on the
bench configuration: world.obj, 2^20 rays x 8 bounces, fused_hist +
flat_bands, single dispatch. Pass flag overrides as k=v args, e.g.

  python benchmarks/trim_ab.py n_true=114
  python benchmarks/trim_ab.py n_true=114 row_unroll=4

Prints one JSON line per variant (baseline first). The wall time
includes the ~23 ms relay round trip — compare DELTAS.
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


def main():
    import jax
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
    from audio_raytracing_tpu.models.scene import Scene
    from audio_raytracing_tpu.ops.pallas_trace import trace_ir_pallas
    from audio_raytracing_tpu.utils.compile_cache import enable as _cc

    _cc(ROOT / "benchmarks" / ".jax_compile_cache")

    # each ';'-separated group of k=v args is one variant, all timed in
    # one process (the relay's run-to-run wobble is ±2 ms: only same-run
    # deltas are comparable)
    variants = [{}]
    for a in sys.argv[1:]:
        if a == ";":
            variants.append({})
            continue
        k, v = a.split("=")
        variants[-1][k] = None if v == "None" else (
            int(v) if v.lstrip("-").isdigit() else v
        )

    n_rays, bounces = 1 << 20, 8
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    arrays = scene.device_arrays()
    dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))
    lst = jnp.asarray([-1.0, 0.0, -0.5])
    srcs = [jnp.asarray([1.0 + 0.001 * i, 0.3, 0.5]) for i in range(16)]
    it = iter(range(10**9))

    for kw in [{}] + variants:
        name = json.dumps(kw) if kw else "baseline"
        fn = partial(
            trace_ir_pallas, cfg=cfg, max_bounces=bounces, dirs=dirs,
            fused_hist=True, flat_bands=True, **kw,
        )

        def step():
            ir = fn(arrays, srcs[next(it) % 16], lst)
            return float(jnp.sum(ir.energy))

        t0 = time.perf_counter()
        e = step()
        compile_s = time.perf_counter() - t0
        step()
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            step()
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(json.dumps({
            "variant": name, "ms": ms, "compile_s": compile_s,
            "energy": e,
            "bounce_per_sec_single_dispatch": n_rays * bounces / ms * 1e3,
        }), flush=True)


if __name__ == "__main__":
    main()
