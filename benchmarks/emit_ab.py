#!/usr/bin/env python
"""Interleaved A/B of the emission stage's division cost (rsqrt_emit).

The r3 attribution leaves emission at ~0.8 ms of the ~35 ms fused trace;
its only non-FMA ops are one sqrt + one divide (listener distance) + one
rsqrt (half-vector) + one divide (distance law) per (row, bounce). Two
prior division-free experiments measured NEUTRAL (shadow_divfree,
fraction-carried intersection — RESULTS.md dead ends: divide latency
hides under surrounding issue slots), so the prior here is neutral; this
pins it with a measurement. ablate="rsqrt_emit" replaces the distance
sqrt+divide with rsqrt+muls (near-exact, measurement-only — the default
path keeps sqrt/divide for the bit-for-bit pallas==XLA contract).

Interleaved A,B,A,B in one process per the CLAUDE.md timing rule.
Config: plain fused kernel (ablate excludes inc_origin/n_true), 2^20
rays x 8 bounces, world.obj. Writes benchmarks/emit_ab.json.
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


def main(n_rays=1 << 20, bounces=8, iters=40, warmup=3):
    import jax
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
    from audio_raytracing_tpu.models.scene import Scene
    from audio_raytracing_tpu.ops.pallas_trace import (
        trace_contributions_pallas,
    )
    from audio_raytracing_tpu.utils.compile_cache import enable as _cc

    _cc(ROOT / "benchmarks" / ".jax_compile_cache")

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    arrays = scene.device_arrays()
    dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))
    lst = jnp.asarray([-1.0, 0.0, -0.5])
    srcs = [jnp.asarray([1.0 + 0.001 * i, 0.3, 0.5]) for i in range(16)]
    it = iter(range(10**9))

    fns = {}
    for name, abl in (("sqrt_div", ""), ("rsqrt", "rsqrt_emit")):
        fns[name] = jax.jit(partial(
            trace_contributions_pallas,
            cfg=cfg, max_bounces=bounces, fused_hist=True, flat_bands=True,
            ablate=abl,
        ))

    def step(name):
        h = fns[name](arrays, srcs[next(it) % 16], lst, dirs)
        return float(jnp.sum(h))

    sums = {}
    for name in fns:
        t0 = time.perf_counter()
        h = fns[name](arrays, srcs[0], lst, dirs)
        sums[name] = float(jnp.sum(h))
        print(f"compile {name}: {time.perf_counter() - t0:.1f} s",
              flush=True)
    rel = abs(sums["rsqrt"] - sums["sqrt_div"]) / abs(sums["sqrt_div"])
    assert rel < 1e-4, sums  # near-exact (last-ulp rsqrt association)

    for _ in range(warmup):
        for name in fns:
            step(name)
    ts = {name: [] for name in fns}
    for _ in range(iters):
        for name in fns:
            t0 = time.perf_counter()
            step(name)
            ts[name].append(time.perf_counter() - t0)

    out = {}
    for name in fns:
        arr = np.asarray(ts[name]) * 1e3
        out[name] = {"ms_median": float(np.median(arr)),
                     "ms_min": float(arr.min()),
                     "energy_sum": sums[name]}
    pair = np.asarray(ts["rsqrt"]) - np.asarray(ts["sqrt_div"])
    out["pairwise_delta_ms"] = {"median": float(np.median(pair) * 1e3),
                                "mean": float(pair.mean() * 1e3)}
    out["config"] = {"n_rays": n_rays, "bounces": bounces, "iters": iters,
                     "interleaved": True, "rel_sum_diff": rel}
    Path(ROOT / "benchmarks" / "emit_ab.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out, default=str)[:500])


if __name__ == "__main__":
    main()
