#!/usr/bin/env python
"""Interleaved A/B of the winner-sweep lowering (mask_sweep) on hardware.

The r3 device-time attribution puts the cross-sublane winner sweep at
~1.7 ms of the ~35 ms fused trace (RESULTS.md "Re-attribution"). The
serial first-winning-sublane scan costs ~8*(4 + n_sel) dependent
(1, 128) steps per bounce; mask_sweep computes the IDENTICAL use-mask
and attribute sums full-vreg via a Hillis-Steele prefix-max over
sublanes (pltpu.roll) — bit-identical by construction (same formulas;
interpret equality incl. a forced-tie duplicated-triangle scene tested
in tests/test_pallas_trace.py). A sublane-halving select TREE was
tried first and rejected by analysis: strided fold slots lose index
order, so an exact-t tie between adjacent sublanes (i, i+1) with i odd
resolves to the HIGHER sublane — a different coincident hit than the
scan/XLA first-win fold.

Expected delta is ~1 ms, so per CLAUDE.md the variants are INTERLEAVED
in one process (A,B,A,B,...) — sequential runs drift with host load.
Production config = the AOT build's (n_true=114, inc_origin, hist_batch=4,
fused_hist, flat_bands). Writes benchmarks/sweep_ab.json.
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
    for name, flag in (("scan", False), ("mask", True)):
        fns[name] = jax.jit(partial(
            trace_contributions_pallas,
            cfg=cfg, max_bounces=bounces, fused_hist=True, flat_bands=True,
            n_true=114, inc_origin=True, hist_batch=4, mask_sweep=flag,
        ))

    def step(name):
        h = fns[name](arrays, srcs[next(it) % 16], lst, dirs)
        return float(jnp.sum(h))  # host transfer barrier

    sums = {}
    for name in fns:
        t0 = time.perf_counter()
        # SAME input for both variants — the bit-identical contract is
        # only meaningful on identical (arrays, src, lst, dirs)
        h = fns[name](arrays, srcs[0], lst, dirs)
        sums[name] = float(jnp.sum(h))
        print(f"compile {name}: {time.perf_counter() - t0:.1f} s",
              flush=True)
    assert sums["scan"] == sums["mask"], sums  # bit-identical contract

    for _ in range(warmup):
        for name in fns:
            step(name)
    ts = {name: [] for name in fns}
    for _ in range(iters):
        for name in fns:  # interleaved: A,B,A,B,...
            t0 = time.perf_counter()
            step(name)
            ts[name].append(time.perf_counter() - t0)

    out = {}
    for name in fns:
        arr = np.asarray(ts[name]) * 1e3
        out[name] = {"ms_median": float(np.median(arr)),
                     "ms_min": float(arr.min()),
                     "ms": [round(v, 2) for v in arr.tolist()],
                     "energy_sum": sums[name]}
    out["delta_ms_median"] = out["mask"]["ms_median"] - out["scan"]["ms_median"]
    pair = np.asarray(ts["mask"]) - np.asarray(ts["scan"])
    out["pairwise_delta_ms"] = {"median": float(np.median(pair) * 1e3),
                                "mean": float(pair.mean() * 1e3)}
    out["config"] = {"n_rays": n_rays, "bounces": bounces, "iters": iters,
                     "interleaved": True}
    Path(ROOT / "benchmarks" / "sweep_ab.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "config"},
                     default=str)[:600])


if __name__ == "__main__":
    main()
