#!/usr/bin/env python
"""A/B the path pass's winner-accumulator split (winner_acc) on hardware.

The ablation (benchmarks/ablate_kernel.json) put 71% of the fused kernel
in the path pass + reflection, running at ~32% of the bare-loop rate; one
suspect is the n_groups-deep loop-carried compare/select chain (16 serial
group folds on world.obj). winner_acc=C keeps C independent winner
chains over contiguous group chunks and merges at the end — dependency
depth n_groups/C + (C-1) at the cost of (C-1) extra live vreg sets.
Bit-identical results (tested in interpret mode, rel L1 = 0).

Same timing discipline as ablate_kernel.py: varied sources, host-transfer
barrier, median of iters. Writes benchmarks/winner_acc_ab.json.
"""

from __future__ import annotations

import json
import sys
import time
import dataclasses
from functools import partial
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main(n_rays=1 << 20, bounces=8, iters=10, warmup=3, accs=(1, 2, 4)):
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
    sums = {}
    for acc in accs:
        fn = jax.jit(
            partial(
                trace_contributions_pallas,
                cfg=cfg, max_bounces=bounces, fused_hist=True,
                flat_bands=True, winner_acc=acc,
            ),
        )

        def step():
            h = fn(arrays, srcs[next(it) % 16], lst, dirs)
            return float(jnp.sum(h))  # host transfer barrier

        t0 = time.perf_counter()
        s = step()
        compile_s = time.perf_counter() - t0
        sums[acc] = s
        for _ in range(warmup):
            step()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            step()
            ts.append(time.perf_counter() - t0)
        row = {
            "winner_acc": acc,
            "ms": float(np.median(ts)) * 1e3,
            "compile_s": compile_s,
            "energy_sum_first": s,
        }
        results[str(acc)] = row
        print(json.dumps(row), flush=True)

    out = {
        "n_rays": n_rays, "bounces": bounces,
        "backend": jax.default_backend(), "variants": results,
    }
    (ROOT / "benchmarks" / "winner_acc_ab.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({"wrote": "benchmarks/winner_acc_ab.json"}))


if __name__ == "__main__":
    main()
