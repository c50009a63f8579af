#!/usr/bin/env python
"""A/B the three multi-listener trace routes that back batched serving
(engine/serving.py) at the serving shapes: world.obj, 2^15 rays x 6
bounces, L listeners in one dispatch (the r2 VERDICT item 4 diagnosis).

  mt         models/ir.trace_ir_multi_listener — one shared XLA path
             pass + L vmapped NEE lanes ((L, R, T) HBM temporaries).
  kernel     ops/pallas_trace.trace_irs_pallas_multi_listener — a
             lax.scan of L FULL fused-kernel traces (L path passes).
  nee        trace_irs_pallas_multi_listener_nee — one fused-kernel path
             pass per `listener_chunk` listeners, per-listener
             shadow/emission/binning VMEM-resident in-kernel.

Usage: python benchmarks/nee_routes_ab.py [L ...] (default 4 8 16)
Prints one JSON line per (route, L). Wall times carry the ~25 ms relay
round trip once per dispatch — all routes are single dispatches, so
same-run comparisons are fair.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import (
        fibonacci_sphere_sorted,
        trace_ir_multi_listener,
    )
    from audio_raytracing_tpu.models.scene import Scene
    from audio_raytracing_tpu.ops.pallas_trace import (
        trace_irs_pallas_multi_listener,
        trace_irs_pallas_multi_listener_nee,
    )
    from audio_raytracing_tpu.utils.compile_cache import enable as _cc

    _cc(ROOT / "benchmarks" / ".jax_compile_cache")
    Ls = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    arrays = scene.device_arrays()
    n_rays, bounces = 1 << 15, 6
    dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))
    src = jnp.asarray([1.0, 0.3, 0.5])
    rng = np.random.default_rng(0)
    it = iter(range(10**9))

    def listeners(L):
        base = rng.uniform(-1.5, 1.5, (L, 3)).astype(np.float32)
        return base

    routes = {
        "mt": lambda lst: trace_ir_multi_listener(
            arrays, src + 0.0001 * next(it), lst, cfg=cfg,
            max_bounces=bounces, dirs=dirs,
        ),
        "kernel": lambda lst: trace_irs_pallas_multi_listener(
            arrays, src + 0.0001 * next(it), lst, cfg=cfg,
            max_bounces=bounces, dirs=dirs, flat_bands=True, n_true=114,
        ),
        "nee": lambda lst: trace_irs_pallas_multi_listener_nee(
            arrays, src + 0.0001 * next(it), lst, cfg=cfg,
            max_bounces=bounces, dirs=dirs, flat_bands=True, n_true=114,
            inc_origin=True, listener_chunk=4,
        ),
    }
    for L in Ls:
        lst = jnp.asarray(listeners(L))
        for name, fn in routes.items():
            ir = fn(lst)
            float(jnp.sum(ir.energy))  # compile + warm
            ir = fn(lst)
            float(jnp.sum(ir.energy))
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                ir = fn(lst)
                float(jnp.sum(ir.energy))
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) * 1e3
            print(json.dumps({
                "route": name, "L": L, "ms": round(ms, 2),
                "ms_per_listener": round(ms / L, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
