#!/usr/bin/env python
"""Big-scene scaling benchmark (separate from the driver-tracked bench.py
to keep its compile budget small): 3072-triangle subdivided room, traced
by BOTH the fused Pallas kernel (group_fori large-scene mode) and the XLA
MXU path; the faster one is the headline. Prints one JSON line."""

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import (
        fibonacci_sphere,
        fibonacci_sphere_sorted,
        trace_ir,
    )
    from audio_raytracing_tpu.models.scene import Scene, box_room_subdivided
    from audio_raytracing_tpu.ops.pallas_trace import trace_ir_pallas

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_triangles(box_room_subdivided(size=(10.0, 4.0, 8.0), k=16), cfg)
    arrays = scene.device_arrays()
    rays = 1 << 15
    dirs = jnp.asarray(fibonacci_sphere(rays))
    dirs_sorted = jnp.asarray(fibonacci_sphere_sorted(rays))
    lst = jnp.asarray([-1.0, 0.0, -0.5])
    srcs = [jnp.asarray([1.0 + 0.001 * i, 0.3, 0.5]) for i in range(8)]

    def xla_step(i):
        ir = trace_ir(arrays, srcs[i % 8], lst, cfg=cfg, max_bounces=4,
                      dirs=dirs, intersector="mxu", scatter="matmul")
        float(jnp.sum(ir.energy))

    def pallas_step(i):
        # group_fori large-scene mode engages automatically (> 32 groups)
        ir = trace_ir_pallas(arrays, srcs[i % 8], lst, cfg=cfg, max_bounces=4,
                             dirs=dirs_sorted, fused_hist=True, flat_bands=True)
        float(jnp.sum(ir.energy))

    def med(step):
        step(0)
        step(1)
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            step(i + 2)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_xla = med(xla_step)
    try:
        t_pallas = med(pallas_step)
    except Exception:
        t_pallas = float("inf")
    t = min(t_xla, t_pallas)
    print(json.dumps({
        "metric": "bigscene_ray_triangle_tests_per_sec",
        "value": rays * 4 * arrays.v0.shape[0] * 2 / t,
        "unit": "tests/s",
        "extra": {"triangles": int(scene.n_triangles), "trace_ms": t * 1e3,
                  "rays": rays, "bounces": 4,
                  "path": "pallas_fori" if t_pallas < t_xla else "xla_mxu",
                  "xla_ms": t_xla * 1e3,
                  "pallas_ms": None if t_pallas == float("inf") else t_pallas * 1e3},
    }))


if __name__ == "__main__":
    main()
