#!/usr/bin/env python
"""Big-scene scaling benchmark (separate from the driver-tracked bench.py
to keep its compile budget small): subdivided rooms at 3k, 49k, and 196k
triangles, traced by the fused Pallas kernel (group_fori large-scene mode,
supergroup culling on AND off), the HBM-streamed kernel (stream_tris —
the 196k scene's tri table exceeds VMEM, the resident kernel cannot load
it), the XLA MXU path, and — at the large sizes — the BIH traversal path
(ops/traverse.py, sub-linear broad phase).
Prints one JSON line; headline = the fastest path on the largest scene.

--open benchmarks an OPEN scene instead (open_courtyard: a subdivided
ground plane + ~200 scattered boxes under open sky, ~49k tris): rays
that miss everything escape and die, and the geometry is dense near the
listener inside a huge sparse arena — the scene class the closed test
rooms never exercise (the sg_tcap dead-end note in NEXT.md flagged it as
unbenchmarked).
"""

import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def open_courtyard(n_boxes=200, k_box=4, k_ground=72, extent=40.0, seed=7):
    """Open outdoor scene: ground grid at y=-1 plus scattered subdivided
    boxes (box_room_subdivided reused as a box — normal orientation is
    irrelevant to the two-sided intersectors). ~48.8k triangles at the
    defaults; the center court is kept clear for the source/listener."""
    from audio_raytracing_tpu.models.scene import box_room_subdivided

    rng = np.random.default_rng(seed)
    e = extent / 2.0
    xs = np.linspace(-e, e, k_ground + 1, dtype=np.float32)
    zs = np.linspace(-e, e, k_ground + 1, dtype=np.float32)
    parts = []
    for i in range(k_ground):
        for j in range(k_ground):
            p00 = np.float32([xs[i], -1.0, zs[j]])
            p10 = np.float32([xs[i + 1], -1.0, zs[j]])
            p01 = np.float32([xs[i], -1.0, zs[j + 1]])
            p11 = np.float32([xs[i + 1], -1.0, zs[j + 1]])
            parts.append([p00, p11, p10])
            parts.append([p00, p01, p11])
    ground = np.asarray(parts, np.float32)
    boxes = []
    for _ in range(n_boxes):
        sx, sz = rng.uniform(1.0, 4.0, 2)
        sy = rng.uniform(2.0, 8.0)
        cx, cz = rng.uniform(-e + 3.0, e - 3.0, 2)
        if abs(cx) < 4.0 and abs(cz) < 4.0:  # clear the center court
            cx += 8.0 if cx >= 0 else -8.0
        boxes.append(
            box_room_subdivided(
                size=(sx, sy, sz), center=(cx, -1.0 + sy / 2.0, cz), k=k_box
            )
        )
    return np.concatenate([ground] + boxes).astype(np.float32)


def _med(step, n=5):
    step(0)
    step(1)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        step(i + 2)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax.numpy as jnp

    from audio_raytracing_tpu.utils.compile_cache import enable as _cc
    _cc(Path(__file__).resolve().parent / ".jax_compile_cache")

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import (
        fibonacci_sphere,
        fibonacci_sphere_sorted,
        trace_ir,
    )
    from audio_raytracing_tpu.models.scene import Scene, box_room_subdivided
    from audio_raytracing_tpu.ops.pallas_trace import trace_ir_pallas

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    rays = 1 << 15
    bounces = 4
    dirs = jnp.asarray(fibonacci_sphere(rays))
    dirs_sorted = jnp.asarray(fibonacci_sphere_sorted(rays))
    lst = jnp.asarray([-1.0, 0.0, -0.5])
    srcs = [jnp.asarray([1.0 + 0.001 * i, 0.3, 0.5]) for i in range(8)]

    if "--open" in sys.argv[1:]:
        scene = Scene.from_triangles(open_courtyard(), cfg)
        arrays = scene.device_arrays()
        T = int(arrays.v0.shape[0])
        row = {"triangles": int(scene.n_triangles), "padded": T}
        osrcs = [jnp.asarray([0.001 * i, 0.5, 0.0]) for i in range(8)]
        olst = jnp.asarray([2.0, 0.0, 1.0])

        def make_step(wf):
            def step(i):
                ir = trace_ir_pallas(
                    arrays, osrcs[i % 8], olst, cfg=cfg,
                    max_bounces=bounces, dirs=dirs_sorted, fused_hist=True,
                    flat_bands=True, sg_cull=True, group_fori=True,
                    wavefront=wf,
                )
                float(jnp.sum(ir.energy))
            return step

        for wf, key in ((False, "pallas_sgcull_ms"),
                        (True, "pallas_wavefront_ms")):
            try:
                print(f"[open] pallas wavefront={wf}...", file=sys.stderr,
                      flush=True)
                row[key] = _med(make_step(wf)) * 1e3
            except Exception as e:  # noqa: BLE001
                row[key.replace("_ms", "_err")] = repr(e)[:200]
        best = min(v for key, v in row.items() if key.endswith("_ms"))
        row["trace_ms"] = best
        row["tests_per_sec"] = rays * bounces * T * 2 / (best / 1e3)
        print(json.dumps({
            "metric": "openscene_ray_triangle_tests_per_sec",
            "value": row["tests_per_sec"],
            "unit": "tests/s",
            "extra": {"rays": rays, "bounces": bounces, **row},
        }))
        return

    sizes = {}
    for k in (16, 64, 128):
        scene = Scene.from_triangles(
            box_room_subdivided(size=(10.0, 4.0, 8.0), k=k), cfg
        )
        arrays = scene.device_arrays()
        T = int(arrays.v0.shape[0])
        row = {"triangles": int(scene.n_triangles), "padded": T}

        # the MXU path materializes a (rays, 3T) f32 Woop matrix; at
        # k=64 (T=49152) the full 32768-ray batch is 19.3 GB and OOMs
        # 16 GB HBM (measured) — chunk rays via the sharded-path hooks
        # (total_rays normalization + direct term on chunk 0 only)
        n_chunks = 1
        while rays * T * 3 * 4 // n_chunks > (6 << 30):
            n_chunks *= 2  # power of two: divides the ray count evenly
        ray_chunks = jnp.reshape(dirs, (n_chunks, rays // n_chunks, 3))

        def xla_step(i):
            e = 0.0
            for c in range(n_chunks):
                ir = trace_ir(arrays, srcs[i % 8], lst, cfg=cfg,
                              max_bounces=bounces, dirs=ray_chunks[c],
                              total_rays=rays, include_direct=(c == 0),
                              intersector="mxu", scatter="matmul")
                e += float(jnp.sum(ir.energy))

        print(f"[k={k}] xla...", file=sys.stderr, flush=True)
        row["xla_ms"] = _med(xla_step) * 1e3
        if n_chunks > 1:
            row["xla_ray_chunks"] = n_chunks

        if k < 128:  # resident kernel: T=196608 x 24 f32 cols > 16 MB VMEM
            for sg in (False, True):
                def pallas_step(i, sg=sg):
                    ir = trace_ir_pallas(
                        arrays, srcs[i % 8], lst, cfg=cfg,
                        max_bounces=bounces, dirs=dirs_sorted,
                        fused_hist=True, flat_bands=True, sg_cull=sg,
                        wavefront=False,  # labeled A/B: auto would engage
                    )
                    float(jnp.sum(ir.energy))

                try:
                    print(f"[k={k}] pallas sg={sg}...", file=sys.stderr,
                          flush=True)
                    row["pallas_sgcull_ms" if sg else "pallas_ms"] = (
                        _med(pallas_step) * 1e3
                    )
                except Exception as e:  # keep the other paths' numbers
                    row["pallas_sgcull_err" if sg else "pallas_err"] = (
                        repr(e)[:200]
                    )

        if k >= 64:
            # wavefront: per-bounce ray re-sorting (octant, origin-morton)
            # between single-bounce state_io kernel launches keeps the
            # sg_cull reach test tight at every depth. Measured 159 vs
            # 205 ms at 49k (resident) and 438 vs 655 ms at 196k
            # (auto-streamed past 98k padded tris); slower at 3072 (sort
            # unrepaid), so it runs at k>=64 only
            def wavefront_step(i):
                ir = trace_ir_pallas(
                    arrays, srcs[i % 8], lst, cfg=cfg, max_bounces=bounces,
                    dirs=dirs_sorted, fused_hist=True, flat_bands=True,
                    sg_cull=True, group_fori=True, wavefront=True,
                )
                float(jnp.sum(ir.energy))

            try:
                print(f"[k={k}] pallas wavefront...", file=sys.stderr,
                      flush=True)
                row["pallas_wavefront_ms"] = _med(wavefront_step) * 1e3
            except Exception as e:
                row["pallas_wavefront_err"] = repr(e)[:200]

        if k >= 64:
            # HBM-streamed kernel: tri-table chunks pipelined from HBM,
            # per-tile ray state in VMEM scratch — scene size bounded by
            # HBM, not VMEM
            def stream_step(i):
                ir = trace_ir_pallas(
                    arrays, srcs[i % 8], lst, cfg=cfg, max_bounces=bounces,
                    dirs=dirs_sorted, fused_hist=True, flat_bands=True,
                    stream_tris=8192, wavefront=False,
                )
                float(jnp.sum(ir.energy))

            try:
                print(f"[k={k}] pallas stream...", file=sys.stderr, flush=True)
                row["pallas_stream_ms"] = _med(stream_step) * 1e3
            except Exception as e:
                row["pallas_stream_err"] = repr(e)[:200]

        if k == 64:
            # the BIH traversal path (never benchmarked in r1), measured
            # at a REDUCED 4096-ray batch: the vmapped while_loop walk is
            # gather-bound on TPU (~12 ms/ray-bounce-visit serialization,
            # no MXU) — at the full 32768-ray batch the minutes-long
            # device program trips the TPU watchdog and kills the worker
            # (measured; benchmarks/RESULTS.md "BIH traversal on TPU").
            # The field is ray-count-normalized out of the `best` min.
            arena = scene.device_bih()
            bih_rays = 1 << 12
            bih_dirs = jnp.asarray(fibonacci_sphere(bih_rays))

            def bih_step(i):
                ir = trace_ir(arrays, srcs[i % 8], lst, cfg=cfg,
                              max_bounces=bounces, dirs=bih_dirs,
                              intersector="bih", bih_arena=arena)
                float(jnp.sum(ir.energy))

            try:
                print(f"[k={k}] bih (4096 rays)...", file=sys.stderr,
                      flush=True)
                row["bih_ms_at_4096_rays"] = _med(bih_step, n=1) * 1e3
            except Exception as e:
                row["bih_err"] = repr(e)[:200]

        best = min(
            v for key, v in row.items() if key.endswith("_ms")
        )
        row["trace_ms"] = best
        row["tests_per_sec"] = rays * bounces * T * 2 / (best / 1e3)
        sizes[f"k{k}"] = row

    big = sizes["k128"]
    print(json.dumps({
        "metric": "bigscene_ray_triangle_tests_per_sec",
        "value": big["tests_per_sec"],
        "unit": "tests/s",
        "extra": {"rays": rays, "bounces": bounces, **sizes},
    }))


if __name__ == "__main__":
    main()
