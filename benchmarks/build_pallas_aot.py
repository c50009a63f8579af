#!/usr/bin/env python
"""Compile the fused Pallas trace kernel ahead of time and serialize the
executable to benchmarks/pallas_trace_exec.pkl.

A fresh Mosaic compile costs minutes through this environment's
remote-compile relay; PJRT executable serialization
(jax.experimental.serialize_executable) loads in ~0.1 s and, unlike the
persistent compilation cache (utils/compile_cache.py, enabled here too),
skips the ~10-30 s tracing/lowering as well.
bench.py uses the artifact as the headline trace path when its source hash
matches ops/pallas_trace.py (stale artifacts are ignored). Re-run this
script after changing the kernel.

Shapes are the bench shapes: world.obj scene, 2^20 rays, 8 bounces,
ir_length 32768.
"""

import dataclasses
import hashlib
import pickle
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BENCH_RAYS = 1 << 20
BENCH_BOUNCES = 8
# the amortized-throughput variant (one dispatch, S IRs). 32 sources:
# per-trace device time is ~32.1 ms and the relay round trip ~22.7 ms, so
# the scan's amortized rate approaches the 2.61e8 bounces/s chip asymptote
# as (1 + 22.7/(32.1 S))^-1 — S=8 left ~8% on the table (measured 2.40e8),
# S=32 predicts ~2.54e8 at a still-moderate 1.05 s dispatch
BENCH_SOURCES = 32
ARTIFACT = ROOT / "benchmarks" / "pallas_trace_exec.pkl"


HASHED_SOURCES = (
    # everything the compiled executable bakes in semantically
    "audio_raytracing_tpu/ops/pallas_trace.py",
    "audio_raytracing_tpu/ops/histogram.py",
    "audio_raytracing_tpu/ops/intersect.py",
    "audio_raytracing_tpu/ops/eq.py",
    "audio_raytracing_tpu/models/ir.py",
    "audio_raytracing_tpu/config.py",
)


def kernel_source_hash() -> str:
    h = hashlib.sha256()
    for rel in HASHED_SOURCES:
        h.update((ROOT / rel).read_bytes())
    return h.hexdigest()


def bench_inputs():
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
    from audio_raytracing_tpu.models.scene import Scene

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=32768)
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    dirs = jnp.asarray(fibonacci_sphere_sorted(BENCH_RAYS))
    return cfg, scene.device_arrays(), dirs


def main():
    import jax.numpy as jnp

    from audio_raytracing_tpu.utils.compile_cache import enable as _cc
    _cc(ROOT / "benchmarks" / ".jax_compile_cache")
    from jax.experimental import serialize_executable as se

    from audio_raytracing_tpu.ops.pallas_trace import trace_ir_pallas

    from audio_raytracing_tpu.ops.pallas_trace import trace_irs_pallas_multi

    cfg, arrays, dirs = bench_inputs()
    src = jnp.asarray([1.0, 0.3, 0.5])
    lst = jnp.asarray([-1.0, 0.0, -0.5])
    # flat_bands: world.obj's default material is band-uniform (0.1 across
    # bands), so the payload-4 fast path is exact for the bench scene.
    # r3 measured adds (benchmarks/trim_ab.py, same-run deltas at 2^20 x
    # 8): n_true=114 drops the 8 padding triangles from both passes
    # (-3.9 ms), inc_origin carries transformed origins across bounces
    # (-2.3 ms), hist_batch=4 quarters the histogram accumulator
    # read-modify-write (-0.6 ms) — single dispatch 64.0 -> 56.8 ms wall.
    FAST = dict(n_true=114, inc_origin=True, hist_batch=4)
    t0 = time.perf_counter()
    compiled = trace_ir_pallas.lower(
        arrays, src, lst, cfg=cfg, max_bounces=BENCH_BOUNCES, dirs=dirs,
        fused_hist=True, flat_bands=True, **FAST,
    ).compile()
    print(f"compiled single in {time.perf_counter() - t0:.1f} s")
    payload, in_tree, out_tree = se.serialize(compiled)
    # the amortized-throughput variant: lax.scan over BENCH_SOURCES sources
    # around the same kernel — ONE dispatch returns S impulse responses, so
    # the ~20-25 ms per-dispatch relay round-trip of this environment (not
    # chip cost) amortizes away and the measured rate is the chip's
    # sustained trace throughput
    srcs = jnp.stack([src + jnp.asarray([0.001 * i, 0.0, 0.0])
                      for i in range(BENCH_SOURCES)])
    t0 = time.perf_counter()
    compiled_m = trace_irs_pallas_multi.lower(
        arrays, srcs, lst, cfg=cfg, max_bounces=BENCH_BOUNCES, dirs=dirs,
        fused_hist=True, flat_bands=True, **FAST,
    ).compile()
    print(f"compiled multi in {time.perf_counter() - t0:.1f} s")
    payload_m, in_tree_m, out_tree_m = se.serialize(compiled_m)
    with open(ARTIFACT, "wb") as f:
        pickle.dump(
            {
                "payload": payload,
                "in_tree": in_tree,
                "out_tree": out_tree,
                "payload_multi": payload_m,
                "in_tree_multi": in_tree_m,
                "out_tree_multi": out_tree_m,
                "n_src": BENCH_SOURCES,
                "source_sha": kernel_source_hash(),
                "rays": BENCH_RAYS,
                "bounces": BENCH_BOUNCES,
            },
            f,
        )
    print(f"wrote {ARTIFACT} ({ARTIFACT.stat().st_size / 1e6:.1f} MB)")


def load():
    """Returns (fn, rays, bounces) or None when absent/stale/unloadable."""
    if not ARTIFACT.exists():
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(ARTIFACT, "rb") as f:
            blob = pickle.load(f)
        if blob["source_sha"] != kernel_source_hash():
            return None
        fn = se.deserialize_and_load(blob["payload"], blob["in_tree"], blob["out_tree"])
        return fn, blob["rays"], blob["bounces"]
    except Exception:
        return None


def load_multi():
    """The multi-source amortized-throughput executable: (fn, rays,
    bounces, n_src) or None when absent/stale/pre-multi."""
    if not ARTIFACT.exists():
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(ARTIFACT, "rb") as f:
            blob = pickle.load(f)
        if blob["source_sha"] != kernel_source_hash():
            return None
        if "payload_multi" not in blob:
            return None
        fn = se.deserialize_and_load(
            blob["payload_multi"], blob["in_tree_multi"], blob["out_tree_multi"]
        )
        return fn, blob["rays"], blob["bounces"], blob["n_src"]
    except Exception:
        return None


if __name__ == "__main__":
    main()
