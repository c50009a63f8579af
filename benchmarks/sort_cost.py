#!/usr/bin/env python
"""TPU cost of a wavefront re-sort step: argsort(int32 keys) + gather of
the per-ray bounce state (12 f32 columns ~ o, d, amps, carries).

The r1 wavefront dead end measured ONE number (1M argsort + 8-f32 gather
= 47.6 ms, as much as the whole 8-bounce trace). The bigscene workload
is 2^15 rays — this measures the sort+gather device cost across sizes so
the wavefront call is made on per-size data, not the 1M extrapolation.

Each size runs REPS sorts inside one jitted lax.scan (keys varied per
step by a cheap hash so neither the sort nor the gather can cache), so
the ~21 ms relay round trip amortizes away; cost = dt / REPS.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 32


def main():
    out = {}
    for logn in (15, 17, 20):
        n = 1 << logn
        state = jnp.asarray(np.random.default_rng(0).random((n, 12), np.float32))
        keys0 = jnp.asarray(
            np.random.default_rng(1).integers(0, 2**30, n, dtype=np.int32)
        )

        @jax.jit
        def run(keys0, state, salt):
            def step(carry, i):
                keys, st = carry
                # cheap per-step key perturbation (lowbias32-ish mix)
                k = (keys ^ (i + salt)) * jnp.int32(np.int32(0x9E3779B1 - 2**32))
                perm = jnp.argsort(k)
                st = jnp.take(st, perm, axis=0)
                return (k, st), jnp.float32(0)

            (keys, st), _ = jax.lax.scan(
                step, (keys0, state), jnp.arange(REPS, dtype=jnp.int32)
            )
            return jnp.sum(st) + jnp.sum(keys)

        # warm (compile) with one salt, then time varied salts
        float(run(keys0, state, jnp.int32(0)))
        ts = []
        for r in range(1, 4):
            t0 = time.perf_counter()
            float(run(keys0, state, jnp.int32(r)))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        out[f"n{n}"] = {
            "sort_gather_ms": dt / REPS * 1e3,
            "wall_ms_total": dt * 1e3,
        }
        print(f"[sort] n=2^{logn}: {dt / REPS * 1e3:.3f} ms/step", file=sys.stderr)
    print(json.dumps({"metric": "wavefront_sort_cost", "sizes": out}))


if __name__ == "__main__":
    main()
