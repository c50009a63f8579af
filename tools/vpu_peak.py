#!/usr/bin/env python
"""Measure the chip's VPU speed of light and the fused trace kernel's
distance from it (VERDICT r1 item 2: the ~1.4e8 strict ray-bounce/s
figure was *asserted* to be VPU-bound; this tool measures it).

Three microkernels, each a Pallas grid over (8, 128) f32 tiles:

  * fma  — 8 independent a*x+b chains: peak FMA issue rate. The
           headline "speed of light" (1 FMA = 1 op here).
  * div  — 8 independent divide chains: divide throughput relative to
           FMA (the intersection test does 2 divides per tri-ray).
  * isect — the EXACT path_pass group_body op sequence from
           ops/pallas_trace.py (Woop transform + slab test + running
           min + 4 selects) on register-resident constants: the
           algorithmic speed of light for this kernel's inner loop, in
           tri-ray tests/s. The full kernel's measured tests/s divided
           by this = its efficiency (what it loses to the shadow pass
           sharing, selection sweep, one-hot binning, and emission).

Prints one JSON line. Run on the real TPU (axon backend); each kernel
is a small Mosaic compile (~tens of seconds through the relay).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _time(fn, xs, iters=8, warmup=2):
    # vary the input per call (the relay caches identical dispatches) and
    # block via a host transfer (block_until_ready is unreliable here)
    it = iter(range(10**9))
    for _ in range(warmup):
        float(jnp.sum(fn(xs[next(it) % len(xs)])))
    ts = []
    for _ in range(iters):
        x = xs[next(it) % len(xs)]
        t0 = time.perf_counter()
        float(jnp.sum(fn(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _grid_call(kernel, grid):
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
    )


def bench_fma(k_iters=2048, chains=32, grids=(512, 2048)):
    """Peak FMA ops/s: `chains` independent x*c1+c2 chains.

    Measured chain sweep on the v5e (2026-08-17): 8 -> 0.89e12, 16 ->
    1.24e12, 24 -> 1.56e12, 32 -> 1.58e12 (peak), 40 -> 1.21e12, 64 ->
    0.89e12 (register spill) — the VPU needs ~32 independent chains in
    flight to saturate its issue slots."""

    def kernel(x_ref, o_ref):
        a = [x_ref[...] * (1.0 + 0.01 * i) for i in range(chains)]

        def body(_, a):
            return tuple(ai * 1.0000001 + 1e-9 for ai in a)

        a = jax.lax.fori_loop(0, k_iters, body, tuple(a))
        o_ref[...] = sum(a)

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((SUBLANES, LANES)), jnp.float32)
          for _ in range(4)]
    ops_per_step = k_iters * chains * SUBLANES * LANES
    t = {g: _time(jax.jit(_grid_call(kernel, g)), xs) for g in grids}
    # two grid sizes difference cancels dispatch/relay fixed overhead
    dt = t[grids[1]] - t[grids[0]]
    return ops_per_step * (grids[1] - grids[0]) / dt


def bench_div(k_iters=512, chains=8, grids=(128, 512)):
    """Divide throughput (ops/s) for x/c chains."""

    def kernel(x_ref, o_ref):
        # variable/variable divides (a constant or loop-invariant
        # denominator strength-reduces to a multiply); the companion
        # d *= c mul costs ~1 FMA-slot per chain-iter, subtracted via the
        # measured FMA rate downstream if needed — dominated by the divide
        a = [x_ref[...] + (1.0 + 0.01 * i) for i in range(chains)]
        d = [x_ref[...] * (1.5 + 0.01 * i) + 2.5 for i in range(chains)]

        def body(_, carry):
            a, d = carry
            d = tuple(di * 1.0000001 for di in d)
            a = tuple(ai / di for ai, di in zip(a, d))
            return (a, d)

        a, d = jax.lax.fori_loop(0, k_iters, body, (tuple(a), tuple(d)))
        o_ref[...] = sum(a) + sum(d)

    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.standard_normal((SUBLANES, LANES)), jnp.float32)
          for _ in range(4)]
    ops_per_step = k_iters * chains * SUBLANES * LANES
    t = {g: _time(jax.jit(_grid_call(kernel, g)), xs) for g in grids}
    dt = t[grids[1]] - t[grids[0]]
    return ops_per_step * (grids[1] - grids[0]) / dt


def bench_isect(n_groups=16, reps=128, grids=(64, 256)):
    """The path_pass group_body op sequence, nothing else: per grid step,
    `reps` sweeps over `n_groups` register-resident triangle groups
    against one (1, 128) ray row per sublane-row — i.e. reps * n_groups *
    8 tris * 8 rows * 128 rays tri-ray tests. Matches
    ops/pallas_trace.py path_pass (b > 0: full origin transform).

    SIZE THE DIFFERENCE GENEROUSLY: the rate comes from t[grids[1]] -
    t[grids[0]], and this environment's relay adds ~10s of ms of jitter
    per dispatch. The original reps=16, grids=(16, 64) left dt ~ 1 ms and
    produced two garbage rates in a row (9.46e11, 1.31e12 — both at or
    above FMA peak, i.e. < 1 op/test); reps=128, grids=(64, 256) spans
    ~3.2e9 tests, dt ~ 40 ms, and reproduces the stable 8.0e10 figure."""
    rng = np.random.default_rng(2)
    tri = jnp.asarray(
        rng.standard_normal((n_groups * 8, 16)), jnp.float32
    )

    def kernel(x_ref, tri_ref, o_ref):
        inf = jnp.float32(np.inf)
        tri_all = tri_ref[...]

        def cg(g, j):
            return jax.lax.slice(tri_all, (g * 8, j), ((g + 1) * 8, j + 1))

        acc = jnp.zeros((SUBLANES, LANES), jnp.float32)

        def row_body(r, acc):
            # six loads from rows DISJOINT across the 8 unrolled rows —
            # sharing the same 8 vectors across rows lets Mosaic CSE the
            # a_ij * x products between rows (measured 4.6x inflation);
            # deriving them by constant scaling folds the whole transform
            # (measured: an impossible 193% of FMA peak). r is the DYNAMIC
            # loop counter so the loads depend on the iteration — with a
            # static row index the whole body is loop-invariant and gets
            # hoisted (measured: an impossible 5.3x FMA peak).
            base = (r % SUBLANES) * 6
            # r-dependent additive bump: with iteration-invariant ray data
            # the whole body hoists out of the rep loop (measured: an
            # impossible 9.5e11 "tests/s"); an ADD can't be factored back
            # out of the transform without float reassociation, which
            # Mosaic correctly refuses
            bump = r.astype(jnp.float32) * 1e-7
            dx = x_ref[pl.ds(base, 1), :] + bump
            dy = x_ref[pl.ds(base + 1, 1), :] + bump
            dz = x_ref[pl.ds(base + 2, 1), :] + bump
            ox = x_ref[pl.ds(base + 3, 1), :] + bump
            oy = x_ref[pl.ds(base + 4, 1), :] + bump
            oz = x_ref[pl.ds(base + 5, 1), :] + bump
            best_t = jnp.full((8, LANES), inf)
            sel = [jnp.zeros((8, LANES), jnp.float32) for _ in range(3)] + [
                jnp.ones((8, LANES), jnp.float32)
            ]
            carry = (best_t, *sel)
            for g in range(n_groups):
                best_t, *sel = carry
                a00, a01, a02 = cg(g, 0), cg(g, 1), cg(g, 2)
                a10, a11, a12 = cg(g, 3), cg(g, 4), cg(g, 5)
                a20, a21, a22 = cg(g, 6), cg(g, 7), cg(g, 8)
                opx = a00 * ox + a01 * oy + a02 * oz + cg(g, 9)
                opy = a10 * ox + a11 * oy + a12 * oz + cg(g, 10)
                opz = a20 * ox + a21 * oy + a22 * oz + cg(g, 11)
                dpx = a00 * dx + a01 * dy + a02 * dz
                dpy = a10 * dx + a11 * dy + a12 * dz
                dpz = a20 * dx + a21 * dy + a22 * dz
                t = -opz / dpz
                u = opx + t * dpx
                v = opy + t * dpy
                ok = (
                    (jnp.abs(dpz) > 1e-12)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t >= 1e-6)
                )
                tc = jnp.where(ok, t, inf)
                improved = tc < best_t
                best_t = jnp.where(improved, tc, best_t)
                ns = [
                    jnp.where(improved, cg(g, 12 + c), sel[c])
                    for c in range(4)
                ]
                carry = (best_t, *ns)
            best_t = carry[0]
            return acc + jnp.where(best_t < inf, best_t, 0.0) + carry[1]

        def rep_body(i, acc):
            # 8 rows unrolled inside the body: the real kernel fully
            # unrolls its row loop (unroll=8), gaining cross-row ILP a
            # rolled per-row loop can't express (measured +40% here too).
            # i + k keeps every load dynamic in i (anti-hoisting) while
            # the 8 unrolled rows still touch disjoint row blocks
            for k in range(SUBLANES):
                acc = row_body(i + k, acc)
            return acc

        acc = jax.lax.fori_loop(0, reps, rep_body, acc)
        o_ref[...] = acc

    def call(grid):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((SUBLANES * 6, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups * 8, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32),
        )

    xs = [jnp.asarray(rng.standard_normal((SUBLANES * 6, LANES)), jnp.float32)
          for _ in range(4)]
    tests_per_step = reps * SUBLANES * n_groups * 8 * LANES
    t = {
        g: _time(jax.jit(lambda x, _g=g: call(_g)(x, tri)), xs)
        for g in grids
    }
    dt = t[grids[1]] - t[grids[0]]
    return tests_per_step * (grids[1] - grids[0]) / dt


def main():
    out = {}
    t0 = time.perf_counter()
    out["vpu_fma_ops_per_sec"] = bench_fma()
    out["vpu_div_ops_per_sec"] = bench_div()
    out["isect_tests_per_sec_peak"] = bench_isect()
    out["elapsed_s"] = time.perf_counter() - t0
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    if out["backend"] == "tpu":
        # persist the chip's measured speed of light so bench.py can report
        # the kernel's roofline fraction without re-running these compiles
        import pathlib

        p = pathlib.Path(__file__).resolve().parent.parent / "benchmarks" / "vpu_roofline.json"
        p.write_text(json.dumps(out, indent=2) + "\n")
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
