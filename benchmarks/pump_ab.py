#!/usr/bin/env python
"""Attribute the 24-stream render-pump tick cost (bench_serving --pump
--only=24 measured rt 0.87: ~205 ms/tick against the 185.8 ms chunk).

Times, interleaved in ONE process (CLAUDE.md rule):
  * the pump dispatch (_stream_blocks_pump) at L in {8, 16, 24} lanes,
    K=64 blocks (the serving chunk) — device + transfer + relay
  * the L=24 in-kernel NEE trace (the concurrent acoustic round)

so the 205 ms/tick splits into pump-dispatch cost vs trace contention.
Inputs varied per iteration (identical dispatches are cached through
the relay). Prints one JSON line; run on the TPU.
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
    from audio_raytracing_tpu.utils.compile_cache import enable as _cc

    _cc(ROOT / "benchmarks" / ".jax_compile_cache")

    import jax
    import jax.numpy as jnp

    from audio_raytracing_tpu.config import DEFAULT_CONFIG
    from audio_raytracing_tpu.engine.ir_stream import (
        IRStreamRenderer,
        _stream_blocks_pump,
    )
    from audio_raytracing_tpu.models.ir import fibonacci_sphere_sorted
    from audio_raytracing_tpu.models.scene import Scene
    from audio_raytracing_tpu.ops import conv_partitioned as cp
    from audio_raytracing_tpu.ops.pallas_trace import (
        trace_irs_pallas_multi_listener_nee,
    )

    cfg = DEFAULT_CONFIG
    scene = Scene.from_obj(ROOT / "data" / "world.obj", cfg)
    arrays = scene.device_arrays()
    B = cfg.block_size
    K = 64
    for a in sys.argv[1:]:
        if a.startswith("--k="):
            K = int(a.split("=", 1)[1])

    # one real renderer supplies the dry arena + spectra shapes the
    # serving pump uses (synth pad source at the origin, world.obj IR)
    r = IRStreamRenderer(scene, cfg, n_rays=1 << 15, max_bounces=6)
    from audio_raytracing_tpu.app.walkthrough import synth_pad

    r.add_source(synth_pad(cfg.sample_rate), np.zeros(3, np.float32),
                 gain=0.5)
    r.update(np.float32([1.5, 0.0, 0.0]), yaw=0.3)
    spec = r._spectra
    S = r._dry_dev.shape[0]
    P = spec[0].shape[-2]

    dirs = jnp.asarray(fibonacci_sphere_sorted(1 << 15))
    src = jnp.asarray([0.0, 0.0, 0.0])

    Ls = tuple(int(a) for a in sys.argv[1:] if not a.startswith("--")) \
        or (8, 16, 24)
    out = {"K": K, "P": int(P)}

    def pump_step(L, states, i):
        cursors = jnp.asarray(
            np.full(L, (i * K * B) % 100000, np.int32)
        )
        sp = jax.tree.map(lambda x: jnp.broadcast_to(x, (L,) + x.shape),
                          spec)
        ys, st = _stream_blocks_pump(
            r._dry_dev, r._src_len_dev, r._src_loop_dev,
            cursors, states, sp, sp, jnp.zeros(L, bool),
            K=K, B=B, n_out=r.n_out,
        )
        float(jnp.sum(ys))
        return st

    def pump_step_full(L, states, i):
        # the REAL pump tick: dispatch + the full (L, K, B, n_out) PCM
        # host transfer (np.asarray) — the r4 "flat ~28 ms" figure used
        # a scalar sum and so excluded the bulk transfer through the
        # relay, which scales with L*K and is the serving pump's
        # candidate binder at L~48
        cursors = jnp.asarray(
            np.full(L, (i * K * B) % 100000, np.int32)
        )
        sp = jax.tree.map(lambda x: jnp.broadcast_to(x, (L,) + x.shape),
                          spec)
        ys, st = _stream_blocks_pump(
            r._dry_dev, r._src_len_dev, r._src_loop_dev,
            cursors, states, sp, sp, jnp.zeros(L, bool),
            K=K, B=B, n_out=r.n_out,
        )
        pcm = np.asarray(ys)
        assert pcm.shape == (L, K, B, r.n_out)
        return st

    def pump_step_s16(L, states, i):
        # device-quantized s16 PCM (engine/serving.py pump_pcm="s16"):
        # same dispatch, half the transfer bytes
        cursors = jnp.asarray(
            np.full(L, (i * K * B) % 100000, np.int32)
        )
        sp = jax.tree.map(lambda x: jnp.broadcast_to(x, (L,) + x.shape),
                          spec)
        ys, st = _stream_blocks_pump(
            r._dry_dev, r._src_len_dev, r._src_loop_dev,
            cursors, states, sp, sp, jnp.zeros(L, bool),
            K=K, B=B, n_out=r.n_out, out_s16=True,
        )
        pcm = np.asarray(ys)
        assert pcm.dtype == np.int16
        return st

    def trace_step(L, i):
        lsts = jnp.asarray(
            np.stack([[-1.0 + 0.01 * (i + j), 0.0, -0.5]
                      for j in range(L)]).astype(np.float32)
        )
        ir = trace_irs_pallas_multi_listener_nee(
            arrays, src, lsts, cfg=cfg, max_bounces=6, dirs=dirs,
        )
        float(jnp.sum(ir.energy))

    # compile both shapes once
    states = {L: cp.conv_init_real((L, S, r.n_out), P, B)
              for L in Ls}
    for L in Ls:
        states[L] = pump_step(L, states[L], 0)
        states[L] = pump_step_s16(L, states[L], 0)
    trace_step(Ls[-1], 0)

    iters = 8
    for L in Ls:
        ts = []
        tf = []
        t16 = []
        for i in range(1, iters + 1):
            t0 = time.perf_counter()
            states[L] = pump_step(L, states[L], i)
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            states[L] = pump_step_full(L, states[L], 100 + i)
            tf.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            states[L] = pump_step_s16(L, states[L], 200 + i)
            t16.append(time.perf_counter() - t0)
            if L == Ls[-1]:
                t0 = time.perf_counter()
                trace_step(Ls[-1], i)
                out.setdefault("_tr", []).append(
                    time.perf_counter() - t0
                )
        out[f"pump_ms_L{L}"] = round(float(np.median(ts)) * 1e3, 2)
        out[f"pump_full_ms_L{L}"] = round(float(np.median(tf)) * 1e3, 2)
        out[f"pump_s16_ms_L{L}"] = round(float(np.median(t16)) * 1e3, 2)
        out[f"pcm_mb_L{L}"] = round(L * K * B * r.n_out * 4 / 2**20, 2)
        print(f"[pump_ab] L={L}: {out[f'pump_ms_L{L}']} ms scalar, "
              f"{out[f'pump_full_ms_L{L}']} ms full-PCM",
              file=sys.stderr, flush=True)
    out[f"trace{Ls[-1]}_ms"] = round(float(np.median(out.pop("_tr"))) * 1e3, 2)
    out["chunk_audio_ms"] = round(K * B / cfg.sample_rate * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
