"""Fused Pallas TPU kernel: the complete multi-bounce acoustic trace.

The XLA tracer (models/ir.py) is HBM-bound: every bounce materializes
(R, 3T) Woop-transform products and a stack of (R, T) temporaries —
gigabytes of traffic per bounce at 1M rays. This kernel keeps the whole
bounce pipeline in VMEM/registers: per grid step it owns a (8, 128) =
1024-ray block, processed as 8 independent 128-ray lane rows, doing

  path nearest-hit -> surface attrs -> specular reflect
  -> listener shadow test (reversed ray: constant origin at the listener,
     so the per-triangle transformed origins are precomputed outside)
  -> next-event contribution (lam, air absorption, delay bin, direction)

with triangles riding the sublane axis in groups of 8 — one (8, 128) VPU
op performs 8 ray-triangle tests — and every triangle constant loaded into
registers once per kernel invocation (no loads inside the hot loops). HBM
traffic per ray-bounce drops from ~6 KB to ~36 B (the emitted
contribution); the only work left outside is the histogram scatter of the
emitted (bin, payload) stream.

Math matches models/ir.py's bounce step (same Woop formulation as
ops/intersect.nearest_hit_mxu, same acoustic laws from the reference —
lam per main.zig:710-722, air absorption per sound_system.zig:229-234)
up to floating-point association and shadow-ray orientation (reversed,
listener-origin); differential tests compare histograms with tolerance
(bit-close in interpret mode on identical formulations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config, DEFAULT_CONFIG
from ..ops.eq import EQ_FREQS
from .histogram import bin_segment

LANES = 128
SUBLANES = 8
TRI_GROUP = 8
TILE = SUBLANES * LANES  # rays per grid step
N_BANDS = 4
PAYLOAD_C = N_BANDS + 3  # energy per band + energy-weighted direction
PAYLOAD_C_FLAT = 1 + 3  # flat-band mode: one energy + direction
# NOTE (measured, do not re-derive): accumulating the one-hot coarse matmul
# into a dynamic 8-aligned window of the histogram (pl.ds(base, 32) += h,
# with a pl.when fallback for wide rows) is SLOWER than the full-height
# (n_coarse, pc*128) accumulate on this hardware — 81 ms vs 64 ms at 1M
# rays — the dynamic-slice read-modify-write plus the per-row-bounce scalar
# min/max reductions cost more than the 8x MAC savings. Full height it is.

# tri_table columns
_A = 0  # 9: row-major world->unit-triangle linear map
_B = 9  # 3: affine offset
_N = 12  # 3: unit normal
_K = 15  # N_BANDS: per-band amplitude kept = sqrt(1 - absorption)
_TAU = 19  # N_BANDS: shadow-crossing log amplitude 0.5*log(transmission)
_SCAT = 23  # 1: per-surface diffuse-bounce probability (scattering)
TRI_COLS = 24  # full


def _morton3(q):
    """Interleave 10-bit x/y/z into a 30-bit morton key. q: (T, 3) int32
    (jnp: traceable under jit; int32 keeps TPU x64-free)."""

    def spread(x):
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def _sg_fori(n_sg, sg_coarse, fori_body, cpred, carry):
    """Run fori_body over n_sg supergroup windows, optionally gated by a
    COARSE second culling level: one cpred(cb) scalar test per block of
    sg_coarse windows skips the block's per-window tests + lax.cond
    machinery wholesale. The all-skip floor measured 41.7/230 ms (49k
    resident) and 92.3/749 ms (196k streamed) of the static culled time —
    most of it per-window cond iterations, which this collapses by
    sg_coarse x in regions the coarse union AABB already rejects. The
    coarse AABBs live at rows n_sg.. of the same SMEM table (see
    _append_coarse), so cpred is just the window test at an offset row."""
    if not sg_coarse:
        return jax.lax.fori_loop(0, n_sg, fori_body, carry)

    def coarse_body(cb, carry):
        def run(c):
            return jax.lax.fori_loop(
                cb * sg_coarse, (cb + 1) * sg_coarse, fori_body, c
            )

        return jax.lax.cond(cpred(cb), run, lambda c: c, carry)

    return jax.lax.fori_loop(0, n_sg // sg_coarse, coarse_body, carry)


def _append_coarse(sg, sg_coarse):
    """Append n_sg/sg_coarse coarse union-AABB rows to a (n_sg, 8)
    supergroup table (lo3, hi3, pad2). Kernels test coarse block cb at
    row n_sg + cb with the ordinary supergroup predicate."""
    n_sg = sg.shape[0]
    s3 = sg.reshape(n_sg // sg_coarse, sg_coarse, 8)
    cg = jnp.concatenate(
        [
            s3[:, :, :3].min(axis=1),
            s3[:, :, 3:6].max(axis=1),
            jnp.zeros((n_sg // sg_coarse, 2), jnp.float32),
        ],
        axis=1,
    )
    return jnp.concatenate([sg, cg], axis=0)


def _resolve_sg_coarse(sg_coarse, n_sg):
    """sg_coarse=None -> auto: the first of (8, 4) that tiles the n_sg
    supergroup windows with at least 2 blocks, else off (small scenes:
    the coarse test would gate nothing). 0/False -> explicitly off (for
    A/Bs). An explicit int passes through for the caller to validate."""
    if sg_coarse is not None:
        return sg_coarse or None
    for c in (8, 4):
        if n_sg % c == 0 and n_sg >= 2 * c:
            return c
    return None


def _coarse_rows_chunked(spc, sg_coarse):
    """Padded per-chunk row count for the streamed blocked SMEM table:
    spc supergroup rows + spc/sg_coarse coarse rows, rounded up to a
    multiple of SUBLANES (Mosaic requires block sublane dims % 8; the
    pad rows are never read — loop bounds stop at spc/sg_coarse)."""
    rows = spc + spc // sg_coarse
    return -(-rows // SUBLANES) * SUBLANES


def _append_coarse_chunked(sg, sg_coarse, spc):
    """Per-chunk variant of _append_coarse for the streamed kernels'
    blocked SMEM table: each chunk's spc supergroup rows get
    spc/sg_coarse coarse rows appended (then zero-padded to
    _coarse_rows_chunked rows), so the block at chunk c is
    (_coarse_rows_chunked(spc, sg_coarse), 8) and the kernel tests
    coarse block cb at block-local row spc + cb."""
    n_chunks = sg.shape[0] // spc
    cpc = spc // sg_coarse
    s3 = sg.reshape(n_chunks, cpc, sg_coarse, 8)
    cg = jnp.concatenate(
        [
            s3[:, :, :, :3].min(axis=2),
            s3[:, :, :, 3:6].max(axis=2),
            jnp.zeros((n_chunks, cpc, 2), jnp.float32),
        ],
        axis=2,
    )
    pad = _coarse_rows_chunked(spc, sg_coarse) - (spc + cpc)
    parts = [sg.reshape(n_chunks, spc, 8), cg]
    if pad:
        parts.append(jnp.zeros((n_chunks, pad, 8), jnp.float32))
    return jnp.concatenate(parts, axis=1).reshape(-1, 8)


def build_tri_tables(scene_arrays):
    """(tri_table (T, TRI_COLS), group_aabbs (T/8, 8)).

    Triangles are morton-sorted by centroid so each sublane group of 8 is
    spatially local, making the per-group AABBs tight — the broad phase the
    kernel's bundle-vs-group culling tests against. Padding (degenerate)
    triangles sort last; their point-AABBs never produce hits. Pure jnp so
    it traces under jit.
    """
    woop_d = scene_arrays.woop_d  # (3, 3T)
    woop_o = scene_arrays.woop_o  # (4, 3T)
    T = woop_d.shape[1] // 3
    a_rows = [woop_d[:, k * T : (k + 1) * T].T for k in range(3)]  # each (T, 3)
    b_cols = [woop_o[3, k * T : (k + 1) * T][:, None] for k in range(3)]  # (T, 1)
    keep = jnp.sqrt(jnp.clip(1.0 - scene_arrays.absorption[:, :N_BANDS], 0.0, 1.0))
    # shadow transmission log-amplitudes (the models/ir law — shared
    # helper so the floor/constant can never diverge from the XLA path);
    # only read when the kernel runs with transmission=True
    from ..models.ir import _transmission_log_amp

    tau = (
        scene_arrays.transmission
        if scene_arrays.transmission is not None
        else jnp.zeros_like(scene_arrays.absorption[:, :N_BANDS])
    )
    tlog = _transmission_log_amp(tau[:, :N_BANDS])
    scat = (
        scene_arrays.scattering
        if scene_arrays.scattering is not None
        else jnp.zeros(keep.shape[0], jnp.float32)
    )[:, None]
    table = jnp.concatenate(
        a_rows + b_cols + [scene_arrays.normals, keep, tlog, scat], axis=1
    )  # (T, 9 + 3 + 3 + 4 + 4 + 1) = (T, 24)
    assert table.shape[1] == TRI_COLS, table.shape
    table = table.astype(jnp.float32)

    v0, v1, v2 = scene_arrays.v0, scene_arrays.v1, scene_arrays.v2
    lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    degenerate = (hi - lo).sum(axis=1) <= 0.0
    c = 0.5 * (lo + hi)
    span = jnp.maximum(c.max(axis=0) - c.min(axis=0), 1e-9)
    q = jnp.clip((c - c.min(axis=0)) / span * 1023.0, 0, 1023).astype(jnp.int32)
    keys = _morton3(q)
    keys = jnp.where(degenerate, jnp.int32(2**30), keys)  # padding last
    order = jnp.argsort(keys, stable=True)
    table = table[order]
    lo = lo[order].reshape(-1, TRI_GROUP, 3)
    hi = hi[order].reshape(-1, TRI_GROUP, 3)
    gaabb = jnp.concatenate(
        [
            lo.min(axis=1),
            hi.max(axis=1),
            jnp.zeros((lo.shape[0], 2), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)
    return table, gaabb


def _trace_kernel(scalar_ref, dx_ref, dy_ref, dz_ref, tri_ref, opl_ref,
                  gaabb_ref, *refs, n_tris: int, max_bounces: int,
                  cfg: Config, fused_hist: bool = False, cull: bool = False,
                  flat_bands: bool = False, mxu_xform: bool = False,
                  group_fori: bool = False, row_unroll: int = 8,
                  transmission: bool = False, weighted: bool = False,
                  scattering: float = 0.0, material_scattering: bool = False,
                  sg_cull: bool = False,
                  shadow_divfree: bool = False, winner_acc: int = 1,
                  ablate: str = "", state_io: bool = False,
                  sg_unroll: int | None = None,
                  sg_coarse: int | None = None,
                  inc_origin: bool = False,
                  shadow_carry: bool = False,
                  tid_fold: bool = False,
                  mask_sweep: bool = False,
                  hist_batch: int = 1,
                  n_listeners: int = 1):
    # n_listeners > 1 (resident unrolled fused_hist kernel): multi-
    # listener next-event estimation IN-KERNEL — the path pass runs
    # once and the shadow/emission/histogram stages loop over C
    # listeners (positions in an SMEM (C, 4) table, per-listener
    # precomputed transformed origins in extra opl columns, per-listener
    # histogram slices in one (C*n_coarse, pc*128) accumulator). This is
    # the serving round's shape: the XLA shared-path tracer pays (L, R,
    # T) HBM temporaries per NEE lane, the per-listener kernel scan
    # re-runs the path pass L times; this runs it once and keeps the L
    # shadow sweeps VMEM-resident (r2 VERDICT item 4).
    if n_listeners > 1:
        assert (fused_hist and not group_fori and not state_io
                and not cull and not mxu_xform and winner_acc == 1
                and not ablate and not tid_fold), (
            "multi-listener NEE supports the resident unrolled kernel")
    # tid_fold (resident unrolled path only): the path-pass winner fold
    # carries (best_t, winning group id) — 2 arrays instead of
    # 2 + n_sel — and the winner's surface attributes are fetched after
    # the sublane sweep by ONE exact one-hot matmul over the register-
    # resident tri table (f32 HIGHEST; the one-hot side is exactly 0/1,
    # so the bf16x3 decomposition reproduces the f32 attribute bits).
    # Same winner as the attribute fold (both take the first
    # strictly-less (group, sublane)), so results are identical.
    if tid_fold:
        assert (fused_hist and not group_fori and not cull
                and not mxu_xform and winner_acc == 1 and not ablate), (
            "tid_fold supports the resident unrolled kernel")
    # inc_origin (resident unrolled fused_hist path only): carry each
    # triangle's TRANSFORMED origin across bounces in VMEM scratch
    # instead of re-transforming per group body. The affine map is
    # linear, so A(o + tb d) + b = (A o + b) + tb (A d): the 12-slot
    # origin transform becomes one FMA on the previous bounce's stored
    # (op, dp) pair (dp is stored when computed anyway). Exact up to fp
    # association (the sum accumulates in a different order than the
    # fresh transform) — differential tests compare with tolerance.
    if inc_origin:
        assert (fused_hist and not group_fori and not state_io
                and not cull and not mxu_xform and winner_acc == 1
                and not ablate), "inc_origin supports the resident kernel"
    # shadow_carry (requires inc_origin): the listener shadow pass reuses
    # the path pass's stored per-triangle (transformed origin, transformed
    # direction) carries instead of re-transforming the shadow direction
    # per triangle. The shadow segment runs listener -> hit vertex with
    # the listener's precomputed transformed origin opl; its transformed
    # DIRECTION for triangle j is
    #   M_j (v - l) = (M_j o_b + c_j + tb * M_j d_b) - (M_j l + c_j)
    #               = (iop_j - opl_j) + tb * idp_j
    # (v = o_b + tb d_b is exactly how nee_one builds the vertex), i.e.
    # one SUB + one FMA per component from 6 stored values — replacing the
    # 9-FMA/9-load per-group direction transform. Exact up to fp
    # association (like inc_origin itself); the final bounce falls back to
    # the classic transform (its (op, dp) is not stored — storing it would
    # cost 6 stores/group for one bounce, more than the transform saves).
    if shadow_carry:
        assert inc_origin and not shadow_divfree and not transmission, (
            "shadow_carry rides inc_origin's (op, dp) carries; divfree/"
            "transmission shadow variants keep the classic transform")
    # ablate (MEASUREMENT ONLY — results are numerically wrong): "+"-joined
    # component skips for on-hardware cost attribution of the fused kernel
    # (benchmarks/ablate_kernel.py). "no_sweep" replaces the winner-sublane
    # sweep with a row-0 slice, "no_shadow" drops the listener shadow pass,
    # "no_emit" drops the emission math (lam/dl/air), "no_hist" replaces
    # the one-hot MXU binning with a (1, 128) accumulate. Each variant
    # still CONSUMES its upstream values so the compiler cannot dead-code
    # the stage being measured around. "rsqrt_emit" is a near-exact
    # MEASUREMENT variant (not a skip): the listener-distance sqrt+divide
    # becomes rsqrt+muls (dl = dl2*rsqrt(dl2)) — quantifies the emission
    # stage's division cost without changing its structure (last-ulp
    # results; kept out of the default path to preserve the bit-for-bit
    # pallas==XLA contract). NOTE (r4+): ablation variants other than
    # no_sweep now default to mask_sweep=True, so their baselines carry
    # the ~0.6-1.0 ms mask_sweep win — deltas are not directly
    # comparable to the r3 attribution numbers in RESULTS.md, which
    # were measured against the serial-scan sweep.
    ab = frozenset(ablate.split("+")) if ablate else frozenset()
    if ab:
        assert ab <= {"no_sweep", "no_shadow", "no_emit", "no_hist",
                      "rsqrt_emit"}, ab
        assert fused_hist and not transmission and not weighted, (
            "ablation supports the plain fused_hist kernel only")
        assert not (scattering > 0.0 or material_scattering) and not cull, (
            "ablation supports the plain fused_hist kernel only")
    # large-scene mode: iterate triangle groups with lax.fori_loop +
    # 8-aligned dynamic VMEM loads instead of a fully unrolled Python loop
    # (which explodes trace/compile time past ~32 groups). Incompatible
    # with the register-resident experiments.
    if group_fori:
        assert not cull and not mxu_xform, "group_fori excludes cull/mxu_xform"
    # transmission: the shadow pass accumulates per-band crossing
    # log-amplitudes (sum of ok * 0.5 log tau over groups) instead of a
    # hard any-hit block; the contribution multiplies exp(sum) per band
    # (models/ir.py's law, in-kernel). Excluded from the experiments.
    if transmission:
        assert not cull and not mxu_xform, "transmission excludes cull/mxu_xform"
    # stochastic scattering (models/ir.py's diffuse family, in-kernel):
    # counter-based hash uniforms (ops/hashrng.py) with the SAME counter
    # layout as trace_ir(scattering_rng="hash") — bit-identical sampling,
    # so interpret-mode tests compare against the XLA path directly
    scatter_on = scattering > 0.0 or material_scattering
    if scatter_on:
        from .hashrng import uniform01

        # the hashed seed rides scalars[10:12] as (lo16, hi16) halves —
        # a TRACED operand, so ensemble seed sweeps and per-shard folds
        # reuse one compiled kernel instead of paying a ~4 min Mosaic
        # recompile per seed (the int32 reassembly wraps, reproducing the
        # signed bit pattern hash_u32 produced outside)
        seed_base = scalar_ref[10].astype(jnp.int32) | (
            scalar_ref[11].astype(jnp.int32) << 16
        )
        # program_id must be read at kernel top level (its interpret-mode
        # interception doesn't reach inside the row fori_loop body)
        tile_base = pl.program_id(0) * TILE
    inf = jnp.float32(np.inf)
    # state_io (wavefront mode, trace_contributions_pallas(wavefront=True)):
    # ONE bounce per call with per-ray state read from input refs and the
    # post-bounce state written to output refs, so the caller can re-sort
    # rays by (direction octant, origin morton) between bounces and keep
    # the sg_cull reach test tight at every depth. The bounce index rides
    # scalars[9] (traced, not static: all bounces share one compiled
    # kernel) and feeds the SAME rng counter layout as the fused loop —
    # per-ray results are bit-identical to the resident kernel; only the
    # histogram accumulation order differs.
    if state_io:
        b_io = scalar_ref[9].astype(jnp.int32)
    sx, sy, sz = scalar_ref[0], scalar_ref[1], scalar_ref[2]
    lx, ly, lz = scalar_ref[3], scalar_ref[4], scalar_ref[5]
    inv_n = scalar_ref[6]
    spm_bps = scalar_ref[7]
    n_bins = scalar_ref[8]
    air = cfg.air_absorption
    eps = 1e-6
    freqs = [float(f) for f in EQ_FREQS]
    # per-band air-absorption amplitude at distance d (cfg static: the
    # model choice and its coefficients are compile-time constants)
    if cfg.air_model == "iso9613":
        from ..models.air import amplitude_decay_per_meter
        from ..models.ir import AIR_BAND_HZ

        k_air = amplitude_decay_per_meter(
            AIR_BAND_HZ, cfg.air_temperature_c, cfg.air_humidity_pct,
            cfg.air_pressure_kpa,
        )
        aab_of = lambda d, c: jnp.exp(float(k_air[c]) * d)  # noqa: E731
    else:
        aab_of = lambda d, c: jnp.clip(  # noqa: E731
            1.0 - air * d * freqs[c], 0.0, 1.0
        )
    n_groups = n_tris // TRI_GROUP
    gshape = (TRI_GROUP, LANES)
    # flat-band mode (fused_hist only): all bands share one absorption
    # amplitude; per-band air absorption is reconstructed from the bin
    # index outside the kernel, shrinking the binned payload from 7 to 4
    n_keep = 1 if (fused_hist and flat_bands) else N_BANDS
    # multi-listener NEE: the (C, 4) listener-position SMEM table is the
    # FIRST extra ref
    if n_listeners > 1:
        lref, refs = refs[0], refs[1:]
    # sg_cull (group_fori only): an SMEM (n_super, 8) supergroup-AABB
    # table precedes the other extra refs; each fori iteration's
    # fori_unroll-group block is skipped via lax.cond when the row's
    # conservative reach interval misses its union AABB (scalar SMEM
    # reads + scalar compares — no vector preds, unlike the measured-slow
    # per-group `cull` experiment). The test is conservative, so results
    # are bit-identical to the uncalled sweep.
    if sg_cull:
        assert group_fori, "sg_cull requires group_fori"
        sgaabb_ref, refs = refs[0], refs[1:]
    # state_io: per-ray bounce-state inputs follow the sg table — ox, oy,
    # oz, amp (n_keep), path, alive, gidx (int32 original ray index, the
    # rng counter key: permutation-invariant sampling) — and the matching
    # outputs (o, d, amp, path, alive) follow the histogram output
    if state_io:
        assert fused_hist and not weighted and not cull and not ablate
        n_st_in = 6 + n_keep  # o(3) + amp(n_keep) + path + alive + gidx
        st_in, refs = refs[:n_st_in], refs[n_st_in:]
    # weighted: n_keep per-ray initial-amplitude inputs (source
    # directivity) precede the outputs in *refs
    if weighted:
        w_refs, out_refs = refs[:n_keep], refs[n_keep:]
    else:
        w_refs, out_refs = None, refs

    if fused_hist and state_io:
        hist_out_ref = out_refs[0]
        st_out = out_refs[1 : 1 + 8 + n_keep]
        hist_ref = out_refs[1 + 8 + n_keep]
        n_coarse = hist_ref.shape[0]

        @pl.when(pl.program_id(0) == 0)
        def _zero_hist_io():
            hist_ref[...] = jnp.zeros_like(hist_ref)
    elif fused_hist:
        # out_refs = (hist_out, hist_scratch): accumulate in scratch (safe
        # across sequential grid steps), write the output once at the end
        # (+ 6 per-row (op, dp) carry buffers when inc_origin)
        if inc_origin:
            hist_out_ref, hist_ref, *iop_refs = out_refs
        else:
            hist_out_ref, hist_ref = out_refs
        # multi-listener: the accumulator stacks C per-listener
        # histograms — n_coarse is the PER-LISTENER row count
        n_coarse = hist_ref.shape[0] // n_listeners

        @pl.when(pl.program_id(0) == 0)
        def _zero_hist():
            hist_ref[...] = jnp.zeros_like(hist_ref)
    else:
        bins_ref, payload_ref = out_refs

    if not group_fori:
        tri_all = tri_ref[...]  # (T, TRI_COLS) register-resident constants
        opl_all = opl_ref[...]  # (T, 8)
    if mxu_xform:
        # EXPERIMENT (measured SLOWER, kept off): op/dp for ALL triangles
        # via (T, 3) @ (3, 128) dot_generals per component, hoping to free
        # the VPU of half the per-group flops. At f32 HIGHEST (r1) the
        # matmuls are multi-pass bf16 and serialize against the VPU
        # pipeline: 140 ms vs 64-70 ms at 1M rays. mxu_xform="bf16" (r2:
        # the verdict's single-pass variant — bf16 inputs, f32 accumulate,
        # DEFAULT precision) was measured too: 66.5 ms vs 57.5 ms — still
        # 16% slower (the tiny K=3 matmuls stay latency-bound against the
        # row-serial dependency chain) AND 0.4% energy error from bf16
        # geometry. Don't re-derive; a two-pass bf16-test/f32-refine needs
        # per-lane gathers Mosaic doesn't have.
        xf_bf16 = mxu_xform == "bf16"
        xf_dtype = jnp.bfloat16 if xf_bf16 else jnp.float32
        a_rows = [
            tri_all[:, 3 * k : 3 * k + 3].astype(xf_dtype) for k in range(3)
        ]  # (T, 3)
        b_cols = [tri_all[:, _B + k : _B + k + 1] for k in range(3)]  # (T, 1)

        def _xf(mat, vec):
            return jax.lax.dot_general(
                mat, vec.astype(xf_dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.DEFAULT if xf_bf16
                    else jax.lax.Precision.HIGHEST
                ),
            )  # (T, 128)

    gaabb_all = gaabb_ref[...]  # (n_groups, 8): [lo xyz | hi xyz | pad]
    g_lo = [gaabb_all[:, j : j + 1] for j in range(3)]  # each (n_groups, 1)
    g_hi = [gaabb_all[:, 3 + j : 4 + j] for j in range(3)]

    def bundle_preds(o_bounds, reach_lo_off, reach_hi_off):
        """(n_groups, 1) bool: may any ray of the bundle reach the group's
        AABB? Per-axis interval test: reachable positions along axis k are
        [o_min + reach_lo_off_k, o_max + reach_hi_off_k]; conservative
        (never culls a hittable group)."""
        pred = None
        for k in range(3):
            omin, omax = o_bounds[k]
            p = (g_hi[k] >= omin + reach_lo_off[k]) & (
                g_lo[k] <= omax + reach_hi_off[k]
            )
            pred = p if pred is None else (pred & p)
        # f32: Mosaic can't extract bool scalars from vectors
        return pred.astype(jnp.float32)

    def cg(g, j):
        """(8, 1) constant column for triangle group g (static slice)."""
        return jax.lax.slice(tri_all, (g * TRI_GROUP, j), ((g + 1) * TRI_GROUP, j + 1))

    def og(g, j):
        return jax.lax.slice(opl_all, (g * TRI_GROUP, j), ((g + 1) * TRI_GROUP, j + 1))

    def spec_pow(x):
        e = int(cfg.specular_exponent)
        while e > 1:
            x = x * x
            e //= 2
        return x

    # groups per fori iteration: a bare 1-group loop body measured 5x
    # slower per group-pass than unrolled code (carry copies + no
    # cross-iteration pipelining). Measured at 3072 tris: unroll 8 = 62 ms,
    # 16 = 56 ms, 32 = 55 ms (best), 64 = 56 ms with 60 s compiles.
    fori_unroll = 1
    for cand in ((sg_unroll,) if sg_unroll else (32, 16, 8)):
        if n_groups % cand == 0 and n_groups >= cand:
            fori_unroll = cand
            break

    def gslice(arr, g):
        """(8, 128) group slice of a (T, 128) per-triangle array
        (mxu_xform experiment only)."""
        return jax.lax.slice(arr, (g * TRI_GROUP, 0), ((g + 1) * TRI_GROUP, LANES))

    def _fori_cols(base, k):
        """Column accessors for group (base_iter*unroll + k): per-column
        (8, 1) VMEM loads at 8-aligned dynamic starts (static lane index ->
        strided load + sublane broadcast, no lane rotations)."""
        g8 = pl.multiple_of(base * (fori_unroll * TRI_GROUP), TRI_GROUP) + k * TRI_GROUP
        col = lambda j: tri_ref[pl.ds(g8, TRI_GROUP), pl.ds(j, 1)]  # noqa: E731
        ocol = lambda j: opl_ref[pl.ds(g8, TRI_GROUP), pl.ds(j, 1)]  # noqa: E731
        return col, ocol

    def _sg_pred(base, o_lo, o_hi, reach_lo, reach_hi):
        """Scalar reachability test for supergroup `base`: can ANY position
        o + t*d with o in [o_lo, o_hi] componentwise and reach offsets
        [reach_lo, reach_hi] touch its union AABB? 6 scalar SMEM reads + 12
        scalar compares — conservative (never skips a hittable group)."""
        p = None
        for k in range(3):
            ok = (sgaabb_ref[base, 3 + k] >= o_lo[k] + reach_lo[k]) & (
                sgaabb_ref[base, k] <= o_hi[k] + reach_hi[k]
            )
            p = ok if p is None else (p & ok)
        return p

    def path_pass(ox, oy, oz, dx, dy, dz, preds=None, o_cols=None,
                  r=None, tb_prev=None, store_iop=False):
        """Nearest hit + attrs for a (1, 128) ray row. Returns per-sublane
        running (best_t, n_xyz, keep) (8, 128) arrays. preds: optional
        (n_groups, 1) bool — groups with False are skipped at runtime.
        o_cols: when the whole row shares one origin (bounce 0: the source),
        its per-triangle transformed origin is precomputed in opl columns
        o_cols..o_cols+2 — skips the 12-op origin transform per group.
        inc_origin: r is the row index into the iop carry buffers,
        tb_prev the previous bounce's (1, 128) hit offset (None at
        bounce 0), store_iop whether a later bounce still needs this
        bounce's (op, dp)."""
        best_t = jnp.full(gshape, inf)
        if tid_fold:
            sel = [jnp.zeros(gshape, jnp.float32)]  # winning group id
        else:
            sel = [jnp.zeros(gshape, jnp.float32) for _ in range(3)] + [
                jnp.ones(gshape, jnp.float32) for _ in range(n_keep)
            ]
            if material_scattering:
                sel.append(jnp.zeros(gshape, jnp.float32))  # diffuse prob
        if mxu_xform:
            dvec = jnp.concatenate([dx, dy, dz], axis=0)  # (3, 128)
            dp_all = [_xf(a_rows[k], dvec) for k in range(3)]
            if o_cols is None:
                ovec = jnp.concatenate([ox, oy, oz], axis=0)
                op_all = [_xf(a_rows[k], ovec) + b_cols[k] for k in range(3)]

        def group_body(col, ocol, carry, g=None):
            best_t, sel = carry[0], list(carry[1:])
            if mxu_xform:
                dpx, dpy, dpz = (gslice(dp_all[k], g) for k in range(3))
                if o_cols is not None:
                    opx = ocol(o_cols) + 0.0 * dx
                    opy = ocol(o_cols + 1) + 0.0 * dx
                    opz = ocol(o_cols + 2) + 0.0 * dx
                else:
                    opx, opy, opz = (gslice(op_all[k], g) for k in range(3))
            else:
                a00, a01, a02 = col(0), col(1), col(2)
                a10, a11, a12 = col(3), col(4), col(5)
                a20, a21, a22 = col(6), col(7), col(8)
                g0 = None if g is None else g * TRI_GROUP
                if o_cols is not None:
                    opx = ocol(o_cols) + 0.0 * dx
                    opy = ocol(o_cols + 1) + 0.0 * dx
                    opz = ocol(o_cols + 2) + 0.0 * dx
                elif inc_origin and tb_prev is not None:
                    # op_b = op_{b-1} + tb_{b-1} * dp_{b-1} (linearity of
                    # the affine map) — 3 FMAs + 6 loads for 12 slots
                    opx = iop_refs[0][r, g0:g0 + TRI_GROUP, :] + (
                        tb_prev * iop_refs[3][r, g0:g0 + TRI_GROUP, :])
                    opy = iop_refs[1][r, g0:g0 + TRI_GROUP, :] + (
                        tb_prev * iop_refs[4][r, g0:g0 + TRI_GROUP, :])
                    opz = iop_refs[2][r, g0:g0 + TRI_GROUP, :] + (
                        tb_prev * iop_refs[5][r, g0:g0 + TRI_GROUP, :])
                else:
                    opx = a00 * ox + a01 * oy + a02 * oz + col(_B)
                    opy = a10 * ox + a11 * oy + a12 * oz + col(_B + 1)
                    opz = a20 * ox + a21 * oy + a22 * oz + col(_B + 2)
                dpx = a00 * dx + a01 * dy + a02 * dz
                dpy = a10 * dx + a11 * dy + a12 * dz
                dpz = a20 * dx + a21 * dy + a22 * dz
                if inc_origin and store_iop:
                    for ref, val in zip(
                        iop_refs, (opx, opy, opz, dpx, dpy, dpz)
                    ):
                        ref[r, g0:g0 + TRI_GROUP, :] = val
            t = -opz / dpz
            u = opx + t * dpx
            v = opy + t * dpy
            ok = (
                (jnp.abs(dpz) > 1e-12)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t >= eps)
            )
            tc = jnp.where(ok, t, inf)
            improved = tc < best_t
            best_t = jnp.where(improved, tc, best_t)
            if tid_fold:
                sel[0] = jnp.where(improved, jnp.float32(g), sel[0])
                return (best_t, sel[0])
            for c in range(3):
                sel[c] = jnp.where(improved, col(_N + c), sel[c])
            for c in range(n_keep):
                sel[3 + c] = jnp.where(improved, col(_K + c), sel[3 + c])
            if material_scattering:
                sel[3 + n_keep] = jnp.where(
                    improved, col(_SCAT), sel[3 + n_keep]
                )
            return (best_t, *sel)

        carry = (best_t, *sel)
        if group_fori:
            if sg_cull:
                o_lo = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
                o_hi = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
                d_lo = (jnp.min(dx), jnp.min(dy), jnp.min(dz))
                d_hi = (jnp.max(dx), jnp.max(dy), jnp.max(dz))
                r_lo = tuple(
                    jnp.where(d_lo[k] < 0, -inf, 0.0) for k in range(3)
                )
                r_hi = tuple(
                    jnp.where(d_hi[k] > 0, inf, 0.0) for k in range(3)
                )

            def fori_body(base, carry):
                def run(carry):
                    for k in range(fori_unroll):
                        col, ocol = _fori_cols(base, k)
                        carry = group_body(col, ocol, carry)
                    return carry

                if not sg_cull:
                    return run(carry)
                return jax.lax.cond(
                    _sg_pred(base, o_lo, o_hi, r_lo, r_hi), run,
                    lambda c: c, carry,
                )

            n_sg = n_groups // fori_unroll
            carry = _sg_fori(
                n_sg, sg_coarse if sg_cull else None, fori_body,
                lambda cb: _sg_pred(n_sg + cb, o_lo, o_hi, r_lo, r_hi),
                carry,
            )
            return carry[0], list(carry[1:])
        if winner_acc > 1 and preds is None:
            # ILP experiment: C independent accumulator chains over
            # CONTIGUOUS group chunks (chunking, not round-robin, so the
            # left-fold merge preserves the serial fold's first-group-wins
            # tie order), merged strictly-less at the end — cuts the
            # loop-carried compare/select dependency depth from n_groups
            # to ~n_groups/C + (C-1) at the cost of (C-1) extra live
            # (best_t + attrs) vreg sets.
            init = carry
            chains = []
            for c in range(winner_acc):
                lo = (c * n_groups) // winner_acc
                hi = ((c + 1) * n_groups) // winner_acc
                ch = init if c == 0 else tuple(v + 0.0 for v in init)
                for g in range(lo, hi):
                    ch = group_body(partial(cg, g), partial(og, g), ch, g)
                chains.append(ch)
            merged = chains[0]
            for ch in chains[1:]:
                imp = ch[0] < merged[0]
                merged = tuple(
                    jnp.where(imp, b, a) for a, b in zip(merged, ch)
                )
            return merged[0], list(merged[1:])
        for g in range(n_groups):
            col = partial(cg, g)
            ocol = partial(og, g)
            if preds is None:
                carry = group_body(col, ocol, carry, g)
            else:
                carry = jax.lax.cond(
                    preds[g, 0] > 0,
                    lambda c, _c=col, _o=ocol, _g=g: group_body(_c, _o, c, _g),
                    lambda c: c, carry,
                )
        return carry[0], list(carry[1:])

    def shadow_pass(wx, wy, wz, preds=None, o_base=0, tb=None, r=None,
                    use_carry=False):
        """Listener->vertex segment test for a (1, 128) row. Constant
        (precomputed) transformed origins at opl columns o_base..o_base+2
        (0 = the single listener; multi-listener NEE passes each
        listener's column base); t <= 1 crosses. preds: optional
        (n_groups, 1) runtime group skip.

        use_carry (shadow_carry bounces): build the transformed direction
        from the path pass's stored (iop, idp) carries — (iop - opl) +
        tb * idp — instead of the 9-FMA transform of w (see the
        shadow_carry note at the top). tb is the bounce's (1, 128) hit
        offset, r the row index into the carry buffers.

        Returns a (1, 128) blocked mask — or, with transmission, a list of
        n_keep (1, 128) crossing log-amplitude sums (exp'd by the
        caller)."""
        if mxu_xform:
            wvec = jnp.concatenate([wx, wy, wz], axis=0)  # (3, 128)
            dp_all = [_xf(a_rows[k], wvec) for k in range(3)]

        def group_body(col, ocol, carry, g=None):
            if mxu_xform:
                dpx, dpy, dpz = (gslice(dp_all[k], g) for k in range(3))
            elif use_carry:
                g0 = g * TRI_GROUP
                olx = ocol(o_base)
                oly = ocol(o_base + 1)
                olz = ocol(o_base + 2)
                dpx = (iop_refs[0][r, g0:g0 + TRI_GROUP, :] - olx) + (
                    tb * iop_refs[3][r, g0:g0 + TRI_GROUP, :])
                dpy = (iop_refs[1][r, g0:g0 + TRI_GROUP, :] - oly) + (
                    tb * iop_refs[4][r, g0:g0 + TRI_GROUP, :])
                dpz = (iop_refs[2][r, g0:g0 + TRI_GROUP, :] - olz) + (
                    tb * iop_refs[5][r, g0:g0 + TRI_GROUP, :])
            else:
                a00, a01, a02 = col(0), col(1), col(2)
                a10, a11, a12 = col(3), col(4), col(5)
                a20, a21, a22 = col(6), col(7), col(8)
                dpx = a00 * wx + a01 * wy + a02 * wz
                dpy = a10 * wx + a11 * wy + a12 * wz
                dpz = a20 * wx + a21 * wy + a22 * wz
            opx = ocol(o_base) + 0.0 * wx
            opy = ocol(o_base + 1) + 0.0 * wx
            opz = ocol(o_base + 2) + 0.0 * wx
            if shadow_divfree:
                # division-free segment test (r2 VERDICT experiment 2a):
                # unlike the path pass, the shadow test never needs t
                # itself (no winner selection — only the accept mask), so
                # every condition is multiplied through by dpz^2 > 0. One
                # variable/variable divide (~6 FMA slots, tools/
                # vpu_peak.py) trades for two muls + two FMAs; exact for
                # non-degenerate dpz (boundary cases can flip only where
                # u, v, or t sit within one ulp of an edge).
                d2 = dpz * dpz
                ad = -(opz * dpz)  # = t * dpz^2
                uu = opx * d2 + ad * dpx  # = u * dpz^2
                vv = opy * d2 + ad * dpy  # = v * dpz^2
                ok = (
                    (d2 > 1e-24)
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= d2)
                    & (ad >= eps * d2)
                    & (ad <= d2)
                )
            else:
                t = -opz / dpz
                u = opx + t * dpx
                v = opy + t * dpy
                ok = (
                    (jnp.abs(dpz) > 1e-12)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t >= eps)
                    & (t <= 1.0)
                )
            okf = ok.astype(jnp.float32)
            if transmission:
                return tuple(
                    carry[c] + okf * col(_TAU + c) for c in range(n_keep)
                )
            return jnp.maximum(carry, okf)

        if transmission:
            carry = tuple(jnp.zeros(gshape, jnp.float32) for _ in range(n_keep))
        else:
            carry = jnp.zeros(gshape, jnp.float32)
        if group_fori:
            if sg_cull:
                # shadow segments run listener -> vertex: origin is the
                # (scalar) listener point, reach = the row's min/max
                # vertex offsets clamped to include t = 0
                l_pt = (lx, ly, lz)
                wb = ((jnp.min(wx), jnp.max(wx)), (jnp.min(wy), jnp.max(wy)),
                      (jnp.min(wz), jnp.max(wz)))
                r_lo = tuple(jnp.minimum(wb[k][0], 0.0) for k in range(3))
                r_hi = tuple(jnp.maximum(wb[k][1], 0.0) for k in range(3))

            def fori_body(base, carry):
                def run(carry):
                    for k in range(fori_unroll):
                        col, ocol = _fori_cols(base, k)
                        carry = group_body(col, ocol, carry)
                    return carry

                if not sg_cull:
                    return run(carry)
                return jax.lax.cond(
                    _sg_pred(base, l_pt, l_pt, r_lo, r_hi), run,
                    lambda c: c, carry,
                )

            n_sg = n_groups // fori_unroll
            carry = _sg_fori(
                n_sg, sg_coarse if sg_cull else None, fori_body,
                lambda cb: _sg_pred(n_sg + cb, l_pt, l_pt, r_lo, r_hi),
                carry,
            )
            if transmission:
                return [jnp.sum(c, axis=0, keepdims=True) for c in carry]
            return jnp.max(carry, axis=0, keepdims=True)
        for g in range(n_groups):
            col = partial(cg, g)
            ocol = partial(og, g)
            if preds is None:
                carry = group_body(col, ocol, carry, g)
            else:
                carry = jax.lax.cond(
                    preds[g, 0] > 0,
                    lambda b, _c=col, _o=ocol, _g=g: group_body(_c, _o, b, _g),
                    lambda b: b, carry,
                )
        if transmission:
            return [jnp.sum(c, axis=0, keepdims=True) for c in carry]
        return jnp.max(carry, axis=0, keepdims=True)  # (1, 128)

    def row_body(r, carry):
        dx = dx_ref[pl.ds(r, 1), :]  # (1, 128)
        dy = dy_ref[pl.ds(r, 1), :]
        dz = dz_ref[pl.ds(r, 1), :]
        if state_io:
            ox = st_in[0][pl.ds(r, 1), :]
            oy = st_in[1][pl.ds(r, 1), :]
            oz = st_in[2][pl.ds(r, 1), :]
            amp = [st_in[3 + c][pl.ds(r, 1), :] for c in range(n_keep)]
            path = st_in[3 + n_keep][pl.ds(r, 1), :]
            alive = st_in[4 + n_keep][pl.ds(r, 1), :]
        else:
            ox = sx + 0.0 * dx
            oy = sy + 0.0 * dx
            oz = sz + 0.0 * dx
            if weighted:
                amp = [w_refs[c][pl.ds(r, 1), :] for c in range(n_keep)]
            else:
                amp = [1.0 + 0.0 * dx for _ in range(n_keep)]
            path = 0.0 * dx
            alive = 1.0 + 0.0 * dx  # f32 mask (i1 carries don't legalize)

        tb_prev = None
        hist_pend = {}  # per-listener pending one-hot dot operands
        for b in ((None,) if state_io else range(max_bounces)):
            if cull:
                o_bounds = [
                    (jnp.min(ox), jnp.max(ox)),
                    (jnp.min(oy), jnp.max(oy)),
                    (jnp.min(oz), jnp.max(oz)),
                ]
                dmins = (jnp.min(dx), jnp.min(dy), jnp.min(dz))
                dmaxs = (jnp.max(dx), jnp.max(dy), jnp.max(dz))
                # unbounded t >= 0: reachable extends to -inf where any ray
                # points negative, +inf where any points positive
                reach_lo = [jnp.where(dmins[k] < 0, -inf, 0.0) for k in range(3)]
                reach_hi = [jnp.where(dmaxs[k] > 0, inf, 0.0) for k in range(3)]
                preds = bundle_preds(o_bounds, reach_lo, reach_hi)
            else:
                preds = None
            best_t8, sel = path_pass(
                ox, oy, oz, dx, dy, dz, preds,
                o_cols=(3 if b == 0 else None),
                r=r, tb_prev=tb_prev,
                store_iop=inc_origin and b is not None
                and b + 1 < max_bounces,
            )
            min_t = jnp.min(best_t8, axis=0, keepdims=True)  # (1, 128)
            n_sel = 3 + n_keep + (1 if material_scattering else 0)
            if mask_sweep:
                # mask-reduce sweep: the serial scan below computes
                #   use_s = row_min_s * (1 - max(row_min_0..s-1))
                #   acc_c = sum_s use_s * sel_c[s]
                # with 8 dependent (1, 128) steps. This computes the
                # IDENTICAL mask and sums — same formulas, full-vreg —
                # via a Hillis-Steele prefix-max over sublanes (3
                # pltpu.roll + zero-mask + max steps), so on hit lanes
                # the winner, tie-break (first sublane), and every
                # accumulated term (one winner + exact 0.0s) are
                # bit-identical to the scan; only the instruction count
                # changes (~70 -> ~35 mostly-independent full-vreg ops
                # per bounce). On MISS lanes (min_t = inf) the
                # intermediates differ: the scan's acc is NaN-poisoned
                # (0.0 * inf), mask_sweep yields sublane-0 attrs.
                # Final outputs are still bit-identical only because
                # every consumer is select-masked (kc via min_t < inf,
                # chans via visible, dirs via where(live)) — keep those
                # selects (not multiplies) when touching consumers.
                # NOTE: a sublane-halving select tree was tried first
                # and REJECTED by analysis — with strided halves
                # ({s, s+4} fold slots) index order is not preserved
                # across levels: an exact-t tie between adjacent
                # sublanes (i, i+1), i odd, resolves to the HIGHER
                # sublane, i.e. a different coincident hit than the XLA
                # tracer's first-win fold — breaking the bit-for-bit
                # pallas==exact contract. Forced-tie equality is tested
                # (duplicated-triangle scene, test_pallas_trace.py).
                row_min8 = (best_t8 == min_t).astype(jnp.float32)
                inc = row_min8  # inclusive prefix-max after the steps
                for k in (1, 2, 4):
                    keepk = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (TRI_GROUP, LANES), 0
                        ) >= k
                    ).astype(jnp.float32)
                    inc = jnp.maximum(
                        inc, pltpu.roll(inc, k, axis=0) * keepk
                    )
                keep1 = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (TRI_GROUP, LANES), 0
                    ) >= 1
                ).astype(jnp.float32)
                prior = pltpu.roll(inc, 1, axis=0) * keep1
                use8 = row_min8 * (1.0 - prior)
                acc = [
                    jnp.sum(use8 * sel[c], axis=0, keepdims=True)
                    for c in range(n_sel)
                ]
            else:
                if tid_fold:
                    # sweep only (t, group id) to the winning sublane, then
                    # fetch the winner's attribute row with one exact one-hot
                    # matmul over the register-resident table. Misses keep
                    # tid 0 (taken stays 0): triangle 0's attrs are fetched
                    # but every consumer is already masked by alive/visible
                    # (keep is forced to 1 on miss below, exactly as the
                    # attribute fold zeroed them).
                    gwin8 = sel[0]
                    taken = 0.0 * min_t
                    tidf = 0.0 * min_t
                    for s in range(TRI_GROUP):
                        row_min = (
                            jax.lax.slice(best_t8, (s, 0), (s + 1, LANES))
                            == min_t
                        ).astype(jnp.float32)
                        use = row_min * (1.0 - taken)
                        tidf = tidf + use * (
                            jax.lax.slice(gwin8, (s, 0), (s + 1, LANES))
                            * TRI_GROUP + s
                        )
                        taken = jnp.maximum(taken, row_min)
                    iota_t = jax.lax.broadcasted_iota(
                        jnp.int32, (n_tris, LANES), 0
                    )  # Mosaic iota is integer-only; tid fits i32 exactly
                    oh = jnp.where(
                        iota_t == tidf.astype(jnp.int32), 1.0, 0.0
                    )  # (T, 128)
                    attrs = jax.lax.dot_general(
                        tri_all, oh, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # (TRI_COLS, 128)

                    def arow(j):
                        return jax.lax.slice(attrs, (j, 0), (j + 1, LANES))

                    acc = [arow(_N), arow(_N + 1), arow(_N + 2)] + [
                        arow(_K + c) for c in range(n_keep)
                    ]
                    if material_scattering:
                        acc.append(arow(_SCAT))
                elif "no_sweep" in ab:
                    # ablation: winner attrs from sublane 0 (wrong, cheap)
                    acc = [
                        jax.lax.slice(sel[c], (0, 0), (1, LANES))
                        for c in range(n_sel)
                    ]
                else:
                    # first-winning-sublane select (no cumsum in Mosaic: static
                    # sweep)
                    taken = 0.0 * min_t
                    acc = [0.0 * min_t for _ in range(n_sel)]
                    for s in range(TRI_GROUP):
                        row_min = (
                            jax.lax.slice(best_t8, (s, 0), (s + 1, LANES)) == min_t
                        ).astype(jnp.float32)
                        use = row_min * (1.0 - taken)
                        for c in range(n_sel):
                            acc[c] = acc[c] + use * jax.lax.slice(
                                sel[c], (s, 0), (s + 1, LANES)
                            )
                        taken = jnp.maximum(taken, row_min)
            nx, ny, nz = acc[0], acc[1], acc[2]
            keep = acc[3:3 + n_keep]
            scat_sel = acc[3 + n_keep] if material_scattering else None

            hitf = (min_t < inf).astype(jnp.float32)
            alive = alive * hitf
            t_safe = jnp.where(min_t < inf, min_t, 0.0) * alive
            tb = t_safe * cfg.backoff
            tb_prev = tb
            vx = ox + dx * tb
            vy = oy + dy * tb
            vz = oz + dz * tb
            ndd = nx * dx + ny * dy + nz * dz
            s = jnp.sign(1e-30 - ndd)
            nx, ny, nz = nx * s, ny * s, nz * s
            path = path + t_safe * alive
            for c in range(n_keep):
                # misses selected keep=1 only if no sublane won; force 1
                kc = jnp.where(min_t < inf, keep[c], 1.0)
                amp[c] = amp[c] * jnp.where(alive > 0, kc, 1.0)

            # --- next-event estimation (per listener) --------------------
            # C = 1 keeps the historical single-listener lowering (o_base
            # 0, full-histogram accumulate); C > 1 loops the shadow/
            # emission/binning stages over the SMEM listener table with
            # per-listener opl columns and histogram slices — the path
            # pass above ran ONCE for all of them.
            def nee_one(lx_c, ly_c, lz_c, o_base_c, l_row):
                wx = vx - lx_c
                wy = vy - ly_c
                wz = vz - lz_c
                if cull:
                    # segment t in [0, 1] from the listener point:
                    # reachable is [l + min(0, w_min), l + max(0, w_max)]
                    l_pt = (lx_c, ly_c, lz_c)
                    w_bounds = [
                        (jnp.min(wx), jnp.max(wx)),
                        (jnp.min(wy), jnp.max(wy)),
                        (jnp.min(wz), jnp.max(wz)),
                    ]
                    o_b = [(l_pt[k], l_pt[k]) for k in range(3)]
                    r_lo = [jnp.minimum(w_bounds[k][0], 0.0) for k in range(3)]
                    r_hi = [jnp.maximum(w_bounds[k][1], 0.0) for k in range(3)]
                    sh_preds = bundle_preds(o_b, r_lo, r_hi)
                else:
                    sh_preds = None
                if "no_shadow" in ab:
                    sh_out = 0.0 * min_t  # ablation: every hit visible
                else:
                    # shadow_carry: this bounce's (iop, idp) are in the
                    # carry buffers only when the path pass stored them
                    # (every bounce but the last — the store_iop
                    # condition); the final bounce keeps the classic
                    # transform
                    sh_out = shadow_pass(
                        wx, wy, wz, sh_preds, o_base=o_base_c, tb=tb, r=r,
                        use_carry=(shadow_carry and b is not None
                                   and b + 1 < max_bounces),
                    )
                if transmission:
                    # all alive rays emit; opaque crossings carry
                    # exp(-34.5) ~ 1e-15 amplitude (energy ~1e-30)
                    t_amp = [jnp.exp(t) for t in sh_out]
                    visible = alive > 0
                else:
                    visible = (alive > 0) & (sh_out < 0.5)

                if "no_emit" in ab:
                    # ablation: skip the listener-leg emission math; a
                    # bare amplitude still feeds the binning so
                    # downstream stages stay live
                    visf = visible.astype(jnp.float32)
                    e_base = amp[0] * amp[0] * inv_n * visf
                    es = [e_base] * n_keep if (
                        fused_hist and flat_bands
                    ) else [e_base] * N_BANDS
                    e_dir = e_base
                    d_total = path
                    inv_dl = 1.0 + 0.0 * wx
                else:
                    if "rsqrt_emit" in ab:
                        dl2 = wx * wx + wy * wy + wz * wz
                        inv_dl = jax.lax.rsqrt(jnp.maximum(dl2, 1e-40))
                        dl = dl2 * inv_dl
                    else:
                        dl = jnp.sqrt(wx * wx + wy * wy + wz * wz)
                        inv_dl = 1.0 / jnp.maximum(dl, 1e-20)
                    wox, woy, woz = -wx * inv_dl, -wy * inv_dl, -wz * inv_dl
                    hx, hy, hz = wox - dx, woy - dy, woz - dz
                    ih = jax.lax.rsqrt(
                        jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-20)
                    )
                    ndw = nx * wox + ny * woy + nz * woz
                    ndh = (nx * hx + ny * hy + nz * hz) * ih
                    lam = jnp.abs(ndw) + spec_pow(jnp.maximum(ndh, 0.0))
                    d_total = path + dl
                    scale = lam / (d_total + 1.0)
                    visf = visible.astype(jnp.float32)
                    if fused_hist and flat_bands:
                        # one amplitude; air absorption reconstructed
                        # from the bin index outside the kernel
                        a0 = amp[0] * scale
                        if transmission:  # band-uniform tau (caller)
                            a0 = a0 * t_amp[0]
                        e_base = a0 * a0 * inv_n * visf
                        es = [e_base]
                        e_dir = e_base
                    else:
                        es = []
                        for c in range(N_BANDS):
                            aab = aab_of(d_total, c)
                            ac = amp[c] * scale * aab
                            if transmission:
                                ac = ac * t_amp[c]
                            es.append(ac * ac * inv_n * visf)
                        e_dir = (es[0] + es[1] + es[2] + es[3]) * (
                            1.0 / N_BANDS
                        )
                bins = jnp.clip(d_total * spm_bps + 0.5, 0.0, n_bins - 1.0)
                bins = jnp.where(visible, bins, n_bins).astype(jnp.int32)

                chans = es + [
                    wx * inv_dl * e_dir,
                    wy * inv_dl * e_dir,
                    wz * inv_dl * e_dir,
                ]
                # dead/occluded rays can carry inf through the masked
                # math (inf * 0 = NaN); a select passes clean zeros
                chans = [jnp.where(visible, c, 0.0) for c in chans]
                if "no_hist" in ab:
                    # ablation: consume bins + channels with one cheap
                    # (1, 128) accumulate instead of the one-hot binning
                    acc1 = bins.astype(jnp.float32) * 1e-9
                    for c in chans:
                        acc1 = acc1 + c
                    hist_ref[pl.ds(0, 1), pl.ds(0, LANES)] += acc1
                elif fused_hist:
                    # in-kernel two-level one-hot binning on the MXU:
                    # H[coarse, c*128 + fine] += payload_c, all channels
                    # stacked into ONE dot_general. Occluded/dead lanes
                    # carry zeroed payloads, so a lane landing anywhere
                    # (incl. the sentinel bin n_bins) adds zeros. bf16
                    # inputs (f32 MXU accumulate): ~4e-3 relative
                    # rounding, below the Monte-Carlo noise.
                    pc = len(chans)
                    coarse = bins // LANES  # (1, 128)
                    fine = bins - coarse * LANES
                    f_oh = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (LANES, LANES), 0
                        ) == fine
                    ).astype(jnp.bfloat16)  # (128 fine, 128 rays)
                    b_all = jnp.concatenate(
                        [f_oh * chans[c].astype(jnp.bfloat16)
                         for c in range(pc)],
                        axis=0,
                    )  # (pc*128, 128 rays)

                    a_oh = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (n_coarse, LANES), 0
                        ) == coarse
                    ).astype(jnp.bfloat16)  # (NC, 128 rays)
                    r0 = l_row * n_coarse

                    def _acc(h):
                        if n_listeners > 1:
                            hist_ref[r0:r0 + n_coarse, :] += h
                        else:
                            hist_ref[...] += h

                    if hist_batch > 1 and not state_io:
                        # batch the one-hot dots of `hist_batch` bounces
                        # into one contraction (rays concatenate on K:
                        # H += sum over bounces AND rays) so the
                        # (NC, pc*128) f32 accumulator is read-modified-
                        # written 1/batch as often — the += traffic, not
                        # the MACs, is the measured histogram cost
                        pend = hist_pend.setdefault(l_row, [])
                        pend.append((a_oh, b_all))
                        if len(pend) == hist_batch or b + 1 == max_bounces:
                            a_cat = jnp.concatenate(
                                [p[0] for p in pend], axis=1
                            )
                            b_cat = jnp.concatenate(
                                [p[1] for p in pend], axis=1
                            )
                            _acc(jax.lax.dot_general(
                                a_cat, b_cat, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ))
                            pend.clear()
                    else:
                        h = jax.lax.dot_general(
                            a_oh, b_all, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (NC, pc*128)
                        _acc(h)
                else:
                    bins_ref[b, pl.ds(r, 1), :] = bins
                    for c in range(PAYLOAD_C):
                        payload_ref[b, c, pl.ds(r, 1), :] = chans[c]

            if n_listeners > 1:
                for li_ in range(n_listeners):
                    nee_one(
                        lref[li_, 0], lref[li_, 1], lref[li_, 2],
                        0 if li_ == 0 else 6 + 3 * (li_ - 1), li_,
                    )
            else:
                nee_one(lx, ly, lz, 0, 0)

            if state_io or b + 1 < max_bounces:
                two_ndd = 2.0 * (nx * dx + ny * dy + nz * dz)
                live = alive > 0
                sdx = dx - two_ndd * nx
                sdy = dy - two_ndd * ny
                sdz = dz - two_ndd * nz
                if scatter_on:
                    # hash uniforms at ((ray*max_bounces + b)*3 + draw);
                    # formulas mirror models/ir.py's hemisphere sample
                    # op-for-op so interpret paths are bit-identical.
                    # state_io: gidx is the ORIGINAL ray index carried
                    # through the caller's permutations and b rides
                    # scalars[9] — draws match the fused loop bit-for-bit
                    if state_io:
                        gidx = st_in[5 + n_keep][pl.ds(r, 1), :]
                        b_rng = b_io
                    else:
                        lane = jax.lax.broadcasted_iota(
                            jnp.int32, (1, LANES), 1
                        )
                        gidx = tile_base + r * LANES + lane
                        b_rng = b
                    cnt = seed_base + (gidx * max_bounces + b_rng) * 3
                    u_sel = uniform01(cnt)
                    u1 = uniform01(cnt + 1)
                    u2 = uniform01(cnt + 2)
                    r_s = jnp.sqrt(u1)
                    phi = 2.0 * jnp.float32(np.pi) * u2
                    z_s = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
                    hxv = (jnp.abs(nz) >= 0.9).astype(jnp.float32)
                    hzv = 1.0 - hxv
                    txx = -hzv * ny
                    txy = hzv * nx - hxv * nz
                    txz = hxv * ny
                    tl = jnp.sqrt(txx * txx + txy * txy + txz * txz)
                    ti = 1.0 / jnp.maximum(tl, 1e-20)
                    txx, txy, txz = txx * ti, txy * ti, txz * ti
                    tyx = ny * txz - nz * txy
                    tyy = nz * txx - nx * txz
                    tyz = nx * txy - ny * txx
                    rc = r_s * jnp.cos(phi)
                    rs = r_s * jnp.sin(phi)
                    ddx = txx * rc + tyx * rs + nx * z_s
                    ddy = txy * rc + tyy * rs + ny * z_s
                    ddz = txz * rc + tyz * rs + nz * z_s
                    prob = scat_sel if material_scattering else scattering
                    use = u_sel < prob
                    sdx = jnp.where(use, ddx, sdx)
                    sdy = jnp.where(use, ddy, sdy)
                    sdz = jnp.where(use, ddz, sdz)
                dx = jnp.where(live, sdx, dx)
                dy = jnp.where(live, sdy, dy)
                dz = jnp.where(live, sdz, dz)
                ox, oy, oz = vx, vy, vz
            if state_io:
                rr = pl.ds(r, 1)
                st_out[0][rr, :] = ox
                st_out[1][rr, :] = oy
                st_out[2][rr, :] = oz
                st_out[3][rr, :] = dx
                st_out[4][rr, :] = dy
                st_out[5][rr, :] = dz
                for c in range(n_keep):
                    st_out[6 + c][rr, :] = amp[c]
                st_out[6 + n_keep][rr, :] = path
                st_out[7 + n_keep][rr, :] = alive
        return carry

    # full unroll on hardware: cross-row ILP the scf.for blocks (+10%
    # measured); interpret mode keeps the rolled loop (8x trace cost).
    # Intermediate levels (Mosaic's fori supports only unroll=1/full) are
    # expressed as a rolled loop whose body runs `row_unroll` rows — the
    # register-pressure/ILP tradeoff knob for A/Bs.
    if row_unroll in (1, SUBLANES):
        jax.lax.fori_loop(0, SUBLANES, row_body, 0, unroll=row_unroll)
    else:
        assert SUBLANES % row_unroll == 0, row_unroll

        def rows_body(i, c):
            for k in range(row_unroll):
                c = row_body(i * row_unroll + k, c)
            return c

        jax.lax.fori_loop(0, SUBLANES // row_unroll, rows_body, 0)
    if fused_hist:
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _flush_hist():
            hist_out_ref[...] = hist_ref[...]


def _trace_kernel_raymajor(scalar_ref, dx_ref, dy_ref, dz_ref, tri_ref,
                           opl_ref, hist_out_ref, hist_ref, *, n_tris: int,
                           max_bounces: int, cfg: Config,
                           flat_bands: bool = False, tri_unroll: int = 8,
                           ray_blocks: int = 1, scattering: float = 0.0,
                           material_scattering: bool = False):
    """Ray-major layout of the fused trace (fused_hist only): the (8, 128)
    vreg holds 1024 RAYS (instead of 8 triangles x 128 rays) and triangle
    constants are SCALARS read from SMEM — measured motivation in
    benchmarks/ablate_kernel.json: the tri-major kernel spends 71% of its
    time in the path pass, which runs at only ~32% of the bare-loop rate
    because every group iteration re-broadcasts (8, 1) triangle columns
    across lanes and keeps the whole (T, 24) table register-resident
    (spilling against 8 bounces of live row state). Here a triangle test
    is ~40 full-vreg ops with zero broadcasts, the cross-sublane winner
    sweep disappears (best_t is per-ray by construction, ties resolve to
    the lowest triangle index exactly like the tri-major kernel's
    group-then-sublane order), and the per-bounce emission math runs once
    per 1024 rays instead of once per 128.

    Scope: the resident small-scene fast path (SMEM holds (T, 24) f32 —
    T <= ~2048). No transmission/directivity/culling; stochastic
    scattering IS supported (same counter-hash streams as _trace_kernel:
    global ray index = tile*1024 + sublane*128 + lane). Large scenes
    belong to the tri-major group_fori/sg_cull/streamed kernels.

    MEASURED VERDICT (v5e, world.obj 1M rays x 8 bounces, flat_bands;
    do not re-derive): SLOWER than the tri-major kernel — 69-71 ms at
    ray_blocks=1 (the per-triangle scalar SMEM reads serialize on the
    scalar unit: ~1.9k scalar loads/bounce/tile against ~1.3k VPU
    cycles), recovering to 63.3 ms at ray_blocks=2-8 (scalar traffic
    amortized over more rays) but never beating the tri-major 61.8 ms.
    Conclusion: Mosaic hoists/CSEs the tri-major layout's (8, 1)->lane
    broadcasts well enough that eliminating them does not pay for the
    per-triangle (vs per-8-triangle) select chain. Kept as a measured
    experiment (interpret parity 2e-4 vs the XLA tracer, the bf16
    binning noise floor); benchmarks/ablate_kernel.json carries the
    component split that motivated it.
    """
    RS = ray_blocks * SUBLANES  # ray sublanes per program
    inf = jnp.float32(np.inf)
    sx, sy, sz = scalar_ref[0], scalar_ref[1], scalar_ref[2]
    lx, ly, lz = scalar_ref[3], scalar_ref[4], scalar_ref[5]
    inv_n = scalar_ref[6]
    spm_bps = scalar_ref[7]
    n_bins = scalar_ref[8]
    air = cfg.air_absorption
    eps = 1e-6
    freqs = [float(f) for f in EQ_FREQS]
    if cfg.air_model == "iso9613":
        from ..models.air import amplitude_decay_per_meter
        from ..models.ir import AIR_BAND_HZ

        k_air = amplitude_decay_per_meter(
            AIR_BAND_HZ, cfg.air_temperature_c, cfg.air_humidity_pct,
            cfg.air_pressure_kpa,
        )
        aab_of = lambda d, c: jnp.exp(float(k_air[c]) * d)  # noqa: E731
    else:
        aab_of = lambda d, c: jnp.clip(  # noqa: E731
            1.0 - air * d * freqs[c], 0.0, 1.0
        )
    n_keep = 1 if flat_bands else N_BANDS
    n_coarse = hist_ref.shape[0]
    scatter_on = scattering > 0.0 or material_scattering
    if scatter_on:
        from .hashrng import uniform01

        # the hashed seed rides scalars[10:12] as (lo16, hi16) halves —
        # a TRACED operand, so ensemble seed sweeps and per-shard folds
        # reuse one compiled kernel instead of paying a ~4 min Mosaic
        # recompile per seed (the int32 reassembly wraps, reproducing the
        # signed bit pattern hash_u32 produced outside)
        seed_base = scalar_ref[10].astype(jnp.int32) | (
            scalar_ref[11].astype(jnp.int32) << 16
        )
        tile_base = pl.program_id(0) * (ray_blocks * TILE)

    @pl.when(pl.program_id(0) == 0)
    def _zero_hist():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    def spec_pow(x):
        e = int(cfg.specular_exponent)
        while e > 1:
            x = x * x
            e //= 2
        return x

    dx = dx_ref[...]  # (8, 128) = 1024 rays
    dy = dy_ref[...]
    dz = dz_ref[...]
    ox = sx + 0.0 * dx
    oy = sy + 0.0 * dx
    oz = sz + 0.0 * dx
    amp = [1.0 + 0.0 * dx for _ in range(n_keep)]
    path = 0.0 * dx
    alive = 1.0 + 0.0 * dx

    assert n_tris % tri_unroll == 0, (n_tris, tri_unroll)

    for b in range(max_bounces):
        # --- path pass: nearest hit over all triangles, attrs selected
        # incrementally (scalar sources -> no winner sweep) ---
        n_sel = 3 + n_keep + (1 if material_scattering else 0)
        best_t = jnp.full((RS, LANES), inf)
        sel = [jnp.zeros((RS, LANES), jnp.float32) for _ in range(3)]
        sel += [jnp.ones((RS, LANES), jnp.float32)
                for _ in range(n_sel - 3)]

        def tri_body(t0, carry, b=b):
            best_t, sel = carry[0], list(carry[1:])
            for k in range(tri_unroll):
                ti = t0 * tri_unroll + k
                a00, a01, a02 = tri_ref[ti, 0], tri_ref[ti, 1], tri_ref[ti, 2]
                a10, a11, a12 = tri_ref[ti, 3], tri_ref[ti, 4], tri_ref[ti, 5]
                a20, a21, a22 = tri_ref[ti, 6], tri_ref[ti, 7], tri_ref[ti, 8]
                dpx = a00 * dx + a01 * dy + a02 * dz
                dpy = a10 * dx + a11 * dy + a12 * dz
                dpz = a20 * dx + a21 * dy + a22 * dz
                if b == 0:
                    # bounce 0: the whole tile shares the source origin —
                    # its transformed origin is a precomputed SCALAR
                    opx = opl_ref[ti, 3]
                    opy = opl_ref[ti, 4]
                    opz = opl_ref[ti, 5]
                else:
                    opx = (a00 * ox + a01 * oy + a02 * oz) + tri_ref[ti, _B]
                    opy = (a10 * ox + a11 * oy + a12 * oz) + tri_ref[ti, _B + 1]
                    opz = (a20 * ox + a21 * oy + a22 * oz) + tri_ref[ti, _B + 2]
                t = -opz / dpz
                u = opx + t * dpx
                v = opy + t * dpy
                ok = (
                    (jnp.abs(dpz) > 1e-12)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t >= eps)
                )
                tc = jnp.where(ok, t, inf)
                improved = tc < best_t
                best_t = jnp.where(improved, tc, best_t)
                for c in range(3):
                    sel[c] = jnp.where(improved, tri_ref[ti, _N + c], sel[c])
                for c in range(n_keep):
                    sel[3 + c] = jnp.where(
                        improved, tri_ref[ti, _K + c], sel[3 + c]
                    )
                if material_scattering:
                    sel[3 + n_keep] = jnp.where(
                        improved, tri_ref[ti, _SCAT], sel[3 + n_keep]
                    )
            return (best_t, *sel)

        carry = jax.lax.fori_loop(
            0, n_tris // tri_unroll, tri_body, (best_t, *sel)
        )
        min_t, acc = carry[0], list(carry[1:])
        nx, ny, nz = acc[0], acc[1], acc[2]
        keep = acc[3:3 + n_keep]
        scat_sel = acc[3 + n_keep] if material_scattering else None

        hitf = (min_t < inf).astype(jnp.float32)
        alive = alive * hitf
        t_safe = jnp.where(min_t < inf, min_t, 0.0) * alive
        tb = t_safe * cfg.backoff
        vx = ox + dx * tb
        vy = oy + dy * tb
        vz = oz + dz * tb
        ndd = nx * dx + ny * dy + nz * dz
        s = jnp.sign(1e-30 - ndd)
        nx, ny, nz = nx * s, ny * s, nz * s
        path = path + t_safe * alive
        for c in range(n_keep):
            kc = jnp.where(min_t < inf, keep[c], 1.0)
            amp[c] = amp[c] * jnp.where(alive > 0, kc, 1.0)

        # --- listener shadow pass: segment test, precomputed scalar
        # origins (opl cols 0:3) ---
        wx = vx - lx
        wy = vy - ly
        wz = vz - lz

        def sh_body(t0, blocked):
            for k in range(tri_unroll):
                ti = t0 * tri_unroll + k
                a00, a01, a02 = tri_ref[ti, 0], tri_ref[ti, 1], tri_ref[ti, 2]
                a10, a11, a12 = tri_ref[ti, 3], tri_ref[ti, 4], tri_ref[ti, 5]
                a20, a21, a22 = tri_ref[ti, 6], tri_ref[ti, 7], tri_ref[ti, 8]
                dpx = a00 * wx + a01 * wy + a02 * wz
                dpy = a10 * wx + a11 * wy + a12 * wz
                dpz = a20 * wx + a21 * wy + a22 * wz
                opx = opl_ref[ti, 0]
                opy = opl_ref[ti, 1]
                opz = opl_ref[ti, 2]
                t = -opz / dpz
                u = opx + t * dpx
                v = opy + t * dpy
                ok = (
                    (jnp.abs(dpz) > 1e-12)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t >= eps)
                    & (t <= 1.0)
                )
                blocked = jnp.maximum(blocked, ok.astype(jnp.float32))
            return blocked

        sh_out = jax.lax.fori_loop(
            0, n_tris // tri_unroll, sh_body, 0.0 * dx
        )
        visible = (alive > 0) & (sh_out < 0.5)

        # --- emission (full-vreg: once per 1024 rays) ---
        dl = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        inv_dl = 1.0 / jnp.maximum(dl, 1e-20)
        wox, woy, woz = -wx * inv_dl, -wy * inv_dl, -wz * inv_dl
        hx, hy, hz = wox - dx, woy - dy, woz - dz
        ih = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-20))
        ndw = nx * wox + ny * woy + nz * woz
        ndh = (nx * hx + ny * hy + nz * hz) * ih
        lam = jnp.abs(ndw) + spec_pow(jnp.maximum(ndh, 0.0))
        d_total = path + dl
        scale = lam / (d_total + 1.0)
        visf = visible.astype(jnp.float32)
        if flat_bands:
            a0 = amp[0] * scale
            e_base = a0 * a0 * inv_n * visf
            es = [e_base]
            e_dir = e_base
        else:
            es = []
            for c in range(N_BANDS):
                aab = aab_of(d_total, c)
                ac = amp[c] * scale * aab
                es.append(ac * ac * inv_n * visf)
            e_dir = (es[0] + es[1] + es[2] + es[3]) * (1.0 / N_BANDS)
        bins = jnp.clip(d_total * spm_bps + 0.5, 0.0, n_bins - 1.0)
        bins = jnp.where(visible, bins, n_bins).astype(jnp.int32)
        chans = es + [
            wx * inv_dl * e_dir,
            wy * inv_dl * e_dir,
            wz * inv_dl * e_dir,
        ]
        chans = [jnp.where(visible, c, 0.0) for c in chans]

        # --- two-level one-hot MXU binning, per 128-ray sublane row (the
        # one-hot needs rays on the lane axis) ---
        pc = len(chans)
        for r in range(RS):
            bins_r = jax.lax.slice(bins, (r, 0), (r + 1, LANES))
            coarse = bins_r // LANES
            fine = bins_r - coarse * LANES
            f_oh = (
                jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
                == fine
            ).astype(jnp.bfloat16)
            b_all = jnp.concatenate(
                [
                    f_oh
                    * jax.lax.slice(chans[c], (r, 0), (r + 1, LANES)).astype(
                        jnp.bfloat16
                    )
                    for c in range(pc)
                ],
                axis=0,
            )
            a_oh = (
                jax.lax.broadcasted_iota(jnp.int32, (n_coarse, LANES), 0)
                == coarse
            ).astype(jnp.bfloat16)
            h = jax.lax.dot_general(
                a_oh, b_all, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hist_ref[...] += h

        # --- reflect ---
        if b + 1 < max_bounces:
            two_ndd = 2.0 * (nx * dx + ny * dy + nz * dz)
            live = alive > 0
            sdx = dx - two_ndd * nx
            sdy = dy - two_ndd * ny
            sdz = dz - two_ndd * nz
            if scatter_on:
                # same counter layout as _trace_kernel: global ray index
                # = tile*1024 + sublane*128 + lane
                sub = jax.lax.broadcasted_iota(
                    jnp.int32, (RS, LANES), 0
                )
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (RS, LANES), 1
                )
                gidx = tile_base + sub * LANES + lane
                cnt = seed_base + (gidx * max_bounces + b) * 3
                u_sel = uniform01(cnt)
                u1 = uniform01(cnt + 1)
                u2 = uniform01(cnt + 2)
                r_s = jnp.sqrt(u1)
                phi = 2.0 * jnp.float32(np.pi) * u2
                z_s = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
                hxv = (jnp.abs(nz) >= 0.9).astype(jnp.float32)
                hzv = 1.0 - hxv
                txx = -hzv * ny
                txy = hzv * nx - hxv * nz
                txz = hxv * ny
                tl = jnp.sqrt(txx * txx + txy * txy + txz * txz)
                ti_ = 1.0 / jnp.maximum(tl, 1e-20)
                txx, txy, txz = txx * ti_, txy * ti_, txz * ti_
                tyx = ny * txz - nz * txy
                tyy = nz * txx - nx * txz
                tyz = nx * txy - ny * txx
                rc = r_s * jnp.cos(phi)
                rs = r_s * jnp.sin(phi)
                ddx = txx * rc + tyx * rs + nx * z_s
                ddy = txy * rc + tyy * rs + ny * z_s
                ddz = txz * rc + tyz * rs + nz * z_s
                prob = scat_sel if material_scattering else scattering
                use = u_sel < prob
                sdx = jnp.where(use, ddx, sdx)
                sdy = jnp.where(use, ddy, sdy)
                sdz = jnp.where(use, ddz, sdz)
            dx = jnp.where(live, sdx, dx)
            dy = jnp.where(live, sdy, dy)
            dz = jnp.where(live, sdz, dz)
            ox, oy, oz = vx, vy, vz

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _flush_hist():
        hist_out_ref[...] = hist_ref[...]


def _trace_kernel_streamed(scalar_ref, dx_ref, dy_ref, dz_ref, tri_ref,
                           opl_ref, gaabb_ref, *refs, n_tris: int,
                           chunk_tris: int, max_bounces: int, cfg: Config,
                           flat_bands: bool = False,
                           transmission: bool = False,
                           weighted: bool = False, scattering: float = 0.0,
                           material_scattering: bool = False,
                           sg_cull: bool = False,
                           shadow_divfree: bool = False,
                           row_unroll: int = 8, state_io: bool = False,
                           sg_unroll: int | None = None,
                           sg_coarse: int | None = None):
    """HBM-streamed variant of _trace_kernel for scenes whose triangle
    table exceeds VMEM (~100k+ triangles at 24 f32 columns).

    The resident kernel holds the whole (T, 24) table in VMEM; here the
    grid is (ray_tiles, bounces, 2 passes, triangle chunks) and the
    Pallas pipeline streams (chunk_tris, 24) blocks from HBM, double-
    buffered against compute — the loop interchange (chunk outermost,
    ray row innermost) that makes each triangle byte travel once per
    tile-bounce-pass instead of once per ray row. Per-tile ray state
    (origins, directions, per-band amplitudes, path lengths) and the
    running nearest-hit / shadow carries live in VMEM scratch across
    grid steps; pass 0 sweeps chunks for the nearest hit, finalizing
    winner selection at the last chunk, pass 1 sweeps the same chunks
    for the listener-shadow segment test, then bins the bounce's
    contribution (same MXU one-hot scheme) and reflects.

    Supports the production feature set (fused_hist required:
    flat_bands / transmission / directivity weights / stochastic
    scattering / sg_cull / shadow_divfree); the register-resident
    experiments (cull, mxu_xform) and the bounce-0 precomputed source
    origins are not carried over (the generic origin transform costs
    ~12 extra ops on bounce 0 only). Reference behavior being
    reproduced: raytracer.zig:98-149 intersection + main.zig:1034-1108
    bounce walk, identical to _trace_kernel."""
    inf = jnp.float32(np.inf)
    scatter_on = scattering > 0.0 or material_scattering
    if scatter_on:
        from .hashrng import uniform01

        # the hashed seed rides scalars[10:12] as (lo16, hi16) halves —
        # a TRACED operand, so ensemble seed sweeps and per-shard folds
        # reuse one compiled kernel instead of paying a ~4 min Mosaic
        # recompile per seed (the int32 reassembly wraps, reproducing the
        # signed bit pattern hash_u32 produced outside)
        seed_base = scalar_ref[10].astype(jnp.int32) | (
            scalar_ref[11].astype(jnp.int32) << 16
        )
    # all program ids read at kernel top level (interpret-mode
    # interception doesn't reach inside pl.when bodies / fori loops)
    i_id = pl.program_id(0)
    tile_base = i_id * TILE
    b_id = pl.program_id(1)
    p_id = pl.program_id(2)
    c_id = pl.program_id(3)
    n_tiles = pl.num_programs(0)
    n_chunks = pl.num_programs(3)
    sx, sy, sz = scalar_ref[0], scalar_ref[1], scalar_ref[2]
    lx, ly, lz = scalar_ref[3], scalar_ref[4], scalar_ref[5]
    inv_n = scalar_ref[6]
    spm_bps = scalar_ref[7]
    n_bins = scalar_ref[8]
    air = cfg.air_absorption
    eps = 1e-6
    freqs = [float(f) for f in EQ_FREQS]
    if cfg.air_model == "iso9613":
        from ..models.air import amplitude_decay_per_meter
        from ..models.ir import AIR_BAND_HZ

        k_air = amplitude_decay_per_meter(
            AIR_BAND_HZ, cfg.air_temperature_c, cfg.air_humidity_pct,
            cfg.air_pressure_kpa,
        )
        aab_of = lambda d, c: jnp.exp(float(k_air[c]) * d)  # noqa: E731
    else:
        aab_of = lambda d, c: jnp.clip(  # noqa: E731
            1.0 - air * d * freqs[c], 0.0, 1.0
        )
    n_keep = 1 if flat_bands else N_BANDS
    chunk_groups = chunk_tris // TRI_GROUP
    fori_unroll = 1
    for cand in ((sg_unroll,) if sg_unroll else (32, 16, 8)):
        if chunk_groups % cand == 0 and chunk_groups >= cand:
            fori_unroll = cand
            break
    if sg_cull:
        # blocked SMEM window: only the current chunk's supergroup rows
        # (the full table at ~1M tris exceeds the 1 MB SMEM — measured)
        sgaabb_ref, refs = refs[0], refs[1:]
    if weighted:
        w_refs, refs = refs[:n_keep], refs[n_keep:]
    # state_io (wavefront mode): ONE bounce per call — per-ray state read
    # from input refs (o, amp, path, alive, gidx; directions ride the
    # base dx/dy/dz inputs) and the post-bounce state written to output
    # refs after the histogram, so the caller can re-sort rays between
    # bounces. The true bounce index rides scalars[9] (traced) for the
    # rng counter; grid bounce dim = 1.
    st_io_in = None
    if state_io:
        assert not weighted
        b_io = scalar_ref[9].astype(jnp.int32)
        n_st_in = 6 + n_keep  # o(3) + amp(n_keep) + path + alive + gidx
        st_io_in, refs = refs[:n_st_in], refs[n_st_in:]
    hist_out_ref = refs[0]
    if state_io:
        st_io_out = refs[1 : 1 + 8 + n_keep]
        refs = refs[:1] + refs[1 + 8 + n_keep :]
    scratch = list(refs[1:])
    hist_ref = scratch.pop(0)
    n_coarse = hist_ref.shape[0]
    # per-tile ray state, persisted across (bounce, pass, chunk) steps
    st_o = [scratch.pop(0) for _ in range(3)]   # current origins
    st_d = [scratch.pop(0) for _ in range(3)]   # current directions
    st_path = scratch.pop(0)
    st_alive = scratch.pop(0)
    st_amp = [scratch.pop(0) for _ in range(n_keep)]
    st_w = [scratch.pop(0) for _ in range(3)]   # vertex - listener
    st_n = [scratch.pop(0) for _ in range(3)]   # winner normal
    st_scat = scratch.pop(0) if material_scattering else None
    n_sel = 3 + n_keep + (1 if material_scattering else 0)
    pb_best = scratch.pop(0)                    # (64, 128) running best t
    pb_sel = [scratch.pop(0) for _ in range(n_sel)]
    n_shc = n_keep if transmission else 1
    sh_c = [scratch.pop(0) for _ in range(n_shc)]
    assert not scratch, len(scratch)

    def spec_pow(x):
        e = int(cfg.specular_exponent)
        while e > 1:
            x = x * x
            e //= 2
        return x

    def _cols(base, k):
        g8 = pl.multiple_of(
            base * (fori_unroll * TRI_GROUP), TRI_GROUP
        ) + k * TRI_GROUP
        col = lambda j: tri_ref[pl.ds(g8, TRI_GROUP), pl.ds(j, 1)]  # noqa: E731
        ocol = lambda j: opl_ref[pl.ds(g8, TRI_GROUP), pl.ds(j, 1)]  # noqa: E731
        return col, ocol

    def _sg_pred(base, o_lo, o_hi, reach_lo, reach_hi):
        # base indexes the CHUNK-LOCAL supergroup window (blocked SMEM)
        p = None
        for k in range(3):
            ok = (sgaabb_ref[base, 3 + k] >= o_lo[k] + reach_lo[k]) & (
                sgaabb_ref[base, k] <= o_hi[k] + reach_hi[k]
            )
            p = ok if p is None else (p & ok)
        return p

    @pl.when((b_id == 0) & (p_id == 0) & (c_id == 0))
    def _init_tile():
        @pl.when(i_id == 0)
        def _zero_hist():
            hist_ref[...] = jnp.zeros_like(hist_ref)

        # zeros_like(ref) never reads the (uninitialized) scratch values
        if state_io:
            for k in range(3):
                st_o[k][...] = st_io_in[k][...]
            st_path[...] = st_io_in[3 + n_keep][...]
            st_alive[...] = st_io_in[4 + n_keep][...]
            for c in range(n_keep):
                st_amp[c][...] = st_io_in[3 + c][...]
        else:
            st_o[0][...] = jnp.zeros_like(st_o[0]) + sx
            st_o[1][...] = jnp.zeros_like(st_o[1]) + sy
            st_o[2][...] = jnp.zeros_like(st_o[2]) + sz
            st_path[...] = jnp.zeros_like(st_path)
            st_alive[...] = jnp.ones_like(st_alive)
            for c in range(n_keep):
                st_amp[c][...] = (
                    w_refs[c][...] if weighted else jnp.ones_like(st_amp[c])
                )
        st_d[0][...] = dx_ref[...]
        st_d[1][...] = dy_ref[...]
        st_d[2][...] = dz_ref[...]

    @pl.when((p_id == 0) & (c_id == 0))
    def _init_path_carry():
        pb_best[...] = jnp.full_like(pb_best, inf)
        for c in range(3):
            pb_sel[c][...] = jnp.zeros_like(pb_sel[c])
        for c in range(n_keep):
            pb_sel[3 + c][...] = jnp.ones_like(pb_sel[3 + c])
        if material_scattering:
            pb_sel[3 + n_keep][...] = jnp.zeros_like(pb_sel[3 + n_keep])

    @pl.when((p_id == 1) & (c_id == 0))
    def _init_shadow_carry():
        for c in range(n_shc):
            sh_c[c][...] = jnp.zeros_like(sh_c[c])

    def path_row(r):
        rr = pl.multiple_of(r * TRI_GROUP, TRI_GROUP)
        ox = st_o[0][pl.ds(r, 1), :]
        oy = st_o[1][pl.ds(r, 1), :]
        oz = st_o[2][pl.ds(r, 1), :]
        dx = st_d[0][pl.ds(r, 1), :]
        dy = st_d[1][pl.ds(r, 1), :]
        dz = st_d[2][pl.ds(r, 1), :]
        if sg_cull:
            o_lo = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
            o_hi = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
            d_lo = (jnp.min(dx), jnp.min(dy), jnp.min(dz))
            d_hi = (jnp.max(dx), jnp.max(dy), jnp.max(dz))
            r_lo = tuple(jnp.where(d_lo[k] < 0, -inf, 0.0) for k in range(3))
            r_hi = tuple(jnp.where(d_hi[k] > 0, inf, 0.0) for k in range(3))

        def group_body(col, ocol, carry):
            best_t, sel = carry[0], list(carry[1:])
            a00, a01, a02 = col(0), col(1), col(2)
            a10, a11, a12 = col(3), col(4), col(5)
            a20, a21, a22 = col(6), col(7), col(8)
            opx = a00 * ox + a01 * oy + a02 * oz + col(_B)
            opy = a10 * ox + a11 * oy + a12 * oz + col(_B + 1)
            opz = a20 * ox + a21 * oy + a22 * oz + col(_B + 2)
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
                & (t >= eps)
            )
            tc = jnp.where(ok, t, inf)
            improved = tc < best_t
            best_t = jnp.where(improved, tc, best_t)
            for c in range(3):
                sel[c] = jnp.where(improved, col(_N + c), sel[c])
            for c in range(n_keep):
                sel[3 + c] = jnp.where(improved, col(_K + c), sel[3 + c])
            if material_scattering:
                sel[3 + n_keep] = jnp.where(improved, col(_SCAT),
                                            sel[3 + n_keep])
            return (best_t, *sel)

        def fori_body(base, carry):
            def run(carry):
                for k in range(fori_unroll):
                    col, ocol = _cols(base, k)
                    carry = group_body(col, ocol, carry)
                return carry

            if not sg_cull:
                return run(carry)
            return jax.lax.cond(
                _sg_pred(base, o_lo, o_hi, r_lo, r_hi), run, lambda c: c,
                carry,
            )

        carry = (
            pb_best[pl.ds(rr, TRI_GROUP), :],
            *[s[pl.ds(rr, TRI_GROUP), :] for s in pb_sel],
        )
        spc = chunk_groups // fori_unroll
        carry = _sg_fori(
            spc, sg_coarse if sg_cull else None, fori_body,
            lambda cb: _sg_pred(spc + cb, o_lo, o_hi, r_lo, r_hi),
            carry,
        )
        pb_best[pl.ds(rr, TRI_GROUP), :] = carry[0]
        for c in range(n_sel):
            pb_sel[c][pl.ds(rr, TRI_GROUP), :] = carry[1 + c]

    def path_finalize_row(r):
        """Winner selection at the last chunk: fold the bounce's hit into
        the persistent ray state (same math as _trace_kernel row_body)."""
        rr = pl.multiple_of(r * TRI_GROUP, TRI_GROUP)
        best_t8 = pb_best[pl.ds(rr, TRI_GROUP), :]
        sel = [s[pl.ds(rr, TRI_GROUP), :] for s in pb_sel]
        ox = st_o[0][pl.ds(r, 1), :]
        oy = st_o[1][pl.ds(r, 1), :]
        oz = st_o[2][pl.ds(r, 1), :]
        dx = st_d[0][pl.ds(r, 1), :]
        dy = st_d[1][pl.ds(r, 1), :]
        dz = st_d[2][pl.ds(r, 1), :]
        alive = st_alive[pl.ds(r, 1), :]
        path = st_path[pl.ds(r, 1), :]
        min_t = jnp.min(best_t8, axis=0, keepdims=True)
        taken = 0.0 * min_t
        acc = [0.0 * min_t for _ in range(n_sel)]
        for s in range(TRI_GROUP):
            row_min = (
                jax.lax.slice(best_t8, (s, 0), (s + 1, LANES)) == min_t
            ).astype(jnp.float32)
            use = row_min * (1.0 - taken)
            for c in range(n_sel):
                acc[c] = acc[c] + use * jax.lax.slice(
                    sel[c], (s, 0), (s + 1, LANES)
                )
            taken = jnp.maximum(taken, row_min)
        nx, ny, nz = acc[0], acc[1], acc[2]
        keep = acc[3:3 + n_keep]

        hitf = (min_t < inf).astype(jnp.float32)
        alive = alive * hitf
        t_safe = jnp.where(min_t < inf, min_t, 0.0) * alive
        tb = t_safe * cfg.backoff
        vx = ox + dx * tb
        vy = oy + dy * tb
        vz = oz + dz * tb
        ndd = nx * dx + ny * dy + nz * dz
        s = jnp.sign(1e-30 - ndd)
        nx, ny, nz = nx * s, ny * s, nz * s
        st_path[pl.ds(r, 1), :] = path + t_safe * alive
        st_alive[pl.ds(r, 1), :] = alive
        for c in range(n_keep):
            kc = jnp.where(min_t < inf, keep[c], 1.0)
            amp = st_amp[c][pl.ds(r, 1), :]
            st_amp[c][pl.ds(r, 1), :] = amp * jnp.where(alive > 0, kc, 1.0)
        st_w[0][pl.ds(r, 1), :] = vx - lx
        st_w[1][pl.ds(r, 1), :] = vy - ly
        st_w[2][pl.ds(r, 1), :] = vz - lz
        st_n[0][pl.ds(r, 1), :] = nx
        st_n[1][pl.ds(r, 1), :] = ny
        st_n[2][pl.ds(r, 1), :] = nz
        if material_scattering:
            st_scat[pl.ds(r, 1), :] = acc[3 + n_keep]

    def shadow_row(r):
        rr = pl.multiple_of(r * TRI_GROUP, TRI_GROUP)
        wx = st_w[0][pl.ds(r, 1), :]
        wy = st_w[1][pl.ds(r, 1), :]
        wz = st_w[2][pl.ds(r, 1), :]
        if sg_cull:
            l_pt = (lx, ly, lz)
            wb = ((jnp.min(wx), jnp.max(wx)), (jnp.min(wy), jnp.max(wy)),
                  (jnp.min(wz), jnp.max(wz)))
            r_lo = tuple(jnp.minimum(wb[k][0], 0.0) for k in range(3))
            r_hi = tuple(jnp.maximum(wb[k][1], 0.0) for k in range(3))

        def group_body(col, ocol, carry):
            a00, a01, a02 = col(0), col(1), col(2)
            a10, a11, a12 = col(3), col(4), col(5)
            a20, a21, a22 = col(6), col(7), col(8)
            dpx = a00 * wx + a01 * wy + a02 * wz
            dpy = a10 * wx + a11 * wy + a12 * wz
            dpz = a20 * wx + a21 * wy + a22 * wz
            opx = ocol(0) + 0.0 * wx
            opy = ocol(1) + 0.0 * wx
            opz = ocol(2) + 0.0 * wx
            if shadow_divfree:
                # see _trace_kernel's shadow_pass for the derivation
                d2 = dpz * dpz
                ad = -(opz * dpz)
                uu = opx * d2 + ad * dpx
                vv = opy * d2 + ad * dpy
                ok = (
                    (d2 > 1e-24)
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= d2)
                    & (ad >= eps * d2)
                    & (ad <= d2)
                )
            else:
                t = -opz / dpz
                u = opx + t * dpx
                v = opy + t * dpy
                ok = (
                    (jnp.abs(dpz) > 1e-12)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t >= eps)
                    & (t <= 1.0)
                )
            okf = ok.astype(jnp.float32)
            if transmission:
                return tuple(
                    carry[c] + okf * col(_TAU + c) for c in range(n_keep)
                )
            return (jnp.maximum(carry[0], okf),)

        def fori_body(base, carry):
            def run(carry):
                for k in range(fori_unroll):
                    col, ocol = _cols(base, k)
                    carry = group_body(col, ocol, carry)
                return carry

            if not sg_cull:
                return run(carry)
            return jax.lax.cond(
                _sg_pred(base, l_pt, l_pt, r_lo, r_hi), run, lambda c: c,
                carry,
            )

        carry = tuple(s[pl.ds(rr, TRI_GROUP), :] for s in sh_c)
        spc = chunk_groups // fori_unroll
        carry = _sg_fori(
            spc, sg_coarse if sg_cull else None, fori_body,
            lambda cb: _sg_pred(spc + cb, l_pt, l_pt, r_lo, r_hi),
            carry,
        )
        for c in range(n_shc):
            sh_c[c][pl.ds(rr, TRI_GROUP), :] = carry[c]

    def emit_reflect_row(r):
        """Last shadow chunk: reduce the shadow carry, bin the bounce's
        contribution (MXU one-hot scheme, identical to _trace_kernel) and
        reflect the ray state for the next bounce."""
        rr = pl.multiple_of(r * TRI_GROUP, TRI_GROUP)
        wx = st_w[0][pl.ds(r, 1), :]
        wy = st_w[1][pl.ds(r, 1), :]
        wz = st_w[2][pl.ds(r, 1), :]
        nx = st_n[0][pl.ds(r, 1), :]
        ny = st_n[1][pl.ds(r, 1), :]
        nz = st_n[2][pl.ds(r, 1), :]
        dx = st_d[0][pl.ds(r, 1), :]
        dy = st_d[1][pl.ds(r, 1), :]
        dz = st_d[2][pl.ds(r, 1), :]
        alive = st_alive[pl.ds(r, 1), :]
        path = st_path[pl.ds(r, 1), :]
        amp = [st_amp[c][pl.ds(r, 1), :] for c in range(n_keep)]
        if transmission:
            sh = [
                jnp.sum(sh_c[c][pl.ds(rr, TRI_GROUP), :], axis=0,
                        keepdims=True)
                for c in range(n_keep)
            ]
            t_amp = [jnp.exp(t) for t in sh]
            visible = alive > 0
        else:
            sh = jnp.max(sh_c[0][pl.ds(rr, TRI_GROUP), :], axis=0,
                         keepdims=True)
            visible = (alive > 0) & (sh < 0.5)

        dl = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        inv_dl = 1.0 / jnp.maximum(dl, 1e-20)
        wox, woy, woz = -wx * inv_dl, -wy * inv_dl, -wz * inv_dl
        hx, hy, hz = wox - dx, woy - dy, woz - dz
        ih = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-20))
        ndw = nx * wox + ny * woy + nz * woz
        ndh = (nx * hx + ny * hy + nz * hz) * ih
        lam = jnp.abs(ndw) + spec_pow(jnp.maximum(ndh, 0.0))
        d_total = path + dl
        scale = lam / (d_total + 1.0)
        visf = visible.astype(jnp.float32)
        if flat_bands:
            a0 = amp[0] * scale
            if transmission:
                a0 = a0 * t_amp[0]
            e_base = a0 * a0 * inv_n * visf
            es = [e_base]
            e_dir = e_base
        else:
            es = []
            for c in range(N_BANDS):
                aab = aab_of(d_total, c)
                ac = amp[c] * scale * aab
                if transmission:
                    ac = ac * t_amp[c]
                es.append(ac * ac * inv_n * visf)
            e_dir = (es[0] + es[1] + es[2] + es[3]) * (1.0 / N_BANDS)
        bins = jnp.clip(d_total * spm_bps + 0.5, 0.0, n_bins - 1.0)
        bins = jnp.where(visible, bins, n_bins).astype(jnp.int32)
        chans = es + [
            wx * inv_dl * e_dir,
            wy * inv_dl * e_dir,
            wz * inv_dl * e_dir,
        ]
        chans = [jnp.where(visible, c, 0.0) for c in chans]
        pc = len(chans)
        coarse = bins // LANES
        fine = bins - coarse * LANES
        f_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0) == fine
        ).astype(jnp.bfloat16)
        b_all = jnp.concatenate(
            [f_oh * chans[c].astype(jnp.bfloat16) for c in range(pc)],
            axis=0,
        )
        a_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (n_coarse, LANES), 0)
            == coarse
        ).astype(jnp.bfloat16)
        h = jax.lax.dot_general(
            a_oh, b_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hist_ref[...] += h

        # reflect for the next bounce (b_id is dynamic: predicated;
        # state_io calls carry one bounce each and always reflect)
        @pl.when(jnp.bool_(True) if state_io else (b_id < max_bounces - 1))
        def _reflect():
            two_ndd = 2.0 * (nx * dx + ny * dy + nz * dz)
            live = alive > 0
            sdx = dx - two_ndd * nx
            sdy = dy - two_ndd * ny
            sdz = dz - two_ndd * nz
            if scatter_on:
                if state_io:
                    gidx = st_io_in[5 + n_keep][pl.ds(r, 1), :]
                    b_rng = b_io
                else:
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (1, LANES), 1
                    )
                    gidx = tile_base + r * LANES + lane
                    b_rng = b_id
                cnt = seed_base + (gidx * max_bounces + b_rng) * 3
                u_sel = uniform01(cnt)
                u1 = uniform01(cnt + 1)
                u2 = uniform01(cnt + 2)
                r_s = jnp.sqrt(u1)
                phi = 2.0 * jnp.float32(np.pi) * u2
                z_s = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
                hxv = (jnp.abs(nz) >= 0.9).astype(jnp.float32)
                hzv = 1.0 - hxv
                txx = -hzv * ny
                txy = hzv * nx - hxv * nz
                txz = hxv * ny
                tl = jnp.sqrt(txx * txx + txy * txy + txz * txz)
                ti = 1.0 / jnp.maximum(tl, 1e-20)
                txx, txy, txz = txx * ti, txy * ti, txz * ti
                tyx = ny * txz - nz * txy
                tyy = nz * txx - nx * txz
                tyz = nx * txy - ny * txx
                rc = r_s * jnp.cos(phi)
                rs = r_s * jnp.sin(phi)
                ddx = txx * rc + tyx * rs + nx * z_s
                ddy = txy * rc + tyy * rs + ny * z_s
                ddz = txz * rc + tyz * rs + nz * z_s
                prob = (
                    st_scat[pl.ds(r, 1), :] if material_scattering
                    else scattering
                )
                use = u_sel < prob
                sdx = jnp.where(use, ddx, sdx)
                sdy = jnp.where(use, ddy, sdy)
                sdz = jnp.where(use, ddz, sdz)
            st_d[0][pl.ds(r, 1), :] = jnp.where(live, sdx, dx)
            st_d[1][pl.ds(r, 1), :] = jnp.where(live, sdy, dy)
            st_d[2][pl.ds(r, 1), :] = jnp.where(live, sdz, dz)
            st_o[0][pl.ds(r, 1), :] = wx + lx
            st_o[1][pl.ds(r, 1), :] = wy + ly
            st_o[2][pl.ds(r, 1), :] = wz + lz

        if state_io:
            rp = pl.ds(r, 1)
            for k in range(3):
                st_io_out[k][rp, :] = st_o[k][rp, :]
                st_io_out[3 + k][rp, :] = st_d[k][rp, :]
            for c in range(n_keep):
                st_io_out[6 + c][rp, :] = st_amp[c][rp, :]
            st_io_out[6 + n_keep][rp, :] = st_path[rp, :]
            st_io_out[7 + n_keep][rp, :] = st_alive[rp, :]

    def rows(fn):
        """Run a per-row stage for all SUBLANES rows (rolled in interpret
        mode via row_unroll=1, unrolled on hardware like _trace_kernel)."""
        if row_unroll in (1, SUBLANES):
            jax.lax.fori_loop(
                0, SUBLANES, lambda r, c: (fn(r), 0)[1], 0,
                unroll=row_unroll,
            )
        else:
            assert SUBLANES % row_unroll == 0, row_unroll

            def body(i, c):
                for k in range(row_unroll):
                    fn(i * row_unroll + k)
                return c

            jax.lax.fori_loop(0, SUBLANES // row_unroll, body, 0)

    @pl.when(p_id == 0)
    def _path_step():
        rows(path_row)

        @pl.when(c_id == n_chunks - 1)
        def _finalize():
            rows(path_finalize_row)

    @pl.when(p_id == 1)
    def _shadow_step():
        rows(shadow_row)

        @pl.when(c_id == n_chunks - 1)
        def _emit():
            rows(emit_reflect_row)

    @pl.when(
        (i_id == n_tiles - 1)
        # the grid's bounce extent: max_bounces, or 1 per state_io call
        & (b_id == pl.num_programs(1) - 1)
        & (p_id == 1)
        & (c_id == n_chunks - 1)
    )
    def _flush_hist():
        hist_out_ref[...] = hist_ref[...]


def trace_contributions_pallas(
    scene_arrays, source, listener, dirs, cfg: Config = DEFAULT_CONFIG,
    max_bounces: int | None = None, total_rays: int | None = None,
    interpret: bool = False, fused_hist: bool = False, cull: bool = False,
    flat_bands: bool = False, mxu_xform: bool = False,
    group_fori: bool | None = None, src_weights=None,
    scattering: float = 0.0, material_scattering: bool = False,
    rng_seed: int = 0, sg_cull: bool | None = None,
    row_unroll: int | None = None, shadow_divfree: bool = False,
    stream_tris: int | None = None, ablate: str = "",
    ray_major: bool | None = None, tri_unroll: int = 8,
    ray_blocks: int = 1, winner_acc: int = 1,
    wavefront: bool | None = None, sg_unroll: int | None = None,
    sg_coarse: int | None = None, n_true: int | None = None,
    inc_origin: bool = False, shadow_carry: bool = False,
    tid_fold: bool = False, mask_sweep: bool | None = None,
    hist_batch: int = 1, listeners=None,
):
    """Run the fused kernel.

    listeners: optional (C, 3) — multi-listener NEE in ONE kernel: the
    path pass runs once and the shadow/emission/binning stages loop over
    the C listeners in-kernel (SMEM positions, per-listener precomputed
    shadow origins, per-listener histogram slices). `listener` is then
    ignored. Returns (C, n_bins, pc). Resident unrolled fused_hist
    kernel only. VMEM grows by C histogram accumulators (C * n_coarse *
    pc * 512 B) — chunk large listener batches with
    trace_irs_pallas_multi_listener_nee.

    hist_batch (resident fused_hist kernel): concatenate the one-hot
    operands of N bounces along the ray (contraction) axis and update
    the (n_coarse, pc*128) f32 accumulator once per N bounces — same
    MACs, 1/N the accumulator read-modify-write traffic. f32-associative
    reorder only (tolerance-level differences).

    tid_fold (resident unrolled fused_hist kernel only): the path-pass
    winner fold carries (best_t, group id) instead of (best_t, normal,
    keep, ...) — n_sel fewer selects per group body — and winner
    attributes are fetched post-sweep by one exact one-hot MXU matmul.
    Identical results (same first-strictly-less winner; the one-hot side
    of the HIGHEST dot is exactly 0/1).

    inc_origin (resident unrolled fused_hist kernel only): carry
    per-triangle transformed origins across bounces in VMEM scratch —
    op_b = op_{b-1} + tb * dp_{b-1} by linearity of the Woop map —
    trading the 12-slot per-group origin transform for one FMA plus the
    (op, dp) load/store traffic. Same histogram up to fp association
    (the incremental sum rounds differently than the fresh transform).

    shadow_carry (requires inc_origin): the listener shadow pass builds
    its per-triangle transformed direction from the path pass's stored
    (op, dp) carries — M(v - l) = (iop - opl) + tb * idp — instead of
    the 9-FMA/9-load transform of w per group (final bounce keeps the
    classic transform: its carries are not stored). Same fp-association
    caveat as inc_origin.

    n_true: the scene's TRUE (unpadded) triangle count, when known
    statically (Scene.n_triangles). SceneArrays pads T to
    cfg.triangle_pad (=128, the MXU intersector's lane alignment) but
    this kernel only needs T % 8: trailing all-padding groups are
    dropped down to round_up(n_true, 8) — exact (padding triangles are
    degenerate, sort last in build_tri_tables, and can never hit or
    block), and worth the full pad fraction of BOTH intersection passes
    (world.obj: 128 -> 120 tested triangles, -6.3%). Resident-unrolled
    region only (<= 32 groups): larger scenes would disturb group_fori's
    unroll/coarse divisibility for a < 1% win.

    winner_acc (tri-major unrolled path only): number of independent
    winner-accumulator chains in the path pass — contiguous group chunks,
    merged at the end — breaking the n_groups-deep loop-carried
    compare/select dependency for more ILP. 1 = the serial fold.
    MEASURED NEUTRAL on the v5e (benchmarks/winner_acc_ab.json: 59.7 /
    60.2 / 59.1 ms at C=1/2/4, 1M rays x 8 bounces) — the winner chain's
    latency already hides under the group's independent intersection
    math; the in-situ path-pass gap is broadcasts + live bounce state,
    not the fold. Kept at 1; bit-identical in interpret mode either way.

    ray_major: the (8, 128) vreg holds 1024 rays and triangle constants
    are SMEM scalars (see _trace_kernel_raymajor). MEASURED DEAD END on
    the v5e (benchmarks/RESULTS.md: 63.3 ms best vs tri-major's 61.8 —
    scalar-unit-bound at ray_blocks=1, never recovers past it); the
    tri-major kernel stays the default (None -> False). Kept for A/Bs.

    ablate (MEASUREMENT ONLY, resident fused_hist kernel): "+"-joined
    component skips for on-hardware cost attribution — see _trace_kernel.
    Results are numerically wrong; never set outside
    benchmarks/ablate_kernel.py.

    src_weights: optional (R, n_keep) per-ray initial amplitudes (source
    directivity, models/directivity.py) — n_keep = 1 in flat_bands mode
    (band-uniform pattern required), else N_BANDS.

    scattering / material_scattering / rng_seed: the stochastic diffuse
    family IN-KERNEL — cosine-weighted hemisphere bounces chosen by
    counter-hash uniforms (ops/hashrng.py) that are bit-identical to
    trace_ir(scattering_rng="hash", rng_seed=...); material mode reads
    each surface's probability from the tri table's scattering column.
    Counters are LOCAL ray indices; rng_seed is a TRACED operand (the
    hashed seed rides the kernel's scalar vector), so ensemble seed
    sweeps and per-shard folds (rng_seed * n_shards + axis_index, see
    parallel/sharding.py) reuse one compiled kernel. For multi-shard
    tracing give each shard its own folded seed so streams are
    independent.

    group_fori: loop triangle groups with lax.fori_loop (dynamic VMEM
    loads) instead of full unrolling — required for large scenes where
    unrolling explodes compile time. Default: automatic (None -> True when
    the scene has more than 32 groups of 8 triangles).

    sg_cull (group_fori only; default = group_fori): skip each fori
    iteration's fori_unroll-group block when the ray row's conservative
    reach interval misses the block's union AABB — scalar SMEM compares +
    lax.cond, bit-identical results (the test never skips a hittable
    group). Sub-linear triangle work WITHOUT per-bounce re-sorting
    (VERDICT r1 item 3): measured pass rates on a 49k-tri subdivided room
    (8k sorted rays, 128-ray rows, 256-tri blocks) — path 42/66/88/92%,
    shadow 8/14/27/33% at bounces 0-3, i.e. the listener-shadow pass
    skips 3-12x of its group sweeps.

    sg_coarse (sg_cull only): COARSE second culling level — one scalar
    test per block of sg_coarse supergroup windows skips the block's
    per-window tests + lax.cond machinery wholesale (the all-skip floor
    measured 41.7/230 ms at 49k resident, 92.3/749 ms at 196k streamed:
    per-window cond iterations are not free). Bit-identical results.
    None -> auto (8 or 4 when they tile the window count, else off);
    0 -> off. Measured (contended host, deltas device-real): 49k
    wavefront 376.7 -> 361.6 ms, 196k streamed wavefront 496.8 -> 467.5,
    49k static 230.3 -> 225.4.

    fused_hist=False: returns (bins (B*R,), payload (B*R, 7)) for an
    external scatter (exact f32).
    fused_hist=True: the histogram is accumulated inside the kernel
    (MXU one-hot binning, bf16 inputs / f32 accumulate) and the return is
    the (n_bins, 7) histogram directly — no contribution stream touches
    HBM. Requires cfg.ir_n_bins % 128 == 0.
    flat_bands=True (fused_hist only): the scene's absorption must be
    band-uniform; the kernel carries a single amplitude and the return is
    (n_bins, 4) = [flat energy | direction], with per-band air absorption
    applied by the caller from the bin index.

    Scenes with a transmission table (models/materials.py) switch the
    shadow pass from hard any-hit blocking to per-band crossing
    log-amplitude accumulation (exp'd into the contribution) — the same
    law as models/ir.trace_ir. flat_bands then additionally requires
    band-uniform transmission (only the first tau band is carried).

    src_directivity (static) + src_axis (dynamic axis override): per-ray
    initial amplitudes enter the kernel as extra (rows, 128) inputs —
    directivity on the fast path. flat_bands requires a band-uniform
    pattern (equal alpha/order across bands; checked statically).

    scattering (static float) / material_scattering / rng_seed: the
    stochastic diffuse family in-kernel, sampling-identical to
    trace_ir(scattering_rng="hash") — see trace_contributions_pallas.
    """
    if flat_bands and not fused_hist:
        raise ValueError("flat_bands requires fused_hist=True")
    if ablate and not fused_hist:
        raise ValueError("ablate requires the fused_hist kernel")
    transmission = scene_arrays.transmission is not None
    if transmission and (cull or mxu_xform):
        raise ValueError(
            "surface transmission is incompatible with the cull/mxu_xform "
            "experiments"
        )
    if transmission and flat_bands:
        # flat mode carries only band 0's log-tau; a band-varying table
        # would be silently wrong. Values are only inspectable when the
        # call is NOT inside a jit trace (e.g. direct tests) — inside one
        # this stays a documented requirement.
        import jax.core as _jc

        t = scene_arrays.transmission
        if not isinstance(t, _jc.Tracer):
            tv = np.asarray(t)
            if not np.allclose(tv, tv[:, :1], atol=1e-7):
                raise ValueError(
                    "flat_bands carries one amplitude: the transmission "
                    "table must be band-uniform; use flat_bands=False for "
                    "band-dependent tau (e.g. the glass preset)"
                )
    max_bounces = max_bounces or cfg.max_bounces
    e = cfg.specular_exponent
    if not (float(e).is_integer() and int(e) > 0 and (int(e) & (int(e) - 1)) == 0):
        raise NotImplementedError(
            "the Pallas kernel computes the specular term by repeated "
            f"squaring and supports power-of-two exponents only (got {e}); "
            "use models.ir.trace_ir for other exponents"
        )
    R = dirs.shape[0]
    assert R % TILE == 0, R
    rows = R // LANES
    tri, gaabb = build_tri_tables(scene_arrays)
    T = tri.shape[0]
    assert T % TRI_GROUP == 0, T
    if n_true is not None:
        t_trim = -(-int(n_true) // TRI_GROUP) * TRI_GROUP
        if t_trim < T and t_trim // TRI_GROUP <= 32:
            tri = tri[:t_trim]
            gaabb = gaabb[: t_trim // TRI_GROUP]
            T = t_trim
    if (stream_tris is None and fused_hist and not (cull or mxu_xform)
            and T > 98304):
        # auto-engage HBM streaming past the resident kernel's VMEM
        # ceiling (196608 tris measured OOM at 16 MB scoped VMEM; 49152
        # fits). Chunk sizes are the measured-fitting ones: 8192 to 256k
        # tris, 4096 beyond (786k driven at 2.69 s / 7.7e10 tests/s).
        stream_tris = 8192 if T <= (1 << 18) else 4096
    # constant-origin transformed origins per triangle: A @ p + b for the
    # listener (shadow pass, cols 0:3) and the source (bounce 0, cols
    # 3:6); multi-listener NEE appends listener c >= 1 at cols 6 + 3(c-1)
    a_mat = tri[:, _A : _A + 9].reshape(T, 3, 3)
    n_listeners = 1
    if listeners is not None:
        listeners = jnp.asarray(listeners, jnp.float32).reshape(-1, 3)
        n_listeners = int(listeners.shape[0])
        listener = listeners[0]
    if n_listeners > 1:
        pts = jnp.concatenate(
            [listeners[:1], jnp.asarray(source, jnp.float32)[None],
             listeners[1:]], axis=0,
        )  # (C + 1, 3)
    else:
        pts = jnp.stack(
            [jnp.asarray(listener, jnp.float32),
             jnp.asarray(source, jnp.float32)]
        )  # (2, 3)
    op2 = jnp.einsum(
        "tij,pj->tpi", a_mat, pts, precision=jax.lax.Precision.HIGHEST,
    ) + tri[:, None, _B : _B + 3]  # (T, P, 3)
    opl_w = -(-(3 * pts.shape[0]) // 8) * 8
    opl = jnp.pad(
        op2.reshape(T, 3 * pts.shape[0]),
        ((0, 0), (0, opl_w - 3 * pts.shape[0])),
    )  # (T, opl_w)

    src = jnp.asarray(source, jnp.float32)
    lst = jnp.asarray(listener, jnp.float32)
    scalars = jnp.concatenate(
        [
            src, lst,
            jnp.asarray(
                [
                    1.0 / float(total_rays or R),
                    cfg.samples_per_meter * cfg.ir_bins_per_sample,
                    float(cfg.ir_n_bins),
                ],
                jnp.float32,
            ),
            jnp.zeros(7, jnp.float32),
        ]
    )  # (16,)
    if scattering > 0.0 or material_scattering:
        # hashed seed -> scalars[10:12] as (lo16, hi16): a traced operand
        # (ensemble seed sweeps / per-shard folds share ONE compiled
        # kernel; rng_seed may be a tracer — e.g. sharding.py's
        # rng_seed * n_shards + axis_index fold)
        from .hashrng import hash_u32

        sb = hash_u32(jnp.asarray(rng_seed, jnp.int32))
        scalars = scalars.at[10].set((sb & 0xFFFF).astype(jnp.float32))
        scalars = scalars.at[11].set(
            (jnp.right_shift(sb, 16) & 0xFFFF).astype(jnp.float32)
        )

    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dxyz = [d[:, k].reshape(rows, LANES) for k in range(3)]

    rm_possible = (
        fused_hist and not cull and not mxu_xform and not transmission
        and src_weights is None and stream_tris is None and not ablate
        and not shadow_divfree and group_fori is not True
        and sg_cull is not True and T <= 2048
    )
    if ray_major is None:
        # opt-in for now: the tri-major kernel stays the default so
        # bit-identity A/Bs (shadow_divfree, sg_cull) keep their baseline;
        # bench/AOT and the parity tests opt in explicitly
        ray_major = False
    elif ray_major and not rm_possible:
        raise ValueError(
            "ray_major requires the plain fused_hist kernel (no cull/"
            "mxu_xform/transmission/directivity/group_fori/sg_cull/"
            "stream_tris/shadow_divfree/ablate) and T <= 2048 SMEM-resident "
            f"triangles (got T={T})"
        )
    if ray_major:
        pc = PAYLOAD_C_FLAT if flat_bands else PAYLOAD_C
        n_bins = cfg.ir_n_bins
        assert n_bins % LANES == 0, n_bins
        n_coarse = n_bins // LANES
        tu = max(1, tri_unroll)
        while T % tu:
            tu //= 2
        rs = ray_blocks * SUBLANES
        assert rows % rs == 0, (rows, ray_blocks)
        kernel_rm = partial(
            _trace_kernel_raymajor, n_tris=T, max_bounces=max_bounces,
            cfg=cfg, flat_bands=flat_bands, tri_unroll=tu,
            ray_blocks=ray_blocks, scattering=scattering,
            material_scattering=material_scattering,
        )
        hist = pl.pallas_call(
            kernel_rm,
            grid=(rows // rs,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rs, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rs, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rs, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # tri table scalars
                pl.BlockSpec(memory_space=pltpu.SMEM),  # opl scalars
            ],
            out_specs=pl.BlockSpec(
                (n_coarse, pc * LANES), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n_coarse, pc * LANES),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_coarse, pc * LANES), jnp.float32)],
            interpret=interpret,
        )(scalars, dxyz[0], dxyz[1], dxyz[2], tri, opl)
        return hist.reshape(n_coarse, pc, LANES).transpose(0, 2, 1).reshape(
            n_bins, pc
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, TRI_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, opl_w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T // TRI_GROUP, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if group_fori is None:
        # auto mode never collides with the unrolled-only experiments
        group_fori = T // TRI_GROUP > 32 and not (cull or mxu_xform)
    elif group_fori and (cull or mxu_xform):
        raise ValueError(
            "group_fori is incompatible with cull/mxu_xform (unrolled-only "
            "experiments); pass group_fori=False for them"
        )
    if sg_cull is None:
        sg_cull = group_fori
    if sg_cull and not group_fori:
        raise ValueError("sg_cull requires group_fori")
    if winner_acc != 1:
        if winner_acc < 1:
            raise ValueError(f"winner_acc must be >= 1, got {winner_acc}")
        if group_fori:
            raise ValueError(
                "winner_acc applies to the fully unrolled tri-major path "
                "pass only (group_fori carries one fori accumulator)"
            )
    if wavefront is None:
        # auto: measured crossover. Originally ~12k padded tris; the
        # coarse culling level moved it down (re-sorted coherent fans
        # skip whole coarse blocks): wavefront wins from 4800 tris
        # (58.4 vs 59.7 ms; 65.8 vs 70.2 at 6912; 76.6 vs 84.7 at 9408;
        # 71.9 vs 91.0 at 12288 — all 2^15 x 4 flat_bands) and loses
        # only a hair at 3072 (48.9 vs 47.9: four sorts unrepaid).
        # Explicit True on a small scene still raises (A/Bs want the
        # error, not a silent fallback).
        wavefront = (
            fused_hist and group_fori and bool(sg_cull)
            and not (cull or mxu_xform or ablate or shadow_divfree
                     or ray_major)
            and T >= 4800
        )
    if (wavefront and sg_unroll is None and stream_tris is None
            and (T // TRI_GROUP) % 16 == 0):
        # Finer supergroup windows pay on the resident wavefront path:
        # re-sorted rays keep coherent fans, so 128-tri windows (unroll
        # 16) cull tighter than 256-tri ones. Measured at 49k tris,
        # 2^15 rays, 8 bounces: 152.7 ms (16) vs 158.2 (auto=32) vs
        # 172.6 (8). Streamed (196k+) keeps auto=32 (measured: 16 loses
        # 506 vs 495 ms at 196k x 2^15 x 4); static paths keep the
        # measured-best 32.
        sg_unroll = 16
    sg_args = ()
    if sg_cull:
        n_groups = T // TRI_GROUP
        fori_unroll = 1
        # MUST match _trace_kernel's choice
        for cand in ((sg_unroll,) if sg_unroll else (32, 16, 8)):
            if n_groups % cand == 0 and n_groups >= cand:
                fori_unroll = cand
                break
        g3 = gaabb.reshape(n_groups // fori_unroll, fori_unroll, 8)
        sgaabb = jnp.concatenate(
            [
                g3[:, :, :3].min(axis=1),
                g3[:, :, 3:6].max(axis=1),
                jnp.zeros((g3.shape[0], 2), jnp.float32),
            ],
            axis=1,
        )  # (n_super, 8) union AABBs, SMEM-resident scalar table
        if stream_tris is None:
            # coarse second level: measured 15 ms at 49k wavefront /
            # 5 ms at 49k static of pure per-window cond machinery
            # collapsed (the all-skip floor is 41.7 of 230 ms there)
            n_sg = n_groups // fori_unroll
            sg_coarse = _resolve_sg_coarse(sg_coarse, n_sg)
            if sg_coarse:
                if n_sg % sg_coarse or n_sg < 2 * sg_coarse:
                    raise ValueError(
                        f"sg_coarse={sg_coarse} must divide the supergroup "
                        f"count {n_sg} with at least 2 blocks"
                    )
                sgaabb = _append_coarse(sgaabb, sg_coarse)
        sg_args = (sgaabb,)
        # the kernel parses the sg ref FIRST among the extra refs: its
        # spec goes right after the 7 base inputs, before any w specs
        in_specs.insert(7, pl.BlockSpec(memory_space=pltpu.SMEM))
    weighted = src_weights is not None
    n_keep = 1 if (fused_hist and flat_bands) else N_BANDS
    w_args = ()
    if weighted:
        w = jnp.asarray(src_weights, jnp.float32)
        assert w.shape == (R, n_keep), (w.shape, R, n_keep)
        w_args = tuple(w[:, c].reshape(rows, LANES) for c in range(n_keep))
        in_specs = in_specs + [
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_keep)
        ]
    if wavefront:
        # Per-bounce ray re-sorting — the r1 "wavefront" dead end revived
        # by measurement: (a) an argsort + full-state gather costs 1.0 ms
        # at 2^15 rays and 8.5 ms at 2^20 when amortized on-chip
        # (benchmarks/sort_cost.py; the r1 47.6 ms figure was one relay-
        # bound dispatch), and (b) re-sorting by (direction octant,
        # origin morton) holds the sg_cull supergroup pass rate at
        # 18/29/43/49% across bounces 0-3 on the 49k-tri room vs
        # 38/57/73/82% for the static order (benchmarks/wavefront_sim.py)
        # — ~1.8x less path-pass and ~2.2x less shadow-pass group traffic.
        # One state_io kernel launch per bounce (single compiled kernel:
        # the bounce index rides scalars[9]); per-ray math, rng draws
        # included, is bit-identical to the fused loop — only histogram
        # accumulation order differs.
        if not (fused_hist and group_fori and sg_cull):
            raise ValueError(
                "wavefront requires fused_hist and the group_fori+sg_cull "
                "large-scene kernel (it exists to tighten the supergroup "
                "reach test)"
            )
        if cull or mxu_xform or ablate or shadow_divfree or ray_major:
            raise ValueError("wavefront excludes the experiment modes")
        pc = PAYLOAD_C_FLAT if flat_bands else PAYLOAD_C
        n_bins = cfg.ir_n_bins
        assert n_bins % LANES == 0, n_bins
        n_coarse = n_bins // LANES
        wf_row_unroll = (
            (1 if interpret else 8) if row_unroll is None else row_unroll
        )
        out_state_shapes = [
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
            for _ in range(8 + n_keep)
        ]
        if stream_tris is not None:
            # streamed wavefront: per-bounce (tiles, 1, 2 passes, chunks)
            # grid of the HBM-streamed kernel with state in/out refs —
            # 196k+ scenes get per-bounce re-sorting too
            chunk = min(int(stream_tris), T)
            while T % chunk or chunk % TRI_GROUP:
                chunk -= TRI_GROUP
                if chunk <= 0:
                    raise ValueError(
                        f"no chunk size <= {stream_tris} divides T={T} in "
                        f"multiples of {TRI_GROUP}; adjust stream_tris"
                    )
            n_chunks = T // chunk
            chunk_groups = chunk // TRI_GROUP
            fori_unroll_s = 1
            # MUST match _trace_kernel_streamed
            for cand in ((sg_unroll,) if sg_unroll else (32, 16, 8)):
                if chunk_groups % cand == 0 and chunk_groups >= cand:
                    fori_unroll_s = cand
                    break
            n_groups_s = T // TRI_GROUP
            g3 = gaabb.reshape(n_groups_s // fori_unroll_s, fori_unroll_s, 8)
            sgaabb_s = jnp.concatenate(
                [
                    g3[:, :, :3].min(axis=1),
                    g3[:, :, 3:6].max(axis=1),
                    jnp.zeros((g3.shape[0], 2), jnp.float32),
                ],
                axis=1,
            )
            sg_per_chunk = chunk_groups // fori_unroll_s
            sg_coarse = _resolve_sg_coarse(sg_coarse, sg_per_chunk)
            sg_rows = sg_per_chunk
            if sg_coarse:
                if (sg_per_chunk % sg_coarse
                        or sg_per_chunk < 2 * sg_coarse):
                    raise ValueError(
                        f"sg_coarse={sg_coarse} must divide the per-chunk "
                        f"supergroup count {sg_per_chunk} with at least 2 "
                        f"blocks"
                    )
                sgaabb_s = _append_coarse_chunked(
                    sgaabb_s, sg_coarse, sg_per_chunk
                )
                sg_rows = _coarse_rows_chunked(sg_per_chunk, sg_coarse)
            sg_args = (sgaabb_s,)
            row4 = pl.BlockSpec((SUBLANES, LANES), lambda i, b, p, c: (i, 0),
                                memory_space=pltpu.VMEM)
            in_specs_w = [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                row4, row4, row4,
                pl.BlockSpec((chunk, TRI_COLS), lambda i, b, p, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, 8), lambda i, b, p, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_groups, 8), lambda i, b, p, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((sg_rows, 8), lambda i, b, p, c: (c, 0),
                             memory_space=pltpu.SMEM),
            ] + [row4] * (6 + n_keep)
            n_sel = 3 + n_keep + (1 if material_scattering else 0)
            n_shc = n_keep if transmission else 1
            row_state = 8 + n_keep + 6 + (1 if material_scattering else 0)
            scratch_w = (
                [pltpu.VMEM((n_coarse, pc * LANES), jnp.float32)]
                + [pltpu.VMEM((SUBLANES, LANES), jnp.float32)] * row_state
                + [pltpu.VMEM((SUBLANES * TRI_GROUP, LANES), jnp.float32)]
                * (1 + n_sel + n_shc)
            )
            kernel_w = partial(
                _trace_kernel_streamed, n_tris=T, chunk_tris=chunk,
                max_bounces=max_bounces, cfg=cfg, flat_bands=flat_bands,
                transmission=transmission, weighted=False,
                scattering=scattering,
                material_scattering=material_scattering,
                sg_cull=True, shadow_divfree=False,
                row_unroll=wf_row_unroll, state_io=True,
                sg_unroll=sg_unroll, sg_coarse=sg_coarse,
            )
            call_w = pl.pallas_call(
                kernel_w,
                grid=(rows // SUBLANES, 1, 2, n_chunks),
                in_specs=in_specs_w,
                out_specs=[
                    pl.BlockSpec((n_coarse, pc * LANES),
                                 lambda i, b, p, c: (0, 0),
                                 memory_space=pltpu.VMEM)
                ] + [row4] * (8 + n_keep),
                out_shape=[
                    jax.ShapeDtypeStruct((n_coarse, pc * LANES),
                                         jnp.float32)
                ] + out_state_shapes,
                scratch_shapes=scratch_w,
                interpret=interpret,
            )
        else:
            row_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
            in_specs_w = in_specs[:8] + [row_spec] * (6 + n_keep)
            kernel_w = partial(
                _trace_kernel, n_tris=T, max_bounces=max_bounces, cfg=cfg,
                fused_hist=True, flat_bands=flat_bands, group_fori=True,
                row_unroll=wf_row_unroll,
                transmission=transmission, weighted=False,
                scattering=scattering,
                material_scattering=material_scattering,
                sg_cull=True, state_io=True, sg_unroll=sg_unroll, sg_coarse=sg_coarse,
            )
            call_w = pl.pallas_call(
                kernel_w,
                grid=(rows // SUBLANES,),
                in_specs=in_specs_w,
                out_specs=[
                    pl.BlockSpec((n_coarse, pc * LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
                ] + [row_spec] * (8 + n_keep),
                out_shape=[
                    jax.ShapeDtypeStruct((n_coarse, pc * LANES),
                                         jnp.float32)
                ] + out_state_shapes,
                scratch_shapes=[
                    pltpu.VMEM((n_coarse, pc * LANES), jnp.float32)
                ],
                interpret=interpret,
            )
        zeros = jnp.zeros((rows, LANES), jnp.float32)
        ones = jnp.ones((rows, LANES), jnp.float32)
        o_st = [src[k] + zeros for k in range(3)]
        d_st = list(dxyz)
        amp_st = list(w_args) if weighted else [ones] * n_keep
        path_st, alive_st = zeros, ones
        gidx_st = jnp.arange(R, dtype=jnp.int32).reshape(rows, LANES)
        sgaabb = sg_args[0]
        glo = jnp.min(gaabb[:, :3], axis=0)  # scene bounds for morton keys
        span = jnp.maximum(jnp.max(gaabb[:, 3:6], axis=0) - glo, 1e-9)
        hist = jnp.zeros((n_coarse, pc * LANES), jnp.float32)
        for b in range(max_bounces):
            if b:
                # sort key: direction octant (sign coherence is what the
                # reach test needs — mixed signs collapse it to
                # always-pass) then origin morton (tight o_lo/o_hi and
                # shadow reach). 3 + 27 bits fit int32.
                q = jnp.stack(
                    [
                        jnp.clip(
                            (o_st[k].reshape(R) - glo[k]) / span[k] * 1023.0,
                            0.0, 1023.0,
                        ).astype(jnp.int32)
                        for k in range(3)
                    ],
                    axis=1,
                )
                octant = (
                    (d_st[0].reshape(R) > 0).astype(jnp.int32)
                    | ((d_st[1].reshape(R) > 0).astype(jnp.int32) << 1)
                    | ((d_st[2].reshape(R) > 0).astype(jnp.int32) << 2)
                )
                perm = jnp.argsort((octant << 27) | (_morton3(q) >> 3))
                tk = lambda a: a.reshape(R)[perm].reshape(rows, LANES)  # noqa: E731
                o_st = [tk(a) for a in o_st]
                d_st = [tk(a) for a in d_st]
                amp_st = [tk(a) for a in amp_st]
                path_st, alive_st = tk(path_st), tk(alive_st)
                gidx_st = tk(gidx_st)
            outs = call_w(
                scalars.at[9].set(jnp.float32(b)), d_st[0], d_st[1],
                d_st[2], tri, opl, gaabb, sgaabb, *o_st, *amp_st, path_st,
                alive_st, gidx_st,
            )
            hist = hist + outs[0]
            o_st = list(outs[1:4])
            d_st = list(outs[4:7])
            amp_st = list(outs[7 : 7 + n_keep])
            path_st = outs[7 + n_keep]
            alive_st = outs[8 + n_keep]
        return hist.reshape(n_coarse, pc, LANES).transpose(0, 2, 1).reshape(
            n_bins, pc
        )
    if stream_tris is not None:
        # HBM-streamed large-scene mode: grid (tiles, bounces, 2 passes,
        # chunks); the Pallas pipeline double-buffers (chunk, 24) tri-table
        # blocks from HBM while per-tile ray state persists in VMEM
        # scratch — scene size is bounded by HBM, not VMEM (~49k tris is
        # the resident kernel's ceiling at 16 MB VMEM with its carries).
        # stream_tris=8192 fits the 16 MB scoped-VMEM budget at
        # ir_n_bins=32768; 16384 was measured 764 KB over (Mosaic
        # stack OOM at 196k tris).
        if not fused_hist:
            raise ValueError("stream_tris requires fused_hist=True")
        if ablate:
            raise ValueError("ablate supports the resident kernel only")
        if cull or mxu_xform:
            raise ValueError(
                "stream_tris excludes the cull/mxu_xform experiments"
            )
        chunk = min(int(stream_tris), T)
        while T % chunk or chunk % TRI_GROUP:
            chunk -= TRI_GROUP
            if chunk <= 0:
                raise ValueError(
                    f"no chunk size <= {stream_tris} divides T={T} in "
                    f"multiples of {TRI_GROUP}; adjust stream_tris"
                )
        n_chunks = T // chunk
        chunk_groups = chunk // TRI_GROUP
        fori_unroll = 1
        # MUST match _trace_kernel_streamed
        for cand in ((sg_unroll,) if sg_unroll else (32, 16, 8)):
            if chunk_groups % cand == 0 and chunk_groups >= cand:
                fori_unroll = cand
                break
        stream_sg = sg_cull if sg_cull is not None else True
        stream_row_unroll = (
            (1 if interpret else 8) if row_unroll is None else row_unroll
        )
        in_specs_s = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i, b, p, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i, b, p, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i, b, p, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, TRI_COLS), lambda i, b, p, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8), lambda i, b, p, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_groups, 8), lambda i, b, p, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ]
        args_s = [scalars, dxyz[0], dxyz[1], dxyz[2], tri, opl, gaabb]
        if stream_sg:
            n_groups = T // TRI_GROUP
            g3 = gaabb.reshape(n_groups // fori_unroll, fori_unroll, 8)
            sgaabb = jnp.concatenate(
                [
                    g3[:, :, :3].min(axis=1),
                    g3[:, :, 3:6].max(axis=1),
                    jnp.zeros((g3.shape[0], 2), jnp.float32),
                ],
                axis=1,
            )
            sg_per_chunk = chunk_groups // fori_unroll
            sg_coarse = _resolve_sg_coarse(sg_coarse, sg_per_chunk)
            sg_rows = sg_per_chunk
            if sg_coarse:
                if (sg_per_chunk % sg_coarse
                        or sg_per_chunk < 2 * sg_coarse):
                    raise ValueError(
                        f"sg_coarse={sg_coarse} must divide the per-chunk "
                        f"supergroup count {sg_per_chunk} with at least 2 "
                        f"blocks"
                    )
                sgaabb = _append_coarse_chunked(
                    sgaabb, sg_coarse, sg_per_chunk
                )
                sg_rows = _coarse_rows_chunked(sg_per_chunk, sg_coarse)
            in_specs_s.append(
                pl.BlockSpec((sg_rows, 8), lambda i, b, p, c: (c, 0),
                             memory_space=pltpu.SMEM)
            )
            args_s.append(sgaabb)
        if weighted:
            in_specs_s += [
                pl.BlockSpec((SUBLANES, LANES), lambda i, b, p, c: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_keep)
            ]
            args_s += list(w_args)
        pc = PAYLOAD_C_FLAT if flat_bands else PAYLOAD_C
        n_bins = cfg.ir_n_bins
        assert n_bins % LANES == 0, n_bins
        n_coarse = n_bins // LANES
        n_sel = 3 + n_keep + (1 if material_scattering else 0)
        n_shc = n_keep if transmission else 1
        row_state = 8 + n_keep + 6 + (1 if material_scattering else 0)
        scratch = (
            [pltpu.VMEM((n_coarse, pc * LANES), jnp.float32)]
            + [pltpu.VMEM((SUBLANES, LANES), jnp.float32)] * row_state
            + [pltpu.VMEM((SUBLANES * TRI_GROUP, LANES), jnp.float32)]
            * (1 + n_sel + n_shc)
        )
        kernel_s = partial(
            _trace_kernel_streamed, n_tris=T, chunk_tris=chunk,
            max_bounces=max_bounces, cfg=cfg, flat_bands=flat_bands,
            transmission=transmission, weighted=weighted,
            scattering=scattering,
            material_scattering=material_scattering,
            sg_cull=stream_sg, shadow_divfree=shadow_divfree,
            row_unroll=stream_row_unroll, sg_unroll=sg_unroll, sg_coarse=sg_coarse,
        )
        hist = pl.pallas_call(
            kernel_s,
            grid=(rows // SUBLANES, max_bounces, 2, n_chunks),
            in_specs=in_specs_s,
            out_specs=pl.BlockSpec(
                (n_coarse, pc * LANES), lambda i, b, p, c: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n_coarse, pc * LANES),
                                           jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args_s)
        return hist.reshape(n_coarse, pc, LANES).transpose(0, 2, 1).reshape(
            n_bins, pc
        )

    if (inc_origin or tid_fold or n_listeners > 1) and not (
        fused_hist and not group_fori and not cull and not mxu_xform
        and winner_acc == 1 and not ablate and stream_tris is None
        and not wavefront and not ray_major
    ):
        raise ValueError(
            "inc_origin/tid_fold/listeners support the resident unrolled "
            "fused_hist kernel only (no group_fori/cull/mxu_xform/"
            "winner_acc/ablate/stream_tris/wavefront/ray_major)"
        )
    if n_listeners > 1 and tid_fold:
        raise ValueError("listeners excludes the tid_fold experiment")
    if mask_sweep is None:
        # ADOPTED default (r4): bit-identical to the serial scan and
        # measured -0.6..-1.0 ms on the 55 ms production dispatch
        # (benchmarks/sweep_ab.json, 40 interleaved iters). The serial
        # scan stays reachable (mask_sweep=False) for A/Bs; the
        # tid_fold / no_sweep experiments keep their own lowerings.
        mask_sweep = not (tid_fold or "no_sweep" in (ablate or ""))
    elif mask_sweep and (tid_fold or "no_sweep" in (ablate or "")):
        raise ValueError("mask_sweep replaces the winner sweep — it "
                         "excludes tid_fold and the no_sweep ablation")
    if shadow_carry and not inc_origin:
        raise ValueError(
            "shadow_carry rides inc_origin's (op, dp) carry buffers — "
            "pass inc_origin=True"
        )
    kernel = partial(
        _trace_kernel, n_tris=T, max_bounces=max_bounces, cfg=cfg,
        fused_hist=fused_hist, cull=cull, flat_bands=flat_bands,
        mxu_xform=mxu_xform, group_fori=group_fori,
        row_unroll=(1 if interpret else 8) if row_unroll is None else row_unroll,
        transmission=transmission,
        weighted=weighted, scattering=scattering,
        material_scattering=material_scattering,
        sg_cull=sg_cull, shadow_divfree=shadow_divfree,
        winner_acc=winner_acc, ablate=ablate, sg_unroll=sg_unroll, sg_coarse=sg_coarse,
        inc_origin=inc_origin, shadow_carry=shadow_carry,
        tid_fold=tid_fold, mask_sweep=mask_sweep, hist_batch=hist_batch,
        n_listeners=n_listeners,
    )
    l_args = ()
    if n_listeners > 1:
        # (C, 4) SMEM listener-position table — the FIRST extra ref
        l_args = (jnp.pad(listeners, ((0, 0), (0, 1))),)
        in_specs.insert(7, pl.BlockSpec(memory_space=pltpu.SMEM))
    args = (scalars, dxyz[0], dxyz[1], dxyz[2], tri, opl, gaabb) + l_args + sg_args + w_args
    if fused_hist:
        pc = PAYLOAD_C_FLAT if flat_bands else PAYLOAD_C
        n_bins = cfg.ir_n_bins
        assert n_bins % LANES == 0, n_bins
        n_coarse = n_bins // LANES
        hist_rows = n_listeners * n_coarse
        scratch = [pltpu.VMEM((hist_rows, pc * LANES), jnp.float32)]
        if inc_origin:
            scratch += [
                pltpu.VMEM((SUBLANES, T, LANES), jnp.float32)
                for _ in range(6)
            ]
        hist = pl.pallas_call(
            kernel,
            grid=(rows // SUBLANES,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (hist_rows, pc * LANES), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((hist_rows, pc * LANES), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)
        # H[coarse, c*128 + fine] -> (n_bins, C) (leading listener axis
        # in multi-listener mode)
        if n_listeners > 1:
            return hist.reshape(
                n_listeners, n_coarse, pc, LANES
            ).transpose(0, 1, 3, 2).reshape(n_listeners, n_bins, pc)
        return hist.reshape(n_coarse, pc, LANES).transpose(0, 2, 1).reshape(
            n_bins, pc
        )
    bins, payload = pl.pallas_call(
        kernel,
        grid=(rows // SUBLANES,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (max_bounces, SUBLANES, LANES), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (max_bounces, PAYLOAD_C, SUBLANES, LANES), lambda i: (0, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_bounces, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((max_bounces, PAYLOAD_C, rows, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    bins_flat = bins.reshape(-1)
    payload_flat = jnp.moveaxis(payload, 1, -1).reshape(-1, PAYLOAD_C)
    return bins_flat, payload_flat


@partial(
    jax.jit,
    static_argnames=("cfg", "n_rays", "max_bounces", "total_rays",
                     "include_direct", "interpret", "fused_hist", "cull",
                     "flat_bands", "mxu_xform", "group_fori",
                     "src_directivity", "scattering", "material_scattering",
                     "sg_cull", "row_unroll", "shadow_divfree",
                     "stream_tris", "ray_major", "tri_unroll", "ray_blocks",
                     "wavefront", "sg_unroll", "sg_coarse", "n_true",
                     "inc_origin", "shadow_carry", "tid_fold", "mask_sweep",
                     "hist_batch"),
)
def trace_ir_pallas(
    scene_arrays,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    total_rays: int | None = None,
    include_direct: bool = True,
    interpret: bool = False,
    fused_hist: bool = False,
    cull: bool = False,
    flat_bands: bool = False,
    mxu_xform: bool = False,
    group_fori: bool | None = None,
    src_directivity=None,
    src_axis=None,
    scattering: float = 0.0,
    material_scattering: bool = False,
    rng_seed: int = 0,
    sg_cull: bool | None = None,
    row_unroll: int | None = None,
    shadow_divfree: bool = False,
    stream_tris: int | None = None,
    ray_major: bool | None = None,
    tri_unroll: int = 8,
    ray_blocks: int = 1,
    wavefront: bool | None = None,
    sg_unroll: int | None = None,
    sg_coarse: int | None = None,
    n_true: int | None = None,
    inc_origin: bool = False,
    shadow_carry: bool = False,
    tid_fold: bool = False,
    mask_sweep: bool | None = None,
    hist_batch: int = 1,
):
    """Drop-in fast path for models.ir.trace_ir using the fused kernel.

    cull=True enables per-row ray-bundle vs triangle-group AABB culling
    (conservative: identical results, runtime group skips via lax.cond).
    Off by default: measured on world.obj, bundle pass rates are 76-93%
    (skip 7-24%) while Mosaic's per-cond overhead needs >35% skips to break
    even — it made tracing 1.8-3.5x SLOWER. Kept as an experimental hook
    for large scenes with tighter bundles (see NEXT.md).

    flat_bands=True (fused_hist only) is the band-uniform-absorption fast
    path: the kernel bins a single energy channel + direction (payload 4
    instead of 7) and the per-band air-absorption law
    (sound_system.zig:229-234) is applied here from the bin index — exact
    up to the half-bin delay quantization (~4 mm of path). The caller must
    ensure every surface's absorption is equal across bands (the default
    scene material is); band-dependent scenes need flat_bands=False."""
    from ..models.ir import ImpulseResponse, direct_ir, fibonacci_sphere_sorted

    if flat_bands and not fused_hist:
        raise ValueError("flat_bands requires fused_hist=True")
    n_rays = n_rays or cfg.rays_per_source
    if dirs is None:
        # spatially-sorted order: same direction set (histograms are
        # order-invariant), tighter per-tile bundles for cull=True
        dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))
    src_weights = None
    if src_axis is not None and src_directivity is None:
        raise ValueError(
            "src_axis requires src_directivity (an omni source has no "
            "axis to aim)"
        )
    if src_directivity is not None:
        from ..models.directivity import directivity_gain

        w = directivity_gain(dirs, src_directivity, axis=src_axis)  # (R, 4)
        if flat_bands:
            if (len(set(src_directivity.alpha)) > 1
                    or len(set(src_directivity.order)) > 1):
                raise ValueError(
                    "flat_bands carries one amplitude: the directivity "
                    "pattern must be band-uniform (equal alpha/order); "
                    "use flat_bands=False for band-dependent patterns"
                )
            w = w[:, :1]
        src_weights = w
    if fused_hist:
        seg = trace_contributions_pallas(
            scene_arrays, source, listener, dirs, cfg=cfg,
            max_bounces=max_bounces, total_rays=total_rays,
            interpret=interpret, fused_hist=True, cull=cull,
            flat_bands=flat_bands, mxu_xform=mxu_xform,
            group_fori=group_fori, src_weights=src_weights,
            scattering=scattering, material_scattering=material_scattering,
            rng_seed=rng_seed, sg_cull=sg_cull, row_unroll=row_unroll,
            shadow_divfree=shadow_divfree, stream_tris=stream_tris,
            ray_major=ray_major, tri_unroll=tri_unroll,
            ray_blocks=ray_blocks, wavefront=wavefront,
            sg_unroll=sg_unroll, sg_coarse=sg_coarse, n_true=n_true,
            inc_origin=inc_origin, shadow_carry=shadow_carry,
            tid_fold=tid_fold, mask_sweep=mask_sweep,
            hist_batch=hist_batch,
        )
    else:
        if wavefront:
            raise ValueError("wavefront requires fused_hist=True")
        bins, payload = trace_contributions_pallas(
            scene_arrays, source, listener, dirs, cfg=cfg,
            max_bounces=max_bounces, total_rays=total_rays,
            interpret=interpret, cull=cull, mxu_xform=mxu_xform,
            group_fori=group_fori, src_weights=src_weights,
            scattering=scattering, material_scattering=material_scattering,
            rng_seed=rng_seed, sg_cull=sg_cull, row_unroll=row_unroll,
            shadow_divfree=shadow_divfree, sg_coarse=sg_coarse,
            n_true=n_true,
        )
        seg = bin_segment(payload, bins, cfg.ir_n_bins)  # (n_bins, 7)
    if flat_bands:
        # reconstruct per-band energies from the bin's delay: bin =
        # round(d * spm * bps) so d(bin) = bin / (spm * bps), at most half
        # a bin off the true path length
        from ..models.ir import _air_amplitude

        d_bin = jnp.arange(cfg.ir_n_bins, dtype=jnp.float32) / (
            cfg.samples_per_meter * cfg.ir_bins_per_sample
        )
        aab2 = _air_amplitude(d_bin, cfg) ** 2  # (n_bins, n_bands)
        energy = (seg[:, :1] * aab2).T
        dir_sum = (seg[:, 1:] * jnp.mean(aab2, axis=1, keepdims=True)).T
    else:
        energy = seg[:, :N_BANDS].T
        dir_sum = seg[:, N_BANDS:].T
    if include_direct:
        dref = direct_ir(scene_arrays, source, listener, cfg=cfg,
                         src_directivity=src_directivity, src_axis=src_axis)
        energy = energy + dref.energy
        dir_sum = dir_sum + dref.dir_sum
    return ImpulseResponse(energy=energy, dir_sum=dir_sum)


@partial(
    jax.jit,
    static_argnames=("cfg", "n_rays", "max_bounces", "include_direct",
                     "interpret", "fused_hist", "cull", "flat_bands",
                     "src_directivity", "wavefront", "n_true",
                     "inc_origin", "shadow_carry", "hist_batch"),
)
def trace_irs_pallas_multi(
    scene_arrays,
    sources,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    include_direct: bool = True,
    interpret: bool = False,
    fused_hist: bool = True,
    cull: bool = False,
    flat_bands: bool = False,
    src_directivity=None,
    src_axes=None,
    wavefront: bool | None = None,
    n_true: int | None = None,
    inc_origin: bool = False,
    shadow_carry: bool = False,
    hist_batch: int = 1,
):
    """All sources' IRs in one compiled program (BASELINE config 5 on a
    single chip): lax.scan over sources around the fused kernel, so the
    kernel compiles once and the whole 8-source trace is one dispatch.
    sources: (S, 3). Returns stacked ImpulseResponse (S, n_bands/3, n_bins).
    On a multi-chip mesh, shard the source axis outside (see
    parallel/sharding.py).

    src_directivity (static pattern shared by all sources) + src_axes
    optional (S, 3) per-source emission axes (dynamic — 8 differently
    aimed speakers scan through ONE compiled kernel)."""
    from ..models.ir import ImpulseResponse, fibonacci_sphere_sorted

    n_rays = n_rays or cfg.rays_per_source
    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))
    if src_axes is not None and src_directivity is None:
        raise ValueError(
            "src_axes requires src_directivity (an omni source has no "
            "axis to aim)"
        )
    if src_axes is None and src_directivity is not None:
        src_axes = jnp.broadcast_to(
            jnp.asarray(src_directivity.axis, jnp.float32),
            (sources.shape[0], 3),
        )

    # fast path for the fused-histogram kernel: the scan body is the
    # KERNEL ONLY — flat-band reconstruction, the direct-path IR, and
    # the payload transpose run ONCE, batched over all S sources, after
    # the scan (they were measured as per-step glue diluting the r3
    # kernel gains: the kernel got ~3.5 ms/trace faster single-dispatch
    # but only ~2.0 in the scan). Non-fused/experimental modes keep the
    # per-source trace_ir_pallas body.
    fast = (
        fused_hist and not cull and src_directivity is None
        and not wavefront
    )
    if fast:
        from ..models.ir import _air_amplitude, direct_ir

        def one(_, src):
            seg = trace_contributions_pallas(
                scene_arrays, src, listener, dirs, cfg=cfg,
                max_bounces=max_bounces, interpret=interpret,
                fused_hist=True, flat_bands=flat_bands, n_true=n_true,
                inc_origin=inc_origin, shadow_carry=shadow_carry,
                hist_batch=hist_batch,
            )
            return None, seg

        _, segs = jax.lax.scan(one, None, sources)  # (S, n_bins, pc)
        if flat_bands:
            d_bin = jnp.arange(cfg.ir_n_bins, dtype=jnp.float32) / (
                cfg.samples_per_meter * cfg.ir_bins_per_sample
            )
            aab2 = _air_amplitude(d_bin, cfg) ** 2  # (n_bins, n_bands)
            energy = (segs[:, :, :1] * aab2[None]).transpose(0, 2, 1)
            dir_sum = (
                segs[:, :, 1:] * jnp.mean(aab2, axis=1)[None, :, None]
            ).transpose(0, 2, 1)
        else:
            energy = segs[:, :, :N_BANDS].transpose(0, 2, 1)
            dir_sum = segs[:, :, N_BANDS:].transpose(0, 2, 1)
        if include_direct:
            d = jax.vmap(
                lambda s: direct_ir(scene_arrays, s, listener, cfg=cfg)
            )(sources)
            energy = energy + d.energy
            dir_sum = dir_sum + d.dir_sum
        return ImpulseResponse(energy=energy, dir_sum=dir_sum)

    def one(_, inp):
        src = inp[0] if src_directivity is not None else inp
        ir = trace_ir_pallas(
            scene_arrays, src, listener, cfg=cfg, max_bounces=max_bounces,
            dirs=dirs, include_direct=include_direct, interpret=interpret,
            fused_hist=fused_hist, cull=cull, flat_bands=flat_bands,
            src_directivity=src_directivity,
            src_axis=None if src_directivity is None else inp[1],
            wavefront=wavefront, n_true=n_true,
            inc_origin=inc_origin, shadow_carry=shadow_carry,
            hist_batch=hist_batch,
        )
        return None, ir

    xs = sources if src_directivity is None else (sources, src_axes)
    _, irs = jax.lax.scan(one, None, xs)
    return ImpulseResponse(energy=irs.energy, dir_sum=irs.dir_sum)


@partial(
    jax.jit,
    static_argnames=("cfg", "n_rays", "max_bounces", "include_direct",
                     "interpret", "fused_hist", "flat_bands", "wavefront",
                     "n_true"),
)
def trace_irs_pallas_multi_listener(
    scene_arrays,
    source,
    listeners,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    include_direct: bool = True,
    interpret: bool = False,
    fused_hist: bool = True,
    flat_bands: bool = False,
    wavefront: bool | None = None,
    n_true: int | None = None,
):
    """All listeners' IRs from one source in one compiled program: lax.scan
    over listeners around the fused kernel (the kernel compiles once; the
    listener is a traced operand — its transformed origins are recomputed
    per step). listeners: (L, 3). Returns stacked ImpulseResponse
    (L, n_bands/3, n_bins). For the shared-path XLA variant (one path
    trace, per-listener NEE only) see models.ir.trace_ir_multi_listener."""
    from ..models.ir import ImpulseResponse, fibonacci_sphere_sorted

    n_rays = n_rays or cfg.rays_per_source
    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))

    def one(_, lst):
        ir = trace_ir_pallas(
            scene_arrays, source, lst, cfg=cfg, max_bounces=max_bounces,
            dirs=dirs, include_direct=include_direct, interpret=interpret,
            fused_hist=fused_hist, flat_bands=flat_bands,
            wavefront=wavefront, n_true=n_true,
        )
        return None, ir

    _, irs = jax.lax.scan(one, None, jnp.asarray(listeners, jnp.float32))
    return ImpulseResponse(energy=irs.energy, dir_sum=irs.dir_sum)


@partial(
    jax.jit,
    static_argnames=("cfg", "n_rays", "max_bounces", "include_direct",
                     "interpret", "flat_bands", "listener_chunk", "n_true",
                     "inc_origin", "shadow_carry", "mask_sweep",
                     "hist_batch"),
)
def trace_irs_pallas_multi_listener_nee(
    scene_arrays,
    source,
    listeners,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    include_direct: bool = True,
    interpret: bool = False,
    flat_bands: bool = False,
    listener_chunk: int = 4,
    n_true: int | None = None,
    inc_origin: bool = False,
    shadow_carry: bool = False,
    mask_sweep: bool | None = None,
    hist_batch: int = 1,
):
    """All listeners' IRs with IN-KERNEL multi-listener NEE: the fused
    kernel's path pass runs once per chunk of ``listener_chunk``
    listeners while the shadow/emission/binning stages loop over the
    chunk inside the kernel (VMEM-resident — no (L, R, T) HBM
    temporaries like models.ir.trace_ir_multi_listener's vmapped NEE,
    no L repeated path passes like trace_irs_pallas_multi_listener's
    scan). listeners: (L, 3), padded up to a chunk multiple internally.
    Returns stacked ImpulseResponse (L, n_bands/3, n_bins).

    listener_chunk bounds the kernel's VMEM: each chunk listener adds
    one (n_bins/128, pc*128) f32 histogram accumulator (512 KB at
    n_bins=32768 flat) plus a shadow/emission stage per (row, bounce).
    """
    from ..models.ir import (
        ImpulseResponse,
        _air_amplitude,
        direct_ir,
        fibonacci_sphere_sorted,
    )

    n_rays = n_rays or cfg.rays_per_source
    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))
    listeners = jnp.asarray(listeners, jnp.float32).reshape(-1, 3)
    L = int(listeners.shape[0])
    C = max(1, min(int(listener_chunk), L))
    n_chunks = -(-L // C)
    pad = n_chunks * C - L
    lst_p = (
        jnp.concatenate(
            [listeners, jnp.broadcast_to(listeners[-1:], (pad, 3))]
        )
        if pad
        else listeners
    )
    segs = []
    for k in range(n_chunks):
        chunk = lst_p[k * C : (k + 1) * C]
        seg = trace_contributions_pallas(
            scene_arrays, source, chunk[0], dirs, cfg=cfg,
            max_bounces=max_bounces, interpret=interpret, fused_hist=True,
            flat_bands=flat_bands, n_true=n_true, inc_origin=inc_origin,
            shadow_carry=shadow_carry, mask_sweep=mask_sweep,
            hist_batch=hist_batch,
            listeners=chunk if C > 1 else None,
        )
        segs.append(seg if C > 1 else seg[None])
    seg = jnp.concatenate(segs, axis=0)[:L]  # (L, n_bins, pc)
    if flat_bands:
        d_bin = jnp.arange(cfg.ir_n_bins, dtype=jnp.float32) / (
            cfg.samples_per_meter * cfg.ir_bins_per_sample
        )
        aab2 = _air_amplitude(d_bin, cfg) ** 2  # (n_bins, n_bands)
        energy = (seg[:, :, :1] * aab2[None]).transpose(0, 2, 1)
        dir_sum = (
            seg[:, :, 1:] * jnp.mean(aab2, axis=1)[None, :, None]
        ).transpose(0, 2, 1)
    else:
        energy = seg[:, :, :N_BANDS].transpose(0, 2, 1)
        dir_sum = seg[:, :, N_BANDS:].transpose(0, 2, 1)
    if include_direct:
        d = jax.vmap(
            lambda l: direct_ir(scene_arrays, source, l, cfg=cfg)
        )(listeners)
        energy = energy + d.energy
        dir_sum = dir_sum + d.dir_sum
    return ImpulseResponse(energy=energy, dir_sum=dir_sum)


def trace_ir_pallas_ensemble(
    scene_arrays,
    source,
    listener,
    n_ensembles: int = 4,
    rng_seed: int = 0,
    include_direct: bool = True,
    **kw,
):
    """Ensemble-averaged stochastic trace: the mean IR over n_ensembles
    independent seed streams, in ONE dispatch (lax.scan over seeds around
    the fused kernel — the traced-seed scalars make every step reuse the
    same compiled kernel; before that change each seed cost its own ~4-5
    min Mosaic compile). Monte-Carlo tail variance drops ~1/n_ensembles
    at n_ensembles x the trace cost and none of the ray-count's VMEM
    pressure. Seeds fold as rng_seed * n_ensembles + e — disjoint from
    an ensemble at any other rng_seed. **kw: any trace_ir_pallas
    options (scattering/material_scattering make this worthwhile;
    deterministic traces are seed-invariant and just waste n_ensembles x
    the work — a specular-only ensemble returns the single-trace IR).
    """
    from ..models.ir import ImpulseResponse, direct_ir

    seeds = jnp.asarray(rng_seed, jnp.int32) * n_ensembles + jnp.arange(
        n_ensembles, dtype=jnp.int32
    )

    def one(_, seed):
        ir = trace_ir_pallas(
            scene_arrays, source, listener, include_direct=False,
            rng_seed=seed, **kw,
        )
        return None, ir

    _, irs = jax.lax.scan(one, None, seeds)
    energy = jnp.mean(irs.energy, axis=0)
    dir_sum = jnp.mean(irs.dir_sum, axis=0)
    if include_direct:
        d = direct_ir(
            scene_arrays, source, listener, cfg=kw.get("cfg", DEFAULT_CONFIG),
            src_directivity=kw.get("src_directivity"),
            src_axis=kw.get("src_axis"),
        )
        energy = energy + d.energy
        dir_sum = dir_sum + d.dir_sum
    return ImpulseResponse(energy=energy, dir_sum=dir_sum)
