"""Impulse-response model: batched multi-bounce tracing -> energy histograms.

This is the framework's TPU-first generalization of the reference's
acoustics (BASELINE.json north star). Where the reference traces 14 + a few
rays per frame and reduces them to 13 scalar DSP parameters per voice
(SURVEY.md §2.3), this model traces *wavefronts* of rays from each source,
bounces them specularly through the scene with per-surface, per-band
absorption, and scatter-bins every listener-visible path into a
delay x band energy histogram — an impulse response the convolution engine
renders directly.

Acoustic laws are the reference's, generalized:
  * amplitude 1/(d+1) distance attenuation (sound_system.zig:237) — direct
    and reflection paths alike;
  * air absorption clamp(1 - 1e-5*d*freqs, 0, 1) per band
    (sound_system.zig:229-234);
  * reflection strength lam = |dot(n, w)| + max(dot(n, h), 0)^16 — Lambert
    + Blinn-Phong-for-sound (main.zig:710-722), with the half vector
    between the reversed incident ray and the listener direction;
  * delay = d_total / 350 m/s * 44100 (sound_system.zig:31-32).

TPU mapping: one `lax.scan` over bounces; each step is a dense
rays x triangles nearest-hit (ops/intersect.py), a shadow-ray batch to the
listener (next-event estimation), and a `segment_sum` scatter into the
histogram. All shapes static; rays that die keep flowing masked. The ray
axis is the natural sharding axis for multi-chip (parallel/sharding.py
shard_maps it and psums the histograms over ICI).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..ops.eq import EQ_FREQS
from ..ops.histogram import bin_matmul, bin_segment
from ..ops.intersect import nearest_hit, nearest_hit_mxu, reflect

GOLDEN = (1.0 + 5.0**0.5) / 2.0


def fibonacci_sphere(n: int) -> np.ndarray:
    """Deterministic, near-uniform unit directions (n, 3) — the
    generalization of the 14-direction raycast_sphere_pattern
    (main.zig:1081-1096) to arbitrary ray counts."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = 2.0 * np.pi * i / GOLDEN
    cos_t = 1.0 - 2.0 * i / n
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - cos_t * cos_t))
    return np.stack(
        [np.cos(phi) * sin_t, cos_t, np.sin(phi) * sin_t], axis=1
    ).astype(np.float32)


def _morton3_np(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit x/y/z columns of q (N, 3) into 30-bit keys."""

    def spread(x):
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    q = q.astype(np.int64)
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def fibonacci_sphere_sorted(n: int) -> np.ndarray:
    """fibonacci_sphere reordered so index-adjacent directions are spatially
    adjacent (consecutive fibonacci indices spiral across the sphere, so a
    128-lane tile of them is incoherent). OCTANT-MAJOR: the kernel's
    supergroup reach test (_sg_pred) collapses to always-pass on any axis
    where a (1, 128) row mixes direction signs, so rows must never straddle
    an octant boundary; within an octant, morton order keeps the bundle
    tight. Measured (benchmarks/wavefront_sim.py, 49k-tri room): the old
    lexicographic key passed 38% of supergroups at bounce 0, octant-major
    passes 18%. Histograms are invariant to ray order."""
    d = fibonacci_sphere(n)
    octant = (
        (d[:, 0] > 0).astype(np.int64)
        | ((d[:, 1] > 0).astype(np.int64) << 1)
        | ((d[:, 2] > 0).astype(np.int64) << 2)
    )
    q = np.clip((np.abs(d) * 1023.999).astype(np.int64), 0, 1023)
    key = (octant << 30) | _morton3_np(q)
    return d[np.argsort(key, kind="stable")]


class ImpulseResponse(NamedTuple):
    """Delay-binned energy + arrival-direction moments for one
    (source, listener) pair."""

    energy: jnp.ndarray  # (n_bands, n_bins) summed energy
    dir_sum: jnp.ndarray  # (3, n_bins) energy-weighted arrival directions
    # optional higher-order spherical-harmonic moments: (n_sh, n_bins)
    # energy-weighted ACN/N3D SH of the arrival directions (ops/hoa.py);
    # populated when tracing with sh_order is not None
    sh_moments: jnp.ndarray = None


def _air_absorption(d, air: float):
    """Per-band amplitude kept after distance d (sound_system.zig:229-234)."""
    return jnp.clip(1.0 - air * d[..., None] * EQ_FREQS, 0.0, 1.0)


# physical center frequencies (Hz) of the four bands for the ISO air
# model: geometric centers of the EQ crossover bands (~128/768/4608 Hz,
# sound_system.zig:580-581), with the open-ended top band at ~2x its edge.
# (EQ_FREQS are the reference's PSEUDO-frequency constants, not Hz.)
AIR_BAND_HZ = (64.0, 313.5, 1881.0, 9216.0)


def _air_amplitude(d, cfg: Config):
    """Per-band amplitude kept after distance d, per cfg.air_model:
    the reference clamp law, or ISO 9613-1 exponential decay
    (models/air.py) evaluated at AIR_BAND_HZ for cfg's atmosphere.
    cfg is static under jit, so the branch costs nothing."""
    if cfg.air_model == "reference":
        return _air_absorption(d, cfg.air_absorption)
    if cfg.air_model == "iso9613":
        from .air import amplitude_decay_per_meter

        k = jnp.asarray(
            amplitude_decay_per_meter(
                AIR_BAND_HZ, cfg.air_temperature_c, cfg.air_humidity_pct,
                cfg.air_pressure_kpa,
            ),
            jnp.float32,
        )
        return jnp.exp(d[..., None] * k)
    raise ValueError(f"unknown air_model {cfg.air_model!r}")


def _transmission_log_amp(transmission):
    """(T, n_bands) per-crossing log amplitude 0.5*log(tau).

    Opaque surfaces (tau = 0) clamp to log(1e-30)/2 ~ -34.5 so the
    crossing-count matmul stays finite: one opaque crossing already puts
    the amplitude at ~1e-15 (energy ~1e-30 ~ 0) without inf/NaN. The
    floor must be a NORMAL f32 (subnormals like 1e-38 are flushed to
    zero by XLA, and log(0) = -inf would NaN the masked matmul).
    """
    return 0.5 * jnp.log(jnp.clip(transmission, 1e-30, 1.0))


def _segment_crossings(org, delta, v0, v1, v2, eps: float = 1e-6):
    """(R, T) f32 mask: does the open segment org -> org+delta cross the
    triangle? Möller–Trumbore on the UNNORMALIZED delta, so t is in
    segment fractions and validity is eps <= t <= 1 (same semantics as the
    reversed-shadow test in trace_ir's mxu path)."""
    ab = (v1 - v0)[None]
    ac = (v2 - v0)[None]
    h = jnp.cross(delta[:, None, :], ac)
    det = jnp.sum(ab * h, axis=-1)
    inv = 1.0 / det
    s = org[:, None, :] - v0[None]
    u = inv * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, ab)
    v = inv * jnp.sum(delta[:, None, :] * q, axis=-1)
    t = inv * jnp.sum(ac * q, axis=-1)
    ok = (
        (jnp.abs(det) >= 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= eps)
        & (t <= 1.0)
    )
    return ok.astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("cfg", "sh_order", "src_directivity", "soft_bins"),
)
def direct_ir(
    scene_arrays, source, listener, cfg: Config = DEFAULT_CONFIG,
    sh_order: int | None = None, src_directivity=None, src_axis=None,
    soft_bins: bool = False,
) -> ImpulseResponse:
    """The single deterministic direct-path term (occlusion-tested).

    Split out so the sharded tracer (parallel/sharding.py) can add it on
    exactly one device before the histogram allreduce.

    With scene_arrays.transmission set, occluders attenuate instead of
    hard-blocking: amplitude x= prod(sqrt(tau)) over crossed surfaces
    (models/materials.py; the reference only hard-blocks,
    main.zig:683-702).

    src_directivity (models/directivity.py) weights the amplitude by the
    source's per-band radiation gain toward the listener.
    """
    v0, v1, v2 = scene_arrays.v0, scene_arrays.v1, scene_arrays.v2
    n_bins = cfg.ir_n_bins
    bps = float(cfg.ir_bins_per_sample)
    spm = cfg.samples_per_meter
    to_l = listener - source
    d_direct = jnp.linalg.norm(to_l)
    if scene_arrays.transmission is not None:
        log_amp = _transmission_log_amp(scene_arrays.transmission)
        cross = _segment_crossings(source[None], to_l[None], v0, v1, v2)
        trans = jnp.exp(
            jnp.dot(cross, log_amp, precision=jax.lax.Precision.HIGHEST)
        )[0]  # (n_bands,)
        amp_direct = (
            trans / (d_direct + 1.0)
            * _air_amplitude(d_direct, cfg)
        )
    else:
        safe_dir = jnp.where(d_direct < 1e-6, jnp.float32([1, 0, 0]), to_l)
        t_occ, _, _ = nearest_hit(source[None], safe_dir[None], v0, v1, v2)
        direct_visible = (t_occ[0] >= d_direct) | (d_direct < 1e-6)
        amp_direct = (
            jnp.where(direct_visible, 1.0, 0.0)
            / (d_direct + 1.0)
            * _air_amplitude(d_direct, cfg)
        )  # (n_bands,)
    if src_axis is not None and src_directivity is None:
        raise ValueError("src_axis requires src_directivity")
    if src_directivity is not None:
        from .directivity import directivity_gain

        amp_direct = amp_direct * directivity_gain(
            to_l, src_directivity, axis=src_axis
        )
    e_direct = amp_direct * amp_direct
    if soft_bins:
        # differentiable linear bin split (see trace_ir docstring)
        p = jnp.clip(d_direct * spm * bps, 0.0, float(n_bins - 1))
        b0 = jnp.floor(p)
        w1 = p - b0
        b0i = b0.astype(jnp.int32)
        b1i = jnp.minimum(b0i + 1, n_bins - 1)

        def _bin_add(buf, val):
            return buf.at[b0i].add(val * (1.0 - w1)).at[b1i].add(val * w1)
    else:
        bin_direct = jnp.clip((d_direct * spm * bps + 0.5), 0, n_bins - 1).astype(jnp.int32)

        def _bin_add(buf, val):
            return buf.at[bin_direct].add(val)

    energy = _bin_add(jnp.zeros((n_bins, len(EQ_FREQS)), jnp.float32), e_direct)
    u_direct = jnp.where(d_direct < 1e-6, 0.0, (source - listener) / jnp.maximum(d_direct, 1e-6))
    dir_sum = _bin_add(
        jnp.zeros((n_bins, 3), jnp.float32), u_direct * jnp.mean(e_direct)
    )
    sh_moments = None
    if sh_order is not None:
        from ..ops.hoa import n_sh, sh_basis

        y = jnp.where(
            d_direct < 1e-6,
            # co-located source: pure W, no directional content (matches
            # the encode fade, sound_system.zig:203-208)
            jnp.zeros(n_sh(sh_order)).at[0].set(1.0),
            sh_basis(u_direct, sh_order),
        )
        sh_moments = _bin_add(
            jnp.zeros((n_bins, n_sh(sh_order)), jnp.float32),
            y * jnp.mean(e_direct),
        ).T
    return ImpulseResponse(energy=energy.T, dir_sum=dir_sum.T, sh_moments=sh_moments)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_rays", "max_bounces", "total_rays", "include_direct",
        "intersector", "scatter", "scattering", "bih_leaf_cap",
        "material_scattering", "sh_order", "src_directivity",
        "scattering_rng", "soft_bins",
    ),
)
def trace_ir(
    scene_arrays,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    total_rays: int | None = None,
    include_direct: bool = True,
    intersector: str = "mt",
    scatter: str = "segment",
    scattering: float = 0.0,
    key=None,
    bih_arena=None,
    bih_leaf_cap: int = 8,
    material_scattering: bool = False,
    sh_order: int | None = None,
    src_directivity=None,
    src_axis=None,
    scattering_rng: str = "threefry",
    rng_seed: int = 0,
    soft_bins: bool = False,
) -> ImpulseResponse:
    """Trace one source -> listener impulse response.

    source, listener: (3,). dirs: optional (n_rays, 3) unit ray directions
    (defaults to a fibonacci sphere). Returns histograms of shape
    (n_bands, cfg.ir_n_bins).

    total_rays / include_direct exist for the sharded path
    (parallel/sharding.py): each device traces its ray shard normalized by
    the *global* ray count, with the direct term added on one device only.

    intersector: "mt" (exact Möller–Trumbore, VPU) or "mxu" (Woop-transform
    matmuls on the systolic array — the fast path, see
    ops/intersect.nearest_hit_mxu). scatter: "segment" (exact scatter-add)
    or "matmul" (MXU one-hot binning, ops/histogram.py).

    scattering in [0, 1] selects the second acoustic model family: each
    bounce continues specularly with probability 1-scattering and as a
    cosine-weighted diffuse scatter about the surface normal otherwise
    (the standard stochastic room-acoustics hybrid; the reference is purely
    specular). Requires `key` (jax PRNG) when > 0; results are
    deterministic per key.

    material_scattering=True reads the diffuse probability per hit surface
    from scene_arrays.scattering (models/materials.py) instead of the
    global `scattering` constant; also requires `key`.

    sh_order (0-5) additionally accumulates energy-weighted spherical-
    harmonic moments of the arrival directions per bin (ops/hoa.py,
    ACN/N3D) into ImpulseResponse.sh_moments — the higher-order
    generalization of dir_sum for HOA rendering (ambisonic_ir_hoa).

    src_directivity (models/directivity.py, static): per-band radiation
    gains applied to each ray's initial amplitude (its emission
    direction) and to the direct term — a cardioid voice excites the
    room mostly forward. src_axis: optional DYNAMIC (3,) emission axis
    overriding the pattern's static one (rotating sources re-dispatch,
    not re-compile).

    scattering_rng: "threefry" (default; requires `key`) or "hash" —
    the counter-based hash RNG (ops/hashrng.py) seeded by rng_seed
    (dynamic here: seed sweeps re-dispatch without recompiling), whose
    draws are BIT-IDENTICAL to the fused Pallas kernel's in-kernel
    sampling (same counter layout: ((ray * max_bounces + bounce) * 3 +
    draw) offset by hash(seed)); `key` is then unused. Counters are
    LOCAL ray indices — when sharding rays across devices, shards must
    draw from distinct seeds. parallel/sharding.trace_ir_sharded does
    this automatically (rng_seed * n_shards + axis_index, or
    jax.random.fold_in for threefry); only hand-rolled shard_maps need
    to fold the shard id in themselves.

    soft_bins=True splits each arrival linearly between its two
    neighboring bins instead of rounding to the nearest (reference
    semantics, integer delay bins) — a DIVERGENCE kept off by default:
    it makes the histogram piecewise-linear (C0) in the path distances,
    so arrival TIMING carries usable reverse-mode gradients
    (models/inverse.py fits source positions through it); it also
    removes the half-bin quantization jitter. Total energy is conserved
    exactly (the two weights sum to 1).
    """
    if src_axis is not None and src_directivity is None:
        raise ValueError("src_axis requires src_directivity")
    if scattering_rng not in ("threefry", "hash"):
        raise ValueError(
            f'scattering_rng must be "threefry" or "hash", got '
            f"{scattering_rng!r}"
        )
    v0, v1, v2 = scene_arrays.v0, scene_arrays.v1, scene_arrays.v2
    normals, absorption = scene_arrays.normals, scene_arrays.absorption

    # per-band transmission through occluders (models/materials.py): the
    # shadow test becomes exp(crossings @ 0.5*log tau) — an MXU matmul —
    # instead of a hard any-hit block. Path rays still always reflect;
    # only shadow/occlusion segments pass through surfaces.
    log_amp = None
    if scene_arrays.transmission is not None:
        if intersector == "bih":
            raise ValueError(
                "surface transmission needs every occluder along the "
                'shadow segment; the "bih" nearest-hit traversal cannot '
                'enumerate them — use intersector="mt" or "mxu"'
            )
        log_amp = _transmission_log_amp(scene_arrays.transmission)

    if intersector == "mxu":
        hit_fn = lambda o, d: nearest_hit_mxu(  # noqa: E731
            o, d, scene_arrays.woop_d, scene_arrays.woop_o
        )
        # shadow test reversed (origin = listener, constant): the
        # per-triangle transformed origin is a single precomputed row, so
        # only the direction matmul materializes — halves shadow cost
        T3 = scene_arrays.woop_o.shape[1]
        opl_row = jnp.dot(
            jnp.concatenate([listener, jnp.ones(1)]),
            scene_arrays.woop_o,
            precision=jax.lax.Precision.HIGH,
        )  # (3T,)

        def _shadow_ok(vertex):
            w = vertex - listener[None, :]  # unnormalized: t in segment units
            dp = jnp.dot(w, scene_arrays.woop_d, precision=jax.lax.Precision.HIGH)
            T = T3 // 3
            ox, oy, oz = opl_row[:T], opl_row[T : 2 * T], opl_row[2 * T :]
            dx_, dy_, dz_ = dp[:, :T], dp[:, T : 2 * T], dp[:, 2 * T :]
            t = -oz / dz_
            u = ox + t * dx_
            vv = oy + t * dy_
            return (
                (jnp.abs(dz_) > 1e-12)
                & (u >= 0.0)
                & (vv >= 0.0)
                & (u + vv <= 1.0)
                & (t >= 1e-6)
                & (t <= 1.0)
            )  # (R, T)

        def shadow_blocked(vertex):
            return jnp.any(_shadow_ok(vertex), axis=1)

        shadow_cross = lambda vertex: _shadow_ok(vertex).astype(jnp.float32)  # noqa: E731
    elif intersector == "bih":
        # large-scene path: BIH traversal (ops/traverse.py); pass
        # bih_arena=scene.device_bih()
        if bih_arena is None:
            raise ValueError('intersector="bih" requires bih_arena')
        from ..ops.traverse import nearest_hit_bih

        hit_fn = lambda o, d: nearest_hit_bih(bih_arena, o, d, bih_leaf_cap)  # noqa: E731
        shadow_blocked = shadow_cross = None
    else:
        hit_fn = lambda o, d: nearest_hit(o, d, v0, v1, v2)  # noqa: E731
        shadow_blocked = None
        shadow_cross = lambda vertex: _segment_crossings(  # noqa: E731
            vertex, listener[None, :] - vertex, v0, v1, v2
        )
    scatter_fn = bin_matmul if scatter == "matmul" else bin_segment
    n_rays = n_rays or cfg.rays_per_source
    max_bounces = max_bounces or cfg.max_bounces
    n_bins = cfg.ir_n_bins
    bps = float(cfg.ir_bins_per_sample)
    spm = cfg.samples_per_meter  # 44100 / 350

    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere(n_rays))
    else:
        n_rays = dirs.shape[0]
    org = jnp.broadcast_to(source, (n_rays, 3))

    if sh_order is not None:
        from ..ops.hoa import n_sh, sh_basis

        c_sh = n_sh(sh_order)
    if include_direct:
        d = direct_ir(
            scene_arrays, source, listener, cfg=cfg, sh_order=sh_order,
            src_directivity=src_directivity, src_axis=src_axis,
            soft_bins=soft_bins,
        )
        energy, dir_sum = d.energy.T, d.dir_sum.T
        sh_acc = d.sh_moments.T if sh_order is not None else None
    else:
        energy = jnp.zeros((n_bins, len(EQ_FREQS)), jnp.float32)
        dir_sum = jnp.zeros((n_bins, 3), jnp.float32)
        sh_acc = (
            jnp.zeros((n_bins, c_sh), jnp.float32) if sh_order is not None else None
        )

    inv_n = 1.0 / float(total_rays or n_rays)

    # triangle attributes fetched by one-hot matmul instead of row gathers:
    # TPU scatter/gather serializes, a (R, T) @ (T, 8) contraction does not
    n_bands = len(EQ_FREQS)
    scat_col = (
        scene_arrays.scattering
        if scene_arrays.scattering is not None
        else jnp.zeros(normals.shape[0], jnp.float32)
    )
    tri_attrs = jnp.concatenate(
        [
            normals,
            jnp.sqrt(jnp.clip(1.0 - absorption, 0.0, 1.0)),
            scat_col[:, None],
        ],
        axis=1,
    )  # (T, 3 + n_bands + 1)
    n_tris_padded = tri_attrs.shape[0]

    def _pow_spec(x):
        # specular exponent as repeated squaring when it is a power of two
        # (16 in the reference) — jnp.power is a transcendental on TPU
        e = cfg.specular_exponent
        if float(e).is_integer() and int(e) > 0 and (int(e) & (int(e) - 1)) == 0:
            k = int(e)
            while k > 1:
                x = x * x
                k //= 2
            return x
        return jnp.power(x, e)

    def bounce_simple(carry, b_i):
        org, d, amp, path_dist, alive = carry
        t, idx, hit = hit_fn(org, d)
        alive = alive & hit
        t_safe = jnp.where(hit, t, 0.0)
        vertex = org + d * (t_safe * cfg.backoff)[:, None]
        onehot = (jnp.arange(n_tris_padded)[None, :] == idx[:, None]).astype(jnp.float32)
        attrs = jnp.dot(onehot, tri_attrs, precision=jax.lax.Precision.HIGHEST)
        n = attrs[:, :3]
        keep_amp = attrs[:, 3 : 3 + n_bands]
        scat_prob = attrs[:, 3 + n_bands]
        n = n * jnp.sign(-jnp.sum(n * d, axis=-1, keepdims=True) + 1e-30)
        path_dist = path_dist + jnp.where(alive, t_safe, 0.0)
        amp = amp * jnp.where(alive[:, None], keep_amp, 1.0)

        to_list = listener[None, :] - vertex
        d_l = jnp.linalg.norm(to_list, axis=-1)
        w_o = to_list / jnp.maximum(d_l, 1e-20)[:, None]
        if log_amp is not None:
            # transmissive occluders: per-band amplitude product over every
            # crossed surface (blocked-by-opaque rays keep their bin but
            # contribute ~1e-30 energy — indistinguishable from dropped)
            vis_amp = jnp.where(
                alive[:, None],
                jnp.exp(jnp.dot(shadow_cross(vertex), log_amp,
                                precision=jax.lax.Precision.HIGHEST)),
                0.0,
            )
            visible = alive
        elif shadow_blocked is not None:
            visible = alive & ~shadow_blocked(vertex)
            vis_amp = jnp.where(visible, 1.0, 0.0)[:, None]
        else:
            t_sh, _, sh_hit = hit_fn(vertex, w_o)
            visible = alive & (~sh_hit | (t_sh >= d_l))
            vis_amp = jnp.where(visible, 1.0, 0.0)[:, None]
        h = w_o - d
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
        lam = jnp.abs(jnp.sum(n * w_o, axis=-1)) + _pow_spec(
            jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
        )
        d_total = path_dist + d_l
        amp_c = (
            amp
            * vis_amp
            * (lam / (d_total + 1.0))[:, None]
            * _air_amplitude(d_total, cfg)
        )
        e_c = amp_c * amp_c * inv_n
        u = (vertex - listener[None, :]) / jnp.maximum(d_l, 1e-20)[:, None]
        # energy (4 bands) + energy-weighted direction (3) [+ SH moments]
        # in ONE scatter
        e_mean = jnp.mean(e_c, axis=-1, keepdims=True)
        cols = [e_c, u * e_mean]
        if sh_order is not None:
            cols.append(sh_basis(u, sh_order) * e_mean)
        payload = jnp.concatenate(cols, axis=-1)  # (R, 7 [+ n_sh])
        if soft_bins:
            # linear split between the two neighboring bins: C0 in
            # d_total, so timing gradients flow (see docstring)
            p = jnp.clip(d_total * spm * bps, 0.0, float(n_bins - 1))
            b0 = jnp.floor(p)
            w1 = (p - b0)[:, None]  # grad d(w1)/d(p) = 1 (floor is const)
            b0i = jnp.where(visible, b0, n_bins).astype(jnp.int32)
            b1i = jnp.where(
                visible, jnp.minimum(b0 + 1.0, float(n_bins - 1)), n_bins
            ).astype(jnp.int32)
            seg = scatter_fn(payload * (1.0 - w1), b0i, n_bins) + scatter_fn(
                payload * w1, b1i, n_bins
            )
        else:
            bins = jnp.where(visible, jnp.clip((d_total * spm * bps + 0.5), 0, n_bins - 1), n_bins)
            seg = scatter_fn(payload, bins.astype(jnp.int32), n_bins)

        d_new = reflect(d, n)
        if scattering > 0.0 or material_scattering:
            if scattering_rng == "hash":
                from ..ops.hashrng import hash_u32, uniform01

                base = hash_u32(jnp.int32(rng_seed))
                idx3 = (
                    jnp.arange(d.shape[0], dtype=jnp.int32) * max_bounces
                    + b_i.astype(jnp.int32)
                ) * 3
                u_sel = uniform01(base + idx3)
                u1 = uniform01(base + idx3 + 1)
                u2 = uniform01(base + idx3 + 2)
            else:
                kb = jax.random.fold_in(key, b_i)
                ku, kd1, kd2 = jax.random.split(kb, 3)
                # cosine-weighted hemisphere sample about n
                u1 = jax.random.uniform(kd1, (d.shape[0],))
                u2 = jax.random.uniform(kd2, (d.shape[0],))
                u_sel = jax.random.uniform(ku, (d.shape[0],))
            r = jnp.sqrt(u1)
            phi = 2.0 * jnp.pi * u2
            z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
            # tangent frame from n (branchless)
            helper = jnp.where(
                jnp.abs(n[:, 2:3]) < 0.9,
                jnp.float32([0.0, 0.0, 1.0]),
                jnp.float32([1.0, 0.0, 0.0]),
            )
            tx = jnp.cross(helper, n)
            tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-20)
            ty = jnp.cross(n, tx)
            d_diff = (
                tx * (r * jnp.cos(phi))[:, None]
                + ty * (r * jnp.sin(phi))[:, None]
                + n * z[:, None]
            )
            prob = scat_prob if material_scattering else scattering
            use_diff = u_sel < prob
            d_new = jnp.where(use_diff[:, None], d_diff, d_new)
        return (vertex, jnp.where(alive[:, None], d_new, d), amp, path_dist, alive), seg

    if src_directivity is not None:
        from .directivity import directivity_gain

        amp0 = directivity_gain(dirs, src_directivity, axis=src_axis)
    else:
        amp0 = jnp.ones((n_rays, len(EQ_FREQS)), jnp.float32)
    carry0 = (org, dirs, amp0, jnp.zeros(n_rays), jnp.ones(n_rays, bool))
    if (
        (scattering > 0.0 or material_scattering)
        and key is None
        and scattering_rng != "hash"
    ):
        raise ValueError(
            'scattering requires a PRNG key (or scattering_rng="hash")'
        )
    _, seg_all = jax.lax.scan(
        bounce_simple, carry0, jnp.arange(max_bounces), length=max_bounces
    )
    seg = jnp.sum(seg_all, axis=0)  # (n_bins, 7 [+ n_sh])
    energy = energy + seg[:, :4]
    dir_sum = dir_sum + seg[:, 4:7]
    if sh_order is not None:
        sh_acc = sh_acc + seg[:, 7:]
        return ImpulseResponse(
            energy=energy.T, dir_sum=dir_sum.T, sh_moments=sh_acc.T
        )
    return ImpulseResponse(energy=energy.T, dir_sum=dir_sum.T)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_rays", "max_bounces", "total_rays", "include_direct",
        "intersector", "scatter", "src_directivity", "sh_order",
    ),
)
def trace_ir_multi_listener(
    scene_arrays,
    source,
    listeners,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    dirs=None,
    total_rays: int | None = None,
    include_direct: bool = True,
    intersector: str = "mt",
    scatter: str = "segment",
    src_directivity=None,
    sh_order: int | None = None,
) -> ImpulseResponse:
    """All listeners' IRs from ONE shared path trace.

    listeners: (L, 3). The bounce path (nearest hit, reflection, surface
    absorption) is listener-independent, so it is traced once; only the
    next-event estimation — shadow ray, reflection strength, delay binning
    — runs per listener (vmapped). For L listeners this costs ~one path
    pass + L NEE passes instead of L full traces. Returns stacked
    ImpulseResponse with leading axis L: energy (L, n_bands, n_bins),
    dir_sum (L, 3, n_bins), and with sh_order=N also sh_moments
    (L, n_sh, n_bins) — exactly trace_ir's energy-weighted SH payload
    per listener, so HOA (sh_order) streams can be served by the
    batched coordinator (engine/serving.py) instead of needing solo
    AsyncAcoustics workers.

    Semantics per listener are exactly trace_ir's (same formulas, forward
    shadow rays); differentially tested against per-listener trace_ir.
    """
    v0, v1, v2 = scene_arrays.v0, scene_arrays.v1, scene_arrays.v2
    normals, absorption = scene_arrays.normals, scene_arrays.absorption
    log_amp = None
    if scene_arrays.transmission is not None:
        log_amp = _transmission_log_amp(scene_arrays.transmission)
    if intersector == "mxu":
        hit_fn = lambda o, d: nearest_hit_mxu(  # noqa: E731
            o, d, scene_arrays.woop_d, scene_arrays.woop_o
        )
    elif intersector == "mt":
        hit_fn = lambda o, d: nearest_hit(o, d, v0, v1, v2)  # noqa: E731
    else:
        raise ValueError(f"multi-listener supports mt/mxu, got {intersector}")
    scatter_fn = bin_matmul if scatter == "matmul" else bin_segment
    n_rays = n_rays or cfg.rays_per_source
    max_bounces = max_bounces or cfg.max_bounces
    n_bins = cfg.ir_n_bins
    bps = float(cfg.ir_bins_per_sample)
    spm = cfg.samples_per_meter
    listeners = jnp.asarray(listeners, jnp.float32)

    if dirs is None:
        dirs = jnp.asarray(fibonacci_sphere(n_rays))
    else:
        n_rays = dirs.shape[0]
    org = jnp.broadcast_to(source, (n_rays, 3))
    inv_n = 1.0 / float(total_rays or n_rays)

    n_bands = len(EQ_FREQS)
    if sh_order is not None:
        from ..ops.hoa import sh_basis

    tri_attrs = jnp.concatenate(
        [normals, jnp.sqrt(jnp.clip(1.0 - absorption, 0.0, 1.0))], axis=1
    )
    n_tris_padded = tri_attrs.shape[0]

    def _pow_spec(x):
        e = cfg.specular_exponent
        if float(e).is_integer() and int(e) > 0 and (int(e) & (int(e) - 1)) == 0:
            k = int(e)
            while k > 1:
                x = x * x
                k //= 2
            return x
        return jnp.power(x, e)

    def nee(listener, vertex, n, d, amp, path_dist, alive):
        """Per-listener next-event estimation -> (n_bins, 7) histogram."""
        to_list = listener[None, :] - vertex
        d_l = jnp.linalg.norm(to_list, axis=-1)
        w_o = to_list / jnp.maximum(d_l, 1e-20)[:, None]
        if log_amp is not None:
            cross = _segment_crossings(vertex, to_list, v0, v1, v2)
            vis_amp = jnp.where(
                alive[:, None],
                jnp.exp(jnp.dot(cross, log_amp,
                                precision=jax.lax.Precision.HIGHEST)),
                0.0,
            )
            visible = alive
        else:
            t_sh, _, sh_hit = hit_fn(vertex, w_o)
            visible = alive & (~sh_hit | (t_sh >= d_l))
            vis_amp = jnp.where(visible, 1.0, 0.0)[:, None]
        h = w_o - d
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
        lam = jnp.abs(jnp.sum(n * w_o, axis=-1)) + _pow_spec(
            jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
        )
        d_total = path_dist + d_l
        amp_c = (
            amp
            * vis_amp
            * (lam / (d_total + 1.0))[:, None]
            * _air_amplitude(d_total, cfg)
        )
        e_c = amp_c * amp_c * inv_n
        u = (vertex - listener[None, :]) / jnp.maximum(d_l, 1e-20)[:, None]
        e_mean = jnp.mean(e_c, axis=-1, keepdims=True)
        cols = [e_c, u * e_mean]
        if sh_order is not None:
            cols.append(sh_basis(u, sh_order) * e_mean)
        payload = jnp.concatenate(cols, axis=-1)
        bins = jnp.where(
            visible, jnp.clip((d_total * spm * bps + 0.5), 0, n_bins - 1), n_bins
        )
        return scatter_fn(payload, bins.astype(jnp.int32), n_bins)

    def bounce(carry, _):
        org, d, amp, path_dist, alive = carry
        t, idx, hit = hit_fn(org, d)
        alive = alive & hit
        t_safe = jnp.where(hit, t, 0.0)
        vertex = org + d * (t_safe * cfg.backoff)[:, None]
        onehot = (jnp.arange(n_tris_padded)[None, :] == idx[:, None]).astype(jnp.float32)
        attrs = jnp.dot(onehot, tri_attrs, precision=jax.lax.Precision.HIGHEST)
        n = attrs[:, :3]
        keep_amp = attrs[:, 3 : 3 + n_bands]
        n = n * jnp.sign(-jnp.sum(n * d, axis=-1, keepdims=True) + 1e-30)
        path_dist = path_dist + jnp.where(alive, t_safe, 0.0)
        amp = amp * jnp.where(alive[:, None], keep_amp, 1.0)
        segs = jax.vmap(
            lambda l: nee(l, vertex, n, d, amp, path_dist, alive)
        )(listeners)  # (L, n_bins, 7)
        d_new = reflect(d, n)
        return (vertex, jnp.where(alive[:, None], d_new, d), amp, path_dist, alive), segs

    if src_directivity is not None:
        from .directivity import directivity_gain

        amp0 = directivity_gain(dirs, src_directivity)
    else:
        amp0 = jnp.ones((n_rays, n_bands), jnp.float32)
    carry0 = (org, dirs, amp0, jnp.zeros(n_rays), jnp.ones(n_rays, bool))
    _, seg_all = jax.lax.scan(bounce, carry0, None, length=max_bounces)
    seg = jnp.sum(seg_all, axis=0)  # (L, n_bins, 7 [+ n_sh])
    energy = jnp.moveaxis(seg[:, :, :4], 1, 2)  # (L, 4, n_bins)
    dir_sum = jnp.moveaxis(seg[:, :, 4:7], 1, 2)
    sh_mom = (
        jnp.moveaxis(seg[:, :, 7:], 1, 2) if sh_order is not None else None
    )
    if include_direct:
        d_ir = jax.vmap(
            lambda l: direct_ir(
                scene_arrays, source, l, cfg=cfg,
                src_directivity=src_directivity, sh_order=sh_order,
            )
        )(listeners)
        energy = energy + d_ir.energy
        dir_sum = dir_sum + d_ir.dir_sum
        if sh_order is not None:
            sh_mom = sh_mom + d_ir.sh_moments
    return ImpulseResponse(energy=energy, dir_sum=dir_sum,
                           sh_moments=sh_mom)


def ambisonic_ir(ir: ImpulseResponse, eps: float = 1e-12):
    """First-order ambisonic IR (4, n_bins) from the histograms.

    W = sqrt(mean-band energy); XYZ = sqrt(3) * W * (energy-weighted mean
    arrival direction) — the N3D convention of ops/ambisonic.py, with
    ||mean dir|| < 1 naturally encoding diffuseness.
    """
    e_mean = jnp.mean(ir.energy, axis=0)  # (n_bins,)
    w = jnp.sqrt(e_mean)
    mean_dir = ir.dir_sum / jnp.maximum(e_mean, eps)[None, :]
    norm = jnp.linalg.norm(mean_dir, axis=0)
    mean_dir = mean_dir * jnp.where(norm > 1.0, 1.0 / jnp.maximum(norm, eps), 1.0)
    xyz = np.sqrt(3.0) * w[None, :] * mean_dir
    return jnp.concatenate([w[None, :], xyz], axis=0)


def ambisonic_ir_hoa(ir: ImpulseResponse, eps: float = 1e-12):
    """Order-N ambisonic IR (n_sh, n_bins) from traced SH moments.

    amb_c = moment_c / sqrt(e_mean): channel 0 reduces to sqrt(e_mean)
    (= ambisonic_ir's W, since moment_0 accumulates e_mean itself) and the
    order-1 block reduces to ambisonic_ir's XYZ (without the unit-norm
    clamp — SH moments of a distribution are naturally bounded). Requires
    trace_ir(..., sh_order=N)."""
    if ir.sh_moments is None:
        raise ValueError("trace with sh_order=N to populate sh_moments")
    e_mean = jnp.mean(ir.energy, axis=0)  # (n_bins,)
    scale = jnp.where(e_mean > eps, 1.0 / jnp.sqrt(jnp.maximum(e_mean, eps)), 0.0)
    return ir.sh_moments * scale[None, :]


def band_irs(ir: ImpulseResponse):
    """Per-band amplitude IRs (n_bands, n_bins) = sqrt(energy)."""
    return jnp.sqrt(ir.energy)
