"""Multi-chip ray sharding + IR-histogram collectives.

BASELINE config 5: "rays sharded across chips with ICI-allreduced IR
histograms". Implementation is the canonical JAX recipe (no custom
transport — XLA inserts the collectives):

  * geometry (the triangle arena) is replicated into every chip's HBM;
  * the ray wavefront (fibonacci directions) is sharded over the mesh's
    "rays" axis; each chip runs the same trace_ir kernel on its shard,
    normalized by the *global* ray count;
  * the per-chip delay x band histograms are `jax.lax.psum`-ed over the
    "rays" axis — a dense (n_bands, n_bins) allreduce that rides ICI;
  * with a 2-D ("sources", "rays") mesh, sources split across the first
    axis (no collective — each source's IR lives on its subgrid) and rays
    across the second;
  * the single deterministic direct-path term (models/ir.direct_ir) is
    added on the rays-axis leader only so the allreduce doesn't multiply
    it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config, DEFAULT_CONFIG
from ..models.ir import ImpulseResponse, direct_ir, fibonacci_sphere, trace_ir


def _bounces_plus_leader_direct(scene_local, src, listener, dirs_local, cfg,
                                max_bounces, total_rays,
                                src_directivity=None, **stochastic):
    lead = (jax.lax.axis_index("rays") == 0).astype(jnp.float32)
    ir = trace_ir(
        scene_local, src, listener, cfg=cfg, max_bounces=max_bounces,
        dirs=dirs_local, total_rays=total_rays, include_direct=False,
        src_directivity=src_directivity, **stochastic,
    )
    d = direct_ir(scene_local, src, listener, cfg=cfg,
                  src_directivity=src_directivity)
    return ImpulseResponse(
        energy=ir.energy + d.energy * lead,
        dir_sum=ir.dir_sum + d.dir_sum * lead,
    )


def trace_ir_sharded(
    scene_arrays,
    source,
    listener,
    mesh: Mesh,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    src_directivity=None,
    scattering: float = 0.0,
    material_scattering: bool = False,
    scattering_rng: str = "threefry",
    rng_seed: int = 0,
    key=None,
    intersector: str = "xla",
    flat_bands: bool = False,
    wavefront: bool | None = None,
    pallas_interpret: bool = False,
) -> ImpulseResponse:
    """Single-source trace with rays sharded over mesh axis "rays".

    intersector="pallas" runs each shard's bounce loop on the fused
    Pallas kernel (ops/pallas_trace.py) instead of the XLA tracer — the
    production fast path, now multi-chip: geometry replicated, each
    chip's kernel traces its dirs slice normalized by the global ray
    count, histograms psum over ICI. flat_bands / wavefront forward to
    trace_ir_pallas (wavefront = per-bounce re-sorting, large scenes).
    Stochastic scattering works with scattering_rng="hash" only (threefry
    keys cannot enter a Mosaic kernel): the kernel's seed is a traced
    operand, so the same rng_seed * n_shards + axis_index fold as the
    XLA path decorrelates shards with one compiled kernel.

    src_directivity (models/directivity.py): the source's radiation
    pattern — a static, so every shard traces with the same weighting and
    no extra communication is needed. Scene transmission tables ride the
    replicated scene pytree the same way.

    Stochastic scattering decorrelates across shards AUTOMATICALLY
    (VERDICT r1 item 6 — the counter-hash RNG's counters are LOCAL ray
    indices, so identical seeds on every shard would trace n_shards
    copies of the same random streams): the hash path folds the shard
    index into the seed as `rng_seed * n_shards + axis_index("rays")`
    (bijective over (seed, shard) — ensemble seed sweeps never collide
    across shards), and the threefry path folds it into the key via
    `jax.random.fold_in`. Shard i's stream equals a single-device
    trace of that shard's dirs slice with seed
    `rng_seed * n_shards + i` (tested in test_sharding.py)."""
    n_rays = n_rays or cfg.rays_per_source
    n_shards = mesh.shape["rays"]
    assert n_rays % n_shards == 0, (n_rays, n_shards)
    stochastic_on = scattering > 0.0 or material_scattering
    if intersector == "pallas":
        if stochastic_on and scattering_rng != "hash":
            raise ValueError(
                'intersector="pallas" scattering uses the counter-hash '
                'rng; pass scattering_rng="hash" (threefry keys cannot '
                "enter a Mosaic kernel)"
            )
        from ..models.ir import fibonacci_sphere_sorted
        from ..ops.pallas_trace import trace_ir_pallas

        # sorted order: the kernel's row bundles / sg_cull want octant-
        # coherent tiles; each shard gets a contiguous (already coherent)
        # slice of the global order
        dirs = jnp.asarray(fibonacci_sphere_sorted(n_rays))

        def shard_fn_pallas(dirs_local, source, listener, scene_local):
            lead = (jax.lax.axis_index("rays") == 0).astype(jnp.float32)
            stoch = {}
            if stochastic_on:
                # same per-shard fold as the XLA path (the kernel's seed
                # is a traced operand since the scalars[10:12] change, so
                # axis_index composes with one compiled kernel)
                stoch = dict(
                    scattering=scattering,
                    material_scattering=material_scattering,
                    rng_seed=(
                        jnp.asarray(rng_seed, jnp.int32) * n_shards
                        + jax.lax.axis_index("rays")
                    ),
                )
            ir = trace_ir_pallas(
                scene_local, source, listener, cfg=cfg,
                max_bounces=max_bounces, dirs=dirs_local,
                total_rays=n_rays, include_direct=False, fused_hist=True,
                flat_bands=flat_bands, wavefront=wavefront,
                src_directivity=src_directivity,
                interpret=pallas_interpret, **stoch,
            )
            d = direct_ir(scene_local, source, listener, cfg=cfg,
                          src_directivity=src_directivity)
            return ImpulseResponse(
                energy=jax.lax.psum(ir.energy + d.energy * lead, "rays"),
                dir_sum=jax.lax.psum(ir.dir_sum + d.dir_sum * lead, "rays"),
            )

        fn = jax.shard_map(
            shard_fn_pallas,
            mesh=mesh,
            in_specs=(P("rays"), P(), P(), P()),
            out_specs=ImpulseResponse(energy=P(), dir_sum=P()),
            check_vma=False,
        )
        return fn(dirs, jnp.asarray(source), jnp.asarray(listener),
                  scene_arrays)
    elif intersector != "xla":
        raise ValueError(f"unknown intersector {intersector!r}")
    dirs = jnp.asarray(fibonacci_sphere(n_rays))

    def shard_fn(dirs_local, source, listener, scene_local):
        stoch = {}
        if stochastic_on:
            idx = jax.lax.axis_index("rays")
            stoch = dict(
                scattering=scattering,
                material_scattering=material_scattering,
                scattering_rng=scattering_rng,
            )
            if scattering_rng == "hash":
                stoch["rng_seed"] = (
                    jnp.asarray(rng_seed, jnp.int32) * n_shards + idx
                )
            else:
                stoch["key"] = jax.random.fold_in(key, idx)
        ir = _bounces_plus_leader_direct(
            scene_local, source, listener, dirs_local, cfg, max_bounces,
            n_rays, src_directivity, **stoch,
        )
        return ImpulseResponse(
            energy=jax.lax.psum(ir.energy, "rays"),
            dir_sum=jax.lax.psum(ir.dir_sum, "rays"),
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("rays"), P(), P(), P()),
        out_specs=ImpulseResponse(energy=P(), dir_sum=P()),
        check_vma=False,
    )
    return fn(dirs, jnp.asarray(source), jnp.asarray(listener), scene_arrays)


def trace_irs_multi_listener_sharded(
    scene_arrays,
    source,
    listeners,
    mesh: Mesh,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
) -> ImpulseResponse:
    """Multi-listener trace over a ("listeners", "rays") mesh.

    listeners: (L, 3) with L divisible by the listeners axis. Each listener
    subgrid runs the shared-path tracer (models.ir.trace_ir_multi_listener:
    ONE path trace per ray shard, per-listener NEE) on its ray shard; the
    per-listener histograms psum over "rays". Returns stacked IRs
    (L, n_bands/3, n_bins) sharded over "listeners"."""
    n_rays = n_rays or cfg.rays_per_source
    l_shards = mesh.shape["listeners"]
    r_shards = mesh.shape["rays"]
    L = listeners.shape[0]
    assert L % l_shards == 0, (L, l_shards)
    assert n_rays % r_shards == 0, (n_rays, r_shards)
    dirs = jnp.asarray(fibonacci_sphere(n_rays))

    def shard_fn(listeners_local, dirs_local, source, scene_local):
        from ..models.ir import trace_ir_multi_listener

        lead = (jax.lax.axis_index("rays") == 0).astype(jnp.float32)
        ir = trace_ir_multi_listener(
            scene_local, source, listeners_local, cfg=cfg,
            max_bounces=max_bounces, dirs=dirs_local, total_rays=n_rays,
            include_direct=False,
        )
        d = jax.vmap(
            lambda l: direct_ir(scene_local, source, l, cfg=cfg)
        )(listeners_local)
        return ImpulseResponse(
            energy=jax.lax.psum(ir.energy + d.energy * lead, "rays"),
            dir_sum=jax.lax.psum(ir.dir_sum + d.dir_sum * lead, "rays"),
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("listeners"), P("rays"), P(), P()),
        out_specs=ImpulseResponse(energy=P("listeners"), dir_sum=P("listeners")),
        check_vma=False,
    )
    return fn(jnp.asarray(listeners), dirs, jnp.asarray(source), scene_arrays)


def trace_irs_multi_source(
    scene_arrays,
    sources,
    listener,
    mesh: Mesh,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
) -> ImpulseResponse:
    """Multi-source trace over a ("sources", "rays") mesh.

    sources: (S, 3) with S divisible by the sources axis. Returns stacked
    IRs (S, n_bands, n_bins) / (S, 3, n_bins), sharded over "sources".
    """
    n_rays = n_rays or cfg.rays_per_source
    s_shards = mesh.shape["sources"]
    r_shards = mesh.shape["rays"]
    S = sources.shape[0]
    assert S % s_shards == 0, (S, s_shards)
    assert n_rays % r_shards == 0, (n_rays, r_shards)
    dirs = jnp.asarray(fibonacci_sphere(n_rays))

    def shard_fn(sources_local, dirs_local, listener, scene_local):
        def one(src):
            return _bounces_plus_leader_direct(
                scene_local, src, listener, dirs_local, cfg, max_bounces, n_rays
            )

        irs = jax.vmap(one)(sources_local)
        return ImpulseResponse(
            energy=jax.lax.psum(irs.energy, "rays"),
            dir_sum=jax.lax.psum(irs.dir_sum, "rays"),
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("sources"), P("rays"), P(), P()),
        out_specs=ImpulseResponse(energy=P("sources"), dir_sum=P("sources")),
        check_vma=False,
    )
    return fn(jnp.asarray(sources), dirs, jnp.asarray(listener), scene_arrays)


def trace_irs_multi_source_multi_listener(
    scene_arrays,
    sources,
    listeners,
    mesh: Mesh,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
) -> ImpulseResponse:
    """Combined fan-out over a 3-axis ("sources", "listeners", "rays") mesh.

    sources (S, 3) split over "sources", listeners (L, 3) over
    "listeners", the ray wavefront over "rays"; each (source-, listener-)
    subgrid runs the shared-path tracer (one path trace per ray shard,
    per-listener NEE) and the histograms psum over "rays" only — source
    and listener axes never communicate. Returns IRs stacked (S, L, ...)
    and sharded P("sources", "listeners")."""
    n_rays = n_rays or cfg.rays_per_source
    s_shards = mesh.shape["sources"]
    l_shards = mesh.shape["listeners"]
    r_shards = mesh.shape["rays"]
    S = sources.shape[0]
    L = listeners.shape[0]
    assert S % s_shards == 0, (S, s_shards)
    assert L % l_shards == 0, (L, l_shards)
    assert n_rays % r_shards == 0, (n_rays, r_shards)
    dirs = jnp.asarray(fibonacci_sphere(n_rays))

    def shard_fn(sources_local, listeners_local, dirs_local, scene_local):
        from ..models.ir import trace_ir_multi_listener

        lead = (jax.lax.axis_index("rays") == 0).astype(jnp.float32)

        def one(src):
            ir = trace_ir_multi_listener(
                scene_local, src, listeners_local, cfg=cfg,
                max_bounces=max_bounces, dirs=dirs_local, total_rays=n_rays,
                include_direct=False,
            )
            d = jax.vmap(
                lambda l: direct_ir(scene_local, src, l, cfg=cfg)
            )(listeners_local)
            return ImpulseResponse(
                energy=ir.energy + d.energy * lead,
                dir_sum=ir.dir_sum + d.dir_sum * lead,
            )

        irs = jax.vmap(one)(sources_local)  # (S_loc, L_loc, ...)
        return ImpulseResponse(
            energy=jax.lax.psum(irs.energy, "rays"),
            dir_sum=jax.lax.psum(irs.dir_sum, "rays"),
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("sources"), P("listeners"), P("rays"), P()),
        out_specs=ImpulseResponse(
            energy=P("sources", "listeners"), dir_sum=P("sources", "listeners")
        ),
        check_vma=False,
    )
    return fn(
        jnp.asarray(sources), jnp.asarray(listeners), dirs, scene_arrays
    )
