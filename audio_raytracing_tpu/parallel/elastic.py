"""Multi-slice meshes + preemptible checkpoint/resume for long traces.

Two production concerns the reference (a single-process demo, SURVEY.md
§2.6/§5) never had:

  * **Multi-slice scaling** — a ("dcn", "rays") mesh: rays shard over every
    chip of every slice; the histogram allreduce is explicitly
    hierarchical — `psum` over "rays" first (intra-slice ICI, cheap) and
    over "dcn" second (inter-slice data-center network, one (n_bands,
    n_bins) tensor per slice instead of per chip). On a single slice the
    "dcn" axis is just another ICI dimension; the code is identical.

  * **Checkpoint/resume** — Monte-Carlo tracing is trivially chunkable:
    the ray set splits into deterministic chunks whose histograms sum to
    the full result. trace_ir_checkpointed accumulates chunk by chunk and
    atomically persists the partial histogram + cursor to an .npz after
    each chunk, so a preempted job resumes where it stopped (the
    checkpoint validates that scene/pose/shape parameters match).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Config, DEFAULT_CONFIG
from ..models.ir import ImpulseResponse, direct_ir, fibonacci_sphere, trace_ir
from .mesh import make_mesh


def dcn_ray_mesh(n_devices: int | None = None, n_slices: int = 2) -> Mesh:
    """("dcn", "rays") mesh: n_slices along the cross-slice axis."""
    n = n_devices or len(jax.devices())
    assert n % n_slices == 0, (n, n_slices)
    return make_mesh(n, ("dcn", "rays"), (n_slices, n // n_slices))


def trace_ir_multislice(
    scene_arrays,
    source,
    listener,
    mesh: Mesh,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
) -> ImpulseResponse:
    """Single-source trace over a ("dcn", "rays") mesh with hierarchical
    histogram reduction (ICI within a slice, DCN across slices)."""
    n_rays = n_rays or cfg.rays_per_source
    n_shards = mesh.shape["dcn"] * mesh.shape["rays"]
    assert n_rays % n_shards == 0, (n_rays, n_shards)
    dirs = jnp.asarray(fibonacci_sphere(n_rays))

    def shard_fn(dirs_local, source, listener, scene_local):
        lead = (
            (jax.lax.axis_index("rays") == 0)
            & (jax.lax.axis_index("dcn") == 0)
        ).astype(jnp.float32)
        ir = trace_ir(
            scene_local, source, listener, cfg=cfg, max_bounces=max_bounces,
            dirs=dirs_local, total_rays=n_rays, include_direct=False,
        )
        d = direct_ir(scene_local, source, listener, cfg=cfg)
        e = ir.energy + d.energy * lead
        ds = ir.dir_sum + d.dir_sum * lead
        # hierarchical allreduce: intra-slice first, one tensor per slice
        # crosses the DCN
        e = jax.lax.psum(jax.lax.psum(e, "rays"), "dcn")
        ds = jax.lax.psum(jax.lax.psum(ds, "rays"), "dcn")
        return ImpulseResponse(energy=e, dir_sum=ds)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(("dcn", "rays")), P(), P(), P()),
        out_specs=ImpulseResponse(energy=P(), dir_sum=P()),
        check_vma=False,
    )
    return fn(dirs, jnp.asarray(source), jnp.asarray(listener), scene_arrays)


def _ckpt_meta(scene_arrays, source, listener, n_rays, n_chunks,
               max_bounces, intersector: str, cfg: Config) -> str:
    """Digest of EVERYTHING the chunk histograms depend on — a checkpoint
    written under different physics (other scene, bounce count,
    intersector, pose, binning) must be rejected, not summed into."""
    import hashlib

    h = hashlib.sha256()
    for a in (scene_arrays.v0, scene_arrays.normals, scene_arrays.absorption):
        h.update(np.asarray(a).tobytes())
    h.update(np.asarray(source, np.float64).tobytes())
    h.update(np.asarray(listener, np.float64).tobytes())
    h.update(
        f"{n_rays}|{n_chunks}|{max_bounces}|{intersector}|{cfg.ir_n_bins}|"
        f"{cfg.ir_bins_per_sample}|{cfg.air_absorption}|"
        f"{cfg.specular_exponent}".encode()
    )
    return h.hexdigest()


def trace_ir_checkpointed(
    scene_arrays,
    source,
    listener,
    ckpt_path,
    n_chunks: int = 8,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    intersector: str = "mt",
    cleanup: bool = True,
    _trace_fn=None,
) -> ImpulseResponse:
    """Chunked trace with atomic partial-histogram checkpoints.

    Splits the deterministic ray set into n_chunks contiguous chunks and
    accumulates their histograms; after each chunk the partial result +
    cursor is written to ckpt_path (tmp-file + rename, so a kill mid-write
    never corrupts it). Re-invoking with the same arguments resumes after
    the last completed chunk; a checkpoint from different arguments is
    rejected. On completion the checkpoint is deleted unless cleanup=False.

    _trace_fn: test seam — replaces models.ir.trace_ir (same signature
    subset)."""
    n_rays = n_rays or cfg.rays_per_source
    assert n_rays % n_chunks == 0, (n_rays, n_chunks)
    if _trace_fn is not None:
        trace = _trace_fn
    elif intersector == "pallas":
        # preemptible tracing on the fused kernel (auto-wavefront on big
        # scenes): each chunk is one kernel dispatch over its 1024-ray
        # tiles; the same atomic checkpoint/resume protocol applies
        from ..ops.pallas_trace import trace_ir_pallas

        def trace(scene_arrays, src, lst, cfg, max_bounces, dirs,
                  total_rays, include_direct, intersector):
            return trace_ir_pallas(
                scene_arrays, src, lst, cfg=cfg, max_bounces=max_bounces,
                dirs=dirs, total_rays=total_rays,
                include_direct=include_direct, fused_hist=True,
            )
    else:
        trace = trace_ir
    ckpt_path = Path(ckpt_path)
    if intersector == "pallas":
        # octant-coherent order (the kernel's row bundles / sg_cull);
        # contiguous chunks stay coherent. Chunks must tile by 1024.
        from ..models.ir import fibonacci_sphere_sorted

        assert (n_rays // n_chunks) % 1024 == 0, (
            "pallas chunks must be multiples of 1024 rays",
            n_rays, n_chunks,
        )
        dirs = fibonacci_sphere_sorted(n_rays)
    else:
        dirs = fibonacci_sphere(n_rays)
    chunk = n_rays // n_chunks
    meta = _ckpt_meta(scene_arrays, source, listener, n_rays, n_chunks,
                      max_bounces, intersector, cfg)

    start = 0
    energy = np.zeros((cfg.n_bands, cfg.ir_n_bins), np.float32)
    dir_sum = np.zeros((3, cfg.ir_n_bins), np.float32)
    if ckpt_path.exists():
        blob = np.load(ckpt_path)
        if str(blob["meta"]) != meta:
            raise ValueError(
                f"checkpoint {ckpt_path} was written by a different trace "
                "(scene/pose/rays/chunks/bounces/intersector/bins mismatch)"
            )
        start = int(blob["next_chunk"])
        energy = blob["energy"]
        dir_sum = blob["dir_sum"]

    for i in range(start, n_chunks):
        ir = trace(
            scene_arrays,
            jnp.asarray(source, jnp.float32),
            jnp.asarray(listener, jnp.float32),
            cfg=cfg,
            max_bounces=max_bounces,
            dirs=jnp.asarray(dirs[i * chunk : (i + 1) * chunk]),
            total_rays=n_rays,
            include_direct=(i == 0),  # the deterministic term, once
            intersector=intersector,
        )
        energy = energy + np.asarray(ir.energy)
        dir_sum = dir_sum + np.asarray(ir.dir_sum)
        tmp = ckpt_path.with_suffix(ckpt_path.suffix + ".tmp")
        with open(tmp, "wb") as f:  # handle: savez won't append ".npz"
            np.savez(f, meta=meta, next_chunk=i + 1, energy=energy, dir_sum=dir_sum)
        os.replace(tmp, ckpt_path)

    if cleanup and ckpt_path.exists():
        ckpt_path.unlink()
    return ImpulseResponse(energy=jnp.asarray(energy), dir_sum=jnp.asarray(dir_sum))
