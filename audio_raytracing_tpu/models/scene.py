"""Scene: triangle geometry + acceleration arena, resident on device.

The reference builds one AABB per triangle into a Builder(u32) with payload
= base vertex index (src/main.zig:390-414) and keeps the vertex soup on the
host for exact intersection. Here the scene is a pytree of padded, static-
shape device arrays (v0/v1/v2/normals, per-band absorption) uploaded to HBM
once; every tracing op consumes it directly. Padding triangles are
degenerate (zeros) so they can never be hit (det==0 fails the eps test in
ops/intersect.py), keeping shapes jit-stable across scenes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..utils.obj import ObjMesh, load_obj
from .bih import BIHArena, build_bih


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class SceneArrays(NamedTuple):
    """Device-resident scene pytree (all padded to the triangle_pad).

    woop_d/woop_o are the per-triangle world->unit-triangle transforms
    laid out for MXU intersection (ops/intersect.nearest_hit_mxu): columns
    grouped [x'(T) | y'(T) | z'(T)] so the (R, 3T) matmul output slices
    into contiguous (R, T) component blocks. Padded triangles have
    all-zero columns and woop_o offsets (-1, -1, -1), which fail every
    validity test.
    """

    v0: object
    v1: object
    v2: object
    normals: object
    absorption: object
    woop_d: object  # (3, 3T) f32: d' = dirs @ woop_d
    woop_o: object  # (4, 3T) f32: o' = [origins, 1] @ woop_o
    scattering: object = None  # (T,) f32 per-surface diffuse probability
    transmission: object = None  # (T, n_bands) f32 energy through occluders


def woop_transforms(tris: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-triangle affine transforms into unit-triangle space.

    For triangle (a, b, c): M = inv([b-a, c-a, (b-a)x(c-a)]) (columns);
    p' = M (p - a). A hit solves o' + t d' with t = -o'_z / d'_z,
    u = o'_x + t d'_x, v = o'_y + t d'_y; valid iff u,v >= 0, u+v <= 1.
    Degenerate (padding) triangles get zero columns + offset -1.
    """
    tris = np.asarray(tris, np.float64)
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    e1, e2 = b - a, c - a
    n = np.cross(e1, e2)
    m = np.stack([e1, e2, n], axis=-1)  # (T, 3, 3) columns
    det = np.linalg.det(m)
    ok = np.abs(det) > 1e-18
    m_safe = np.where(ok[:, None, None], m, np.eye(3)[None])
    minv = np.linalg.inv(m_safe)  # (T, 3, 3): p' = minv @ (p - a)
    minv = np.where(ok[:, None, None], minv, 0.0)
    offs = -np.einsum("tij,tj->ti", minv, a)  # (T, 3)
    offs = np.where(ok[:, None], offs, -1.0)
    T = tris.shape[0]
    # layout: columns grouped by output component
    woop_d = np.zeros((3, 3 * T), np.float32)
    woop_o = np.zeros((4, 3 * T), np.float32)
    for k in range(3):  # output component x', y', z'
        woop_d[:, k * T : (k + 1) * T] = minv[:, k, :].T
        woop_o[:3, k * T : (k + 1) * T] = minv[:, k, :].T
        woop_o[3, k * T : (k + 1) * T] = offs[:, k]
    return woop_d, woop_o


@dataclass
class Scene:
    """Host-side scene. `.device_arrays()` yields the jit-ready pytree."""

    v0: np.ndarray  # (T, 3) f32
    v1: np.ndarray
    v2: np.ndarray
    normals: np.ndarray  # (T, 3) f32, unit, from winding order
    absorption: np.ndarray  # (T, n_bands) f32 in [0,1]; energy kept = 1-a
    bih: BIHArena
    n_triangles: int  # true (unpadded) count
    scattering: np.ndarray = None  # (T,) f32 diffuse-bounce probability
    # per-band energy fraction a shadow ray keeps when crossing the
    # surface (models/materials.py AcousticMaterial.transmission); None =
    # every surface opaque (reference parity, main.zig:683-702)
    transmission: np.ndarray = None
    # (3*n_triangles, 2) f32 texture coordinates from the OBJ (stride 3),
    # carried for the visual layer (app/render.py's gradient sampling);
    # None for procedurally built scenes. Acoustics never reads them.
    uvs: np.ndarray = None

    def __post_init__(self):
        if self.scattering is None:
            self.scattering = np.zeros(self.v0.shape[0], np.float32)

    @property
    def triangles(self) -> np.ndarray:
        """Unpadded (n_triangles, 3, 3) vertex stack — the raw-geometry
        input the host-side analyses expect (extract_edges /
        extract_wedges, Scene.from_triangles roundtrips)."""
        t = self.n_triangles
        return np.stack([self.v0[:t], self.v1[:t], self.v2[:t]], axis=1)

    @classmethod
    def from_triangles(
        cls,
        triangles: np.ndarray,
        cfg: Config = DEFAULT_CONFIG,
        absorption: np.ndarray | None = None,
        scattering: np.ndarray | None = None,
        transmission: np.ndarray | None = None,
    ) -> "Scene":
        """triangles: (T, 3, 3) float32. transmission: optional (T,
        n_bands) per-band energy fraction shadow rays keep through each
        surface (None = all opaque)."""
        tris = np.asarray(triangles, dtype=np.float32)
        t_true = tris.shape[0]
        v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
        n = np.cross(v1 - v0, v2 - v0)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        normals = n / np.maximum(norm, 1e-30)
        if absorption is None:
            absorption = np.full((t_true, cfg.n_bands), 0.1, dtype=np.float32)
        absorption = np.asarray(absorption, dtype=np.float32)
        if absorption.ndim == 0:  # one scalar for every surface and band
            absorption = np.full(
                (t_true, cfg.n_bands), float(absorption), np.float32
            )
        if absorption.ndim == 1:
            absorption = np.repeat(absorption[:, None], cfg.n_bands, axis=1)
        if scattering is None:
            scattering = np.zeros(t_true, np.float32)
        scattering = np.asarray(scattering, dtype=np.float32).reshape(t_true)
        if transmission is not None:
            transmission = np.asarray(transmission, np.float32).reshape(
                t_true, cfg.n_bands
            )
            if not transmission.any():
                transmission = None  # all opaque: keep the fast path

        low = tris.min(axis=1)
        high = tris.max(axis=1)
        # payload = base-vertex index i (multiple of 3), as in main.zig:410;
        # native C++ builder when available (bit-identical arenas)
        from .. import native as _native

        values = np.arange(t_true, dtype=np.int32) * 3
        bih = _native.build_bih_native(low, high, values, cfg.bih_max_leaf_size)
        if bih is None:
            bih = build_bih(low, high, values, cfg.bih_max_leaf_size)

        t_pad = max(_round_up(t_true, cfg.triangle_pad), cfg.triangle_pad)
        pad = t_pad - t_true

        def p(a):
            return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)).astype(np.float32)

        return cls(
            v0=p(v0), v1=p(v1), v2=p(v2),
            normals=p(normals),
            absorption=p(absorption),
            bih=bih,
            n_triangles=t_true,
            scattering=p(scattering),
            transmission=None if transmission is None else p(transmission),
        )

    def device_bih(self):
        """BIH arena + reordered triangles on device for the large-scene
        traversal path (ops/traverse.py)."""
        from ..ops.traverse import device_arena

        return device_arena(
            self.bih, self.v0, self.v1, self.v2,
            max_leaf_size=int(self.bih.leaf_count.max()) if self.bih.n_nodes else 1,
        )

    @classmethod
    def from_obj(
        cls, path, cfg: Config = DEFAULT_CONFIG, absorption=None,
        materials=None,
    ) -> "Scene":
        mesh = load_obj(path)
        return cls.from_mesh(mesh, cfg, absorption, materials)

    @classmethod
    def from_gltf(
        cls, path, cfg: Config = DEFAULT_CONFIG, absorption=None,
        materials=None,
    ) -> "Scene":
        """Scene from a glTF 2.0 / GLB file (utils/gltf.py flattens the
        node hierarchy into the same soup Scene.from_obj builds; glTF
        material names map through `materials` exactly like usemtl)."""
        from ..utils.gltf import load_gltf

        return cls.from_mesh(load_gltf(path), cfg, absorption, materials)

    @classmethod
    def from_mesh(
        cls, mesh: ObjMesh, cfg: Config = DEFAULT_CONFIG, absorption=None,
        materials=None,
    ) -> "Scene":
        """materials: optional {obj usemtl name -> AcousticMaterial | preset
        name} (models/materials.py); mutually exclusive with an explicit
        absorption array."""
        scattering = transmission = None
        if materials is not None:
            if absorption is not None:
                raise ValueError("pass either absorption or materials, not both")
            from .materials import mesh_surface_tables

            absorption, scattering, transmission = mesh_surface_tables(
                mesh, materials
            )
        scene = cls.from_triangles(
            mesh.triangles(), cfg, absorption, scattering, transmission
        )
        scene.uvs = np.asarray(mesh.uvs, np.float32)
        return scene

    def device_arrays(self) -> SceneArrays:
        import jax.numpy as jnp

        woop_d, woop_o = woop_transforms(
            np.stack([self.v0, self.v1, self.v2], axis=1)
        )
        return SceneArrays(
            v0=jnp.asarray(self.v0),
            v1=jnp.asarray(self.v1),
            v2=jnp.asarray(self.v2),
            normals=jnp.asarray(self.normals),
            absorption=jnp.asarray(self.absorption),
            woop_d=jnp.asarray(woop_d),
            woop_o=jnp.asarray(woop_o),
            scattering=jnp.asarray(self.scattering),
            transmission=(
                None if self.transmission is None
                else jnp.asarray(self.transmission)
            ),
        )


def rigid_transform_arrays(arrays: SceneArrays, rotation, translation,
                           mask=None) -> SceneArrays:
    """Rigidly transform a device-resident scene WITHOUT a host rebuild.

    rotation (3, 3) orthonormal, translation (3,): every vertex moves to
    R v + t. The Woop transforms update in closed form — for M' = the new
    world->unit-triangle map, M' = M R^T and offset' = offset - M R^T t
    (derivation: new edge columns are R * old columns) — so animated rigid
    geometry re-traces with zero host work; jit/scan-friendly (all jnp).

    mask (T,) bool restricts the motion to a subset of triangles (a moving
    object inside a static room); None moves the whole scene.

    The BIH arena (host) is NOT touched: dense/MXU/Pallas tracing never
    reads it; Space/BIH queries on a moved scene need a rebuild or use the
    inverse-transformed query (tested equivalence in tests/test_geometry).

    Contractions pin HIGHEST precision (TPU default bf16 matmuls would
    shift vertices by ~2^-8 relative). Like any f32 pipeline, very large
    world offsets still cost absolute precision: measured on TPU, trace
    invariance holds to ~1e-3 for meter-scale moves and ~3e-2 L1 at 30 m
    offsets (edge-tie Monte-Carlo reassignment, not bias).
    """
    import jax
    import jax.numpy as jnp  # module stays importable without jax

    hi = jax.lax.Precision.HIGHEST  # geometry: bf16 default would shift
    r = jnp.asarray(rotation, jnp.float32)  # vertices by ~2^-8 relative
    t = jnp.asarray(translation, jnp.float32)

    def pt(v):
        return jnp.matmul(v, r.T, precision=hi) + t

    T = arrays.v0.shape[0]
    # woop_d layout: (3, 3T) with columns grouped by output component —
    # rows of each triangle's M sit at [:, k*T + i]; reshape to (T, 3, 3)
    m = jnp.stack(
        [arrays.woop_d[:, k * T : (k + 1) * T].T for k in range(3)], axis=1
    )  # (T, 3row, 3col)
    m2 = jnp.einsum("tij,kj->tik", m, r, precision=hi)  # M R^T
    offs = jnp.stack(
        [arrays.woop_o[3, k * T : (k + 1) * T] for k in range(3)], axis=1
    )  # (T, 3)
    offs2 = offs - jnp.einsum("tij,j->ti", m2, t, precision=hi)
    v0, v1, v2 = pt(arrays.v0), pt(arrays.v1), pt(arrays.v2)
    normals = jnp.matmul(arrays.normals, r.T, precision=hi)
    if mask is not None:
        keep = jnp.asarray(mask).reshape(T, 1)
        v0 = jnp.where(keep, v0, arrays.v0)
        v1 = jnp.where(keep, v1, arrays.v1)
        v2 = jnp.where(keep, v2, arrays.v2)
        normals = jnp.where(keep, normals, arrays.normals)
        m2 = jnp.where(keep[:, :, None], m2, m)
        offs2 = jnp.where(keep, offs2, offs)
    woop_d = jnp.concatenate([m2[:, k, :].T for k in range(3)], axis=1)  # (3, 3T)
    woop_o = jnp.concatenate(
        [
            jnp.concatenate([m2[:, k, :].T, offs2[:, k][None, :]], axis=0)
            for k in range(3)
        ],
        axis=1,
    )  # (4, 3T)
    return arrays._replace(
        v0=v0, v1=v1, v2=v2, normals=normals, woop_d=woop_d, woop_o=woop_o
    )


def box_room(size=(10.0, 3.0, 8.0), center=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Procedural 12-triangle box room (inward-facing), (12, 3, 3) float32.

    Used as a fallback scene and in tests; normals face inward so rays from
    inside hit front faces.
    """
    sx, sy, sz = (s * 0.5 for s in size)
    cx, cy, cz = center
    lo = np.array([cx - sx, cy - sy, cz - sz], np.float32)
    hi = np.array([cx + sx, cy + sy, cz + sz], np.float32)

    def corner(ix, iy, iz):
        return np.array(
            [hi[0] if ix else lo[0], hi[1] if iy else lo[1], hi[2] if iz else lo[2]],
            np.float32,
        )

    c = {(i, j, k): corner(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)}
    quads = [
        # (a, b, c, d) ordered so the normal faces inward
        ((0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)),  # -z wall
        ((1, 0, 1), (1, 1, 1), (0, 1, 1), (0, 0, 1)),  # +z wall
        ((0, 0, 1), (0, 1, 1), (0, 1, 0), (0, 0, 0)),  # -x wall
        ((1, 0, 0), (1, 1, 0), (1, 1, 1), (1, 0, 1)),  # +x wall
        ((0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)),  # floor (-y)
        ((0, 1, 1), (1, 1, 1), (1, 1, 0), (0, 1, 0)),  # ceiling (+y)
    ]
    tris = []
    for a, b, d, e in quads:
        tris.append([c[a], c[d], c[b]])
        tris.append([c[a], c[e], c[d]])
    return np.asarray(tris, dtype=np.float32)


def box_room_subdivided(size=(10.0, 3.0, 8.0), center=(0.0, 0.0, 0.0),
                        k: int = 8) -> np.ndarray:
    """Box room with each wall split into k x k quads: 12*k^2 triangles.

    Scaling-benchmark scene: same acoustics as box_room, arbitrarily many
    triangles, all reachable by rays from inside.
    """
    base = box_room(size, center)  # 12 tris = 6 quads (2 tris each)
    out = []
    for q in range(6):
        t0, t1 = base[2 * q], base[2 * q + 1]
        # recover the quad corners: t0 = (a, d, b), t1 = (a, e, d)
        a, d, b = t0
        _, e, _ = t1
        for i in range(k):
            for j in range(k):
                u0, u1 = i / k, (i + 1) / k
                v0, v1 = j / k, (j + 1) / k

                def p(u, v):
                    return a + (b - a) * u + (e - a) * v

                p00, p10, p01, p11 = p(u0, v0), p(u1, v0), p(u0, v1), p(u1, v1)
                out.append([p00, p11, p10])
                out.append([p00, p01, p11])
    return np.asarray(out, dtype=np.float32)
