"""glTF 2.0 scene ingestion (pure Python — json + base64 + numpy).

The reference only reads Wavefront OBJ (src/main.zig:320-388, mirrored in
utils/obj.py); production acoustic scenes come out of DCC tools and game
pipelines as glTF. This loader flattens a .gltf/.glb file into the same
`ObjMesh` triangle soup `Scene.from_mesh` already consumes, so every
downstream path (BIH build, Woop transforms, materials mapping, tracing)
works unchanged.

Scope (deliberate):
  * TRIANGLES primitives (mode 4, the default) — indexed or not; other
    modes (strips/fans/lines/points) raise rather than misparse.
  * POSITION (required) and TEXCOORD_0 (optional) attributes; sparse
    accessors are applied; normals/tangents/colors are ignored (acoustics
    recomputes geometric normals — ops/intersect.py::triangle_normals).
  * Full node hierarchy with per-node `matrix` or TRS composed to world
    space (glTF quaternions are (x, y, z, w); matrices column-major).
  * Buffers from GLB BIN chunks, `data:` URIs, or files next to the
    .gltf (path-traversal outside the directory is rejected).
  * Per-primitive material names -> ObjMesh.material_names/material_ids,
    same convention as OBJ `usemtl` (unnamed default "" at id 0), so
    models/materials.py name->absorption mapping applies directly.

Anything outside this scope fails loudly: acoustic geometry silently
dropped or mis-transformed would corrupt traces downstream.
"""

from __future__ import annotations

import base64
import json
import struct
from pathlib import Path
from urllib.parse import unquote

import numpy as np

from .obj import ObjMesh

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_NCOMP = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}
_GLB_MAGIC = 0x46546C67  # 'glTF'
_MODE_TRIANGLES = 4


def _decode_uri(uri: str, base_dir: Path | None) -> bytes:
    if uri.startswith("data:"):
        header, _, payload = uri.partition(",")
        if ";base64" not in header:
            raise ValueError(f"unsupported data URI encoding: {header!r}")
        return base64.b64decode(payload)
    if base_dir is None:
        raise ValueError(
            "external buffer URI with no base directory (GLB or in-memory "
            f"parse referencing {uri!r})"
        )
    rel = unquote(uri)
    path = (base_dir / rel).resolve()
    if base_dir.resolve() not in path.parents and path != base_dir.resolve():
        raise ValueError(f"buffer URI escapes the glTF directory: {uri!r}")
    return path.read_bytes()


def _load_buffers(doc: dict, bin_chunk: bytes | None,
                  base_dir: Path | None) -> list:
    out = []
    for i, buf in enumerate(doc.get("buffers", [])):
        if "uri" not in buf:
            if bin_chunk is None:
                raise ValueError(f"buffer {i} has no uri and no GLB BIN chunk")
            data = bin_chunk
        else:
            data = _decode_uri(buf["uri"], base_dir)
        if len(data) < buf.get("byteLength", 0):
            raise ValueError(
                f"buffer {i}: {len(data)} bytes < declared "
                f"{buf['byteLength']}"
            )
        out.append(data)
    return out


def _read_accessor(doc: dict, buffers: list, idx: int) -> np.ndarray:
    """Decode accessor `idx` to a dense (count, ncomp) array (native dtype)."""
    acc = doc["accessors"][idx]
    dtype = np.dtype(_COMPONENT_DTYPES[acc["componentType"]]).newbyteorder("<")
    ncomp = _TYPE_NCOMP[acc["type"]]
    count = acc["count"]
    elem_bytes = dtype.itemsize * ncomp

    if "bufferView" in acc:
        bv = doc["bufferViews"][acc["bufferView"]]
        data = buffers[bv["buffer"]]
        start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        stride = bv.get("byteStride") or elem_bytes
        if stride == elem_bytes:
            flat = np.frombuffer(data, dtype, count * ncomp, start)
            arr = flat.reshape(count, ncomp)
        else:
            # interleaved vertex buffer: strided window per element
            raw = np.frombuffer(
                data, np.uint8, (count - 1) * stride + elem_bytes, start
            )
            rows = np.lib.stride_tricks.as_strided(
                raw, shape=(count, elem_bytes), strides=(stride, 1)
            )
            arr = rows.copy().view(dtype).reshape(count, ncomp)
    else:
        arr = np.zeros((count, ncomp), dtype)  # spec: zeros, sparse fills

    if "sparse" in acc:
        sp = acc["sparse"]
        idx_arr = _read_bufferview_scalars(
            doc, buffers, sp["indices"],
            _COMPONENT_DTYPES[sp["indices"]["componentType"]], sp["count"])
        val_bv = sp["values"]
        bv = doc["bufferViews"][val_bv["bufferView"]]
        data = buffers[bv["buffer"]]
        start = bv.get("byteOffset", 0) + val_bv.get("byteOffset", 0)
        vals = np.frombuffer(
            data, dtype, sp["count"] * ncomp, start
        ).reshape(sp["count"], ncomp)
        arr = arr.copy()
        arr[idx_arr] = vals
    return np.ascontiguousarray(arr)


def _read_bufferview_scalars(doc, buffers, ref, comp_dtype, count):
    bv = doc["bufferViews"][ref["bufferView"]]
    data = buffers[bv["buffer"]]
    start = bv.get("byteOffset", 0) + ref.get("byteOffset", 0)
    dt = np.dtype(comp_dtype).newbyteorder("<")
    return np.frombuffer(data, dt, count, start).astype(np.int64)


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] = np.diag(node["scale"])
    if "rotation" in node:
        x, y, z, w = node["rotation"]  # glTF order: (x, y, z, w)
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        m[:3, :3] = r @ m[:3, :3]
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def parse_gltf(doc: dict, buffers: list) -> ObjMesh:
    """Flatten a parsed glTF document + decoded buffers into an ObjMesh.

    Walks the default scene's node tree (all scenes' roots if none is
    marked default), composes world transforms, and concatenates every
    TRIANGLES primitive into one soup.
    """
    positions: list = []
    uvs: list = []
    face_mats: list = []
    mat_names: list = [""]

    materials = doc.get("materials", [])

    def mat_id(prim_mat: int | None) -> int:
        if prim_mat is None:
            return 0
        m = materials[prim_mat]
        name = m.get("name", f"material_{prim_mat}")
        if name not in mat_names:
            mat_names.append(name)
        return mat_names.index(name)

    def emit_mesh(mesh_idx: int, world: np.ndarray):
        mesh = doc["meshes"][mesh_idx]
        for prim in mesh["primitives"]:
            mode = prim.get("mode", _MODE_TRIANGLES)
            if mode != _MODE_TRIANGLES:
                raise ValueError(
                    f"unsupported primitive mode {mode} in mesh "
                    f"{mesh.get('name', mesh_idx)!r} (only TRIANGLES)"
                )
            attrs = prim["attributes"]
            pos = _read_accessor(doc, buffers, attrs["POSITION"])
            pos = pos.astype(np.float64)
            if "TEXCOORD_0" in attrs:
                uv = _read_accessor(doc, buffers, attrs["TEXCOORD_0"])
                uv = _normalize_uv(
                    uv, doc["accessors"][attrs["TEXCOORD_0"]]["componentType"]
                )
            else:
                uv = np.zeros((pos.shape[0], 2), np.float32)
            if "indices" in prim:
                idx = _read_accessor(
                    doc, buffers, prim["indices"]
                ).reshape(-1).astype(np.int64)
            else:
                idx = np.arange(pos.shape[0], dtype=np.int64)
            if idx.shape[0] % 3:
                raise ValueError(
                    f"TRIANGLES index count {idx.shape[0]} not divisible by 3"
                )
            wp = pos @ world[:3, :3].T + world[:3, 3]
            positions.append(wp[idx].astype(np.float32))
            uvs.append(uv[idx].astype(np.float32))
            face_mats.append(
                np.full(idx.shape[0] // 3, mat_id(prim.get("material")),
                        np.int32)
            )

    def walk(node_idx: int, parent: np.ndarray, depth: int = 0):
        if depth > 256:
            raise ValueError("node graph too deep (cycle?)")
        node = doc["nodes"][node_idx]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            emit_mesh(node["mesh"], world)
        for child in node.get("children", []):
            walk(child, world, depth + 1)

    scenes = doc.get("scenes", [])
    if scenes:
        scene_ids = [doc.get("scene", 0)] if "scene" in doc or len(
            scenes) == 1 else range(len(scenes))
        roots = [n for s in scene_ids for n in scenes[s].get("nodes", [])]
    else:
        # no scene: spec allows free meshes; walk every root-less node
        children = {c for n in doc.get("nodes", [])
                    for c in n.get("children", [])}
        roots = [i for i in range(len(doc.get("nodes", [])))
                 if i not in children]
    for r in roots:
        walk(r, np.eye(4))

    if not positions:
        raise ValueError("glTF contains no TRIANGLES geometry")
    return ObjMesh(
        positions=np.concatenate(positions, axis=0),
        uvs=np.concatenate(uvs, axis=0),
        material_ids=np.concatenate(face_mats, axis=0),
        material_names=tuple(mat_names),
    )


def _normalize_uv(uv: np.ndarray, component_type: int) -> np.ndarray:
    """glTF TEXCOORD may be normalized uint8/uint16; map to [0, 1] f32."""
    if component_type == 5126:
        return uv.astype(np.float32)
    scale = {5121: 255.0, 5123: 65535.0}.get(component_type)
    if scale is None:
        raise ValueError(f"unsupported TEXCOORD componentType {component_type}")
    return (uv.astype(np.float32) / scale).astype(np.float32)


def _parse_glb(blob: bytes) -> tuple[dict, bytes | None]:
    if len(blob) < 12:
        raise ValueError("GLB too short")
    magic, version, length = struct.unpack_from("<III", blob, 0)
    if magic != _GLB_MAGIC:
        raise ValueError("not a GLB file (bad magic)")
    if version != 2:
        raise ValueError(f"unsupported GLB version {version}")
    off = 12
    doc = None
    bin_chunk = None
    while off + 8 <= min(length, len(blob)):
        clen, ctype = struct.unpack_from("<II", blob, off)
        payload = blob[off + 8:off + 8 + clen]
        if ctype == 0x4E4F534A:  # 'JSON'
            doc = json.loads(payload.decode("utf-8"))
        elif ctype == 0x004E4942:  # 'BIN\0'
            bin_chunk = payload
        off += 8 + clen + (-clen % 4)
    if doc is None:
        raise ValueError("GLB has no JSON chunk")
    return doc, bin_chunk


def load_gltf(path) -> ObjMesh:
    """Load a .gltf (JSON + external/data-URI buffers) or .glb file."""
    p = Path(path)
    blob = p.read_bytes()
    if blob[:4] == b"glTF":
        doc, bin_chunk = _parse_glb(blob)
        buffers = _load_buffers(doc, bin_chunk, p.parent)
    else:
        doc = json.loads(blob.decode("utf-8"))
        buffers = _load_buffers(doc, None, p.parent)
    return parse_gltf(doc, buffers)
