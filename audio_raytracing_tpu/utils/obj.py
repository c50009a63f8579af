"""Wavefront OBJ loading with the reference's semantics.

The reference hand-rolls a parser (src/main.zig:320-388) handling exactly
three record types — `v x y z`, `vt u v`, and triangulated faces
`f v/vt v/vt v/vt` — with 1-based indices converted to 0-based, expanding
into a flat triangle soup (3 vertices per triangle). We mirror those
semantics; records the reference would choke on (vn, `f v//vn`, quads) are
rejected or skipped explicitly rather than misparsed.

Beyond the reference: `usemtl` records are tracked per triangle (the
reference skips them, main.zig never inspects the token) so scenes can map
named materials to acoustic surface properties (models/materials.py).
`mtllib` is recorded but not loaded — visual .mtl files carry no acoustic
data.
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np


@dataclass
class ObjMesh:
    """Flat triangle soup: positions[3*T, 3], uvs[3*T, 2] (stride 3).

    material_ids[T] indexes material_names; triangles before any `usemtl`
    get id 0 = the unnamed default material ""."""

    positions: np.ndarray  # (3*T, 3) float32
    uvs: np.ndarray  # (3*T, 2) float32
    material_ids: np.ndarray = None  # (T,) int32, lazily defaulted
    material_names: tuple = ("",)
    mtllib: str | None = None

    def __post_init__(self):
        if self.material_ids is None:
            self.material_ids = np.zeros(self.n_triangles, np.int32)

    @property
    def n_triangles(self) -> int:
        return self.positions.shape[0] // 3

    def triangles(self) -> np.ndarray:
        """(T, 3, 3) view of the soup."""
        return self.positions.reshape(-1, 3, 3)

    def triangle_material_names(self) -> list:
        """Per-triangle material name, resolved."""
        return [self.material_names[i] for i in self.material_ids]


def parse_obj(text: str) -> ObjMesh:
    verts: list = []
    uvs: list = []
    faces: list = []
    face_mats: list = []
    mat_names: list = [""]
    cur_mat = 0
    mtllib = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("vt "):
            parts = line.split()
            uvs.append((float(parts[1]), float(parts[2])))
        elif line.startswith("v "):
            parts = line.split()
            verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif line.startswith("vn ") or line.startswith("vp "):
            continue  # normals/params: unused (world.obj has none)
        elif line.startswith("usemtl"):
            name = line[len("usemtl"):].strip()
            if name in mat_names:
                cur_mat = mat_names.index(name)
            else:
                mat_names.append(name)
                cur_mat = len(mat_names) - 1
        elif line.startswith("mtllib"):
            mtllib = line[len("mtllib"):].strip()
        elif line.startswith("f "):
            # tokenize on spaces and '/', exactly like main.zig:361-370
            toks = [t for t in line.replace("/", " ").split() if t][1:]
            if len(toks) != 6:
                raise ValueError(
                    "only triangulated `f v/vt v/vt v/vt` faces are "
                    f"supported (got {line!r})"
                )
            idx = tuple(int(t) for t in toks)
            if any(i < 0 for i in idx):
                raise ValueError(
                    f"relative (negative) OBJ indices are not supported ({line!r})"
                )
            faces.append(tuple(i - 1 for i in idx))
            face_mats.append(cur_mat)
    v = np.asarray(verts, dtype=np.float32)
    vt = (
        np.asarray(uvs, dtype=np.float32)
        if uvs
        else np.zeros((1, 2), np.float32)
    )
    pos = np.zeros((3 * len(faces), 3), dtype=np.float32)
    uv = np.zeros((3 * len(faces), 2), dtype=np.float32)
    for t, (a, b, c, d, e, f) in enumerate(faces):
        pos[3 * t + 0] = v[a]
        uv[3 * t + 0] = vt[b]
        pos[3 * t + 1] = v[c]
        uv[3 * t + 1] = vt[d]
        pos[3 * t + 2] = v[e]
        uv[3 * t + 2] = vt[f]
    return ObjMesh(
        positions=pos,
        uvs=uv,
        material_ids=np.asarray(face_mats, np.int32),
        material_names=tuple(mat_names),
        mtllib=mtllib,
    )


def load_obj(path) -> ObjMesh:
    with io.open(path, "r", encoding="utf-8") as f:
        return parse_obj(f.read())
