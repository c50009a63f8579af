"""glTF 2.0 ingestion (utils/gltf.py) — synthesized in-memory assets.

Zero-egress: every fixture builds its glTF JSON/GLB bytes from numpy
arrays, then checks the flattened ObjMesh soup against the arrays the
fixture embedded — transforms, index decoding, interleaving, sparse
accessors, material naming, and the Scene.from_mesh handoff.
"""

import base64
import json
import struct

import numpy as np
import pytest

from audio_raytracing_tpu.models.scene import Scene
from audio_raytracing_tpu.utils.gltf import (
    _parse_glb, load_gltf, parse_gltf,
)


def _buf_uri(data: bytes) -> str:
    return "data:application/octet-stream;base64," + base64.b64encode(
        data
    ).decode()


def _quad_doc(indexed=True, translation=None, rotation=None,
              material=None, uv=True):
    """One unit quad (two triangles) in the xy plane."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    blobs = [pos.tobytes(), uvs.tobytes(), idx.tobytes()]
    offsets = np.cumsum([0] + [len(b) for b in blobs])
    buf = b"".join(blobs)
    views = [
        {"buffer": 0, "byteOffset": int(offsets[i]),
         "byteLength": len(blobs[i])} for i in range(3)
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4,
         "type": "VEC3"},
        {"bufferView": 1, "componentType": 5126, "count": 4,
         "type": "VEC2"},
        {"bufferView": 2, "componentType": 5123, "count": 6,
         "type": "SCALAR"},
    ]
    attrs = {"POSITION": 0}
    if uv:
        attrs["TEXCOORD_0"] = 1
    prim = {"attributes": attrs}
    if indexed:
        prim["indices"] = 2
    node = {"mesh": 0}
    if translation is not None:
        node["translation"] = translation
    if rotation is not None:
        node["rotation"] = rotation
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [{"primitives": [prim]}],
        "buffers": [{"uri": _buf_uri(buf), "byteLength": len(buf)}],
        "bufferViews": views,
        "accessors": accessors,
    }
    if material is not None:
        doc["materials"] = [{"name": material}]
        prim["material"] = 0
    return doc, pos, uvs, idx


def _load_doc(doc):
    from audio_raytracing_tpu.utils.gltf import _load_buffers

    return parse_gltf(doc, _load_buffers(doc, None, None))


class TestParse:
    def test_indexed_quad(self):
        doc, pos, uvs, idx = _quad_doc()
        mesh = _load_doc(doc)
        assert mesh.n_triangles == 2
        np.testing.assert_allclose(mesh.positions, pos[idx])
        np.testing.assert_allclose(mesh.uvs, uvs[idx])

    def test_unindexed(self):
        doc, pos, _, _ = _quad_doc(indexed=False)
        # 4 verts isn't divisible by 3 unindexed — pad fixture to 6
        doc["accessors"][0]["count"] = 3
        mesh = _load_doc(doc)
        assert mesh.n_triangles == 1
        np.testing.assert_allclose(mesh.positions, pos[:3])

    def test_node_transform(self):
        doc, pos, _, idx = _quad_doc(
            translation=[1.0, 2.0, 3.0],
            rotation=[0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)],
        )
        mesh = _load_doc(doc)
        # 90 deg about z then translate
        r = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
        expect = pos @ r.T + [1, 2, 3]
        np.testing.assert_allclose(
            mesh.positions, expect[idx], atol=1e-6
        )

    def test_nested_nodes_compose(self):
        doc, pos, _, idx = _quad_doc()
        doc["nodes"] = [
            {"children": [1], "translation": [0.0, 0.0, 5.0]},
            {"mesh": 0, "translation": [1.0, 0.0, 0.0]},
        ]
        mesh = _load_doc(doc)
        np.testing.assert_allclose(
            mesh.positions, (pos + [1, 0, 5])[idx], atol=1e-6
        )

    def test_matrix_node(self):
        doc, pos, _, idx = _quad_doc()
        m = np.eye(4)
        m[:3, 3] = [0, 7, 0]
        # glTF matrices are column-major
        doc["nodes"][0]["matrix"] = list(m.T.reshape(-1))
        mesh = _load_doc(doc)
        np.testing.assert_allclose(
            mesh.positions, (pos + [0, 7, 0])[idx], atol=1e-6
        )

    def test_material_names(self):
        doc, *_ = _quad_doc(material="brick")
        mesh = _load_doc(doc)
        assert mesh.material_names == ("", "brick")
        assert (mesh.material_ids == 1).all()

    def test_interleaved_stride(self):
        # one vertex buffer interleaving pos(12B) + uv(8B), stride 20
        pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
        inter = np.concatenate([pos, uvs], axis=1).astype(np.float32)
        buf = inter.tobytes()
        doc = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1}}]}],
            "buffers": [{"uri": _buf_uri(buf), "byteLength": len(buf)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": len(buf),
                 "byteStride": 20},
            ],
            "accessors": [
                {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
                 "count": 3, "type": "VEC3"},
                {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
                 "count": 3, "type": "VEC2"},
            ],
        }
        mesh = _load_doc(doc)
        np.testing.assert_allclose(mesh.positions, pos)
        np.testing.assert_allclose(mesh.uvs, uvs)

    def test_sparse_accessor(self):
        doc, pos, _, idx = _quad_doc()
        # override vertex 2's position via a sparse accessor
        sp_idx = np.array([2], np.uint16).tobytes()
        sp_val = np.array([[5.0, 5.0, 5.0]], np.float32).tobytes()
        base = base64.b64decode(
            doc["buffers"][0]["uri"].split(",", 1)[1]
        )
        buf = base + sp_idx + sp_val
        doc["buffers"][0] = {
            "uri": _buf_uri(buf), "byteLength": len(buf)}
        doc["bufferViews"] += [
            {"buffer": 0, "byteOffset": len(base), "byteLength": 2},
            {"buffer": 0, "byteOffset": len(base) + 2, "byteLength": 12},
        ]
        doc["accessors"][0]["sparse"] = {
            "count": 1,
            "indices": {"bufferView": 3, "componentType": 5123},
            "values": {"bufferView": 4},
        }
        mesh = _load_doc(doc)
        expect = pos.copy()
        expect[2] = [5, 5, 5]
        np.testing.assert_allclose(mesh.positions, expect[idx])

    def test_rejects_non_triangles(self):
        doc, *_ = _quad_doc()
        doc["meshes"][0]["primitives"][0]["mode"] = 1  # LINES
        with pytest.raises(ValueError, match="TRIANGLES"):
            _load_doc(doc)

    def test_normalized_uint16_uv(self):
        doc, _, uvs, idx = _quad_doc()
        q = (uvs * 65535).astype(np.uint16)
        base = base64.b64decode(
            doc["buffers"][0]["uri"].split(",", 1)[1]
        )
        buf = base + q.tobytes()
        doc["buffers"][0] = {"uri": _buf_uri(buf), "byteLength": len(buf)}
        doc["bufferViews"].append(
            {"buffer": 0, "byteOffset": len(base),
             "byteLength": q.nbytes})
        doc["accessors"].append(
            {"bufferView": 3, "componentType": 5123, "count": 4,
             "type": "VEC2", "normalized": True})
        doc["meshes"][0]["primitives"][0]["attributes"]["TEXCOORD_0"] = 3
        mesh = _load_doc(doc)
        np.testing.assert_allclose(mesh.uvs, uvs[idx], atol=1e-4)


class TestFiles:
    def test_glb_roundtrip(self, tmp_path):
        doc, pos, _, idx = _quad_doc(material="stone")
        # move the data-URI buffer into a GLB BIN chunk
        payload = base64.b64decode(doc["buffers"][0]["uri"].split(",", 1)[1])
        doc["buffers"][0] = {"byteLength": len(payload)}
        js = json.dumps(doc).encode()
        js += b" " * (-len(js) % 4)
        bin_pad = payload + b"\0" * (-len(payload) % 4)
        glb = (
            struct.pack("<III", 0x46546C67, 2,
                        12 + 8 + len(js) + 8 + len(bin_pad))
            + struct.pack("<II", len(js), 0x4E4F534A) + js
            + struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad
        )
        p = tmp_path / "quad.glb"
        p.write_bytes(glb)
        mesh = load_gltf(p)
        np.testing.assert_allclose(mesh.positions, pos[idx])
        assert mesh.material_names == ("", "stone")

    def test_gltf_external_buffer(self, tmp_path):
        doc, pos, _, idx = _quad_doc()
        payload = base64.b64decode(doc["buffers"][0]["uri"].split(",", 1)[1])
        (tmp_path / "geo.bin").write_bytes(payload)
        doc["buffers"][0] = {"uri": "geo.bin", "byteLength": len(payload)}
        p = tmp_path / "scene.gltf"
        p.write_text(json.dumps(doc))
        mesh = load_gltf(p)
        np.testing.assert_allclose(mesh.positions, pos[idx])

    def test_rejects_path_escape(self, tmp_path):
        doc, *_ = _quad_doc()
        doc["buffers"][0] = {"uri": "../../etc/passwd", "byteLength": 4}
        p = tmp_path / "bad.gltf"
        p.write_text(json.dumps(doc))
        with pytest.raises(ValueError, match="escapes"):
            load_gltf(p)

    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            _parse_glb(b"NOPE" + b"\0" * 20)


class TestSceneHandoff:
    def test_scene_from_gltf_traces(self, tmp_path):
        """A glTF box room builds a Scene and the BIH raycasts hit it."""
        from audio_raytracing_tpu.models.scene import box_room

        tris = box_room(size=(4.0, 3.0, 5.0))  # (T, 3, 3) soup
        pos = tris.reshape(-1, 3).astype(np.float32)
        buf = pos.tobytes()
        doc = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
            "buffers": [{"uri": _buf_uri(buf), "byteLength": len(buf)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": len(buf)}],
            "accessors": [
                {"bufferView": 0, "componentType": 5126,
                 "count": pos.shape[0], "type": "VEC3"}],
        }
        p = tmp_path / "room.gltf"
        p.write_text(json.dumps(doc))
        scene = Scene.from_gltf(p, absorption=0.3)
        assert scene.triangles.shape[0] == tris.shape[0]
        from audio_raytracing_tpu.models.space import Space

        hit = Space(scene.bih).raycast(
            np.zeros(3, np.float32), np.array([1, 0, 0], np.float32), 4
        )
        assert len(hit) >= 1  # wall at x=2 from inside the box
