"""Headless software rasterizer — the visual layer (demo scaffolding).

The reference renders with SDL_GPU + SPIR-V shaders (two passes:
off-screen 800x600 then swapchain blit, src/main.zig:42-318, 791-939;
shaders raw/shaders/shader.{vert,frag}: vp-transform + texture sample of a
2x2 gradient). Visuals are explicitly a non-goal there ("this is not about
the renderer", main.zig:799-800); here the equivalent is a dependency-free
NumPy rasterizer: vp-projected triangles, z-buffered, barycentric-uv
bilinear sampling of the same 2x2 gradient texture (main.zig:284-292)
modulated by face-normal shading, with the music-source marker tetrahedron
(main.zig:818-829), writing PPM frames. Enough to *see* a scene/camera/
sources headlessly and to test the camera math end to end.
"""

from __future__ import annotations

import numpy as np

from ..models.scene import Scene
from .camera import Camera

# the reference's 2x2 gradient texture (main.zig:284-292): blue/red/green/
# yellow, sampled with bilinear filtering and clamp-to-edge
GRADIENT_TEXTURE = np.asarray(
    [[[0, 0, 255], [255, 0, 0]], [[0, 255, 0], [255, 255, 0]]], np.float32
)


def sample_gradient(u, v):
    """Bilinear clamp-to-edge sample of the 2x2 texture. u, v: arrays in
    [0, 1] (texel centers at 0.25/0.75, like GPU linear filtering)."""
    # map uv to texel space: centers at 0.25 and 0.75 -> s in [0, 1]
    s = np.clip(np.asarray(u) * 2.0 - 0.5, 0.0, 1.0)
    t = np.clip(np.asarray(v) * 2.0 - 0.5, 0.0, 1.0)
    c00 = GRADIENT_TEXTURE[0, 0]
    c10 = GRADIENT_TEXTURE[0, 1]
    c01 = GRADIENT_TEXTURE[1, 0]
    c11 = GRADIENT_TEXTURE[1, 1]
    s = s[..., None]
    t = t[..., None]
    return (c00 * (1 - s) + c10 * s) * (1 - t) + (c01 * (1 - s) + c11 * s) * t


def marker_tetrahedron(pos, size: float = 0.1) -> np.ndarray:
    """The reference's source-marker tetra (main.zig:818-829), (4, 3, 3)."""
    p = np.asarray(pos, np.float32)
    s = size
    a = p + np.float32([s, s, -s])
    b = p + np.float32([s, -s, -s])
    c = p + np.float32([0, 0, 2 * s])
    d = p + np.float32([-s, s, -s])
    return np.asarray([[a, b, c], [d, b, c], [d, a, c], [a, b, d]], np.float32)


def render_frame(
    scene: Scene,
    camera: Camera,
    width: int = 800,
    height: int = 600,
    markers=(),
    alpha: float = 1.0,
    uvs=None,
) -> np.ndarray:
    """Rasterize to an (H, W, 3) uint8 image (z-buffered; textured via the
    reference's 2x2 gradient when uvs (3T, 2) are given — defaulting to
    the scene's own OBJ texture coordinates (Scene.uvs) when it has them —
    flat-shaded base color otherwise)."""
    if uvs is None and getattr(scene, "uvs", None) is not None and len(scene.uvs):
        uvs = scene.uvs
    tris = np.stack([scene.v0, scene.v1, scene.v2], axis=1)[: scene.n_triangles]
    tri_uvs = None
    if uvs is not None:
        tri_uvs = np.asarray(uvs, np.float32).reshape(-1, 3, 2)[: scene.n_triangles]
    for m in markers:
        tris = np.concatenate([tris, marker_tetrahedron(m)], axis=0)
        if tri_uvs is not None:
            tri_uvs = np.concatenate(
                [tri_uvs, np.tile(np.float32([[0, 0], [1, 0], [0, 1]]), (4, 1, 1))]
            )
    vp = camera.vp(alpha=alpha, aspect=width / height)  # row-vector convention

    verts = tris.reshape(-1, 3)
    hom = np.concatenate([verts, np.ones((len(verts), 1), np.float32)], axis=1)
    clip = hom @ vp  # (N, 4)
    w = clip[:, 3:4]
    valid_w = w[:, 0] > 1e-6
    ndc = np.where(valid_w[:, None], clip[:, :3] / np.where(valid_w[:, None], w, 1.0), 0.0)
    sx = (ndc[:, 0] * 0.5 + 0.5) * (width - 1)
    sy = (1.0 - (ndc[:, 1] * 0.5 + 0.5)) * (height - 1)
    sz = ndc[:, 2]

    img = np.zeros((height, width, 3), np.uint8)
    img[:] = (24, 26, 32)  # clear color
    zbuf = np.full((height, width), np.inf, np.float32)

    n_tris = len(tris)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    normals = np.cross(e1, e2)
    nn = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(nn, 1e-20)
    light = np.float32([0.4, 0.8, 0.3])
    light /= np.linalg.norm(light)
    shade = 0.35 + 0.65 * np.abs(normals @ light)

    for t in range(n_tris):
        i0, i1, i2 = 3 * t, 3 * t + 1, 3 * t + 2
        if not (valid_w[i0] and valid_w[i1] and valid_w[i2]):
            continue
        xs = np.float32([sx[i0], sx[i1], sx[i2]])
        ys = np.float32([sy[i0], sy[i1], sy[i2]])
        zs = np.float32([sz[i0], sz[i1], sz[i2]])
        x_min, x_max = int(max(xs.min(), 0)), int(min(xs.max(), width - 1)) + 1
        y_min, y_max = int(max(ys.min(), 0)), int(min(ys.max(), height - 1)) + 1
        if x_min >= x_max or y_min >= y_max:
            continue
        gx, gy = np.meshgrid(
            np.arange(x_min, x_max, dtype=np.float32),
            np.arange(y_min, y_max, dtype=np.float32),
        )
        d = (ys[1] - ys[2]) * (xs[0] - xs[2]) + (xs[2] - xs[1]) * (ys[0] - ys[2])
        if abs(d) < 1e-9:
            continue
        l0 = ((ys[1] - ys[2]) * (gx - xs[2]) + (xs[2] - xs[1]) * (gy - ys[2])) / d
        l1 = ((ys[2] - ys[0]) * (gx - xs[2]) + (xs[0] - xs[2]) * (gy - ys[2])) / d
        l2 = 1.0 - l0 - l1
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        z = l0 * zs[0] + l1 * zs[1] + l2 * zs[2]
        sub_z = zbuf[y_min:y_max, x_min:x_max]
        upd = inside & (z < sub_z) & (z > 0.0) & (z < 1.0)
        sub_z[upd] = z[upd]
        is_marker = t >= scene.n_triangles
        sub_img = img[y_min:y_max, x_min:x_max]
        if tri_uvs is not None:
            uv = (
                l0[..., None] * tri_uvs[t, 0]
                + l1[..., None] * tri_uvs[t, 1]
                + l2[..., None] * tri_uvs[t, 2]
            )
            tex = sample_gradient(uv[..., 0], uv[..., 1]) * shade[t]
            sub_img[upd] = np.clip(tex, 0, 255).astype(np.uint8)[upd]
        else:
            base = np.float32([240, 120, 80]) if is_marker else np.float32([120, 160, 220])
            sub_img[upd] = (base * shade[t]).astype(np.uint8)
    return img


def write_ppm(path, img: np.ndarray) -> None:
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img.tobytes())
