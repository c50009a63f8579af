"""Edge-diffraction model family (knife-edge, Kurze-Anderson).

The fourth acoustic model family: sound bending around edges into shadow
zones — the phenomenon neither the specular tracer (models/ir.py), the
stochastic hybrid, nor the image-source model (models/ism.py) captures:
with all of those, an occluded source is simply silent apart from late
reverberant energy, where a real listener still hears a low-passed direct
arrival over the obstacle.

Model: classical knife-edge diffraction. For every candidate edge the
shortest source->edge->listener path is found in closed form (unfold the
two endpoints around the edge line; the straight line between them crosses
the edge axis at the apex), the detour delta = |SP| + |PL| - |SL| gives the
Fresnel number N = 2 delta / lambda per band, and the insertion loss is
the Kurze-Anderson fit

    A(N) = 5 + 20 log10( sqrt(2 pi N) / tanh(sqrt(2 pi N)) )  dB,  N > 0

applied to the free-field direct amplitude at the diffracted path length
(the framework's 1/(d+1) and air-absorption laws). Band wavelengths come
from the 4 EQ band frequencies (the same Hz-like constants the reference's
air-absorption law uses, sound_system.zig:229-234). Contributions are
GATED to shadow zones — the direct ray must be blocked and both legs to
the apex clear — which is what keeps the model additive with the other
families (they carry the insonified region).

Approximations (documented, standard for geometric acoustics): first-order
diffraction only, knife-edge coefficient regardless of wedge angle, energy
summed incoherently like every other family's histogram contributions.

TPU mapping: edges are extracted host-side once (mesh topology, NumPy) and
padded; apex/detour/gating/attenuation are fully batched jnp over all
edges, occlusion legs are dense nearest-hits — one jit per (scene, edges)
shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..ops.eq import EQ_FREQS
from ..ops.intersect import nearest_hit
from .ir import ImpulseResponse, _air_absorption


def extract_edges(triangles: np.ndarray, min_dihedral_deg: float = 10.0):
    """Diffracting edges of a triangle soup: (E, 2, 3) endpoint pairs.

    An edge diffracts when it is a boundary (one adjacent face) or a crease
    (two faces whose dihedral deviates from flat by at least
    min_dihedral_deg). Coplanar interior edges are dropped — they cannot
    cast an acoustic shadow. Host-side (topology), run once per scene."""
    tris = np.asarray(triangles, np.float32).reshape(-1, 3, 3)
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    good = norm[:, 0] > 1e-12
    n = np.where(norm > 1e-12, n / np.maximum(norm, 1e-30), 0.0)

    def key(p, q):
        a = tuple(np.round(p, 5))
        b = tuple(np.round(q, 5))
        return (a, b) if a <= b else (b, a)

    edges: dict = {}
    for t in range(tris.shape[0]):
        if not good[t]:
            continue
        for i in range(3):
            p, q = tris[t, i], tris[t, (i + 1) % 3]
            edges.setdefault(key(p, q), []).append(t)

    cos_flat = np.cos(np.radians(min_dihedral_deg))
    out = []
    for (a, b), faces in edges.items():
        if len(faces) == 1:
            out.append((a, b))  # boundary: always a diffractor
        elif len(faces) == 2:
            # SIGNED dot: consistently wound coplanar neighbors have
            # dot ~ +1 (flat, dropped); a double-sided zero-thickness
            # sheet (duplicated faces, flipped winding) has dot ~ -1 and
            # IS a knife edge — abs() would silently drop it
            c = float(np.dot(n[faces[0]], n[faces[1]]))
            if c < cos_flat:  # crease / opposed normals: diffracts
                out.append((a, b))
        # > 2 adjacent faces (e.g. the interior diagonal of a duplicated
        # sheet): non-manifold, coplanar in practice — skipped
    if not out:
        return np.zeros((0, 2, 3), np.float32)
    return np.asarray(out, np.float32)


def _apex(e0, e1, s, l):
    """Closed-form shortest-path point on each edge segment.

    Unfold around the edge line: with axial coordinates s_par/l_par and
    radial distances s_perp/l_perp, the 2D straight line from (s_par,
    s_perp) to (l_par, -l_perp) crosses the axis at the apex; clamp into
    the segment. e0/e1: (E, 3); s/l: (3,). Returns (P (E, 3), on-segment
    interior mask)."""
    d = e1 - e0
    length = jnp.linalg.norm(d, axis=-1)
    u = d / jnp.maximum(length, 1e-12)[:, None]
    sv = s[None, :] - e0
    lv = l[None, :] - e0
    s_par = jnp.sum(sv * u, axis=-1)
    l_par = jnp.sum(lv * u, axis=-1)
    s_perp = jnp.linalg.norm(sv - s_par[:, None] * u, axis=-1)
    l_perp = jnp.linalg.norm(lv - l_par[:, None] * u, axis=-1)
    denom = jnp.maximum(s_perp + l_perp, 1e-12)
    t = s_par + s_perp * (l_par - s_par) / denom
    interior = (t > 0.0) & (t < length)
    t = jnp.clip(t, 0.0, length)
    return e0 + t[:, None] * u, interior


def _leg_clear(scene_arrays, a, b, eps=1e-3):
    d = b - a
    length = jnp.linalg.norm(d, axis=-1)
    safe = jnp.maximum(length, 1e-12)
    a2 = a + d * eps
    t_hit, _, hit = nearest_hit(
        a2, d / safe[..., None],
        scene_arrays.v0, scene_arrays.v1, scene_arrays.v2,
    )
    return (~hit) | (t_hit >= length * (1.0 - 2.0 * eps))


def kurze_anderson_db(fresnel_n):
    """Insertion loss in dB for Fresnel number N > ~0 (Kurze & Anderson
    1971); clamped to >= 0 and evaluated smoothly near N = 0."""
    n = jnp.maximum(fresnel_n, 1e-9)
    x = jnp.sqrt(2.0 * jnp.pi * n)
    return jnp.maximum(5.0 + 20.0 * jnp.log10(x / jnp.tanh(x)), 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def diffraction_ir(
    scene_arrays,
    edges,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
) -> ImpulseResponse:
    """First-order edge-diffraction IR: (n_bands, n_bins) histograms of the
    shadow-zone arrivals over the given edges (extract_edges).

    Additive with trace_ir / image_source_ir / hybrid_ir: it contributes
    ONLY when the direct path is occluded (their direct term is zero
    there). edges: (E, 2, 3)."""
    src = jnp.asarray(source, jnp.float32)
    lst = jnp.asarray(listener, jnp.float32)
    edges = jnp.asarray(edges, jnp.float32)
    n_bins = cfg.ir_n_bins
    if edges.shape[0] == 0:
        z = jnp.zeros((len(EQ_FREQS), n_bins), jnp.float32)
        return ImpulseResponse(energy=z, dir_sum=jnp.zeros((3, n_bins)))

    # shadow-zone gate: the direct ray must be blocked
    d_sl = jnp.linalg.norm(lst - src)
    safe_dir = jnp.where(d_sl < 1e-9, jnp.float32([1, 0, 0]), lst - src)
    t_occ, _, hit = nearest_hit(
        src[None], safe_dir[None] / jnp.maximum(d_sl, 1e-9),
        scene_arrays.v0, scene_arrays.v1, scene_arrays.v2,
    )
    direct_blocked = hit[0] & (t_occ[0] < d_sl)

    p, interior = _apex(edges[:, 0], edges[:, 1], src, lst)
    d_sp = jnp.linalg.norm(p - src[None, :], axis=-1)
    d_pl = jnp.linalg.norm(lst[None, :] - p, axis=-1)
    d_total = d_sp + d_pl
    delta = d_total - d_sl
    legs = _leg_clear(scene_arrays, jnp.broadcast_to(src, p.shape), p) & _leg_clear(
        scene_arrays, p, jnp.broadcast_to(lst, p.shape)
    )
    valid = direct_blocked & legs & (delta > 1e-6) & interior

    lam = cfg.speed_of_sound / EQ_FREQS  # (4,) band wavelengths
    fresnel = 2.0 * delta[:, None] / lam[None, :]
    gain = 10.0 ** (-kurze_anderson_db(fresnel) / 20.0)
    amp = (
        gain / (d_total[:, None] + 1.0) * _air_absorption(d_total, cfg.air_absorption)
    )
    e = amp * amp * jnp.where(valid, 1.0, 0.0)[:, None]

    bps = float(cfg.ir_bins_per_sample)
    spm = cfg.samples_per_meter
    b_raw = d_total * spm * bps + 0.5
    bins = jnp.where(
        valid & (b_raw < n_bins), jnp.clip(b_raw, 0, n_bins - 1), n_bins
    ).astype(jnp.int32)
    energy = jax.ops.segment_sum(e, bins, num_segments=n_bins + 1)[:-1]
    u = (p - lst[None, :]) / jnp.maximum(d_pl, 1e-9)[:, None]
    dsum = jax.ops.segment_sum(
        u * jnp.mean(e, axis=-1, keepdims=True), bins, num_segments=n_bins + 1
    )[:-1]
    return ImpulseResponse(energy=energy.T, dir_sum=dsum.T)
