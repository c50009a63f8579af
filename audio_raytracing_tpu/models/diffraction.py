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

A second, higher-fidelity coefficient is available: the Uniform Theory of
Diffraction wedge coefficient (Kouyoumjian & Pathak 1974) via
`extract_wedges` + `diffraction_ir_utd` — true wedge geometry (exterior
angle n*pi measured in the air sector, incidence/diffraction angles from
the o-face, oblique-incidence sin(beta0), per-face reflection coefficients
from surface absorption) with the four-cotangent coefficient, the Fresnel
transition function, and the analytic shadow-boundary limit (so the
diffracted field approaches half the incident field at the boundary). All
complex arithmetic is explicit re/im pairs — the axon TPU runtime has no
complex64.

TPU mapping: edges are extracted host-side once (mesh topology, NumPy) and
padded; apex/detour/gating/attenuation are fully batched jnp over all
edges, occlusion legs are dense nearest-hits — one jit per (scene, edges)
shape.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..ops.eq import EQ_FREQS
from ..ops.intersect import nearest_hit
from .ir import ImpulseResponse, _air_amplitude


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


def _apex_b(e0, e1, s, l):
    """_apex with batched per-row source/listener points: e0/e1 (P, 3),
    s/l (P, 3) or (3,). Returns (P (P, 3), interior (P,))."""
    d = e1 - e0
    length = jnp.linalg.norm(d, axis=-1)
    u = d / jnp.maximum(length, 1e-12)[:, None]
    sv = jnp.broadcast_to(s, e0.shape) - e0
    lv = jnp.broadcast_to(l, e0.shape) - e0
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


def _band_freqs(cfg):
    """Band frequencies for diffraction wavenumbers/wavelengths, per
    cfg.diffraction_band_model: "pseudo" keeps the reference's EQ
    pseudo-frequency constants (continuity with the pre-UTD Kurze-Anderson
    behavior and the EQ/air parity surface), "physical" uses the measured
    LR2 band centers AIR_BAND_HZ — the physically meaningful choice for
    the UTD wedge coefficient (r1 ADVICE: band 0 at 4 Hz puts lambda at
    ~87 m, far off the band's real ~64 Hz center)."""
    if cfg.diffraction_band_model == "physical":
        from .ir import AIR_BAND_HZ

        return np.asarray(AIR_BAND_HZ, np.float32)
    if cfg.diffraction_band_model != "pseudo":
        raise ValueError(
            f"diffraction_band_model must be 'pseudo' or 'physical', got "
            f"{cfg.diffraction_band_model!r}"
        )
    return EQ_FREQS


def kurze_anderson_db(fresnel_n):
    """Insertion loss in dB for Fresnel number N > ~0 (Kurze & Anderson
    1971); clamped to >= 0 and evaluated smoothly near N = 0."""
    n = jnp.maximum(fresnel_n, 1e-9)
    x = jnp.sqrt(2.0 * jnp.pi * n)
    return jnp.maximum(5.0 + 20.0 * jnp.log10(x / jnp.tanh(x)), 0.0)


@partial(jax.jit, static_argnames=("cfg", "src_directivity"))
def diffraction_ir(
    scene_arrays,
    edges,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    src_directivity=None,
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

    lam = cfg.speed_of_sound / _band_freqs(cfg)  # (4,) band wavelengths
    fresnel = 2.0 * delta[:, None] / lam[None, :]
    gain = 10.0 ** (-kurze_anderson_db(fresnel) / 20.0)
    if src_directivity is not None:
        from .directivity import directivity_gain

        gain = gain * directivity_gain(p - src[None, :], src_directivity)
    amp = (
        gain / (d_total[:, None] + 1.0) * _air_amplitude(d_total, cfg)
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


# ---------------------------------------------------------------------------
# UTD wedge diffraction (Kouyoumjian & Pathak 1974)
# ---------------------------------------------------------------------------


class WedgeSet(NamedTuple):
    """Per-edge wedge geometry for the UTD coefficient (extract_wedges).

    edges (E, 2, 3) endpoints; xhat (E, 3) o-face tangent (perpendicular to
    the edge, in the o-face plane, pointing into the face); yhat (E, 3)
    completes the frame so that sweeping from xhat toward yhat traverses
    the AIR sector; n_w (E,) exterior wedge index (air sector span / pi,
    2.0 = thin screen); face_o/face_n (E,) adjacent triangle indices (equal
    for boundary edges) used for per-face reflection coefficients."""

    edges: np.ndarray
    xhat: np.ndarray
    yhat: np.ndarray
    n_w: np.ndarray
    face_o: np.ndarray
    face_n: np.ndarray


def extract_wedges(triangles: np.ndarray, min_dihedral_deg: float = 10.0) -> WedgeSet:
    """Diffracting edges WITH wedge geometry (host-side, once per scene).

    Same edge selection as extract_edges; additionally derives, per edge,
    the air-sector frame and exterior wedge index the UTD coefficient
    needs. The air sector is identified from the adjacent face normals:
    each face's normal points into the air, so the sector whose bisector
    has positive dot with both normals is air (mixed-sign windings fall
    back to the sum-of-normals test); boundary edges and zero-thickness
    sheets are thin screens (n_w = 2)."""
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
            edges.setdefault(key(p, q), []).append((t, i))

    def tangent(t, a, b):
        """In-plane unit tangent of face t, perpendicular to edge (a, b),
        pointing from the edge into the triangle."""
        w = np.asarray(b, np.float32) - np.asarray(a, np.float32)
        w = w / max(np.linalg.norm(w), 1e-12)
        # third vertex = the one not on the edge
        pts = tris[t]
        da = np.linalg.norm(pts - np.asarray(a, np.float32), axis=-1)
        db = np.linalg.norm(pts - np.asarray(b, np.float32), axis=-1)
        c = pts[np.argmax(np.minimum(da, db))]
        v = c - np.asarray(a, np.float32)
        v = v - np.dot(v, w) * w
        return v / max(np.linalg.norm(v), 1e-12), w

    cos_flat = np.cos(np.radians(min_dihedral_deg))
    E, X, Y, NW, FO, FN = [], [], [], [], [], []
    for (a, b), faces in edges.items():
        a3 = np.asarray(a, np.float32)
        b3 = np.asarray(b, np.float32)
        if len(faces) == 1:
            t0 = faces[0][0]
            x, w = tangent(t0, a, b)
            E.append((a3, b3)); X.append(x); Y.append(np.cross(w, x))
            NW.append(2.0); FO.append(t0); FN.append(t0)
        elif len(faces) == 2:
            t0, t1 = faces[0][0], faces[1][0]
            c = float(np.dot(n[t0], n[t1]))
            if c >= cos_flat:
                continue  # flat interior edge
            x, w = tangent(t0, a, b)
            t2v, _ = tangent(t1, a, b)
            s = x + t2v
            if np.linalg.norm(s) < 1e-6:
                # opposed tangents (zero-thickness sheet): thin screen
                E.append((a3, b3)); X.append(x); Y.append(np.cross(w, x))
                NW.append(2.0); FO.append(t0); FN.append(t1)
                continue
            u = s / np.linalg.norm(s)
            alpha = float(np.arccos(np.clip(np.dot(x, t2v), -1.0, 1.0)))
            d0, d1 = float(np.dot(u, n[t0])), float(np.dot(u, n[t1]))
            if d0 > 0 and d1 > 0:
                air_span = alpha  # short sector is air
            elif d0 < 0 and d1 < 0:
                air_span = 2.0 * np.pi - alpha
            else:  # inconsistent winding: majority vote
                air_span = alpha if (d0 + d1) > 0 else 2.0 * np.pi - alpha
            nw = air_span / np.pi
            # yhat: sweeping from xhat by +angle must cross AIR and land on
            # the n-face tangent at angle nw*pi
            y = np.cross(w, x)
            ang = float(np.arctan2(np.dot(t2v, y), np.dot(t2v, x))) % (2.0 * np.pi)
            if abs(ang - air_span) > abs((2.0 * np.pi - ang) - air_span):
                y = -y
            E.append((a3, b3)); X.append(x); Y.append(y)
            NW.append(nw); FO.append(t0); FN.append(t1)
        # >2 adjacent faces: non-manifold, skipped (as in extract_edges)
    if not E:
        z3 = np.zeros((0, 3), np.float32)
        return WedgeSet(np.zeros((0, 2, 3), np.float32), z3, z3,
                        np.zeros((0,), np.float32),
                        np.zeros((0,), np.int32), np.zeros((0,), np.int32))
    return WedgeSet(
        np.asarray(E, np.float32), np.asarray(X, np.float32),
        np.asarray(Y, np.float32), np.asarray(NW, np.float32),
        np.asarray(FO, np.int32), np.asarray(FN, np.int32),
    )


def _fresnel_transition(x):
    """UTD transition function F(X) = 2j sqrt(X) e^{jX} int_{sqrt(X)}^inf
    e^{-j tau^2} d tau, as (re, im), X >= 0.

    With the Fresnel-integral auxiliary functions f, g (Abramowitz &
    Stegun 7.3.5-7.3.10, rational fits 7.3.32-33, |err| <= 2e-3) the
    expression collapses exactly to F(X) = sqrt(2 pi X) (f(u) + j g(u)),
    u = sqrt(2X/pi). The large-X tail switches to the asymptotic
    F ~ 1 + j/(2X) (the rational fits' relative error grows as both f, g
    -> 0)."""
    x = jnp.maximum(x, 1e-12)
    u = jnp.sqrt(2.0 * x / jnp.pi)
    f = (1.0 + 0.926 * u) / (2.0 + 1.792 * u + 3.104 * u * u)
    g = 1.0 / (2.0 + 4.142 * u + 3.492 * u * u + 6.67 * u * u * u)
    s = jnp.sqrt(2.0 * jnp.pi * x)
    big = x > 8.0
    re = jnp.where(big, 1.0, s * f)
    im = jnp.where(big, 0.5 / x, s * g)
    return re, im


_SQ2O2 = 0.7071067811865476  # cos(pi/4) = sin(pi/4)


def _utd_term(gamma, n_w, kl):
    """One cotangent term of the UTD coefficient, as (re, im).

    gamma = pi +/- beta; kl = k * L (..., bands). Regular form
    cot(gamma / 2n) * F(kL * a), a = 2 sin^2(eps/2) with eps the distance
    to the nearest shadow/reflection boundary; within ~1e-3 rad of a
    boundary the analytic Kouyoumjian-Pathak limit
    n e^{j pi/4} (sqrt(2 pi kL) sgn(eps) - 2 kL eps e^{j pi/4}) replaces
    the 0 * inf product."""
    nn = n_w[..., None]
    big_n = jnp.round(gamma / (2.0 * jnp.pi * n_w))
    eps = (gamma - 2.0 * jnp.pi * n_w * big_n)[..., None]
    a = 2.0 * jnp.sin(eps / 2.0) ** 2
    fre, fim = _fresnel_transition(kl * a)
    half = (gamma / (2.0 * n_w))[..., None]
    sin_h = jnp.sin(half)
    safe = jnp.where(jnp.abs(sin_h) < 1e-6, 1.0, sin_h)
    cot = jnp.cos(half) / safe
    reg_re = cot * fre
    reg_im = cot * fim
    root = jnp.sqrt(2.0 * jnp.pi * kl) * jnp.sign(eps)
    # n * (sqrt(2 pi kL) sgn(eps) e^{j pi/4} - 2 kL eps e^{j pi/2})
    lim_re = nn * root * _SQ2O2
    lim_im = nn * (root * _SQ2O2 - 2.0 * kl * eps)
    near = jnp.abs(eps) < 1e-3
    return jnp.where(near, lim_re, reg_re), jnp.where(near, lim_im, reg_im)


def _utd_gain(xh, yh, n_w, r_o, r_n, w_unit, p, s_pt, l_pt, s_in, s_out, k):
    """|D| (P, bands) of the four-term Kouyoumjian-Pathak coefficient for
    wedges at apex points p, with incident points s_pt and outgoing points
    l_pt (all (P, 3)).

    s_in/s_out are the distance parameters entering L = s_in s_out /
    (s_in + s_out) sin^2(beta0) — for first-order diffraction they are the
    actual leg lengths; for a cascaded (edge-to-edge) wedge the incident
    distance is the accumulated path from the source (Kouyoumjian's
    continuation of the spherical spreading), so they are passed
    separately from the geometry."""
    sv = s_pt - p
    lv = l_pt - p
    sp = sv - jnp.sum(sv * w_unit, axis=-1, keepdims=True) * w_unit
    lp = lv - jnp.sum(lv * w_unit, axis=-1, keepdims=True) * w_unit
    sp_n = jnp.linalg.norm(sp, axis=-1)
    two_pi = 2.0 * jnp.pi
    phi0 = jnp.mod(
        jnp.arctan2(jnp.sum(sp * yh, axis=-1), jnp.sum(sp * xh, axis=-1)), two_pi
    )
    phi = jnp.mod(
        jnp.arctan2(jnp.sum(lp * yh, axis=-1), jnp.sum(lp * xh, axis=-1)), two_pi
    )
    span = n_w * jnp.pi
    phi0 = jnp.clip(phi0, 0.0, span)
    phi = jnp.clip(phi, 0.0, span)
    sin_b0 = jnp.clip(
        sp_n / jnp.maximum(jnp.linalg.norm(sv, axis=-1), 1e-9), 1e-3, 1.0
    )

    L = s_in * s_out / jnp.maximum(s_in + s_out, 1e-9) * sin_b0 * sin_b0
    kl = L[:, None] * k[None, :]  # (P, bands)

    b_minus = phi - phi0
    b_plus = phi + phi0
    t1r, t1i = _utd_term(jnp.pi + b_minus, n_w, kl)
    t2r, t2i = _utd_term(jnp.pi - b_minus, n_w, kl)
    t3r, t3i = _utd_term(jnp.pi + b_plus, n_w, kl)
    t4r, t4i = _utd_term(jnp.pi - b_plus, n_w, kl)
    sum_r = t1r + t2r + r_n * t3r + r_o * t4r
    sum_i = t1i + t2i + r_n * t3i + r_o * t4i
    denom = 2.0 * n_w[:, None] * jnp.sqrt(2.0 * jnp.pi * k)[None, :] * sin_b0[:, None]
    return jnp.sqrt(sum_r * sum_r + sum_i * sum_i) / denom  # (P, bands)


@partial(jax.jit, static_argnames=("cfg", "src_directivity"))
def diffraction_ir_utd(
    scene_arrays,
    wedges: WedgeSet,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    src_directivity=None,
) -> ImpulseResponse:
    """First-order UTD wedge-diffraction IR (Kouyoumjian & Pathak 1974).

    Same gating and histogram semantics as diffraction_ir (shadow zone
    only, additive with the other families), but the per-band attenuation
    is the true wedge coefficient: exterior angle n*pi from the extracted
    wedge geometry, angles phi0/phi measured from the o-face in the air
    sector, oblique incidence via sin(beta0), spherical-wave distance
    parameter L = s s'/(s+s') sin^2(beta0), per-face reflection
    coefficients R = sqrt(1 - absorption) on the (phi +/- phi0)
    image terms. Gain is |D| relative to the free field at the diffracted
    path length: |D| sqrt((s+s')/(s s')). wedges: extract_wedges output."""
    src = jnp.asarray(source, jnp.float32)
    lst = jnp.asarray(listener, jnp.float32)
    edges = jnp.asarray(wedges.edges, jnp.float32)
    n_bins = cfg.ir_n_bins
    if edges.shape[0] == 0:
        z = jnp.zeros((len(EQ_FREQS), n_bins), jnp.float32)
        return ImpulseResponse(energy=z, dir_sum=jnp.zeros((3, n_bins)))
    xh = jnp.asarray(wedges.xhat)
    yh = jnp.asarray(wedges.yhat)
    n_w = jnp.asarray(wedges.n_w)

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

    # wedge-frame angles at the apex
    w = edges[:, 1] - edges[:, 0]
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
    k = 2.0 * jnp.pi * _band_freqs(cfg) / cfg.speed_of_sound  # (4,)
    keep = jnp.sqrt(jnp.clip(1.0 - scene_arrays.absorption, 0.0, 1.0))  # (T, 4)
    r_o = keep[jnp.asarray(wedges.face_o)]
    r_n = keep[jnp.asarray(wedges.face_n)]
    d_mag = _utd_gain(
        xh, yh, n_w, r_o, r_n, w, p,
        jnp.broadcast_to(src, p.shape), jnp.broadcast_to(lst, p.shape),
        d_sp, d_pl, k,
    )  # (E, 4)
    gain = d_mag * jnp.sqrt(
        d_total / jnp.maximum(d_sp * d_pl, 1e-12)
    )[:, None]
    if src_directivity is not None:
        from .directivity import directivity_gain

        gain = gain * directivity_gain(p - src[None, :], src_directivity)

    amp = (
        gain / (d_total[:, None] + 1.0) * _air_amplitude(d_total, cfg)
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


@partial(jax.jit, static_argnames=("cfg", "n_iters", "src_directivity"))
def diffraction_ir_utd2(
    scene_arrays,
    wedges: WedgeSet,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    n_iters: int = 12,
    src_directivity=None,
) -> ImpulseResponse:
    """Second-order (edge-to-edge) UTD diffraction over all ordered wedge
    pairs — the path family a single edge cannot produce (e.g. across a
    thick barrier or a pair of screens, where every first-order apex leg
    is blocked).

    Geometry: the stationary (Fermat) double-apex path src -> p1 on edge
    i -> p2 on edge j -> lst is found by alternating the closed-form
    single-edge apex solve (_apex_b) n_iters times — each step is the
    exact optimum for one apex holding the other fixed, so the pair
    iteration converges to the joint shortest path; non-stationary pairs
    (the straight continuation misses the second edge) end CLAMPED to an
    edge endpoint and are discarded by the interior masks, which is also
    what prevents double counting against first-order paths.

    Amplitude: cascaded Kouyoumjian-Pathak coefficients with LOCAL
    spherical distance parameters — wedge i sees (s_in, s_out) =
    (s1, s2), wedge j sees (s2, s3), i.e. each wedge treats the previous
    apex as a point source. The alternative (Kouyoumjian's continuation,
    s_in = s1 + s2 at the second wedge) is slightly more accurate inside
    transition zones but breaks acoustic reciprocity (swapping source and
    listener changes the L parameters); the local choice keeps the
    swapped path's {L} set identical, and reciprocity is tested. Total
    field D1 D2 sqrt(1/(s1 s2 s3 d_total)) expressed in this module's
    free-field-relative convention as
    gain = |D1||D2| sqrt(d_total/(s1 s2 s3)).

    Includes strip/slit double diffraction: for a single finite screen
    the top->bottom (and side->side) edge pairs are genuine stationary
    double-diffracted rays (Keller's strip problem) whose connecting leg
    grazes the sheet — they survive the gating and contribute below the
    first-order field.

    Cost: dense over E^2 ordered pairs (each with three nearest-hit
    occlusion legs) — fine for room-scale wedge counts (E <= a few
    hundred); prune the WedgeSet first for city-scale scenes.
    """
    src = jnp.asarray(source, jnp.float32)
    lst = jnp.asarray(listener, jnp.float32)
    edges = jnp.asarray(wedges.edges, jnp.float32)
    n_bins = cfg.ir_n_bins
    E = edges.shape[0]
    if E < 2:
        z = jnp.zeros((len(EQ_FREQS), n_bins), jnp.float32)
        return ImpulseResponse(energy=z, dir_sum=jnp.zeros((3, n_bins)))

    i = jnp.repeat(jnp.arange(E), E)
    j = jnp.tile(jnp.arange(E), E)
    e0i, e1i = edges[i, 0], edges[i, 1]
    e0j, e1j = edges[j, 0], edges[j, 1]

    # direct must be blocked (additive with the other families)
    d_sl = jnp.linalg.norm(lst - src)
    safe_dir = jnp.where(d_sl < 1e-9, jnp.float32([1, 0, 0]), lst - src)
    t_occ, _, hit = nearest_hit(
        src[None], safe_dir[None] / jnp.maximum(d_sl, 1e-9),
        scene_arrays.v0, scene_arrays.v1, scene_arrays.v2,
    )
    direct_blocked = hit[0] & (t_occ[0] < d_sl)

    # alternating Fermat solve for the double apex
    p2 = 0.5 * (e0j + e1j)
    p1 = 0.5 * (e0i + e1i)
    int1 = int2 = jnp.ones(E * E, bool)
    for _ in range(n_iters):
        p1, int1 = _apex_b(e0i, e1i, src, p2)
        p2, int2 = _apex_b(e0j, e1j, p1, lst)

    s1 = jnp.linalg.norm(p1 - src[None, :], axis=-1)
    s2 = jnp.linalg.norm(p2 - p1, axis=-1)
    s3 = jnp.linalg.norm(lst[None, :] - p2, axis=-1)
    d_total = s1 + s2 + s3
    delta = d_total - d_sl

    legs = (
        _leg_clear(scene_arrays, jnp.broadcast_to(src, p1.shape), p1)
        & _leg_clear(scene_arrays, p1, p2)
        & _leg_clear(scene_arrays, p2, jnp.broadcast_to(lst, p2.shape))
    )
    valid = (
        direct_blocked & legs & int1 & int2
        & (i != j) & (s2 > 1e-4) & (delta > 1e-6)
    )

    k = 2.0 * jnp.pi * _band_freqs(cfg) / cfg.speed_of_sound  # (4,)
    keep = jnp.sqrt(jnp.clip(1.0 - scene_arrays.absorption, 0.0, 1.0))
    xh = jnp.asarray(wedges.xhat)
    yh = jnp.asarray(wedges.yhat)
    n_w = jnp.asarray(wedges.n_w)
    r_o = keep[jnp.asarray(wedges.face_o)]
    r_n = keep[jnp.asarray(wedges.face_n)]
    w = edges[:, 1] - edges[:, 0]
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)

    d1 = _utd_gain(
        xh[i], yh[i], n_w[i], r_o[i], r_n[i], w[i], p1,
        jnp.broadcast_to(src, p1.shape), p2, s1, s2, k,
    )
    d2 = _utd_gain(
        xh[j], yh[j], n_w[j], r_o[j], r_n[j], w[j], p2,
        p1, jnp.broadcast_to(lst, p2.shape), s2, s3, k,
    )
    gain = d1 * d2 * jnp.sqrt(
        d_total / jnp.maximum(s1 * s2 * s3, 1e-12)
    )[:, None]
    if src_directivity is not None:
        from .directivity import directivity_gain

        gain = gain * directivity_gain(p1 - src[None, :], src_directivity)

    amp = (
        gain / (d_total[:, None] + 1.0)
        * _air_amplitude(d_total, cfg)
    )
    e = amp * amp * jnp.where(valid, 1.0, 0.0)[:, None]

    bps = float(cfg.ir_bins_per_sample)
    spm = cfg.samples_per_meter
    b_raw = d_total * spm * bps + 0.5
    bins = jnp.where(
        valid & (b_raw < n_bins), jnp.clip(b_raw, 0, n_bins - 1), n_bins
    ).astype(jnp.int32)
    energy = jax.ops.segment_sum(e, bins, num_segments=n_bins + 1)[:-1]
    u = (p2 - lst[None, :]) / jnp.maximum(s3, 1e-9)[:, None]
    dsum = jax.ops.segment_sum(
        u * jnp.mean(e, axis=-1, keepdims=True), bins, num_segments=n_bins + 1
    )[:-1]
    return ImpulseResponse(energy=energy.T, dir_sum=dsum.T)


def diffraction_ir_utd3(
    scene_arrays,
    wedges: WedgeSet,
    source,
    listener,
    cfg: Config = DEFAULT_CONFIG,
    n_iters: int = 12,
    src_directivity=None,
    capacity: int = 1 << 15,
) -> ImpulseResponse:
    """Third-order (edge-to-edge-to-edge) UTD diffraction over all
    ordered wedge triples — the last path family of the deferred
    diffraction roadmap (NEXT.md D): three cascaded barriers, deep
    multi-screen shadow zones, and the strip's triple bounce (i == k
    with distinct apexes is allowed; only consecutive wedges must
    differ).

    Same construction as diffraction_ir_utd2 one order up: the
    stationary triple-apex path src -> p1 (edge i) -> p2 (edge j) ->
    p3 (edge k) -> lst from cyclically alternating the closed-form
    single-edge solve (_apex_b) n_iters times; non-stationary triples
    end clamped to an endpoint and are discarded by the interior masks.
    Cascaded Kouyoumjian-Pathak coefficients with LOCAL (reciprocal)
    distance parameters — wedge i sees (s1, s2), j (s2, s3), k (s3,
    s4) — and total free-field-relative gain
    |D1||D2||D3| sqrt(d_total / (s1 s2 s3 s4)).

    Cost: the Fermat/interior GEOMETRY phase is dense over E^3 ordered
    triples but scene-free (~50 flops/row); the expensive stages — four
    nearest-hit occlusion legs and three Fresnel coefficient cascades —
    run only on the first `capacity` geometry survivors after a
    nonzero(size=capacity) compaction (the models/ism.py two-phase
    pattern; a dense E=98 room measured 512 s on CPU, the compacted
    form ~1 s). Survivors beyond capacity are silently dropped —
    raise `capacity` for dense multi-barrier scenes. Rarely audible
    over the hybrid tail (each extra order sheds energy fast); provided
    for completeness of the deterministic family.
    """
    src = jnp.asarray(source, jnp.float32)
    lst = jnp.asarray(listener, jnp.float32)
    edges = jnp.asarray(wedges.edges, jnp.float32)
    n_bins = cfg.ir_n_bins
    E = edges.shape[0]
    if E < 2:
        z = jnp.zeros((len(EQ_FREQS), n_bins), jnp.float32)
        return ImpulseResponse(energy=z, dir_sum=jnp.zeros((3, n_bins)))

    ar = jnp.arange(E)
    i = jnp.repeat(ar, E * E)
    j = jnp.tile(jnp.repeat(ar, E), E)
    kx = jnp.tile(ar, E * E)
    e0i, e1i = edges[i, 0], edges[i, 1]
    e0j, e1j = edges[j, 0], edges[j, 1]
    e0k, e1k = edges[kx, 0], edges[kx, 1]

    # direct must be blocked (additive with the other families)
    d_sl = jnp.linalg.norm(lst - src)
    safe_dir = jnp.where(d_sl < 1e-9, jnp.float32([1, 0, 0]), lst - src)
    t_occ, _, hit = nearest_hit(
        src[None], safe_dir[None] / jnp.maximum(d_sl, 1e-9),
        scene_arrays.v0, scene_arrays.v1, scene_arrays.v2,
    )
    direct_blocked = hit[0] & (t_occ[0] < d_sl)

    # phase 1 (dense, scene-free): cyclic alternating Fermat solve for
    # the triple apex + interiority/degeneracy gates
    p1 = 0.5 * (e0i + e1i)
    p2 = 0.5 * (e0j + e1j)
    p3 = 0.5 * (e0k + e1k)
    int1 = int2 = int3 = jnp.ones(E * E * E, bool)
    for _ in range(n_iters):
        p1, int1 = _apex_b(e0i, e1i, src, p2)
        p2, int2 = _apex_b(e0j, e1j, p1, p3)
        p3, int3 = _apex_b(e0k, e1k, p2, lst)

    s1 = jnp.linalg.norm(p1 - src[None, :], axis=-1)
    s2 = jnp.linalg.norm(p2 - p1, axis=-1)
    s3 = jnp.linalg.norm(p3 - p2, axis=-1)
    s4 = jnp.linalg.norm(lst[None, :] - p3, axis=-1)
    d_total = s1 + s2 + s3 + s4
    delta = d_total - d_sl

    geo_ok = (
        direct_blocked & int1 & int2 & int3
        & (i != j) & (j != kx) & (s2 > 1e-4) & (s3 > 1e-4)
        & (delta > 1e-6)
    )

    # phase 2 (compacted): occlusion legs + cascaded coefficients on the
    # first `capacity` survivors only
    sel = jnp.nonzero(geo_ok, size=capacity, fill_value=0)[0]
    # fill rows repeat index 0 (which may itself be a survivor): mask by
    # position against the true survivor count, not by geo_ok[sel]
    alive = jnp.arange(capacity) < jnp.sum(geo_ok.astype(jnp.int32))
    i, j, kx = i[sel], j[sel], kx[sel]
    p1, p2, p3 = p1[sel], p2[sel], p3[sel]
    s1, s2, s3, s4 = s1[sel], s2[sel], s3[sel], s4[sel]
    d_total, delta = d_total[sel], delta[sel]

    legs = (
        _leg_clear(scene_arrays, jnp.broadcast_to(src, p1.shape), p1)
        & _leg_clear(scene_arrays, p1, p2)
        & _leg_clear(scene_arrays, p2, p3)
        & _leg_clear(scene_arrays, p3, jnp.broadcast_to(lst, p3.shape))
    )
    valid = alive & legs

    k = 2.0 * jnp.pi * _band_freqs(cfg) / cfg.speed_of_sound  # (4,)
    keep = jnp.sqrt(jnp.clip(1.0 - scene_arrays.absorption, 0.0, 1.0))
    xh = jnp.asarray(wedges.xhat)
    yh = jnp.asarray(wedges.yhat)
    n_w = jnp.asarray(wedges.n_w)
    r_o = keep[jnp.asarray(wedges.face_o)]
    r_n = keep[jnp.asarray(wedges.face_n)]
    w = edges[:, 1] - edges[:, 0]
    w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)

    d1 = _utd_gain(
        xh[i], yh[i], n_w[i], r_o[i], r_n[i], w[i], p1,
        jnp.broadcast_to(src, p1.shape), p2, s1, s2, k,
    )
    d2 = _utd_gain(
        xh[j], yh[j], n_w[j], r_o[j], r_n[j], w[j], p2,
        p1, p3, s2, s3, k,
    )
    d3 = _utd_gain(
        xh[kx], yh[kx], n_w[kx], r_o[kx], r_n[kx], w[kx], p3,
        p2, jnp.broadcast_to(lst, p3.shape), s3, s4, k,
    )
    gain = d1 * d2 * d3 * jnp.sqrt(
        d_total / jnp.maximum(s1 * s2 * s3 * s4, 1e-12)
    )[:, None]
    if src_directivity is not None:
        from .directivity import directivity_gain

        gain = gain * directivity_gain(p1 - src[None, :], src_directivity)

    amp = (
        gain / (d_total[:, None] + 1.0)
        * _air_amplitude(d_total, cfg)
    )
    e = amp * amp * jnp.where(valid, 1.0, 0.0)[:, None]

    bps = float(cfg.ir_bins_per_sample)
    spm = cfg.samples_per_meter
    b_raw = d_total * spm * bps + 0.5
    bins = jnp.where(
        valid & (b_raw < n_bins), jnp.clip(b_raw, 0, n_bins - 1), n_bins
    ).astype(jnp.int32)
    energy = jax.ops.segment_sum(e, bins, num_segments=n_bins + 1)[:-1]
    u = (p3 - lst[None, :]) / jnp.maximum(s4, 1e-9)[:, None]
    dsum = jax.ops.segment_sum(
        u * jnp.mean(e, axis=-1, keepdims=True), bins, num_segments=n_bins + 1
    )[:-1]
    return ImpulseResponse(energy=energy.T, dir_sum=dsum.T)
