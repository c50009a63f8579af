"""Image-source model: analytic single-wall and box-room cases, occlusion,
alignment with the Monte-Carlo specular tracer."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.models.ir import fibonacci_sphere, trace_ir
from audio_raytracing_tpu.models.ism import (
    image_source_ir,
    plane_groups,
)
from audio_raytracing_tpu.models.scene import Scene, box_room
from audio_raytracing_tpu.ops.eq import EQ_FREQS

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096)


def wall_at_x(w=3.0, absorption=0.2):
    tris = np.float32(
        [
            [[w, -5, -5], [w, 5, -5], [w, 5, 5]],
            [[w, -5, -5], [w, 5, 5], [w, -5, 5]],
        ]
    )
    return Scene.from_triangles(tris, CFG, absorption=np.full(2, absorption, np.float32))


def test_order1_single_wall_analytic():
    """One wall at x=3: image at (6-sx); delay and per-band amplitude exact."""
    a = 0.2
    scene = wall_at_x(3.0, a)
    src = jnp.asarray([1.0, 0.3, 0.2])
    lst = jnp.asarray([0.0, -0.4, 0.1])
    ir = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1,
                         include_direct=False)
    image = np.float32([6.0 - 1.0, 0.3, 0.2])
    d = float(np.linalg.norm(image - np.asarray(lst)))
    want_bin = int(round(d * CFG.samples_per_meter * CFG.ir_bins_per_sample))
    e = np.asarray(ir.energy)
    assert e[:, want_bin].sum() > 0
    # only that bin carries energy
    others = e.sum() - e[:, want_bin].sum()
    np.testing.assert_allclose(others, 0.0, atol=1e-12)
    amp = np.sqrt(1 - a) / (d + 1) * np.clip(1 - CFG.air_absorption * d * EQ_FREQS, 0, 1)
    np.testing.assert_allclose(e[:, want_bin], amp * amp, rtol=1e-5)
    # arrival direction points listener -> reflection point (+x-ish)
    ds = np.asarray(ir.dir_sum)
    assert ds[0, want_bin] > 0


def test_order1_reflection_point_outside_wall_invalid():
    """Listener+source positioned so the mirror path would cross the plane
    outside the finite wall: no contribution."""
    scene = wall_at_x(3.0)
    src = jnp.asarray([1.0, 30.0, 0.0])  # reflection point near y~15, off the wall
    lst = jnp.asarray([0.0, 25.0, 0.0])
    ir = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1,
                         include_direct=False)
    assert float(ir.energy.sum()) == 0.0


def test_order1_occluded_by_blocker():
    """A second wall between the listener and the reflector kills the path."""
    w = 3.0
    tris = np.concatenate(
        [
            np.float32([[[w, -5, -5], [w, 5, -5], [w, 5, 5]],
                        [[w, -5, -5], [w, 5, 5], [w, -5, 5]]]),
            # blocker at x=2 spanning everything
            np.float32([[[2, -5, -5], [2, 5, -5], [2, 5, 5]],
                        [[2, -5, -5], [2, 5, 5], [2, -5, 5]]]),
        ]
    )
    scene = Scene.from_triangles(tris, CFG)
    src = jnp.asarray([1.0, 0.3, 0.2])
    lst = jnp.asarray([0.0, -0.4, 0.1])
    ir = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1,
                         include_direct=False)
    e = np.asarray(ir.energy)
    # the x=3 wall's image path is blocked; the x=2 blocker itself reflects
    image_blocked = np.float32([6.0 - 1.0, 0.3, 0.2])
    d_blocked = float(np.linalg.norm(image_blocked - np.asarray(lst)))
    bin_blocked = int(round(d_blocked * CFG.samples_per_meter))
    assert e[:, bin_blocked].sum() == 0.0
    image_near = np.float32([4.0 - 1.0, 0.3, 0.2])
    d_near = float(np.linalg.norm(image_near - np.asarray(lst)))
    bin_near = int(round(d_near * CFG.samples_per_meter))
    assert e[:, bin_near].sum() > 0.0


def test_order2_box_room_analytic_bin():
    """Opposite walls x=+/-4: the 2nd-order image S -> (+x wall) -> (-x wall)
    sits at x = -16 - sx; its bin must carry energy."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 4.0, 6.0)), CFG,
        absorption=np.full(12, 0.2, np.float32),
    )
    src = jnp.asarray([1.0, 0.2, 0.3])
    lst = jnp.asarray([-1.0, -0.2, 0.1])
    ir1 = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1,
                          include_direct=False)
    ir2 = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=2,
                          include_direct=False)
    e1, e2 = np.asarray(ir1.energy), np.asarray(ir2.energy)
    assert e2.sum() > e1.sum()  # order 2 adds arrivals
    # mirror across x=+4 then x=-4: x -> 8 - x -> -8 - (8 - x) = x - 16
    image = np.float32([1.0 - 16.0, 0.2, 0.3])
    d = float(np.linalg.norm(image - np.asarray(lst)))
    b = int(round(d * CFG.samples_per_meter))
    assert e2[:, b].sum() > 0
    assert e1[:, b].sum() == 0  # strictly a 2nd-order arrival
    # direct term toggles
    ir_d = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1)
    assert float(ir_d.energy.sum()) > float(ir1.energy.sum())


def test_ism_arrivals_align_with_traced_peaks():
    """The Monte-Carlo specular tracer puts energy where the image sources
    say the early arrivals are (box room, first-order bins)."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 4.0, 6.0)), CFG,
        absorption=np.full(12, 0.2, np.float32),
    )
    src = jnp.asarray([1.0, 0.2, 0.3])
    lst = jnp.asarray([-1.0, -0.2, 0.1])
    ism = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1,
                          include_direct=False)
    traced = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, max_bounces=1,
                      dirs=jnp.asarray(fibonacci_sphere(1 << 15)),
                      include_direct=False)
    e_ism = np.asarray(ism.energy).mean(axis=0)
    e_tr = np.asarray(traced.energy).mean(axis=0)
    bins = np.nonzero(e_ism)[0]
    assert len(bins) >= 4  # several walls visible
    for b in bins:
        # tracer bins are +-1 from NEE quantization of nearby paths
        assert e_tr[max(0, b - 1) : b + 2].sum() > 0, b


def test_hybrid_ir_composition():
    """Early bins are exactly the ISM field; the traced tail only starts
    after the transition; explicit transition_bin overrides."""
    import jax

    from audio_raytracing_tpu.models.ism import hybrid_ir

    scene = Scene.from_triangles(
        box_room(size=(8.0, 4.0, 6.0)), CFG,
        absorption=np.full(12, 0.2, np.float32),
    )
    src = jnp.asarray([1.0, 0.2, 0.3])
    lst = jnp.asarray([-1.0, -0.2, 0.1])
    key = jax.random.PRNGKey(3)
    hy = hybrid_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1,
                   n_rays=512, max_bounces=6, scattering=0.5, key=key)
    ism = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1)
    e_ism = np.asarray(ism.energy)
    e_hy = np.asarray(hy.energy)
    last = int(np.nonzero(e_ism.sum(axis=0))[0].max())
    np.testing.assert_allclose(e_hy[:, : last + 1], e_ism[:, : last + 1],
                               rtol=1e-6, atol=1e-12)
    assert e_hy[:, last + 1 :].sum() > 0  # traced tail present
    # explicit transition: nothing traced before it
    tr = trace_ir(scene.device_arrays(), src, lst, cfg=CFG, n_rays=512,
                  max_bounces=6, include_direct=False, scattering=0.5,
                  key=key)
    tb = 600
    hy2 = hybrid_ir(scene.device_arrays(), src, lst, cfg=CFG, order=1,
                    n_rays=512, max_bounces=6, scattering=0.5, key=key,
                    transition_bin=tb)
    want = e_ism.copy()
    want[:, tb:] += np.asarray(tr.energy)[:, tb:]
    np.testing.assert_allclose(np.asarray(hy2.energy), want, rtol=1e-5,
                               atol=1e-12)


def test_order3_box_room_analytic_bin_and_amplitude():
    """Third order, opposite x walls: the two symmetric triple-bounce paths
    (+x,-x,+x) and (-x,+x,-x) land in one bin at d = 4*Lx - |dx| with
    energy exactly 2 * (keep^3 / (d+1) * air)^2 per band."""
    a = 0.2
    scene = Scene.from_triangles(
        box_room(size=(8.0, 4.0, 6.0)), CFG,
        absorption=np.full(12, a, np.float32),
    )
    src = jnp.asarray([1.0, 0.2, 0.3])
    lst = jnp.asarray([-1.0, 0.1, -0.2])
    ir2 = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=2,
                          include_direct=False)
    ir3 = image_source_ir(scene.device_arrays(), src, lst, cfg=CFG, order=3,
                          include_direct=False)
    e2, e3 = np.asarray(ir2.energy), np.asarray(ir3.energy)
    # order 3 is a superset of orders 1-2
    assert e3.sum() > e2.sum()
    nz2 = np.nonzero(e2.sum(axis=0))[0]
    # superset: order-3 bins carry at least the order-1/2 energy (third-
    # order arrivals may add into the same bins)
    assert (e3[:, nz2] >= e2[:, nz2] * (1.0 - 1e-6)).all()

    # unfold +x,-x,+x: mirrors across x=4, x=-4, x=4 -> image x = xs + 16... :
    # x -> 8-x -> -8-(8-x) = x-16 -> 8-(x-16) = 24-x; y,z unchanged
    image = np.float32([24.0 - 1.0, 0.2, 0.3])
    d = float(np.linalg.norm(image - np.asarray(lst)))
    b = int(d * CFG.samples_per_meter + 0.5)
    # strictly a third-order arrival (max 2nd-order image distance ~16 m)
    assert e2[:, max(0, b - 2) : b + 3].sum() == 0
    keep = np.sqrt(1.0 - a)
    amp = keep**3 / (d + 1.0) * np.clip(
        1.0 - CFG.air_absorption * d * EQ_FREQS, 0.0, 1.0
    )
    np.testing.assert_allclose(e3[:, b], 2.0 * amp * amp, rtol=1e-3)


def test_order3_fully_absorbing_is_silent():
    scene = Scene.from_triangles(
        box_room(size=(8.0, 4.0, 6.0)), CFG,
        absorption=np.ones(12, np.float32),
    )
    ir3 = image_source_ir(
        scene.device_arrays(), jnp.asarray([1.0, 0.2, 0.3]),
        jnp.asarray([-1.0, 0.1, -0.2]), cfg=CFG, order=3,
        include_direct=False,
    )
    assert float(np.asarray(ir3.energy).sum()) == 0.0


def test_hybrid_order3_smoke():
    import jax

    from audio_raytracing_tpu.models.ism import hybrid_ir

    scene = Scene.from_triangles(
        box_room(size=(8.0, 4.0, 6.0)), CFG,
        absorption=np.full(12, 0.2, np.float32),
    )
    hy = hybrid_ir(scene.device_arrays(), jnp.asarray([1.0, 0.2, 0.3]),
                   jnp.asarray([-1.0, 0.1, -0.2]), cfg=CFG, order=3,
                   n_rays=256, max_bounces=4, key=jax.random.PRNGKey(0))
    e = np.asarray(hy.energy)
    assert np.isfinite(e).all() and e.sum() > 0


def test_order4_corridor_analytic():
    """Two parallel walls: the 4-bounce ABAB/BABA flutter paths have
    closed-form image positions; order=4 adds exactly those two arrivals
    (beyond order 3) at the right bins with the exact amplitude law."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096, triangle_pad=16)
    L = 4.0

    def wall(x):
        return np.float32([
            [[x, -8, -8], [x, 8, -8], [x, 8, 8]],
            [[x, -8, -8], [x, 8, 8], [x, -8, 8]],
        ])

    scene = Scene.from_triangles(np.concatenate([wall(0.0), wall(L)]), cfg)
    src = np.float32([1.0, 0.0, 0.0])
    lst = np.float32([3.0, 0.2, 0.1])
    kw = dict(cfg=cfg, include_direct=False)
    e3 = np.asarray(image_source_ir(
        scene.device_arrays(), jnp.asarray(src), jnp.asarray(lst),
        order=3, **kw).energy)
    e4 = np.asarray(image_source_ir(
        scene.device_arrays(), jnp.asarray(src), jnp.asarray(lst),
        order=4, **kw).energy)
    extra = e4 - e3
    assert extra.min() > -1e-10  # orders accumulate

    # mirror maps: A: x -> -x ; B: x -> 2L - x (applied first-to-last)
    def img_x(seq, x):
        for w in seq:
            x = -x if w == "A" else 2 * L - x
        return x

    spm = cfg.samples_per_meter
    keep = np.sqrt(1.0 - 0.1)  # default absorption
    expect_bins = {}
    for seq in ("ABAB", "BABA"):
        d = np.linalg.norm(np.float32([img_x(seq, src[0]), 0, 0]) - lst)
        air = np.clip(1.0 - cfg.air_absorption * d * np.asarray(EQ_FREQS),
                      0.0, 1.0)
        amp = keep ** 4 / (d + 1.0) * air
        expect_bins[int(d * spm + 0.5)] = amp * amp
    got_bins = set(np.nonzero(extra.sum(axis=0) > 1e-12)[0].tolist())
    assert got_bins == set(expect_bins)
    for b, e in expect_bins.items():
        np.testing.assert_allclose(extra[:, b], e, rtol=1e-4)


@pytest.mark.slow
def test_order4_padding_invariance():
    """The chunked T^4 enumeration gives identical physics at different
    paddings (degenerate padding rows self-mask)."""
    tris = np.float32([
        [[-6, -1, -6], [6, -1, -6], [6, -1, 6]],
        [[-6, -1, -6], [6, -1, 6], [-6, -1, 6]],
        [[-6, 2, -6], [6, 2, 6], [6, 2, -6]],
        [[-6, 2, -6], [-6, 2, 6], [6, 2, 6]],
    ])
    src = jnp.asarray([0.5, 0.4, 0.3])
    lst = jnp.asarray([-0.7, 0.1, -0.4])
    outs = []
    for pad in (8, 32):
        cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096,
                                  triangle_pad=pad)
        sc = Scene.from_triangles(tris, cfg)
        outs.append(np.asarray(image_source_ir(
            sc.device_arrays(), src, lst, cfg=cfg, order=4,
            include_direct=False).energy))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-12)


def test_plane_groups_structure():
    """A subdivided box has exactly 6 unique planes; every real triangle
    lands in exactly one group; padding rows are excluded."""
    from audio_raytracing_tpu.models.scene import box_room_subdivided

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(
        box_room_subdivided(size=(10.0, 4.0, 8.0), k=3), cfg
    )
    arrays = scene.device_arrays()
    pg = plane_groups(arrays)
    assert pg.pn.shape[0] == 6
    mem = np.asarray(pg.members)
    real = mem[mem >= 0]
    assert len(real) == scene.n_triangles
    assert len(set(real.tolist())) == scene.n_triangles
    # plane equations actually hold for every member's vertices
    pn, pd = np.asarray(pg.pn), np.asarray(pg.pd)
    v0 = np.asarray(arrays.v0)
    for p in range(6):
        for t in mem[p][mem[p] >= 0]:
            np.testing.assert_allclose(pn[p] @ v0[t], pd[p], atol=1e-4)


def test_plane_mode_matches_exhaustive_box():
    """Plane enumeration = exhaustive triangle enumeration, orders 2-4,
    box room (every wall is 2 coplanar triangles -> P=6, M=2)."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096,
                              triangle_pad=16)
    scene = Scene.from_triangles(
        box_room(size=(8.0, 4.0, 6.0)), cfg,
        absorption=np.linspace(0.05, 0.4, 12).astype(np.float32),
    )
    arrays = scene.device_arrays()
    pg = plane_groups(arrays)
    src = jnp.asarray([1.0, 0.2, 0.3])
    lst = jnp.asarray([-1.0, -0.2, 0.1])
    for order in (2, 3, 4):
        a = image_source_ir(arrays, src, lst, cfg=cfg, order=order,
                            include_direct=False)
        b = image_source_ir(arrays, src, lst, cfg=cfg, order=order,
                            include_direct=False, planes=pg)
        np.testing.assert_allclose(
            np.asarray(b.energy), np.asarray(a.energy), rtol=1e-5,
            atol=1e-12, err_msg=f"order {order}",
        )
        np.testing.assert_allclose(
            np.asarray(b.dir_sum), np.asarray(a.dir_sum), rtol=1e-4,
            atol=1e-10, err_msg=f"order {order}",
        )


def test_plane_mode_matches_exhaustive_world_obj():
    """Same on real OBJ geometry (world.obj: 114 tris, 80 planes — the
    unstructured case where grouping buys little but must stay exact)."""
    from pathlib import Path

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096)
    obj = Path(__file__).resolve().parent.parent / "data" / "world.obj"
    scene = Scene.from_obj(str(obj), cfg)
    arrays = scene.device_arrays()
    pg = plane_groups(arrays)
    src = jnp.asarray([1.0, 0.3, 0.5])
    lst = jnp.asarray([-1.0, 0.0, -0.5])
    a = image_source_ir(arrays, src, lst, cfg=cfg, order=2,
                        include_direct=False)
    b = image_source_ir(arrays, src, lst, cfg=cfg, order=2,
                        include_direct=False, planes=pg)
    np.testing.assert_allclose(np.asarray(b.energy), np.asarray(a.energy),
                               rtol=1e-5, atol=1e-12)


def test_plane_mode_two_sided_sheet_exact():
    """Coincident duplicated triangles (a two-sided sheet): the membership
    weight sum-of-keep^2 makes the plane path reproduce the exhaustive
    walk's duplicate contributions exactly."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096,
                              triangle_pad=32)
    base = box_room(size=(8.0, 4.0, 6.0))
    # vertical sheet at x=2, BOTH windings (reversed normal), distinct
    # absorptions so the duplicate product matters
    sheet = np.float32([
        [[2, -2, -3], [2, 2, -3], [2, 2, 3]],
        [[2, -2, -3], [2, 2, 3], [2, -2, 3]],
        [[2, -2, -3], [2, 2, 3], [2, 2, -3]],
        [[2, -2, -3], [2, -2, 3], [2, 2, 3]],
    ])
    tris = np.concatenate([base, sheet])
    ab = np.full(len(tris), 0.1, np.float32)
    ab[12:] = [0.2, 0.2, 0.35, 0.35]
    scene = Scene.from_triangles(tris, cfg, absorption=ab)
    arrays = scene.device_arrays()
    pg = plane_groups(arrays)
    # the sheet's 4 triangles share one plane
    assert pg.pn.shape[0] == 7
    src = jnp.asarray([3.0, 0.2, 0.3])
    lst = jnp.asarray([-1.0, -0.2, 0.1])
    for order in (1, 2):
        a = image_source_ir(arrays, src, lst, cfg=cfg, order=order,
                            include_direct=False)
        b = image_source_ir(arrays, src, lst, cfg=cfg, order=order,
                            include_direct=False, planes=pg)
        np.testing.assert_allclose(
            np.asarray(b.energy), np.asarray(a.energy), rtol=1e-5,
            atol=1e-12, err_msg=f"order {order}",
        )


def test_plane_mode_order5_corridor_analytic():
    """Orders 5-6 (plane mode only): corridor flutter ABABA/BABAB images
    have closed-form positions; each order adds exactly those two
    arrivals with amplitude keep^k / (d+1) * air."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=8192,
                              triangle_pad=16)
    L = 4.0

    def wall(x):
        return np.float32([
            [[x, -8, -8], [x, 8, -8], [x, 8, 8]],
            [[x, -8, -8], [x, 8, 8], [x, -8, 8]],
        ])

    scene = Scene.from_triangles(np.concatenate([wall(0.0), wall(L)]), cfg)
    arrays = scene.device_arrays()
    pg = plane_groups(arrays)
    assert pg.pn.shape[0] == 2
    src = np.float32([1.0, 0.0, 0.0])
    lst = np.float32([3.0, 0.2, 0.1])
    kw = dict(cfg=cfg, include_direct=False, planes=pg)

    def img_x(seq, x):
        for w in seq:
            x = -x if w == "A" else 2 * L - x
        return x

    spm = cfg.samples_per_meter
    keep = np.sqrt(1.0 - 0.1)
    prev = np.asarray(image_source_ir(
        arrays, jnp.asarray(src), jnp.asarray(lst), order=4, **kw).energy)
    for k, seqs in ((5, ("ABABA", "BABAB")), (6, ("ABABAB", "BABABA"))):
        cur = np.asarray(image_source_ir(
            arrays, jnp.asarray(src), jnp.asarray(lst), order=k, **kw
        ).energy)
        extra = cur - prev
        assert extra.min() > -1e-10
        expect = {}
        for seq in seqs:
            d = np.linalg.norm(np.float32([img_x(seq, src[0]), 0, 0]) - lst)
            air = np.clip(
                1.0 - cfg.air_absorption * d * np.asarray(EQ_FREQS), 0.0, 1.0
            )
            amp = keep ** k / (d + 1.0) * air
            b = int(d * spm + 0.5)
            # at odd orders the two flutter images sit at the SAME
            # distance (|x_src| and |2L - x_src| unfold symmetrically):
            # their energies sum in one bin
            expect[b] = expect.get(b, 0.0) + amp * amp
        got = set(np.nonzero(extra.sum(axis=0) > 1e-12)[0].tolist())
        assert got == set(expect), f"order {k}"
        for b, e in expect.items():
            np.testing.assert_allclose(extra[:, b], e, rtol=1e-4,
                                       err_msg=f"order {k} bin {b}")
        prev = cur


def test_plane_mode_transmission_and_directivity_parity():
    """Plane mode honors transmissive occluders and source directivity
    identically to the exhaustive path."""
    from audio_raytracing_tpu.models.directivity import Directivity

    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=4096,
                              triangle_pad=32)
    base = box_room(size=(8.0, 4.0, 6.0))
    screen = np.float32([
        [[0, -2, -2], [0, 2, -2], [0, 2, 2]],
        [[0, -2, -2], [0, 2, 2], [0, -2, 2]],
    ])
    tris = np.concatenate([base, screen])
    trans = np.zeros((len(tris), cfg.n_bands), np.float32)
    trans[12:] = 0.6  # the screen passes energy
    scene = Scene.from_triangles(tris, cfg, transmission=trans)
    arrays = scene.device_arrays()
    pg = plane_groups(arrays)
    src = jnp.asarray([2.0, 0.2, 0.3])
    lst = jnp.asarray([-2.0, -0.2, 0.1])
    card = Directivity(axis=(1.0, 0.0, 0.0), alpha=(0.5,) * cfg.n_bands)
    for kwargs in ({}, {"src_directivity": card}):
        a = image_source_ir(arrays, src, lst, cfg=cfg, order=2,
                            include_direct=False, **kwargs)
        b = image_source_ir(arrays, src, lst, cfg=cfg, order=2,
                            include_direct=False, planes=pg, **kwargs)
        np.testing.assert_allclose(
            np.asarray(b.energy), np.asarray(a.energy), rtol=1e-5,
            atol=1e-12,
        )


def test_plane_mode_order_validation():
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(box_room(), cfg)
    arrays = scene.device_arrays()
    pg = plane_groups(arrays)
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    with pytest.raises(ValueError, match="plane_groups"):
        image_source_ir(arrays, src, lst, cfg=cfg, order=5)
    with pytest.raises(ValueError, match="1..6"):
        image_source_ir(arrays, src, lst, cfg=cfg, order=7, planes=pg)


@pytest.mark.slow
def test_hybrid_pallas_tail():
    """tail_backend='pallas' runs the Monte-Carlo tail on the fused
    kernel: for a purely specular tail it matches the xla backend up to
    the bf16 in-kernel binner; scattering tails are deterministic per
    seed."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)
    scene = Scene.from_triangles(box_room(), cfg)
    src = jnp.asarray([1.0, 0.5, 0.5])
    lst = jnp.asarray([-1.0, -0.5, -1.0])
    kw = dict(cfg=cfg, order=1, n_rays=1024, max_bounces=3, scattering=0.0)
    import jax

    from audio_raytracing_tpu.models.ism import hybrid_ir

    a = hybrid_ir(scene.device_arrays(), src, lst,
                  key=jax.random.PRNGKey(0), **kw)
    b = hybrid_ir(scene.device_arrays(), src, lst, tail_backend="pallas",
                  tail_interpret=True, **kw)
    # NOTE the two backends use different direction sets by default
    # (sorted vs unsorted fibonacci) — the histogram totals agree, bins
    # shift within Monte-Carlo noise
    np.testing.assert_allclose(
        float(b.energy.sum()), float(a.energy.sum()), rtol=2e-2
    )
    c = hybrid_ir(scene.device_arrays(), src, lst, tail_backend="pallas",
                  tail_interpret=True, cfg=cfg, order=1, n_rays=1024,
                  max_bounces=3, scattering=0.5, rng_seed=7)
    c2 = hybrid_ir(scene.device_arrays(), src, lst, tail_backend="pallas",
                   tail_interpret=True, cfg=cfg, order=1, n_rays=1024,
                   max_bounces=3, scattering=0.5, rng_seed=7)
    np.testing.assert_array_equal(np.asarray(c.energy), np.asarray(c2.energy))
