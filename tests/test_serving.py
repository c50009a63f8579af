"""Batched multi-stream serving (engine/serving.py): one shared
trace_ir_multi_listener dispatch per acoustic round feeds every stream's
IRStreamRenderer via update(traced_amb=...)."""

import dataclasses
import time

import numpy as np
import pytest

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.engine.ir_stream import IRStreamRenderer
from audio_raytracing_tpu.engine.serving import BatchedAcoustics
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG = dataclasses.replace(
    DEFAULT_CONFIG, ir_length=2048, rays_per_source=512, max_bounces=3
)
SRC = np.float32([1.0, 0.5, 0.5])


@pytest.fixture(autouse=True)
def _no_persistent_compile_cache():
    """Same defense as test_netserve's fixture (see its docstring for
    the full postmortem): coordinator warmups deserialize large
    same-run XLA:CPU cache entries, which segfaulted full-suite runs
    after ~an hour of accumulated process state. This module opts out
    of the persistent cache too — its programs are small."""
    import jax
    from jax._src import compilation_cache as _cc

    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()
    jax.clear_caches()  # fresh compile arena too (see test_netserve)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
    _cc.reset_cache()


POSES = [
    (np.float32([-1.0, -0.5, -1.0]), 0.3),
    (np.float32([0.5, 0.0, 1.5]), -0.8),
]


def make_scene():
    return Scene.from_triangles(
        box_room(size=(6.0, 3.0, 5.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )


def tone():
    return (
        0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / 44100)
    ).astype(np.float32)


def make_coord(scene, n):
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0,
    )
    renderers = []
    handles = []
    for _ in range(n):
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    return coord, renderers, handles


def test_batched_round_matches_solo_updates():
    """One coordinator round produces (per stream) the spectra a solo
    IRStreamRenderer.update at the same pose produces — the batched trace
    is the same acoustics, just one dispatch."""
    scene = make_scene()
    coord, renderers, handles = make_coord(scene, 2)
    coord.warmup(POSES)
    for h, (pos, yaw) in zip(handles, POSES):
        h.request(pos, yaw=yaw)
    coord._round()
    assert all(h.updates == 1 and h.retraces == 1 for h in handles)

    for r, (pos, yaw) in zip(renderers, POSES):
        solo = IRStreamRenderer(scene, CFG)
        solo.add_source(tone(), pos=SRC)
        solo.update(pos, yaw=yaw)
        assert solo.last_update_retraced
        for got, want in zip(r._spectra, solo._spectra):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
            )
        a = r.render(512)
        b = solo.render(512)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_batched_round_applies_dirty_streams_only():
    scene = make_scene()
    coord, renderers, handles = make_coord(scene, 2)
    coord.warmup(POSES)
    handles[0].request(POSES[0][0], yaw=POSES[0][1])
    coord._round()
    assert handles[0].updates == 1 and handles[0].retraces == 1
    assert handles[1].updates == 0
    assert renderers[1]._spectra is None  # untouched until it requests

    # rotation-only request: pose cache keeps the traced IRs (the batched
    # amb for the same position is the same trace), no retrace counted
    handles[0].request(POSES[0][0], yaw=POSES[0][1] + 0.5)
    coord._round()
    assert handles[0].updates == 2 and handles[0].retraces == 1


def test_batched_worker_thread_end_to_end():
    """The threaded path: requests land, the worker batches them, streams
    render finite audio; a scene swap forces a re-trace for everyone."""
    scene = make_scene()
    coord, renderers, handles = make_coord(scene, 2)
    coord.warmup(POSES)
    with coord:
        for h, (pos, yaw) in zip(handles, POSES):
            h.request(pos, yaw=yaw)
        deadline = time.time() + 30.0
        while (
            any(h.updates < 1 for h in handles) and time.time() < deadline
        ):
            time.sleep(0.01)
        assert all(h.updates >= 1 for h in handles)
        # past the direct-path delay (~2.7 m ~ 340 samples)
        out = [h.render(1024) for h in handles]
        assert all(np.isfinite(o).all() for o in out)
        assert all(np.abs(o).max() > 1e-7 for o in out)

        # shared moving geometry: swap arrays -> every stream re-traces
        # at its unchanged pose on the next round
        before = [h.retraces for h in handles]
        coord.set_scene_arrays(scene.device_arrays())
        deadline = time.time() + 30.0
        while (
            any(h.retraces == b for h, b in zip(handles, before))
            and time.time() < deadline
        ):
            time.sleep(0.01)
        assert all(h.retraces == b + 1 for h, b in zip(handles, before))
    assert coord.error is None


def test_batched_hoa_cohort_matches_solo_updates():
    """sh_order cohorts (r5): the coordinator traces per-listener SH
    moments in ONE shared-path dispatch and each stream decodes through
    its own HOA respectra — spectra must match solo
    IRStreamRenderer(sh_order=N).update at the same poses."""
    import pytest

    scene = make_scene()
    order = 2
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, sh_order=order,
    )
    renderers, handles = [], []
    for _ in range(2):
        r = IRStreamRenderer(scene, CFG, sh_order=order)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    # order mismatch is rejected
    with pytest.raises(ValueError, match="sh_order"):
        coord.stream(IRStreamRenderer(scene, CFG))
    coord.warmup(POSES)
    for h, (pos, yaw) in zip(handles, POSES):
        h.request(pos, yaw=yaw)
    coord._round()
    assert all(h.updates == 1 and h.retraces == 1 for h in handles)

    for r, (pos, yaw) in zip(renderers, POSES):
        solo = IRStreamRenderer(scene, CFG, sh_order=order)
        solo.add_source(tone(), pos=SRC)
        solo.update(pos, yaw=yaw)
        for got, want in zip(r._spectra, solo._spectra):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
            )
        a = r.render(512)
        b = solo.render(512)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    # the shared-bank binaural HOA cohort QUALIFIES for the stacked
    # respectra (same (S, 2, P, F) spectra shapes), so the render pump
    # serves HOA too: pump two order-2 streams and bit-match each lane
    # against a solo renderer adopting its stacked slice
    coord2 = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, sh_order=order, render_pump=True,
        pump_chunk_blocks=4, pump_prefill=False,
    )
    rs2, hs2 = [], []
    for _ in range(2):
        r = IRStreamRenderer(scene, CFG, sh_order=order)
        r.add_source(tone(), pos=SRC)
        hs2.append(coord2.stream(r))
        rs2.append(r)
    coord2.warmup(POSES)
    assert coord2._respectra_all is not None
    K, B = coord2.pump_chunk_blocks, CFG.block_size
    coord2._pump_tick()
    for i, (h, (pos, yaw)) in enumerate(zip(hs2, POSES)):
        s = IRStreamRenderer(scene, CFG, sh_order=order)
        s.add_source(tone(), pos=SRC)
        s.apply_traced(pos, yaw, 0.0, None,
                       lane_spectra(coord2._pump_cur, i))
        got = coord2._pump_read(h, K * B)
        assert np.array_equal(got, s.render(K * B))


def test_batched_serving_sharded_mesh():
    """mesh=("listeners","rays"): the round's one dispatch runs the
    sharded shared-path tracer across the virtual 8-device mesh and the
    per-stream spectra still match solo single-device updates."""
    from audio_raytracing_tpu.parallel.mesh import make_mesh

    scene = make_scene()
    mesh = make_mesh(8, ("listeners", "rays"), (2, 4))
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        mesh=mesh, coalesce_s=0.0,
    )
    renderers = []
    handles = []
    for _ in range(2):
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    coord.warmup(POSES)
    for h, (pos, yaw) in zip(handles, POSES):
        h.request(pos, yaw=yaw)
    coord._round()
    for r, (pos, yaw) in zip(renderers, POSES):
        solo = IRStreamRenderer(scene, CFG)
        solo.add_source(tone(), pos=SRC)
        solo.update(pos, yaw=yaw)
        for got, want in zip(r._spectra, solo._spectra):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
            )


def test_batched_serving_pallas_route():
    """intersector='pallas' (interpret mode on CPU): the listener-scanned
    fused kernel feeds the same spectra as a solo pallas stream."""
    scene = make_scene()
    # the fused kernel tiles rays at 1024 (8 sublanes x 128 lanes)
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=1024, max_bounces=2,
        intersector="pallas", pallas_kw={"interpret": True},
        coalesce_s=0.0,
    )
    r = IRStreamRenderer(scene, CFG, n_rays=1024, max_bounces=2,
                         intersector="pallas", pallas_interpret=True)
    r.add_source(tone(), pos=SRC)
    h = coord.stream(r)
    coord.warmup(POSES[:1])
    h.request(POSES[0][0], yaw=POSES[0][1])
    coord._round()
    assert h.retraces == 1

    solo = IRStreamRenderer(scene, CFG, n_rays=1024, max_bounces=2,
                            intersector="pallas", pallas_interpret=True)
    solo.add_source(tone(), pos=SRC)
    solo.update(POSES[0][0], yaw=POSES[0][1])
    for got, want in zip(r._spectra, solo._spectra):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-7
        )


def test_batch_respectra_flag_and_fallback():
    """auto (vmapped cohort respectra + apply_traced) and
    batch_respectra=False (per-stream update(traced_amb=)) produce the
    same spectra; forcing True with a speaker-rig stream raises."""
    import pytest

    scene = make_scene()
    outs = []
    for flag in (None, False):
        coord = BatchedAcoustics(
            scene.device_arrays(), [SRC], cfg=CFG,
            n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
            coalesce_s=0.0, batch_respectra=flag,
        )
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        h = coord.stream(r)
        coord.warmup(POSES[:1])
        assert (coord._respectra_all is not None) == (flag is None)
        h.request(POSES[0][0], yaw=POSES[0][1])
        coord._round()
        outs.append(r._spectra)
    for got, want in zip(*outs):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-7
        )

    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        batch_respectra=True,
    )
    rig = IRStreamRenderer(
        scene, CFG, speaker_dirs=np.float32([[1, 0, 0], [-1, 0, 0]])
    )
    rig.add_source(tone(), pos=SRC)
    coord.stream(rig)
    with pytest.raises(ValueError, match="batch_respectra"):
        coord.warmup(POSES[:1])


def test_late_registration_recompiles_and_serves():
    """A stream joining after warmup changes the (L, 3) batch shape: the
    next round recompiles (documented) and still feeds every dirty stream
    the right spectra."""
    scene = make_scene()
    coord, renderers, handles = make_coord(scene, 2)
    coord.warmup(POSES)
    late = IRStreamRenderer(scene, CFG)
    late.add_source(tone(), pos=SRC)
    h3 = coord.stream(late)
    pose3 = (np.float32([2.0, 1.0, -2.0]), 1.1)
    h3._pose = (pose3[0], pose3[1], 0.0)
    for h, (pos, yaw) in zip(handles, POSES):
        h.request(pos, yaw=yaw)
    h3.request(pose3[0], yaw=pose3[1])
    coord._round()
    assert all(h.updates == 1 for h in handles + [h3])

    solo = IRStreamRenderer(scene, CFG)
    solo.add_source(tone(), pos=SRC)
    solo.update(pose3[0], yaw=pose3[1])
    for got, want in zip(late._spectra, solo._spectra):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
        )


def test_batched_registration_validation():
    import pytest

    scene = make_scene()
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
    )
    with pytest.raises(ValueError, match="n_rays/max_bounces"):
        coord.stream(IRStreamRenderer(scene, CFG, n_rays=64))
    with pytest.raises(ValueError, match="sh_order"):
        coord.stream(IRStreamRenderer(scene, CFG, sh_order=2))
    with pytest.raises(ValueError, match="one initial pose"):
        coord.warmup(POSES)


def test_run_walkthrough_accepts_batched_handle():
    """run_walkthrough(acoustics=handle) drives a batched stream through
    the live pipeline (pure-Python sink path on CPU)."""
    from audio_raytracing_tpu.app.walkthrough import (
        circle_path,
        run_walkthrough,
    )

    scene = make_scene()
    # run_walkthrough adds its own source at (0,0,0), so the coordinator
    # is built around that source instead of make_coord's
    coord = BatchedAcoustics(
        scene.device_arrays(), [np.zeros(3, np.float32)], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0,
        # a 93 ms walkthrough fits one round under the default 0.2 s
        # serving pace — unpace so a MOVED pose's retrace lands in-run
        round_interval_s=0.0,
    )
    r = IRStreamRenderer(scene, CFG)
    h = coord.stream(r)
    coord.warmup([(np.float32([1.5, 0.0, 0.0]), 0.0)])
    n_blocks = 32
    dur = n_blocks * CFG.block_size / CFG.sample_rate
    with coord:
        stats = run_walkthrough(
            dur, scene=scene, cfg=CFG, renderer=r, acoustics=h,
            n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
            chunk_blocks=4, ring_blocks=n_blocks + 8,
            updates_per_second=40.0,
            path=lambda t: circle_path(t, radius=1.5, period=0.05),
        )
    assert coord.error is None
    assert stats["frames_written"] == n_blocks * CFG.block_size
    assert stats["updates"] >= 1
    assert stats["retraces"] >= 1


def test_run_walkthrough_through_render_pump():
    """The bench_serving --pump path end to end: pre-sourced renderers,
    coordinator warmup (which fixes the pump cohort + compiles the pump
    executable), then run_walkthrough popping pumped PCM through the
    live pipeline — the walkthrough must NOT re-add a source or run its
    solo warmup (that would desync the pump's stacked conv state)."""
    from audio_raytracing_tpu.app.walkthrough import (
        circle_path,
        run_walkthrough,
        synth_pad,
    )

    scene = make_scene()
    coord = BatchedAcoustics(
        scene.device_arrays(), [np.zeros(3, np.float32)], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, round_interval_s=0.0,
        render_pump=True, pump_chunk_blocks=4,
    )
    rs = [IRStreamRenderer(scene, CFG) for _ in range(2)]
    handles = [coord.stream(r) for r in rs]
    for r in rs:
        r.add_source(synth_pad(CFG.sample_rate), np.zeros(3, np.float32),
                     gain=0.5)
    coord.warmup([(np.float32([1.5, 0.0, 0.0]), 0.0),
                  (np.float32([-1.5, 0.0, 0.5]), 0.4)])
    assert all(len(r._sources) == 1 for r in rs)
    n_blocks = 32
    dur = n_blocks * CFG.block_size / CFG.sample_rate
    stats = [None, None]
    import threading

    def one(i):
        stats[i] = run_walkthrough(
            dur, scene=scene, cfg=CFG, renderer=rs[i], acoustics=handles[i],
            n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
            chunk_blocks=4, ring_blocks=n_blocks + 8,
            updates_per_second=40.0,
            path=lambda t, i=i: circle_path(t + 1.7 * i, radius=1.5,
                                            period=0.05),
        )

    with coord:
        ts = [threading.Thread(target=one, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    assert coord.error is None
    # the walkthrough didn't add a second source behind the pump's back
    assert all(len(r._sources) == 1 for r in rs)
    for s in stats:
        assert s is not None
        assert s["frames_written"] == n_blocks * CFG.block_size
        assert s["updates"] >= 1
    assert coord.pump_ticks >= 1


def test_batched_serving_pallas_nee_route():
    """intersector='pallas_nee' (interpret mode on CPU): the in-kernel
    multi-listener NEE — one path pass per listener chunk — feeds the
    same spectra as solo pallas streams, across a chunk boundary
    (3 streams, chunk 2)."""
    scene = make_scene()
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=1024, max_bounces=2,
        intersector="pallas_nee",
        pallas_kw={"interpret": True, "listener_chunk": 2},
        coalesce_s=0.0,
    )
    poses3 = POSES + [(np.float32([1.2, 0.3, -0.8]), 1.1)]
    renderers, handles = [], []
    for _ in range(3):
        r = IRStreamRenderer(scene, CFG, n_rays=1024, max_bounces=2,
                             intersector="pallas", pallas_interpret=True)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    coord.warmup(poses3)
    for h, (pos, yaw) in zip(handles, poses3):
        h.request(pos, yaw=yaw)
    coord._round()
    for r, (pos, yaw) in zip(renderers, poses3):
        solo = IRStreamRenderer(scene, CFG, n_rays=1024, max_bounces=2,
                                intersector="pallas", pallas_interpret=True)
        solo.add_source(tone(), pos=SRC)
        solo.update(pos, yaw=yaw)
        for got, want in zip(r._spectra, solo._spectra):
            # the vmapped direct_ir rounds one element differently from
            # the scalar path (f32 association): rtol 2e-4
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=5e-7
            )


def test_capacity_join_leave_without_recompile():
    """capacity= fixes the traced lane shape: streams join and leave a
    live coordinator with NO recompile of the batched trace or the
    cohort respectra (production tenants must not stall each other on
    executable builds)."""
    import pytest

    scene = make_scene()
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, capacity=4,
    )
    renderers, handles = [], []
    for _ in range(2):
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    coord.warmup(POSES)
    assert coord._trace_all._cache_size() == 1
    for h, (pos, yaw) in zip(handles, POSES):
        h.request(pos, yaw=yaw)
    coord._round()
    assert all(h.updates == 1 for h in handles)

    # join a third stream MID-FLIGHT: no pose yet -> it must not stall
    # the cohort's next round
    r3 = IRStreamRenderer(scene, CFG)
    r3.add_source(tone(), pos=SRC)
    h3 = coord.stream(r3)
    handles[0].request(POSES[0][0], yaw=POSES[0][1] + 0.2)
    coord._round()
    assert handles[0].updates == 2 and h3.updates == 0

    # ... and after its first request it rides the SAME executables
    pos3, yaw3 = np.float32([0.8, 0.2, -1.2]), 1.1
    h3.request(pos3, yaw=yaw3)
    coord._round()
    assert h3.updates == 1 and h3.retraces == 1
    assert coord._trace_all._cache_size() == 1
    if coord._respectra_all is not None:
        assert coord._respectra_all._cache_size() == 1

    # the joined stream's acoustics match a solo renderer at its pose
    solo = IRStreamRenderer(scene, CFG)
    solo.add_source(tone(), pos=SRC)
    solo.update(pos3, yaw=yaw3)
    for got, want in zip(r3._spectra, solo._spectra):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
        )

    # leave: the freed lane is reusable, rounds keep going, still no
    # recompile
    handles[0].close()
    handles[0].close()  # idempotent
    h3.request(pos3, yaw=yaw3 + 0.1)
    coord._round()
    assert coord._trace_all._cache_size() == 1

    # capacity is enforced
    for _ in range(2):
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        coord.stream(r)
    r = IRStreamRenderer(scene, CFG)
    r.add_source(tone(), pos=SRC)
    with pytest.raises(ValueError, match="capacity"):
        coord.stream(r)


def make_pump_coord(scene, n, **kw):
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, render_pump=True, pump_chunk_blocks=4, **kw,
    )
    renderers, handles = [], []
    for _ in range(n):
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    return coord, renderers, handles


def lane_spectra(stacked, i):
    """Slice lane i's (re, im) out of the pump's stacked spectra (tests
    only — the production pump never materializes per-lane slices)."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x[i]), stacked)


def test_render_pump_bit_matches_solo():
    """The pump's one-dispatch-for-all-lanes chunk is BIT-identical per
    lane to each lane rendering solo through _stream_blocks — including
    the per-lane crossfade block (faded lane) and the plain block
    (non-faded lane in the same dispatch). Solo comparators adopt
    slices of the very stacked respectra arrays the pump renders with
    (stacked-publish mode: pump lanes never hold per-lane spectra)."""
    scene = make_scene()
    coord, renderers, handles = make_pump_coord(scene, 2,
                                                pump_prefill=False)
    coord.warmup(POSES)

    # shadow solo renderers adopting slices of the pump's warmup spectra
    solos = []
    for i, (r, (pos, yaw)) in enumerate(zip(renderers, POSES)):
        s = IRStreamRenderer(scene, CFG)
        s.add_source(tone(), pos=SRC)
        s.apply_traced(pos, yaw, 0.0, None, lane_spectra(coord._pump_cur, i))
        solos.append(s)

    K, B = coord.pump_chunk_blocks, CFG.block_size
    coord._pump_tick()
    coord._pump_tick()
    for h, s in zip(handles, solos):
        got = coord._pump_read(h, 2 * K * B)
        want = np.concatenate([s.render(K * B), s.render(K * B)])
        assert np.array_equal(got, want)

    # lane 0 adopts new spectra (crossfades); lane 1 rides plain — in
    # the SAME pump dispatch
    pos2, yaw2 = np.float32([0.0, 0.4, -0.6]), -1.2
    handles[0].request(pos2, yaw=yaw2)
    coord._round()
    assert handles[0].updates == 2
    nxt = coord._pump_next
    assert nxt is not None and nxt[1] == [True, False]
    solos[0].apply_traced(pos2, yaw2, 0.0, None, lane_spectra(nxt[0], 0))
    assert solos[0]._pending_fade
    coord._pump_tick()
    for h, s in zip(handles, solos):
        got = coord._pump_read(h, K * B)
        want = s.render(K * B)
        assert np.array_equal(got, want)
    assert coord.pump_ticks == 3


def test_render_pump_prefill():
    """warmup() with pump_prefill (default) deposits the compile
    dispatch's PCM: every lane starts one chunk ahead of the clock, and
    that chunk is bit-identical to solo chunk 0 (same cursor-0 zero
    state the first live tick would use)."""
    scene = make_scene()
    coord, renderers, handles = make_pump_coord(scene, 2)
    coord.warmup(POSES)
    K, B = coord.pump_chunk_blocks, CFG.block_size
    assert coord.pump_ticks == 1
    assert all(h._buf_n == K * B for h in handles)
    pos, yaw = POSES[0]
    s = IRStreamRenderer(scene, CFG)
    s.add_source(tone(), pos=SRC)
    s.apply_traced(pos, yaw, 0.0, None, lane_spectra(coord._pump_cur, 0))
    got = coord._pump_read(handles[0], K * B)
    assert np.array_equal(got, s.render(K * B))


def test_render_pump_threaded_end_to_end():
    """The pump thread paces itself, streams pop real-time PCM without
    ever dispatching, and a stalled lane only drops ITS oldest chunks."""
    scene = make_scene()
    coord, renderers, handles = make_pump_coord(
        scene, 2, pump_buffer_chunks=2, pump_max_buffer_chunks=3
    )
    coord.warmup(POSES)
    K, B = coord.pump_chunk_blocks, CFG.block_size
    with coord:
        for h, (pos, yaw) in zip(handles, POSES):
            h.request(pos, yaw=yaw)
        out = [h.render(3 * K * B) for h in handles]
        assert all(np.isfinite(o).all() for o in out)
        assert all(np.abs(o).max() > 1e-7 for o in out)
        assert coord.pump_ticks >= 3
        # starve lane 1 (never read): the pump keeps serving lane 0 and
        # bounds lane 1's buffer by dropping its oldest chunks
        deadline = time.time() + 30.0
        while handles[1].pump_dropped == 0 and time.time() < deadline:
            handles[0].render(K * B)
            time.sleep(0.005)
        assert handles[1].pump_dropped > 0
        assert len(handles[1]._buf) <= 3
    assert coord.error is None
    # cohort unfixed after exit
    handles[0].close()


def test_render_pump_validation():
    import pytest

    scene = make_scene()
    # pump + capacity needs the stacked respectra publish
    with pytest.raises(ValueError, match="batch_respectra"):
        BatchedAcoustics(
            scene.device_arrays(), [SRC], cfg=CFG, render_pump=True,
            capacity=4, batch_respectra=False,
        )

    # mismatched dry tables across lanes are rejected at pump setup
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, render_pump=True, pump_chunk_blocks=4,
    )
    r1 = IRStreamRenderer(scene, CFG)
    r1.add_source(tone(), pos=SRC)
    r2 = IRStreamRenderer(scene, CFG)
    r2.add_source(0.5 * tone(), pos=SRC)
    h1 = coord.stream(r1)
    coord.stream(r2)
    with pytest.raises(ValueError, match="dry source tables"):
        coord.warmup(POSES)

    # close() is refused while an EXACT-cohort pump is fixed (capacity
    # pumps allow live leave — test_render_pump_capacity_join_leave)
    coord2, renderers, handles = make_pump_coord(scene, 2)
    coord2.warmup(POSES)
    with pytest.raises(ValueError, match="fixed"):
        handles[0].close()


def test_render_pump_capacity_join_leave():
    """The r4 gap closed: the render pump serves a CHANGING population.
    capacity= fixes the pump's lane shape; streams join a LIVE pump
    (activation at a chunk boundary: conv-state reset, cursor 0, no
    fade — first chunk bit-identical to a fresh solo stream) and leave
    it (lane deactivates, slot frees, next tenant reuses it), with no
    recompile of the pump executable. Reference analogue:
    sound_system.zig:113-121/164-171 — one callback mixes a changing
    voice set."""
    from audio_raytracing_tpu.engine.ir_stream import _stream_blocks_pump

    scene = make_scene()
    coord, renderers, handles = make_pump_coord(
        scene, 2, capacity=4, pump_prefill=False
    )
    assert [h.slot for h in handles] == [0, 1]
    coord.warmup(POSES)
    K, B = coord.pump_chunk_blocks, CFG.block_size
    assert len(coord._pump_cursors) == 4  # lanes = capacity, not cohort
    pump_cache0 = _stream_blocks_pump._cache_size()
    trace_cache0 = coord._trace_all._cache_size()

    # founders bit-match solo streams (slot-sliced stacked spectra)
    solos = []
    for h, (r, (pos, yaw)) in zip(handles, zip(renderers, POSES)):
        s = IRStreamRenderer(scene, CFG)
        s.add_source(tone(), pos=SRC)
        s.apply_traced(pos, yaw, 0.0, None,
                       lane_spectra(coord._pump_cur, h.slot))
        solos.append(s)
    coord._pump_tick()
    for h, s in zip(handles, solos):
        assert np.array_equal(coord._pump_read(h, K * B), s.render(K * B))

    # JOIN a live pump: inactive until its first traced spectra land
    r3 = IRStreamRenderer(scene, CFG)
    r3.add_source(tone(), pos=SRC)
    h3 = coord.stream(r3)
    assert h3.slot == 2 and not h3.ready() and not h3._pump_active
    pos3, yaw3 = np.float32([0.8, 0.2, -1.2]), 1.1
    h3.request(pos3, yaw=yaw3)
    coord._round()
    assert coord._pump_pending_activate == {2}
    coord._pump_tick()  # adopts the round -> activates lane 2
    assert h3.ready() and h3._pump_active

    # the joiner's first chunk == a FRESH solo stream adopting its
    # lane's slice (proves the state reset + cursor 0 + no fade)
    s3 = IRStreamRenderer(scene, CFG)
    s3.add_source(tone(), pos=SRC)
    s3.apply_traced(pos3, yaw3, 0.0, None,
                    lane_spectra(coord._pump_cur, 2))
    assert np.array_equal(coord._pump_read(h3, K * B), s3.render(K * B))
    # founders rode the same tick undisturbed (their lanes kept state;
    # no fade — they were not dirty in the activation round)
    for h, s in zip(handles, solos):
        assert np.array_equal(coord._pump_read(h, K * B), s.render(K * B))

    # LEAVE a live pump: lane deactivates, cohort keeps flowing
    handles[0].close()
    assert handles[0].slot is None
    coord._pump_tick()
    assert np.array_equal(coord._pump_read(h3, K * B), s3.render(K * B))
    assert np.array_equal(
        coord._pump_read(handles[1], K * B), solos[1].render(K * B)
    )
    assert handles[0]._buf_n == 0  # nothing deposited after leave

    # REJOIN: the freed slot 0 is reused; activation resets the previous
    # tenant's conv-state residue (bit-match vs fresh solo proves it)
    r4 = IRStreamRenderer(scene, CFG)
    r4.add_source(tone(), pos=SRC)
    h4 = coord.stream(r4)
    assert h4.slot == 0
    pos4, yaw4 = np.float32([-0.4, 0.6, 1.0]), -0.7
    h4.request(pos4, yaw=yaw4)
    coord._round()
    coord._pump_tick()
    s4 = IRStreamRenderer(scene, CFG)
    s4.add_source(tone(), pos=SRC)
    s4.apply_traced(pos4, yaw4, 0.0, None,
                    lane_spectra(coord._pump_cur, 0))
    assert np.array_equal(coord._pump_read(h4, K * B), s4.render(K * B))

    # no recompiles across any join/leave
    assert _stream_blocks_pump._cache_size() == pump_cache0
    assert coord._trace_all._cache_size() == trace_cache0


def test_render_pump_capacity_join_validation():
    """A stream joining a live capacity pump must share the pump's dry
    arena and HRTF, and must add its sources before stream()."""
    import pytest

    scene = make_scene()
    coord, renderers, handles = make_pump_coord(
        scene, 1, capacity=3, pump_prefill=False
    )
    coord.warmup(POSES[:1])

    bad = IRStreamRenderer(scene, CFG)  # no sources yet
    with pytest.raises(ValueError, match="add_source"):
        coord.stream(bad)
    bad2 = IRStreamRenderer(scene, CFG)
    bad2.add_source(0.25 * tone(), pos=SRC)  # different dry table
    with pytest.raises(ValueError, match="dry source tables"):
        coord.stream(bad2)
    # rejected joins must not leak lane slots
    ok1 = IRStreamRenderer(scene, CFG)
    ok1.add_source(tone(), pos=SRC)
    ok2 = IRStreamRenderer(scene, CFG)
    ok2.add_source(tone(), pos=SRC)
    h1 = coord.stream(ok1)
    h2 = coord.stream(ok2)
    assert {h1.slot, h2.slot} == {1, 2}


def test_capacity_same_size_leave_join_requalifies_respectra():
    """Regression (r5 review): the cohort respectra must re-qualify on
    MEMBERSHIP change, not stream-count change — a same-size leave+join
    where the newcomer carries a different HRTF silently rendered the
    newcomer with the old tenant's HRTF (the stacked vmap still
    captured it)."""
    scene = make_scene()
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, capacity=3,
    )
    renderers, handles = [], []
    for _ in range(2):
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    coord.warmup(POSES)
    assert coord._respectra_all is not None  # shared-HRTF cohort

    # same-size leave+join with a DIFFERENT HRTF
    handles[1].close()
    from audio_raytracing_tpu.engine.system import default_hrtf

    hl, hr = default_hrtf()
    odd = IRStreamRenderer(scene, CFG, hrtf=(hl * 0.5, hr * 0.5))
    odd.add_source(tone(), pos=SRC)
    h_odd = coord.stream(odd)
    pos2, yaw2 = np.float32([0.3, 0.1, -0.4]), 0.9
    h_odd.request(pos2, yaw=yaw2)
    coord._round()
    # mixed-HRTF cohort: the stacked path must have DECLINED (auto) and
    # the newcomer's spectra must match a solo renderer with ITS hrtf
    assert coord._respectra_all is None
    solo = IRStreamRenderer(scene, CFG, hrtf=(hl * 0.5, hr * 0.5))
    solo.add_source(tone(), pos=SRC)
    solo.update(pos2, yaw=yaw2)
    for got, want in zip(odd._spectra, solo._spectra):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
        )

    # and a same-HRTF rejoin re-qualifies WITHOUT building a fresh jit
    # (the cached jit object survives, keeping joins recompile-free)
    h_odd.close()
    r3 = IRStreamRenderer(scene, CFG)
    r3.add_source(tone(), pos=SRC)
    h3 = coord.stream(r3)
    h3.request(pos2, yaw=yaw2)
    coord._round()
    assert coord._respectra_all is not None
    assert coord._respectra_all is coord._respectra_prev_jit


def test_render_pump_s16_matches_quantized_f32():
    """pump_pcm="s16" (the netserve wire format, quantized ON DEVICE to
    halve the PCM host transfer) is exactly np.rint(f32 * 32767)
    clipped, per chunk, against an identical f32 pump — and render()
    pops int16."""
    scene = make_scene()
    pcm = {}
    for mode in ("f32", "s16"):
        coord, renderers, handles = make_pump_coord(
            scene, 2, pump_prefill=False, pump_pcm=mode
        )
        coord.warmup(POSES)
        K, B = coord.pump_chunk_blocks, CFG.block_size
        coord._pump_tick()
        coord._pump_tick()
        pcm[mode] = [coord._pump_read(h, 2 * K * B) for h in handles]
    for f, s in zip(pcm["f32"], pcm["s16"]):
        assert s.dtype == np.int16 and f.dtype == np.float32
        want = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(
            np.int16
        )
        assert np.array_equal(s, want)


def test_round_survives_concurrent_close():
    """Regression: a handle closing DURING a round (netserve evicts from
    client threads) nulls its slot; the round must keep using its
    snapshot slots instead of reading h.slot mid-flight (numpy's
    arr[None] is an axis insert, so the old code silently corrupted
    the batch or exploded in the respectra). Exercised by closing a
    stream from inside the round's trace call."""
    scene = make_scene()
    coord = BatchedAcoustics(
        scene.device_arrays(), [SRC], cfg=CFG,
        n_rays=CFG.rays_per_source, max_bounces=CFG.max_bounces,
        coalesce_s=0.0, capacity=3,
    )
    renderers, handles = [], []
    for _ in range(2):
        r = IRStreamRenderer(scene, CFG)
        r.add_source(tone(), pos=SRC)
        handles.append(coord.stream(r))
        renderers.append(r)
    coord.warmup(POSES)
    for h, (pos, yaw) in zip(handles, POSES):
        h.request(pos, yaw=yaw)

    orig = coord._trace_all

    def tracing(*a, **k):
        out = orig(*a, **k)
        handles[1].close()  # mid-round: after the snapshot, before publish
        return out

    coord._trace_all = tracing
    coord._round()  # must not raise
    assert handles[0].updates == 1
    assert handles[1].slot is None

    # pump flavor: the closed lane's freed slot must NOT be activated
    # by the in-flight round (slot-identity check in _publish_traced)
    coord2, renderers2, handles2 = make_pump_coord(
        scene, 1, capacity=3, pump_prefill=False
    )
    coord2.warmup(POSES[:1])
    r3 = IRStreamRenderer(scene, CFG)
    r3.add_source(tone(), pos=SRC)
    h3 = coord2.stream(r3)
    h3.request(np.float32([0.8, 0.2, -1.2]), yaw=1.1)
    orig2 = coord2._trace_all

    def tracing2(*a, **k):
        out = orig2(*a, **k)
        h3.close()
        return out

    coord2._trace_all = tracing2
    coord2._round()
    assert coord2._pump_pending_activate == set()


def test_render_pump_drop_declick():
    """VERDICT r4 weak #6: a stalled consumer's drops must not emit a
    raw discontinuity. The read after a drop splices with a one-block
    linear ramp from the last emitted sample into the post-gap audio
    (exact expected PCM asserted), and handle.pump_dropped surfaces the
    skip to the caller."""
    scene = make_scene()
    coord, renderers, handles = make_pump_coord(
        scene, 1, pump_max_buffer_chunks=2, pump_prefill=False
    )
    coord.warmup(POSES[:1])
    h = handles[0]
    K, B = coord.pump_chunk_blocks, CFG.block_size
    coord._pump_tick()
    first = coord._pump_read(h, K * B)
    last = np.array(first[-1])
    # stall: 5 more chunks against a 2-chunk cap -> oldest chunks drop
    for _ in range(5):
        coord._pump_tick()
    assert h.pump_dropped >= 1 and h._splice
    assert len(h._buf) <= 2
    raw = np.array(h._buf[0])  # the chunk the next read will pop
    got = coord._pump_read(h, K * B)
    a = (np.arange(1, B + 1, dtype=np.float32) / B)[:, None]
    expected = raw.copy()
    expected[:B] = a * raw[:B] + (1.0 - a) * last
    assert np.array_equal(got, expected)
    assert not h._splice
    # the splice-boundary jump is ramp-bounded, not a full click
    assert (np.abs(got[0] - last).max()
            <= np.abs(raw[0] - last).max() / B + 1e-7)
