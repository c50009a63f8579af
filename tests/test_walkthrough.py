"""Live walkthrough app: moving-listener IR streaming through the live
sink (app/walkthrough.py) — the full serving pipeline (trace -> pose
cache -> partitioned conv -> wall-clock playback) in one loop.
"""

import dataclasses

import numpy as np

from audio_raytracing_tpu.config import DEFAULT_CONFIG
from audio_raytracing_tpu.app.walkthrough import (
    circle_path, run_walkthrough, synth_pad,
)
from audio_raytracing_tpu.engine.ir_stream import IRStreamRenderer
from audio_raytracing_tpu.models.scene import Scene, box_room

CFG = dataclasses.replace(DEFAULT_CONFIG, ir_length=2048)


def test_walkthrough_streams_and_retraces():
    """The walkthrough plays its stream (sized to the priming lead — the
    CPU renders slower than real time, see test_live.py) and the moving
    path really drives pose-cache re-traces mid-run."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )
    n_blocks = 32
    dur = n_blocks * CFG.block_size / CFG.sample_rate
    stats = run_walkthrough(
        dur, scene=scene, cfg=CFG, n_rays=2048, max_bounces=4,
        chunk_blocks=4, ring_blocks=n_blocks + 8,
        updates_per_second=40.0,
        path=lambda t: circle_path(t, radius=1.5, period=0.05),  # fast orbit
    )
    assert stats["frames_written"] == n_blocks * CFG.block_size
    assert stats["underruns"] <= max(3, stats["blocks"] // 20)
    assert stats["updates"] >= 2
    assert stats["retraces"] >= 1  # translation updates re-traced
    assert stats["updates"] >= stats["retraces"]


def test_walkthrough_async_updates():
    """async mode: the trace runs on the AsyncAcoustics worker while the
    producer renders — updates land, audio is finite, accounting holds."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )
    n_blocks = 32
    dur = n_blocks * CFG.block_size / CFG.sample_rate
    stats = run_walkthrough(
        dur, scene=scene, cfg=CFG, n_rays=2048, max_bounces=4,
        chunk_blocks=4, ring_blocks=n_blocks + 8,
        updates_per_second=40.0, async_updates=True,
        path=lambda t: circle_path(t, radius=1.5, period=0.05),
    )
    assert stats["frames_written"] == n_blocks * CFG.block_size
    assert stats["updates"] >= 1  # worker really consumed pose requests
    assert stats["retraces"] >= 1


def test_render_chunk_matches_blockwise():
    """render(K*B) (one scanned dispatch) is bit-identical to K
    render_block() calls — including the crossfade block after an
    update."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )

    def mk():
        r = IRStreamRenderer(scene, CFG, n_rays=2048, max_bounces=4)
        r.add_source(synth_pad(CFG.sample_rate), np.float32([2.0, 0.5, 1.0]))
        r.update(np.float32([0, 0, 0]), yaw=0.0)
        r.render(2 * CFG.block_size)  # advance into a steady state
        r.update(np.float32([0.5, 0, 0]), yaw=0.3)  # pending crossfade
        return r

    ra, rb = mk(), mk()
    chunk = ra.render(5 * CFG.block_size)
    blocks = np.concatenate([rb.render_block() for _ in range(5)])
    np.testing.assert_array_equal(chunk, blocks)


def test_walkthrough_audio_responds_to_pose():
    """Offline sanity on the same renderer the walkthrough drives: two
    listener poses produce different binaural blocks (the IR swap is
    audible), and a rotation-only update skips the re-trace."""
    scene = Scene.from_triangles(
        box_room(size=(8.0, 3.0, 6.0)), CFG,
        absorption=np.full(12, 0.3, np.float32),
    )
    r = IRStreamRenderer(scene, CFG, n_rays=2048, max_bounces=4)
    r.add_source(synth_pad(CFG.sample_rate), np.float32([2.0, 0.5, 1.0]))
    r.update(np.float32([0, 0, 0]), yaw=0.0)
    a = r.render(4 * CFG.block_size)
    r.update(np.float32([1.0, 0, 0]), yaw=0.0)
    assert r.last_update_retraced
    b = r.render(4 * CFG.block_size)
    assert np.abs(a).max() > 0 and np.abs(b).max() > 0
    assert not np.allclose(a, b)
    r.update(np.float32([1.0, 0, 0]), yaw=0.7)
    assert not r.last_update_retraced  # rotation-only: cache hit
