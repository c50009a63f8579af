"""Live playback: the SoundSystem/RealtimeEngine feeding a real-time
audio sink.

Closes the reference's L0 loop end to end (sound_system.zig:44-92 device
open, 123-172 pull callback): `native.AudioSink` runs the DAC-cadence
pull thread (clock_nanosleep absolute schedule, one 128-frame block per
~2.9 ms tick, silence + an underrun count when the ring is short), and
`run_live` is the producer — it renders audio in chunks and keeps the
sink's ring fed, exactly the role the reference's main loop plays through
SDL's buffered stream. With a RealtimeEngine, traced acoustic updates
land asynchronously through the mailbox while playback runs — the full
three-thread architecture (game/render, acoustic update, audio pull) the
reference's own comments ask for (main.zig:518-521).

No DAC exists in this container, so the sink writes raw interleaved f32
PCM to a file descriptor (pipe to `aplay -f FLOAT_LE -r 44100 -c 2` on a
machine with hardware) or discards it; the real-time accounting is
identical either way.
"""

from __future__ import annotations

import time

import numpy as np

from .. import native


def run_live(
    render,
    duration_s: float,
    sample_rate: int,
    block_frames: int = 128,
    channels: int = 2,
    chunk_blocks: int = 16,
    ring_blocks: int = 64,
    fd=None,
    sink: native.AudioSink | None = None,
) -> dict:
    """Play `duration_s` of audio through a live sink.

    render: callable(n_samples) -> (n_samples, channels) float32 — e.g.
    `RealtimeEngine.render` (traced updates then land mid-playback) or
    `SoundSystem.render`. Rendering happens in `chunk_blocks`-block chunks
    whenever the ring has space (the producer never blocks the pull
    thread; the ring's `ring_blocks` lead is the jitter budget, like the
    reference's SDL stream buffering).

    Returns the sink stats plus {"blocks", "realtime_factor"}:
    realtime_factor = produced-audio seconds per wall second of producing
    (>= 1 means the renderer keeps up with the DAC unaided by the lead).
    """
    blk = int(block_frames)
    n_blocks = int(np.ceil(duration_s * sample_rate / blk))
    own_sink = sink is None
    if own_sink:
        sink = native.AudioSink(
            sample_rate, block_frames=blk, channels=channels,
            ring_blocks=ring_blocks, fd=fd,
        )
    # the sink's ACTUAL capacity (a passed-in sink may be smaller than
    # ring_blocks) bounds the priming lead and the chunk size. Chunks are
    # clamped to HALF the ring (double buffering): a chunk needing the
    # whole ring can only render once the ring is empty, and the clock
    # ticks on the empty ring while the render runs — guaranteed
    # underruns, not just a tight fit.
    cap_blocks = sink.space // blk
    chunk_blocks = max(1, min(int(chunk_blocks), cap_blocks // 2))
    period = blk / sample_rate
    rendered = 0  # blocks produced (accounted at render time)
    pending = np.zeros((0, channels), np.float32)
    render_wall = 0.0
    try:
        # prime: fill the ring before the clock starts (startup latency,
        # not an underrun — same as the deadline harness's first chunk)
        while rendered < min(n_blocks, cap_blocks) and len(pending) == 0:
            k = min(chunk_blocks, n_blocks - rendered)
            t0 = time.perf_counter()
            chunk = np.asarray(render(k * blk), np.float32)
            render_wall += time.perf_counter() - t0
            rendered += k
            pending = chunk[sink.write(chunk):]
        sink.start()
        while rendered < n_blocks or len(pending):
            if len(pending) == 0:
                k = min(chunk_blocks, n_blocks - rendered)
                if sink.space < k * blk:
                    time.sleep(period / 2)
                    continue
                t0 = time.perf_counter()
                pending = np.asarray(render(k * blk), np.float32)
                render_wall += time.perf_counter() - t0
                rendered += k
            pending = pending[sink.write(pending):]
            if len(pending):
                time.sleep(period / 2)
        # drain: let the clock consume what's queued, then stop promptly
        # so post-stream ticks don't count as underruns
        while sink.level >= blk:
            time.sleep(period / 2)
    finally:
        sink.stop()
        stats = sink.stats()
        if own_sink:
            sink.close()
    stats["blocks"] = n_blocks
    stats["realtime_factor"] = (
        (n_blocks * period) / render_wall if render_wall > 0 else float("inf")
    )
    return stats
