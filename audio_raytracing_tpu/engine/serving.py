"""Batched multi-stream serving: one trace dispatch serves every listener.

benchmarks/bench_serving.py measured per-stream throughput holding to 4
concurrent walkthrough streams and halving at 8: each stream's
AsyncAcoustics worker dispatches its OWN re-trace, and the per-dispatch
cost (~21-25 ms through this environment's relay; still a full path
trace on any runtime) saturates the chip's dispatch queue. But the
bounce path of the tracer is listener-independent —
models/ir.py::trace_ir_multi_listener already traces ONE shared path
pass and runs only per-listener next-event estimation — so N streams in
the same scene with the same sources should never pay N path traces.

BatchedAcoustics is the serving-side coordinator that exploits it: all
streams share one worker thread that snapshots every stream's freshest
requested pose (coalescing, like AsyncAcoustics), traces ALL listeners
in ONE dispatch (constant (L, 3) batch shape -> one compiled
executable), and hands each stream its (S, 4, L_ir) ambisonic IRs via
IRStreamRenderer.update(traced_amb=...), which then pays only its own
respectra + atomic spectra swap. Per acoustic round the dispatch queue
sees 1 shared trace + L cheap respectras instead of L full traces.

The reference's architecture is one SoundSystem serving one listener
(sound_system.zig:128-170, main.zig:518-521 for the decoupled-tracing
intent); many listeners per chip is the serving scale-out this
framework adds, and the shared-path batching is the TPU-native way to
do it (big batched dispatches over many small ones).

Constraints (v1, asserted where cheap): every stream shares the scene
geometry and the source configuration (positions + per-source
directivity) given to the coordinator; per-stream source motion is not
coordinated (use per-stream AsyncAcoustics for that). HOA cohorts
(sh_order=N, r5): the XLA route traces per-listener SH moments in the
shared path pass (models/ir.py::trace_ir_multi_listener sh_order) and
binaural HOA cohorts sharing one bank batch their decode like
first-order ones (the stacked respectra — and therefore the render
pump — serve HOA too); speaker-rig HOA lanes take the per-stream
decode path. The pallas/mesh trace routes stay first-order. Moving shared geometry IS
supported: set_scene_arrays swaps the traced arrays and invalidates
every stream's pose cache.
"""

from __future__ import annotations

import itertools
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config, DEFAULT_CONFIG
from ..models.ir import (
    ImpulseResponse,
    ambisonic_ir,
    fibonacci_sphere,
    trace_ir_multi_listener,
)
from ..utils import quat
from .ir_stream import _respectra, _respectra_speakers


@jax.jit
def _mask_lanes(states, keep):
    """Zero the stacked per-lane conv state where keep is False — the
    pump's lane (re)activation reset. keep is traced (jnp (L,) bool), so
    one executable serves every join regardless of which slot it lands
    in (an eager .at[slot].set(0) with a Python-int slot would recompile
    per distinct slot — the engine/system.py::_start_voice lesson).
    Fresh conv state is all-zeros (ops/conv_partitioned.conv_init_real),
    so masking IS the reset."""

    def m(a):
        k = keep.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(k, a, jnp.zeros((), a.dtype))

    return jax.tree.map(m, states)


class _StreamHandle:
    """Per-stream facade over the shared coordinator — the AsyncAcoustics
    interface (request/render/updates/retraces + context manager), so
    app/walkthrough.py::run_walkthrough(acoustics=handle) drives a batched
    stream exactly like a solo one. The context manager is a no-op: the
    worker thread's lifecycle belongs to the coordinator (`with coord:`),
    not to any single stream."""

    _uid_counter = itertools.count(1)

    def __init__(self, coord: "BatchedAcoustics", renderer):
        # monotonic identity for cohort-membership keys (id() can be
        # reused after GC, which would silently skip a respectra
        # requalification on a leave+join). itertools.count.__next__
        # is atomic under the GIL — netserve joins run concurrently
        self.uid = next(_StreamHandle._uid_counter)
        self.coord = coord
        self.r = renderer
        self.lock = threading.Lock()  # spectra swap vs stream read
        self._pose = None  # (pos f32[3], yaw, pitch) — last requested
        self._dirty = False
        self._pending = None  # mailbox: (pos, yaw, pitch, amb, spectra)
        self.updates = 0
        self.retraces = 0
        # render-pump PCM buffer (coord.render_pump=True): chunks the
        # pump thread produced ahead of this stream's consumption, all
        # under coord._pump_cv
        self._buf: list[np.ndarray] = []
        self._buf_off = 0  # consumed samples of _buf[0]
        self._buf_n = 0  # total buffered samples
        self._want = 0  # samples a blocked render() is waiting for
        self.pump_dropped = 0  # chunks dropped because this lane stalled
        # capacity mode: fixed lane index in the traced batch / pump
        # state (assigned at stream(), freed at close()); None in
        # exact-cohort mode
        self.slot: int | None = None
        # pump-lane liveness: PCM is deposited only for active lanes. A
        # stream joining a LIVE capacity pump activates at the chunk
        # boundary where its first traced spectra land (state reset,
        # cursor 0 — bit-identical to a fresh solo stream)
        self._pump_active = False
        # drop-splice declick (see _pump_read): set when _deposit drops
        # this lane's oldest chunk, consumed by the next read
        self._splice = False
        self._last_out = None  # (n_out,) last emitted sample
        # a per-handle failure (e.g. evicted by the pump-setup join
        # sweep for a cohort mismatch) — render() raises it
        self.error: Exception | None = None

    def request(self, pos, yaw: float = 0.0, pitch: float = 0.0,
                t: float = 0.0) -> None:
        self._pose = (np.asarray(pos, np.float32), float(yaw), float(pitch))
        self._dirty = True
        self.coord._evt.set()

    def _publish(self, pos, yaw, pitch, amb, spectra) -> None:
        """Hand a finished round result to the stream WITHOUT blocking on
        its lock. The stream's render thread holds `lock` for the whole
        chunk dispatch (tens of ms through a relay); a round that waited
        on N of those in sequence serialized the whole cohort (measured
        ~444 ms/round at 16 streams — the r3 cadence ceiling). Mailbox
        semantics instead (the reference's triple-buffer idea,
        main.zig:518-521 / native/mailbox.cpp): overwrite the single
        pending slot (freshest wins), adopt NOW if the stream is idle,
        else let its next render() adopt at the block boundary."""
        self._pending = (pos, yaw, pitch, amb, spectra)
        if self.lock.acquire(blocking=False):
            try:
                self._adopt_locked()
            finally:
                self.lock.release()

    def _adopt_locked(self) -> None:
        """Apply the pending update (caller holds `lock`). Pure
        bookkeeping + reference swaps — microseconds; the device work
        (trace + respectra) already happened on the round thread."""
        p = self._pending
        if p is None:
            return
        self._pending = None
        pos, yaw, pitch, amb, spectra = p
        self.r.apply_traced(pos, yaw, pitch, amb, spectra)
        self.updates += 1
        self.retraces += bool(self.r.last_update_retraced)

    def render(self, n: int) -> np.ndarray:
        if self.coord.render_pump:
            return self.coord._pump_read(self, n)
        with self.lock:
            self._adopt_locked()
            return self.r.render(n)

    def available(self) -> int:
        """Samples of pumped PCM currently buffered for this lane
        (pump mode). A real-time consumer that must NOT block can poll
        this before render(): `available() >= n` means render(n) is a
        pure host-memory pop (benchmarks/bench_serving.py's
        consolidated pacer uses it to count a missed deadline as an
        underrun instead of stalling every other lane)."""
        with self.coord._pump_cv:
            return self._buf_n

    def ready(self) -> bool:
        """True once this stream can render: its first acoustic round has
        published. In pump mode that means the lane ACTIVATED (the pump
        adopted its first traced spectra at a chunk boundary — the
        stacked-publish pump never materializes per-lane renderer
        spectra, so `r._spectra` stays None there); otherwise it means
        the renderer holds spectra. Poll this before the first render()
        of a freshly joined stream (engine/netserve.py does)."""
        if self.coord.render_pump and self.coord._pump_states is not None:
            return self._pump_active
        return self.r._spectra is not None

    def close(self) -> None:
        """Leave the cohort: the coordinator stops tracing this stream's
        listener lane. The renderer keeps working solo (its spectra stay
        whatever the last round published). With a capacity coordinator
        the freed lane is reusable by a later stream() with NO recompile
        — including while the render pump is LIVE (the lane deactivates:
        its PCM stops depositing, its slot returns to the free list, and
        the next tenant's activation resets its conv state)."""
        self.coord._remove(self)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class BatchedAcoustics:
    """Shared acoustic-update worker for N concurrent listener streams.

    Usage (see benchmarks/bench_serving.py --batched):

        coord = BatchedAcoustics(scene.device_arrays(), [src_pos], cfg=cfg,
                                 n_rays=1 << 15, max_bounces=6)
        handles = [coord.stream(r) for r in renderers]
        coord.warmup(initial_poses)      # compile before the clock starts
        with coord:                      # worker thread
            ... each stream: handle.request(...) / handle.render(...)

    Register every stream before warmup(): the batched trace executable is
    compiled for the (L, 3) listener batch; registering later recompiles
    on the next round (correct, but a mid-stream stall through a
    compile-relay environment). For serving workloads where tenants come
    and go, pass capacity=N instead — the lane shape is fixed at N, and
    stream()/handle.close() on a live coordinator are recompile-free.
    """

    def __init__(self, scene_arrays, source_positions,
                 cfg: Config = DEFAULT_CONFIG, n_rays: int | None = None,
                 max_bounces: int | None = None, intersector: str = "mt",
                 src_directivities=None, coalesce_s: float = 0.02,
                 mesh=None, pallas_kw=None,
                 batch_respectra: bool | None = None,
                 round_interval_s: float = 0.2,
                 capacity: int | None = None,
                 sh_order: int | None = None,
                 render_pump: bool = False,
                 pump_chunk_blocks: int = 64,
                 pump_buffer_chunks: int = 2,
                 pump_max_buffer_chunks: int = 6,
                 pump_prefill: bool = True,
                 pump_pcm: str = "f32"):
        """intersector: "mt"/"mxu" use the shared-path XLA tracer (one path
        pass + L NEE lanes — the cheapest round); "pallas" scans the fused
        kernel over the listener batch (ops/pallas_trace.py::
        trace_irs_pallas_multi_listener — L full traces of device work but
        still ONE dispatch, and the auto-wavefront/sg_cull kernel is the
        only way to serve 49k+-triangle rooms; pallas_kw forwards e.g.
        interpret/flat_bands/wavefront). mesh: a ("listeners", "rays")
        jax.sharding.Mesh scales the round across chips
        (parallel/sharding.py::trace_irs_multi_listener_sharded — stream
        count must divide the listeners axis).

        batch_respectra: also fold every stream's HRTF respectra into ONE
        vmapped dispatch per round (then a stream's update is pure
        bookkeeping — IRStreamRenderer.apply_traced — and the round costs
        2 dispatches total regardless of N; at 16 streams the N respectra
        dispatches were the measured next bottleneck after the batched
        trace). None = auto: on when every stream is plain binaural
        stereo sharing one HRTF; True asserts that; False keeps
        per-stream update() respectras.

        round_interval_s: minimum wall time between acoustic rounds. The
        device is SHARED with every stream's per-chunk render dispatch;
        an unpaced loop re-traces the moment the previous round's
        dispatches drain (streams request poses every frame, so the
        event is always set) and starves the audio renders — measured at
        16 streams: 7.4 rounds/s drove every stream to 0.72x realtime,
        ~2000 underruns each. 0.2 s = the ~5 Hz acoustic cadence the
        solo walkthrough measures (and well under the reference's
        per-frame intent, main.zig:518-521 — acoustics there also run
        at game-loop rate, not audio rate).

        capacity: fix the traced listener-batch shape at `capacity`
        lanes so streams can join (stream()) and leave (handle.close())
        a RUNNING coordinator with no recompile — production serving
        can't stall every tenant for a mid-stream executable build
        whenever one connects. Fewer live streams than capacity ride as
        padding lanes (the first live pose repeated; their results are
        discarded). None (default) = the exact-cohort behavior:
        cheapest trace, but a later stream() recompiles on the next
        round.

        render_pump: batch the RENDER dispatches too. The r3 serving
        wall was not the acoustic rounds (those are already one
        dispatch per round) but the audio renders: at 24 streams, 24
        render threads each dispatch their own chunk, so aggregate
        render-dispatch traffic scales linearly with N while each
        dispatch pays the relay's serialized round trip — every stream
        pinned at rt 0.55 with ~3200 underruns (RESULTS.md). The
        reference's audio callback renders ALL voices in one pass
        (sound_system.zig:123-172); the pump is that architecture at
        serving scale: one thread renders EVERY lane's next
        pump_chunk_blocks-block chunk in ONE dispatch
        (ir_stream.py::_stream_blocks_pump, bit-identical per lane to
        the solo path), buffers pump_buffer_chunks chunks ahead per
        lane, and handle.render() just pops host PCM. Dispatches/s =
        sample_rate/(pump_chunk_blocks*block) regardless of N.
        Constraints (asserted at pump start): every stream shares the
        source tables (same dry samples/loops — the coordinator
        already requires shared sources) and output layout (same
        n_out / spectra shapes). WITH capacity= the pump serves a
        CHANGING population at the fixed lane shape — the reference's
        one-callback-mixes-a-changing-voice-set architecture
        (sound_system.zig:113-121 playSound inserts, 164-171 finished
        sweep, 123-172 one callback serves all) at serving scale:
        stream() on a live pump takes a free lane and ACTIVATES at the
        chunk boundary where its first traced spectra land (conv state
        reset, cursor 0 — its first chunk is bit-identical to a fresh
        solo stream's), handle.close() deactivates the lane and frees
        the slot; neither recompiles anything. Capacity pumps require
        warmup() and the stacked respectra path (binaural cohorts
        sharing one HRTF — batch_respectra auto/True). WITHOUT
        capacity the cohort is FIXED while the pump runs (register
        every stream before warmup(); per-lane-mailbox cohorts like
        speaker rigs live here). A lane that stops consuming (dead
        sink) has its oldest chunk dropped past pump_max_buffer_chunks
        (handle.pump_dropped counts; the next read declicks the
        splice) so one stalled client never blocks the cohort.

        pump_pcm: "f32" (default — render() pops float32, bit-matching
        the solo path) or "s16" — the pump quantizes to s16 ON DEVICE
        (round-to-nearest, clipped; exactly np.rint of the f32 PCM)
        and render() pops int16. Halves the device->host PCM transfer,
        which is the measured per-chip lane binder through this
        environment's ~33 MB/s relay (benchmarks/pump_ab.py: the L=48
        f32 tick is 128.8 ms — ~89 ms of it the 3 MB transfer — vs the
        185.8 ms chunk), and s16 is already the network wire format
        (engine/netserve.py serves it without any host conversion)."""
        self.cfg = cfg
        self._arrays = scene_arrays
        self._srcs = jnp.asarray(
            np.asarray(source_positions, np.float32).reshape(-1, 3)
        )
        n_src = int(self._srcs.shape[0])
        if src_directivities is not None and len(src_directivities) != n_src:
            raise ValueError("one directivity (or None) per source")
        dvts = tuple(src_directivities or (None,) * n_src)
        self.n_rays = n_rays or cfg.rays_per_source
        self.max_bounces = max_bounces or cfg.max_bounces
        self.intersector = intersector
        # coalescing window: staggered per-stream requests inside one
        # window batch into a single round (streams request at the block
        # cadence, so a few ms catches a whole cohort)
        self.coalesce_s = coalesce_s
        self.round_interval_s = round_interval_s
        if capacity is not None and capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.sh_order = sh_order
        if sh_order is not None and (
            intersector not in ("mt", "mxu") or mesh is not None
        ):
            raise ValueError(
                "sh_order cohorts are traced by the XLA multi-listener "
                "route only (intersector='mt'/'mxu', no mesh)"
            )
        self.capacity = capacity
        # capacity mode: stable lane slots — each handle keeps ONE index
        # into the traced batch and the pump's stacked state for its
        # whole life, so join/leave never shifts another lane's conv
        # state (list-position indexing would)
        self._free_slots = list(range(capacity))[::-1] if capacity else []
        if render_pump and capacity is not None and batch_respectra is False:
            raise ValueError(
                "render_pump with capacity lanes rides the STACKED "
                "respectra publish (the pump adopts the whole (L, ...) "
                "spectra array at chunk boundaries; per-lane mailboxes "
                "cannot describe an empty slot) — leave batch_respectra "
                "at None/True (binaural cohorts sharing one HRTF)"
            )
        self.render_pump = bool(render_pump)
        self.pump_chunk_blocks = int(pump_chunk_blocks)
        self.pump_buffer_chunks = int(pump_buffer_chunks)
        self.pump_max_buffer_chunks = int(pump_max_buffer_chunks)
        # deposit the warmup compile-dispatch's PCM as every lane's
        # first chunk (it is bit-identical to the first live tick) so
        # streams start a chunk ahead of the clock; False = discard it
        # (deterministic tick/chunk accounting for tests)
        self.pump_prefill = bool(pump_prefill)
        if pump_pcm not in ("f32", "s16"):
            raise ValueError(f"pump_pcm must be f32/s16, got {pump_pcm!r}")
        self.pump_pcm = pump_pcm
        self._pump_cv = threading.Condition()
        self._pump_thread = None
        self._pump_lanes = None  # fixed handle list while pumping
        self._pump_states = None  # stacked RealConvState (L, S, n_out, ...)
        self._pump_cur = None  # stacked spectra the lanes render with
        # slot -> handle (or None for a free/empty lane) while the pump
        # is fixed; in exact-cohort mode slot i == _pump_lanes[i]
        self._pump_slot_handles = None
        # slots whose first traced spectra are waiting in _pump_next:
        # the tick that adopts them resets their lane (state zeros,
        # cursor 0, no fade) and flips the handle active (all under
        # _pump_cv)
        self._pump_pending_activate: set[int] = set()
        # shared dry arena the pump renders from, stashed at setup so
        # ticks survive the founding lane leaving: (dry_dev, len_dev,
        # loop_dev, n_out) + host copies for join-time validation
        self._pump_arena = None
        self._pump_dry_host = None
        # _pump_setup exclusivity: warmup() (user thread) and the pump
        # loop's no-warmup fallback may race to fix the lanes; the
        # loop also gates ticking on _pump_states, which setup
        # therefore assigns LAST (after the warm dispatch + prefill)
        self._pump_setup_lock = threading.Lock()
        # stacked-publish mailbox: ((re, im) stacked (L, ...), dirty
        # flags) from the latest round, freshest wins (see
        # _publish_traced — per-lane slicing measured ~200 ms of relay
        # queue per 24-stream round)
        self._pump_next = None
        self._pump_cursors = None  # per-lane python-int sample cursors
        self.pump_ticks = 0
        # observability: cumulative wall seconds inside _pump_tick /
        # _round — avg tick cost = pump_tick_s / pump_ticks (the
        # serving capacity math in benchmarks/RESULTS.md runs on these)
        self.pump_tick_s = 0.0
        self.round_s = 0.0
        self._handles: list[_StreamHandle] = []
        self._evt = threading.Event()
        self._stop_evt = threading.Event()
        self._thread = None
        self.rounds = 0
        self.error = None
        self._batch_respectra_opt = batch_respectra
        self._respectra_all = None
        # the last-built vmapped respectra jit, kept across a cohort
        # emptying (its jax.jit cache is what keeps join/leave
        # recompile-free — rebuilding a fresh jit object would pay a
        # full compile on the next round)
        self._respectra_prev_jit = None
        self._respectra_hrtf_host = None  # host (hl, hr) the vmap captured
        # cohort IDENTITY the vmap was built for — membership, not a
        # count: a same-size leave+join must re-qualify the cohort
        # (the newcomer may carry a different HRTF or a speaker
        # decoder; a count check silently kept the old tenant's)
        self._respectra_cohort = ()
        n_bounce, config = self.max_bounces, cfg
        amb_of = jax.vmap(lambda e, d: ambisonic_ir(ImpulseResponse(e, d)))

        if intersector in ("pallas", "pallas_nee"):
            if mesh is not None:
                raise ValueError(
                    "pallas + mesh batched serving is not implemented; "
                    "use the sharded XLA tracer (intersector='mt', mesh=)"
                )
            if any(d is not None for d in dvts):
                raise ValueError(
                    "source directivity is not plumbed through the "
                    "multi-listener kernel scan"
                )
            from ..models.ir import fibonacci_sphere_sorted
            from ..ops.pallas_trace import (
                trace_irs_pallas_multi_listener,
                trace_irs_pallas_multi_listener_nee,
            )

            dirs = jnp.asarray(fibonacci_sphere_sorted(self.n_rays))
            kw = dict(pallas_kw or {})
            # "pallas_nee": multi-listener NEE IN-KERNEL — one path pass
            # per listener chunk, VMEM-resident shadow/emission/binning
            # per listener (the r2 16-stream bottleneck was the XLA NEE
            # lanes' (L, R, T) HBM temporaries; the per-listener kernel
            # scan instead re-ran the path pass L times)
            trace_ml = (
                trace_irs_pallas_multi_listener_nee
                if intersector == "pallas_nee"
                else trace_irs_pallas_multi_listener
            )

            def _trace_all(arrays, srcs, listeners):
                ambs = []
                for i in range(n_src):
                    ir = trace_ml(
                        arrays, srcs[i], listeners, cfg=config,
                        max_bounces=n_bounce, dirs=dirs, **kw,
                    )
                    ambs.append(amb_of(ir.energy, ir.dir_sum))
                return jnp.stack(ambs, axis=1)  # (L, S, 4, L_ir)

        elif mesh is not None:
            if any(d is not None for d in dvts):
                raise ValueError(
                    "source directivity is not plumbed through the "
                    "sharded multi-listener tracer"
                )
            from ..parallel.sharding import trace_irs_multi_listener_sharded

            the_mesh, rays = mesh, self.n_rays

            def _trace_all(arrays, srcs, listeners):
                ambs = []
                for i in range(n_src):
                    ir = trace_irs_multi_listener_sharded(
                        arrays, srcs[i], listeners, the_mesh, cfg=config,
                        n_rays=rays, max_bounces=n_bounce,
                    )
                    ambs.append(amb_of(ir.energy, ir.dir_sum))
                return jnp.stack(ambs, axis=1)

        else:
            dirs = jnp.asarray(fibonacci_sphere(self.n_rays))
            isect = intersector
            order = sh_order
            if order is not None:
                from ..models.ir import ambisonic_ir_hoa

                amb_of_hoa = jax.vmap(
                    lambda e, d, m: ambisonic_ir_hoa(
                        ImpulseResponse(e, d, m)
                    )
                )

            def _trace_all(arrays, srcs, listeners):
                # one multi-listener trace per source (python loop — n_src
                # is static), each = one shared path pass + L NEE lanes;
                # stacked to (L, S, C, L_ir) ambisonic IRs (C = 4 first
                # order, n_sh(sh_order) for HOA cohorts)
                ambs = []
                for i in range(n_src):
                    ir = trace_ir_multi_listener(
                        arrays, srcs[i], listeners, cfg=config,
                        max_bounces=n_bounce, dirs=dirs, intersector=isect,
                        src_directivity=dvts[i], sh_order=order,
                    )
                    if order is not None:
                        ambs.append(
                            amb_of_hoa(ir.energy, ir.dir_sum,
                                       ir.sh_moments)
                        )
                    else:
                        ambs.append(amb_of(ir.energy, ir.dir_sum))
                return jnp.stack(ambs, axis=1)  # (L, S, C, L_ir)

        self._trace_all = jax.jit(_trace_all)

    # -- streams -------------------------------------------------------------

    def stream(self, renderer) -> _StreamHandle:
        """Register an IRStreamRenderer; returns its request/render facade.
        With capacity= this is safe on a LIVE coordinator (the lane shape
        is fixed, no recompile) — including while the render pump runs
        (the new stream takes a free lane slot and ACTIVATES at the
        chunk boundary where its first traced spectra land; until then
        ready() is False and render() blocks). Without capacity, prefer
        registering before warmup()."""
        if self.capacity is not None and not self._free_slots:
            raise ValueError(
                f"coordinator is at capacity ({self.capacity}); close() a "
                "stream first or raise capacity"
            )
        if renderer.sh_order != self.sh_order:
            raise ValueError(
                "renderer sh_order must match the coordinator's "
                f"({renderer.sh_order} vs {self.sh_order}) — the batched "
                "trace emits one moment order for the whole cohort"
            )
        if renderer._ir_fn is not None:
            raise ValueError("custom ir_fn streams cannot be batch-traced")
        if (renderer.n_rays, renderer.max_bounces) != (
            self.n_rays, self.max_bounces
        ):
            raise ValueError(
                "renderer n_rays/max_bounces must match the coordinator "
                f"({renderer.n_rays}/{renderer.max_bounces} vs "
                f"{self.n_rays}/{self.max_bounces}) — the batched trace "
                "replaces the renderer's own"
            )
        h = _StreamHandle(self, renderer)
        if self.capacity is not None:
            with self._pump_cv:
                if not self._free_slots:
                    raise ValueError(
                        f"coordinator is at capacity ({self.capacity}); "
                        "close() a stream first or raise capacity"
                    )
                h.slot = self._free_slots.pop()
                if self.render_pump and self._pump_states is not None:
                    # joining a LIVE pump: the lane renders from the
                    # shared arena with the cohort's stacked respectra,
                    # so the newcomer must match both
                    try:
                        self._validate_pump_join(renderer)
                    except Exception:
                        self._free_slots.append(h.slot)
                        h.slot = None
                        raise
                    self._pump_slot_handles[h.slot] = h
                # append INSIDE the cv: _pump_setup_locked's join sweep
                # snapshots _handles under the same cv, so a join is
                # either fully visible to the sweep or fully after the
                # pump fixes (and then took the live-join path above)
                self._handles.append(h)
        else:
            self._handles.append(h)
        return h

    def _validate_pump_join(self, r) -> None:
        """A stream joining a live capacity pump must share the pump's
        dry arena, output layout, and HRTF. HOST-memory comparisons
        ONLY (caller holds _pump_cv, and netserve joins arrive in
        bursts): device compares per join measured as a ~10 s join
        storm at 48 clients through the relay — every array compared
        here has a host copy kept exactly for this."""
        dry, slen, sloop = self._pump_dry_host
        if r._dry is None:
            raise ValueError(
                "add_source() the renderer BEFORE stream() when joining "
                "a live render pump (the pump renders every lane from "
                "one shared dry arena)"
            )
        if not (np.array_equal(r._dry, dry)
                and np.array_equal(r._src_len_host, slen)
                and np.array_equal(r._src_loop_host, sloop)):
            raise ValueError(
                "pump lanes must share the dry source tables (same "
                "samples, gains, loop flags) — the joining renderer's "
                "arena differs from the pump's"
            )
        if r.n_out != self._pump_arena[3] or r._decoder is not None:
            raise ValueError("pump lanes must share n_out (binaural)")
        hl, hr = self._respectra_hrtf_host
        if not (np.array_equal(r._hrtf_host[0], hl)
                and np.array_equal(r._hrtf_host[1], hr)):
            raise ValueError(
                "pump lanes share ONE stacked respectra — the joining "
                "renderer's HRTF differs from the cohort's"
            )

    def _remove(self, handle: _StreamHandle) -> None:
        if (self.capacity is None and self._pump_lanes is not None
                and handle in self._pump_lanes):
            raise ValueError(
                "render_pump cohorts are fixed while the pump runs "
                "(exact-cohort mode); use capacity= for live "
                "join/leave, or stop the coordinator first"
            )
        with self._pump_cv:
            try:
                self._handles.remove(handle)
            except ValueError:
                return  # already closed
            if handle.slot is not None:
                if (self._pump_slot_handles is not None
                        and self._pump_slot_handles[handle.slot] is handle):
                    self._pump_slot_handles[handle.slot] = None
                self._pump_pending_activate.discard(handle.slot)
                handle._pump_active = False
                self._free_slots.append(handle.slot)
                handle.slot = None
            self._pump_cv.notify_all()

    def set_scene_arrays(self, arrays) -> None:
        """Swap the shared device geometry (e.g. rigid_transform_arrays
        output) — every stream's pose cache invalidates, so the next round
        re-traces and re-swaps all dirty streams against the new room."""
        self._arrays = arrays
        for h in self._handles:
            h.r.set_scene_arrays(arrays)
            h._dirty = True
        self._evt.set()

    # -- rounds --------------------------------------------------------------

    def _cohort_key(self):
        """Identity of the current stream membership (order-free)."""
        return frozenset(h.uid for h in self._handles)

    def _setup_respectra(self) -> None:
        """Build (or decline) the cohort-wide vmapped respectra for the
        current stream set; re-run whenever cohort MEMBERSHIP changes
        (not just its size — see _respectra_cohort)."""
        self._respectra_cohort = self._cohort_key()
        prev = self._respectra_all or self._respectra_prev_jit
        self._respectra_all = None
        if self._batch_respectra_opt is False or not self._handles:
            return
        rs = [h.r for h in self._handles]
        # HOST-memory equality only: this runs on the round thread mid-
        # serving whenever the cohort changes, and device compares here
        # each cost a relay round trip (part of the measured netserve
        # join storm). Binaural cohorts qualify at any sh_order (the
        # HOA decode emits the same (S, 2, P, F) spectra shapes, so the
        # stacked publish — and the render pump — serve HOA too);
        # stream() already pins every lane to the coordinator's order.
        ok = all(
            r.n_out == 2 and r._decoder is None
            and r.sh_order == self.sh_order
            for r in rs
        ) and all(
            np.array_equal(r._hrtf_host[0], rs[0]._hrtf_host[0])
            and np.array_equal(r._hrtf_host[1], rs[0]._hrtf_host[1])
            and r._full_bank == rs[0]._full_bank
            for r in rs[1:]
        )
        if not ok:
            if self._batch_respectra_opt is True:
                raise ValueError(
                    "batch_respectra needs binaural-stereo streams "
                    "sharing one HRTF/bank (no speaker rigs, no "
                    "per-stream HRTF sets)"
                )
            return
        hl_h, hr_h = rs[0]._hrtf_host
        block = self.cfg.block_size
        if (prev is not None and self._respectra_hrtf_host is not None
                and np.array_equal(self._respectra_hrtf_host[0], hl_h)
                and np.array_equal(self._respectra_hrtf_host[1], hr_h)):
            # cohort changed but the HRTF didn't: keep the SAME jit
            # object (a fresh jax.jit has an empty cache — with
            # capacity the shapes are stable and this keeps join/leave
            # recompile-free)
            self._respectra_all = prev
            self._respectra_prev_jit = prev
            return
        hl, hr = rs[0].hrtf_l, rs[0].hrtf_r
        self._respectra_hrtf_host = (hl_h.copy(), hr_h.copy())
        if self.sh_order is None:
            one = lambda a, o: _respectra(a, o, hl, hr, block)  # noqa: E731
        else:
            from .ir_stream import _respectra_hoa

            order, fb = self.sh_order, rs[0]._full_bank
            one = lambda a, o: _respectra_hoa(  # noqa: E731
                a, o, hl, hr, block, order, full_bank=fb
            )
        self._respectra_all = jax.jit(
            lambda ambs, orients: jax.vmap(one)(ambs, orients)
        )
        self._respectra_prev_jit = self._respectra_all

    def _round_cohort(self):
        """Snapshot (handles, slots) for one round UNDER _pump_cv: a
        handle closing concurrently (netserve evicts from client
        threads) nulls h.slot, and a None slot used as an index would
        silently corrupt the whole batch (numpy's arr[None] is an axis
        insert, not an error). The slot captured here stays valid for
        the round even if the handle closes mid-round — worst case one
        discarded lane trace (or, if the slot is re-taken within the
        same ~100 ms round, one stale crossfade that the next round
        corrects)."""
        with self._pump_cv:
            handles = list(self._handles)
            if self.capacity is None:
                return handles, list(range(len(handles)))
            pairs = [
                (h, h.slot) for h in handles
                if h._pose is not None and h.slot is not None
            ]
            return [h for h, _ in pairs], [s for _, s in pairs]

    def _listener_batch(self, handles, slots) -> jnp.ndarray:
        """(L, 3) listener positions. With capacity the batch is SLOT-
        ordered at the fixed (capacity, 3) lane shape: row h.slot holds
        h's pose for the handle's whole life (the pump's stacked conv
        state is indexed by the same slots, so lane identity must never
        shift with cohort membership); free/unposed slots carry the
        first live pose repeated (their results are discarded)."""
        if self.capacity is None:
            return jnp.asarray(np.stack([h._pose[0] for h in handles]))
        lst = np.broadcast_to(
            handles[0]._pose[0], (self.capacity, 3)
        ).copy()
        for h, s in zip(handles, slots):
            lst[s] = h._pose[0]
        return jnp.asarray(lst)

    def _orient_batch(self, handles, slots) -> jnp.ndarray:
        o = np.asarray(self._orients(handles))
        if self.capacity is None:
            return jnp.asarray(o)
        out = np.broadcast_to(o[0], (self.capacity, 4)).copy()
        for row, s in zip(o, slots):
            out[s] = row
        return jnp.asarray(out)

    @staticmethod
    def _orients(handles):
        # HOST array: _orient_batch scatters rows by slot on host and
        # does the single device upload itself (a jnp round-trip here
        # cost two pointless relay hops per round)
        return np.stack([
            np.asarray(quat.quat_from_roll_pitch_yaw(
                np.float32(h._pose[2]), np.float32(h._pose[1]),
                np.float32(0.0),
            ), np.float32)
            for h in handles
        ])

    def warmup(self, poses) -> None:
        """Seed every stream's pose ((pos, yaw[, pitch]) per stream, in
        registration order) and compile + run the batched trace once, so
        the first live round never pays the executable build. In
        render_pump mode this also PUBLISHES the warmup trace to every
        stream (each lane needs spectra before the first pump chunk)
        and compiles the pump executable with one discarded dispatch."""
        if len(poses) != len(self._handles):
            raise ValueError("one initial pose per registered stream")
        for h, p in zip(self._handles, poses):
            pos, yaw = p[0], p[1]
            pitch = float(p[2]) if len(p) > 2 else 0.0
            h._pose = (np.asarray(pos, np.float32), float(yaw), pitch)
        handles, slots = self._round_cohort()
        amb = self._trace_all(
            self._arrays, self._srcs, self._listener_batch(handles, slots)
        )
        float(jnp.sum(amb))  # host transfer: force the compile + execute
        self._setup_respectra()
        if self._respectra_all is not None:
            re, _ = self._respectra_all(
                amb, self._orient_batch(handles, slots)
            )
            float(jnp.sum(re))
        if self.render_pump:
            # seed every lane's spectra from this warmup trace, then
            # compile + run the pump executable once and discard —
            # the first live chunk must not pay the build
            self._publish_traced(
                handles, amb, [True] * len(handles), slots
            )
            for h in self._handles:
                with h.lock:
                    h._adopt_locked()
            self._pump_setup(warm=True)

    def _round(self) -> None:
        # snapshot under the lock: slots stay valid for the whole round
        # even if a handle closes concurrently (see _round_cohort).
        # In capacity mode a just-joined stream without a pose yet must
        # not stall the others — it joins the round after its first
        # request()
        handles, slots = self._round_cohort()
        if self.capacity is not None:
            if not handles:
                return
        elif not handles or any(h._pose is None for h in handles):
            return  # nothing to do until every stream has a pose
        dirty = []
        for h in handles:
            dirty.append(h._dirty)
            h._dirty = False
        if not any(dirty):
            return
        # ONE dispatch for the whole cohort: the batch shape stays (L, 3)
        # whether one stream moved or all did (clean streams ride their
        # unchanged pose; their lanes are the cheap NEE part of the trace,
        # and their update() below is a pose-cache no-op)
        amb = self._trace_all(
            self._arrays, self._srcs, self._listener_batch(handles, slots)
        )
        if self._respectra_cohort != self._cohort_key():
            self._setup_respectra()
        self._publish_traced(handles, amb, dirty, slots)
        self.rounds += 1

    def _publish_traced(self, handles, amb, dirty, slots) -> None:
        """Decode the round's traced ambisonic IRs to per-stream
        partitioned spectra and publish through each dirty stream's
        mailbox (also used by warmup() in pump mode to seed every lane
        before the first pump dispatch). slots: the round's slot
        snapshot (_round_cohort) — lane indices into amb/the stacked
        respectra."""
        if (self.render_pump and self.capacity is not None
                and self._respectra_all is None):
            # capacity pumps are stacked-only; _respectra_all can only
            # be None here when the cohort emptied mid-round (every
            # snapshot handle closed and _setup_respectra saw zero
            # streams) — nothing live to publish to, and the
            # per-handle fallback below must not run for pump lanes
            return
        if self.render_pump and self._respectra_all is not None:
            # STACKED publish: the pump consumes the (L, ...) respectra
            # arrays whole, so slicing them per lane here would only
            # create ~2L tiny device ops per round — measured ~200 ms of
            # relay-queue time per 24-stream round, the residual wall
            # after the pump removed render-dispatch scaling
            # (benchmarks/pump_ab.py: the pump dispatch itself is a flat
            # ~28 ms at L=8/16/24 and the L=24 trace 42 ms — the rest of
            # the 238 ms/round was this glue). One mailbox swap instead;
            # per-lane crossfades ride the dirty flags (SLOT-indexed —
            # the pump's lanes are slots, not list positions).
            re, im = self._respectra_all(
                amb, self._orient_batch(handles, slots)
            )
            L = self.capacity or len(handles)
            flags = [False] * L
            acts = set()
            with self._pump_cv:
                for i, h in enumerate(handles):
                    j = slots[i]
                    flags[j] = bool(dirty[i])
                    if (dirty[i] and self._pump_states is not None
                            and not h._pump_active
                            and self._pump_slot_handles is not None
                            and self._pump_slot_handles[j] is h):
                        # first traced spectra for a lane that joined a
                        # LIVE pump: the adopting tick activates it
                        # (state reset + cursor 0 + no fade). The
                        # slot-identity check skips a handle that
                        # closed mid-round (its slot may already
                        # belong to someone else)
                        acts.add(j)
                self._pump_next = ((re, im), flags)
                self._pump_pending_activate |= acts
                self._pump_cv.notify_all()
            for i, h in enumerate(handles):
                if dirty[i]:
                    pos, yaw, pitch = h._pose
                    h.updates += 1
                    h.retraces += bool(
                        h.r.note_traced_pose(pos, yaw, pitch)
                    )
            return
        if self._respectra_all is not None:
            # 2 dispatches per round total: per-stream adoption below is
            # pure bookkeeping + an atomic swap
            re, im = self._respectra_all(
                amb, self._orient_batch(handles, slots)
            )
            for i, h in enumerate(handles):
                if not dirty[i]:
                    continue
                pos, yaw, pitch = h._pose
                j = slots[i]
                h._publish(pos, yaw, pitch, amb[j], (re[j], im[j]))
        else:
            for i, h in enumerate(handles):
                if not dirty[i]:
                    continue
                pos, yaw, pitch = h._pose
                # respectra on THIS thread (a device dispatch — never
                # on the audio thread), swap deferred through the
                # mailbox. The decode selection IS the renderer's own
                # (one shared dispatch — batched streams can never
                # decode differently from solo ones)
                j = slots[i]
                orient = jnp.asarray(quat.quat_from_roll_pitch_yaw(
                    np.float32(pitch), np.float32(yaw), np.float32(0.0)
                ))
                spectra = h.r._respectra_for(amb[j], orient)
                h._publish(pos, yaw, pitch, amb[j], spectra)

    # -- render pump -----------------------------------------------------------

    def _pump_setup(self, warm: bool = False) -> None:
        """Fix the pump's lane shape and build its stacked device state:
        (L,)-stacked conv states (zeros — a fresh stream), (L,)-stacked
        current spectra, per-lane cursors. L = capacity when set (lanes
        beyond the registered streams start FREE — a later stream()
        takes one with no recompile), else the exact registered cohort.
        warm=True also compiles the pump executable with one discarded
        dispatch."""
        from ..ops import conv_partitioned as cp

        with self._pump_setup_lock:
            if self._pump_states is not None:
                return  # another thread already fixed the lanes
            self._pump_setup_locked(cp, warm)

    def _pump_setup_locked(self, cp, warm: bool) -> None:
        with self._pump_cv:
            # snapshot under the cv: stream() also mutates _handles /
            # slots under it, so the founding-lane set is consistent;
            # anyone who joins DURING this setup is swept into the slot
            # table at the end (inactive — the normal activation flow
            # serves them)
            lanes = list(self._handles)
        if not lanes:
            raise ValueError("render_pump needs at least one stream")
        rs = [h.r for h in lanes]
        r0 = rs[0]
        if any(r._dry is None for r in rs):
            raise RuntimeError(
                "every pump lane needs its dry sources before the pump "
                "starts — add_source() each renderer BEFORE warmup() "
                "(the pump renders all lanes from one stacked (S, N) "
                "dry arena, so it must exist when the cohort is fixed)"
            )
        with self._pump_cv:
            stacked = self._pump_next
            self._pump_next = None
            self._pump_pending_activate = set()
        if self.capacity is not None and stacked is None:
            if self._respectra_all is None and any(
                r._spectra is None for r in rs
            ):
                # warmup ran but _setup_respectra DECLINED the cohort
                # (per-stream HRTFs / speaker rigs under
                # batch_respectra=None auto) — say so instead of the
                # misleading "needs warmup() first"
                raise RuntimeError(
                    "render_pump with capacity lanes needs the stacked "
                    "respectra path, and this cohort does not qualify "
                    "(binaural streams sharing ONE HRTF required; see "
                    "batch_respectra)"
                )
            raise RuntimeError(
                "render_pump with capacity lanes needs warmup() first: "
                "the pump's (capacity, ...) stacked spectra come from "
                "the warmup round's batched respectra publish"
            )
        if stacked is None and any(r._spectra is None for r in rs):
            raise RuntimeError(
                "every pump lane needs spectra before the pump starts — "
                "call warmup(), or request() once per stream and let a "
                "round publish"
            )
        for r in rs[1:]:
            if r.n_out != r0.n_out:
                raise ValueError("pump lanes must share n_out")
            if not (np.array_equal(r._dry, r0._dry)
                    and np.array_equal(r._src_len_host,
                                       r0._src_len_host)
                    and np.array_equal(r._src_loop_host,
                                       r0._src_loop_host)):
                raise ValueError(
                    "pump lanes must share the dry source tables (same "
                    "samples, gains, loop flags) — the pump renders all "
                    "lanes from one (S, N) arena"
                )
            if stacked is None and jax.tree.map(
                jnp.shape, r._spectra
            ) != jax.tree.map(jnp.shape, r0._spectra):
                raise ValueError("pump lanes must share spectra shapes")
        S = r0._dry_dev.shape[0]
        B = self.cfg.block_size
        L = self.capacity or len(lanes)
        for h in lanes:
            with h.lock:
                # the pump starts from each lane's CURRENT spectra; any
                # pre-pump solo swap is already reflected there
                h.r._pending_fade = False
            h._buf = []
            h._buf_off = 0
            h._buf_n = 0
        with self._pump_cv:
            slot_handles = [None] * L
            for i, h in enumerate(lanes):
                if self.capacity is not None and h.slot is None:
                    # founding lane close()d between the lanes snapshot
                    # and here — its slot is already freed; skip it
                    # (indexing with None would TypeError)
                    continue
                h._pump_active = True
                slot_handles[
                    h.slot if self.capacity is not None else i
                ] = h
            self._pump_slot_handles = slot_handles
            self._pump_lanes = lanes
        # the dry arena outlives any single lane (capacity mode: the
        # founding stream may close while the pump keeps serving)
        self._pump_arena = (
            r0._dry_dev, r0._src_len_dev, r0._src_loop_dev, r0.n_out
        )
        self._pump_dry_host = (
            r0._dry.copy(),
            r0._src_len_host.copy(),
            r0._src_loop_host.copy(),
        )
        if stacked is not None:
            # stacked-publish mode: the warmup (or first) round's
            # batched respectra output IS the pump's spectra — per-lane
            # slices are never materialized (capacity mode: the trace
            # batch is already (capacity, ...), free slots ride pad rows
            # whose PCM is never deposited)
            self._pump_cur = stacked[0]
        else:
            self._pump_cur = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[h.r._spectra for h in lanes]
            )
        P = self._pump_cur[0].shape[-2]
        states = cp.conv_init_real((L, S, r0.n_out), P, B)
        self._pump_cursors = [0] * L
        if warm:
            from .ir_stream import _stream_blocks_pump

            ys, st = _stream_blocks_pump(
                r0._dry_dev, r0._src_len_dev, r0._src_loop_dev,
                jnp.zeros(L, jnp.int32), states,
                self._pump_cur, self._pump_cur,
                jnp.zeros(L, bool),
                K=self.pump_chunk_blocks, B=B, n_out=r0.n_out,
                out_s16=self.pump_pcm == "s16",
            )
            pcm = np.asarray(ys)  # force the compile + execute NOW
            if self.pump_prefill:
                # the warm dispatch (cursor 0, zero state, warmup
                # spectra) is bit-identical to what the first live tick
                # would render — deposit it so every lane starts one
                # chunk ahead of the clock instead of racing the pump's
                # first post-start tick (a 24-stream run measured a
                # single startup underrun exactly there)
                states = st
                self._deposit(pcm)
        with self._pump_cv:
            if self.capacity is not None:
                # sweep in anyone who joined while this setup ran:
                # stream() saw _pump_states None then, so it neither
                # validated them nor registered their slot — without
                # this they would be orphaned (never activate, render()
                # times out). They stay INACTIVE; a round publish
                # activates them like any live join. stream() appends
                # to _handles under this same cv, so a join is either
                # fully visible here or arrives after _pump_states is
                # set and takes the validated live-join path.
                for h in list(self._handles):
                    if h in lanes or h.slot is None:
                        continue
                    try:
                        self._validate_pump_join(h.r)
                    except ValueError as e:
                        # evict the mismatched joiner instead of
                        # letting its error brick warmup() for the
                        # whole valid cohort; its render() raises
                        h.error = e
                        self._free_slots.append(h.slot)
                        h.slot = None
                        self._handles.remove(h)
                        continue
                    self._pump_slot_handles[h.slot] = h
            # assign LAST and inside the cv: the pump loop gates on
            # _pump_states, and a coordinator entered before warmup()
            # has its pump thread live during this setup
            # (engine/netserve.py start() does exactly that) —
            # everything above must be consistent before it ticks,
            # and no join may land between the sweep and this
            self._pump_states = states

    def _pump_tick(self) -> None:
        """ONE pump iteration: adopt every lane's pending spectra at
        this chunk boundary (activating any lane whose FIRST spectra
        just landed: state reset via _mask_lanes, cursor 0, no fade —
        its first chunk is bit-identical to a fresh solo stream's),
        render every lane's next chunk in one dispatch, deposit the PCM
        in the per-lane buffers. Synchronous and thread-free so tests
        can drive it deterministically; the pump thread is just pacing
        around this."""
        from .ir_stream import _stream_blocks_pump

        dry_dev, len_dev, loop_dev, n_out = self._pump_arena
        B = self.cfg.block_size
        K = self.pump_chunk_blocks
        L = len(self._pump_cursors)
        with self._pump_cv:
            nxt = self._pump_next
            self._pump_next = None
            acts = ()
            if nxt is not None and self._pump_pending_activate:
                # activations ride a publish: their spectra are in nxt
                # (any later publish re-traces every posed lane, so a
                # freshest-wins overwrite still carries them)
                acts = tuple(self._pump_pending_activate)
                self._pump_pending_activate = set()
        if nxt is not None:
            # stacked publish (binaural cohorts — _respectra_all): adopt
            # the round's (L, ...) respectra arrays whole; dirty lanes
            # crossfade old -> new at this chunk boundary
            prev = self._pump_cur
            self._pump_cur = nxt[0]
            fades = np.asarray(nxt[1], bool)
            if acts:
                keep = np.ones(L, bool)
                for s in acts:
                    keep[s] = False
                    fades[s] = False  # fresh stream: no old spectra
                    self._pump_cursors[s] = 0
                self._pump_states = _mask_lanes(
                    self._pump_states, jnp.asarray(keep)
                )
                with self._pump_cv:
                    for s in acts:
                        h = self._pump_slot_handles[s]
                        if h is not None:
                            h._pump_active = True
                    self._pump_cv.notify_all()
        elif self._respectra_all is None and self.capacity is None:
            # per-lane mailbox mode (speaker rigs / per-stream HRTFs;
            # exact-cohort pumps ONLY — a capacity pump whose
            # _respectra_all momentarily nulled (cohort emptied
            # mid-round) must NOT iterate the stale founding _pump_lanes
            # here; it falls to the plain branch below instead)
            lanes = self._pump_lanes
            fades = np.zeros(L, bool)
            specs = [None] * len(lanes)
            for i, h in enumerate(lanes):
                with h.lock:
                    h._adopt_locked()
                    if h.r._pending_fade:
                        fades[i] = True
                        h.r._pending_fade = False
                    specs[i] = h.r._spectra
            prev = self._pump_cur
            if fades.any():
                self._pump_cur = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *specs
                )
        else:
            fades = np.zeros(L, bool)
            prev = self._pump_cur
        ys, self._pump_states = _stream_blocks_pump(
            dry_dev, len_dev, loop_dev,
            jnp.asarray(np.asarray(self._pump_cursors, np.int32)),
            self._pump_states, prev, self._pump_cur,
            jnp.asarray(fades),
            K=K, B=B, n_out=n_out,
            out_s16=self.pump_pcm == "s16",
        )
        self._deposit(np.asarray(ys))  # (L, K, B, n_out) — ONE transfer

    def _deposit(self, pcm: np.ndarray) -> None:
        """Append one pumped chunk of PCM to every ACTIVE lane's buffer
        and advance the lane cursors (shared by _pump_tick and the
        warmup prefill). Free/inactive slots render pad audio that is
        simply not deposited."""
        K, B = self.pump_chunk_blocks, self.cfg.block_size
        n_out = self._pump_arena[3]
        with self._pump_cv:
            for i in range(len(self._pump_cursors)):
                self._pump_cursors[i] += K * B
            for i, h in enumerate(self._pump_slot_handles):
                if h is None or not h._pump_active:
                    continue
                h._buf.append(pcm[i].reshape(K * B, n_out))
                h._buf_n += K * B
                # a read bigger than the buffer cap must still be
                # satisfiable: never trim below an outstanding demand
                allowed = max(
                    self.pump_max_buffer_chunks,
                    -(-h._want // (K * B)) + 1,
                )
                while len(h._buf) > allowed:
                    # stalled consumer: drop its OLDEST chunk so one
                    # dead sink never blocks the cohort (live-stream
                    # semantics; netserve evicts the peer separately).
                    # The consumer's next read splices across the gap
                    # with a one-block declick ramp (_pump_read) and
                    # pump_dropped counts what it skipped.
                    old = h._buf.pop(0)
                    h._buf_n -= len(old) - h._buf_off
                    h._buf_off = 0
                    h.pump_dropped += 1
                    h._splice = True
            self.pump_ticks += 1
            self._pump_cv.notify_all()

    def _pump_loop(self) -> None:
        while not self._stop_evt.is_set():
            if self._pump_states is None:
                if self.capacity is not None:
                    # capacity pumps are fixed by warmup() (the stacked
                    # respectra seed); just wait for it
                    time.sleep(0.005)
                    continue
                # no warmup(): wait for the first round to publish
                # spectra to every lane, then fix the cohort
                try:
                    self._pump_setup(warm=False)
                except RuntimeError:
                    time.sleep(0.01)
                    continue
                except Exception as e:  # noqa: BLE001
                    self.error = e
                    with self._pump_cv:
                        self._pump_cv.notify_all()
                    return
            target = self.pump_buffer_chunks * self.pump_chunk_blocks \
                * self.cfg.block_size
            with self._pump_cv:
                # produce until every ACTIVE lane is buffered past BOTH
                # the read-ahead target and any blocked reader's demand;
                # also wake for a pending activation (the joining lane
                # is not active yet, but its first chunk must not wait
                # on the rest of the cohort draining)
                while not self._stop_evt.is_set():
                    if (self._pump_pending_activate
                            and self._pump_next is not None):
                        break
                    active = [
                        h for h in self._pump_slot_handles
                        if h is not None and h._pump_active
                    ]
                    if active and min(
                        h._buf_n - max(target, h._want) for h in active
                    ) < 0:
                        break
                    self._pump_cv.wait(timeout=0.05)
            if self._stop_evt.is_set():
                return
            try:
                t0 = time.monotonic()
                self._pump_tick()
                self.pump_tick_s += time.monotonic() - t0
            except Exception as e:  # noqa: BLE001
                self.error = e
                with self._pump_cv:
                    self._pump_cv.notify_all()
                return

    def _pump_read(self, handle: _StreamHandle, n: int) -> np.ndarray:
        """Pop n samples of this lane's pumped PCM (blocking until the
        pump has produced them; raises if the pump died or stalled
        >30 s). The pop is pure host memory — the render thread never
        dispatches.

        Drop semantics: if the pump dropped this lane's oldest chunk(s)
        since the last read (a stalled consumer past
        pump_max_buffer_chunks — handle.pump_dropped counts), the
        stream SKIPS forward and this read declicks the splice: its
        first block_size samples ramp linearly from the last emitted
        sample into the post-gap audio, bounding the boundary
        discontinuity to |gap jump|/block_size per sample instead of a
        full-amplitude click (tested:
        tests/test_serving.py::test_render_pump_drop_declick)."""
        deadline = time.monotonic() + 30.0
        parts = []
        with self._pump_cv:
            if handle.error is not None:
                raise handle.error
            handle._want = n  # pump pacing produces past this demand
            try:
                while handle._buf_n < n:
                    if self.error is not None:
                        raise self.error
                    if self._stop_evt.is_set():
                        raise RuntimeError("render pump is stopped")
                    left = deadline - time.monotonic()
                    if left <= 0:
                        raise RuntimeError(
                            "render pump stalled (30 s without producing)"
                        )
                    self._pump_cv.notify_all()  # wake the pump's pacing
                    self._pump_cv.wait(timeout=min(0.5, left))
            finally:
                handle._want = 0
            need = n
            while need:
                c = handle._buf[0]
                take = min(len(c) - handle._buf_off, need)
                parts.append(
                    c[handle._buf_off:handle._buf_off + take]
                )
                handle._buf_off += take
                handle._buf_n -= take
                need -= take
                if handle._buf_off == len(c):
                    handle._buf.pop(0)
                    handle._buf_off = 0
            splice = handle._splice
            handle._splice = False
            self._pump_cv.notify_all()  # wake the pump's pacing wait
        out = parts[0] if len(parts) == 1 else np.concatenate(parts)
        if splice and handle._last_out is not None:
            out = np.array(out)  # parts may view buffered chunks
            W = min(self.cfg.block_size, len(out))
            a = (np.arange(1, W + 1, dtype=np.float32) / W)[:, None]
            ramp = (a * out[:W].astype(np.float32)
                    + (1.0 - a) * handle._last_out.astype(np.float32))
            # s16 pump: the ramp re-quantizes (same np.rint convention
            # as the device conversion)
            out[:W] = (np.rint(ramp).astype(out.dtype)
                       if out.dtype == np.int16 else ramp)
        handle._last_out = np.array(out[-1])
        return out

    def _loop(self) -> None:
        while not self._stop_evt.is_set():
            if not self._evt.wait(timeout=0.02):
                continue
            t0 = time.monotonic()  # pace from cycle start, coalesce included
            if self.coalesce_s:
                time.sleep(self.coalesce_s)
            self._evt.clear()
            try:
                tr = time.monotonic()
                self._round()
                self.round_s += time.monotonic() - tr
            except Exception as e:  # noqa: BLE001 — surface, don't hang streams
                self.error = e
                return
            # pace: leave the device to the streams' render dispatches
            # until the next acoustic deadline (see round_interval_s)
            spare = self.round_interval_s - (time.monotonic() - t0)
            if spare > 0:
                self._stop_evt.wait(timeout=spare)

    def __enter__(self):
        self._stop_evt.clear()
        self._thread = threading.Thread(
            target=self._loop, name="batched-acoustics", daemon=True
        )
        self._thread.start()
        if self.render_pump:
            self._pump_thread = threading.Thread(
                target=self._pump_loop, name="render-pump", daemon=True
            )
            self._pump_thread.start()
        return self

    def __exit__(self, *exc):
        self._stop_evt.set()
        with self._pump_cv:
            self._pump_cv.notify_all()
        self._thread.join(timeout=30.0)
        if self._pump_thread is not None:
            self._pump_thread.join(timeout=30.0)
            self._pump_thread = None
            self._pump_lanes = None  # cohort unfixed: close() allowed again
            self._pump_slot_handles = None
            self._pump_states = None  # a re-enter re-fixes the lanes
            self._pump_next = None
            self._pump_pending_activate = set()
        if self.error is not None:
            raise self.error
        return False
