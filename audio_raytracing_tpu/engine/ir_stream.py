"""Streaming IR renderer: moving listener, re-traced IRs, crossfaded
partitioned convolution (BASELINE config 4).

The interactive loop the reference approximates with 13 scalar parameters
per voice becomes, in the IR pipeline: every acoustic frame re-traces each
source's ambisonic impulse response on device, folds listener rotation and
the HRTF decode into two per-ear partitioned spectra
(ops/conv_partitioned.binaural_ir_spectra), and the audio stream renders
128-sample blocks through a frequency-domain delay line, crossfading for
one block whenever the spectra were swapped — the block-level analogue of
the reference's prev_dist lerping (sound_system.zig:213-225, 468-476).

State is functional; the host loop is:

    r = IRStreamRenderer(scene, cfg)
    src_id = r.add_source(dry_samples, pos)
    r.update(listener_pos, yaw, pitch)   # re-trace + respectra (async)
    block = r.render_block()             # (block, 2) stereo
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config, DEFAULT_CONFIG
from ..models.ir import ambisonic_ir, trace_ir
from ..models.scene import Scene
from ..ops import conv_partitioned as cp
from ..utils import profiling, quat
from .system import default_hrtf


@partial(jax.jit, static_argnames=("block",))
def _respectra(amb_irs, orientation, hrtf_l, hrtf_r, block: int):
    """(S, 4, L) ambisonic IRs -> ((S, 2, P, F) re, (S, 2, P, F) im).

    Real-arithmetic path (ops/conv_partitioned real variants): some TPU
    runtimes have no complex64 support at all, and the DFT matmuls run on
    the MXU anyway."""
    return jax.vmap(
        lambda ir: cp.binaural_ir_spectra_real(ir, orientation, hrtf_l, hrtf_r, block)
    )(amb_irs)


@partial(jax.jit, static_argnames=("block",))
def _respectra_speakers(amb_irs, orientation, decoder, block: int):
    """(S, 4, L) ambisonic IRs -> per-speaker partitioned spectra
    ((S, n_spk, P, F) re/im): rotate the bed by the listener, decode to
    speaker IRs with the (n_spk, 4) mode-matching matrix (ops/hoa.py),
    partition. No HRTF — speaker feeds go to a physical rig."""

    def one(ir):
        xyz = ir[1:4].T
        rot = quat.rotate(orientation[None, :], xyz).T
        amb_rot = jnp.concatenate([ir[:1], rot], axis=0)  # (4, L)
        spk_irs = jnp.matmul(
            decoder, amb_rot, precision=jax.lax.Precision.HIGHEST
        )  # (n_spk, L)
        return cp.partition_ir_real(spk_irs, block)

    return jax.vmap(one)(amb_irs)


@partial(jax.jit, static_argnames=("block", "order", "full_bank"))
def _respectra_hoa(hoa_irs, orientation, hrtf_l, hrtf_r, block: int, order: int,
                   full_bank: bool = False):
    """(S, C, L) HOA IRs -> binaural partitioned spectra ((S, 2, P, F) re/im).

    Full-order rotation (ops/hoa.rotate_hoa), then the same decode chain as
    the offline renderer. full_bank=False: max-rE truncation to the
    reference's first-order layout and its 4-channel MagLS bank (hrtf_l/r
    are (4, taps)). full_bank=True: hrtf_l/r are the order-N rigid-sphere
    bank ((C, taps)) and EVERY channel decodes (true HOA binaural)."""
    from ..ops.hoa import hoa_to_reference_foa, rotate_hoa

    def one(ir):
        amb_rot = rotate_hoa(ir, orientation, order)
        amb = amb_rot if full_bank else hoa_to_reference_foa(amb_rot)
        left = jnp.sum(cp.convolve_direct(amb, hrtf_l), axis=0)
        right = jnp.sum(cp.convolve_direct(amb, hrtf_r), axis=0)
        return cp.partition_ir_real(jnp.stack([left, right], axis=0), block)

    return jax.vmap(one)(hoa_irs)


@partial(jax.jit, static_argnames=("block", "order"))
def _respectra_speakers_hoa(hoa_irs, orientation, decoder, block: int, order: int):
    """(S, C, L) HOA IRs -> per-speaker spectra via an order-N mode-matching
    decode (decoder (n_spk, C) in ACN layout, ops/hoa.speaker_decoder)."""
    from ..ops.hoa import rotate_hoa

    def one(ir):
        amb_rot = rotate_hoa(ir, orientation, order)
        spk_irs = jnp.matmul(decoder, amb_rot, precision=jax.lax.Precision.HIGHEST)
        return cp.partition_ir_real(spk_irs, block)

    return jax.vmap(one)(hoa_irs)


@jax.jit
def _stream_block(x, state, spectra_old, spectra_new, crossfade):
    """x: (S, n_out, B) per-source channel-duplicated dry blocks. Sums sources."""
    def faded(x, st):
        return cp.conv_block_crossfade_real(x, st, spectra_old, spectra_new)

    def plain(x, st):
        return cp.conv_block_real(x, st, *spectra_new)

    y, new_state = jax.lax.cond(crossfade, faded, plain, x, state)
    return jnp.sum(y, axis=0).T, new_state  # (B, n_out)


@partial(jax.jit, static_argnames=("K", "B", "n_out"))
def _stream_blocks(dry, src_len, src_loop, cursor, state,
                   spectra_old, spectra_new, crossfade_first,
                   K: int, B: int, n_out: int):
    """K blocks in ONE dispatch: device-side chunk assembly + a
    lax.scan of _stream_block over the chunk (the crossfade, if
    pending, applies to the first block only — same semantics as K
    sequential render_block calls). Matters twice through the remote
    relay: (a) the per-block live path was relay-bound at 64 dispatches
    per 64-block chunk (measured realtime_factor 0.08 in the
    walkthrough) — one scanned dispatch fixes that; (b) the chunk's dry
    blocks used to be assembled on the HOST (numpy fancy-indexed
    loop-wrap per source, reshape/transpose, an eager n_out-broadcast
    dispatch, a (S, K*B)-float transfer) — measurable per-chunk CPU
    that serializes under the GIL when 16 concurrent serving streams
    render on a 1-core host (benchmarks/bench_serving.py). Now a chunk
    is described by ONE int32 cursor: per-source gather, loop
    wrap/one-shot zero-pad, and channel broadcast all run inside this
    dispatch. Bit-identical to the host assembly (same indices, same
    f32 values; int32 cursor bounds a stream at 2^31 samples ~ 13.5 h).

    dry (S, N) padded per-source samples * gain; src_len (S,) int32
    per-source true lengths; src_loop (S,) bool -> (ys (K, B, n_out),
    new_state)."""
    pos = cursor + jnp.arange(K * B, dtype=jnp.int32)  # (K*B,)
    idx = pos[None, :] % src_len[:, None]  # (S, K*B) in-range gather
    vals = jnp.take_along_axis(dry, idx, axis=1)
    live = src_loop[:, None] | (pos[None, :] < src_len[:, None])
    blocks = jnp.where(live, vals, jnp.float32(0.0))
    S = dry.shape[0]
    xs = blocks.reshape(S, K, B).transpose(1, 0, 2)[:, :, None, :]
    xs = jnp.broadcast_to(xs, (K, S, n_out, B))
    fades = jnp.zeros(K, bool).at[0].set(crossfade_first)

    def body(st, inp):
        x, fade = inp
        y, st = _stream_block(x, st, spectra_old, spectra_new, fade)
        return st, y

    state, ys = jax.lax.scan(body, state, (xs, fades))
    return ys, state


@partial(jax.jit, static_argnames=("K", "B", "n_out", "out_s16"))
def _stream_blocks_pump(dry, src_len, src_loop, cursors, states,
                        spectra_old, spectra_new, fades,
                        K: int, B: int, n_out: int,
                        out_s16: bool = False):
    """EVERY lane's next K-block chunk in ONE dispatch — the serving
    render pump's kernel (engine/serving.py::BatchedAcoustics
    render_pump=True). The reference's audio callback renders all
    voices in one pass (sound_system.zig:123-172); per-stream render
    dispatches instead scale the dispatch count with the stream count,
    which is exactly the wall bench_serving measured at 24 streams
    (each dispatch pays the relay round trip, and N render threads
    contend a 1-core host). Here the lane axis is vmapped over stacked
    per-lane conv state, the dry/source tables are shared across
    lanes, and the host fans the (L, K, B, n_out) PCM out of one
    transfer — the per-second dispatch count is sr/(K*B) regardless of
    how many streams are live.

    Per-lane crossfades without lax.cond-under-vmap (a cond under vmap
    lowers to a select that runs both branches anyway): block 0 is
    computed BOTH ways — crossfaded (spectra_old -> spectra_new) and
    plain — and jnp.where picks per lane. The conv state does not need
    a select: crossfade and plain push the identical (x_re, x_im,
    prev_input) into the delay line (ops/conv_partitioned.py:202,227),
    so state1 is bit-equal either way. Blocks 1..K-1 convolve plain.
    Output bits therefore match each lane running _stream_blocks solo
    with its own crossfade_first flag exactly (tested:
    tests/test_serving.py pump bit-match).

    out_s16: quantize the PCM to s16 ON DEVICE (round-to-nearest,
    clipped — the definition tests pin against np.rint on the f32
    output). The serving pump's host transfer through this
    environment's relay runs at ~33 MB/s and is the measured per-chip
    lane binder (benchmarks/pump_ab.py full-PCM rows: L=48 tick
    128.8 ms of which ~89 ms is the 3 MB f32 transfer, vs the 185.8 ms
    chunk); s16 halves the bytes — and it IS the network wire format
    (engine/netserve.py), so the serving path pays no fidelity it was
    not already paying.

    cursors (L,) i32; states/spectra stacked (L, ...); fades (L,) bool.
    Returns (ys (L, K, B, n_out) f32 — or int16 with out_s16, new
    states)."""

    def chunk_one(cursor, state, so1, sn1, fade):
        pos = cursor + jnp.arange(K * B, dtype=jnp.int32)
        idx = pos[None, :] % src_len[:, None]
        vals = jnp.take_along_axis(dry, idx, axis=1)
        live = src_loop[:, None] | (pos[None, :] < src_len[:, None])
        blocks = jnp.where(live, vals, jnp.float32(0.0))
        S = dry.shape[0]
        xs = blocks.reshape(S, K, B).transpose(1, 0, 2)[:, :, None, :]
        xs = jnp.broadcast_to(xs, (K, S, n_out, B))
        y0f, state1 = cp.conv_block_crossfade_real(xs[0], state, so1, sn1)
        y0p, _ = cp.conv_block_real(xs[0], state, *sn1)
        y0 = jnp.where(fade, y0f, y0p)

        def body(st, x):
            y, st = cp.conv_block_real(x, st, *sn1)
            return st, y

        state1, ys = jax.lax.scan(body, state1, xs[1:])
        ys = jnp.concatenate([y0[None], ys], axis=0)  # (K, S, n_out, B)
        return jnp.sum(ys, axis=1).transpose(0, 2, 1), state1

    ys, st = jax.vmap(chunk_one)(cursors, states, spectra_old,
                                 spectra_new, fades)
    if out_s16:
        ys = jnp.clip(
            jnp.round(ys * 32767.0), -32768.0, 32767.0
        ).astype(jnp.int16)
    return ys, st


class IRStreamRenderer:
    def __init__(self, scene: Scene, cfg: Config = DEFAULT_CONFIG,
                 hrtf=None, n_rays: int | None = None,
                 max_bounces: int | None = None, intersector: str = "mt",
                 speaker_dirs=None, sh_order: int | None = None,
                 hoa_hrtf: str = "magls4", ir_fn=None,
                 pallas_interpret: bool = False,
                 pallas_wavefront: bool | None = None):
        """speaker_dirs (n_spk, 3): stream to a physical speaker rig
        (mode-matching first-order decode, no HRTF) instead of binaural
        stereo; render_block then returns (B, n_spk) feeds.

        sh_order=N streams a higher-order bed (ops/hoa.py): the tracer
        accumulates (N+1)^2 SH-moment histograms, rotation is applied at
        full order, and the decode is either binaural (max-rE truncation
        through the first-order MagLS bank, matching render_ir_offline) or
        an order-N mode-matching speaker decode when speaker_dirs is given.
        Rotation-only pose updates still reuse the cached HOA IRs.
        hoa_hrtf="sphere" decodes every channel through the order-N
        rigid-sphere MagLS bank instead of truncating (see
        render_ir_offline)."""
        self.cfg = cfg
        self.scene = scene
        if ir_fn is not None and sh_order is not None:
            raise ValueError(
                "ir_fn produces first-order IRs; sh_order requires the "
                "built-in tracer"
            )
        self._ir_fn = ir_fn
        self._arrays = scene.device_arrays()
        is_bank = hoa_hrtf == "sphere" or str(hoa_hrtf).endswith(".npz")
        if hoa_hrtf != "magls4" and not is_bank:
            raise ValueError(f"unknown hoa_hrtf {hoa_hrtf!r}")
        self._full_bank = is_bank and sh_order is not None
        if self._full_bank:
            from ..ops.hoa import hoa_binaural_bank

            hl, hr = hoa_binaural_bank(
                sh_order, bank=None if hoa_hrtf == "sphere" else hoa_hrtf
            )
        else:
            hl, hr = hrtf if hrtf is not None else default_hrtf()
        # host copies first, device arrays LAZY: a serving join
        # (engine/netserve.py accepts a client -> one renderer) must
        # not pay device uploads through a slow link for arrays the
        # stacked pump never reads per-lane — and join validation
        # compares these host copies with zero device traffic
        self._hrtf_host = (np.asarray(hl, np.float32),
                           np.asarray(hr, np.float32))
        self._hrtf_dev = None
        self.sh_order = sh_order
        if speaker_dirs is not None:
            if sh_order is not None:
                from ..ops.hoa import speaker_decoder

                # ACN-layout decoder; max-rE like the offline decode chain
                self._decoder = speaker_decoder(speaker_dirs, sh_order)
            else:
                from ..ops.hoa import speaker_decoder_foa_reference

                self._decoder = speaker_decoder_foa_reference(speaker_dirs)
            self.n_out = self._decoder.shape[0]
        else:
            self._decoder = None
            self.n_out = 2
        self.n_rays = n_rays or cfg.rays_per_source
        self.max_bounces = max_bounces or cfg.max_bounces
        self._pallas_interpret = pallas_interpret
        # per-bounce ray re-sorting on the fused kernel (big scenes only:
        # needs the auto-engaged group_fori+sg_cull kernel; 1.46x at 49k
        # tris, 1.68x at 196k — benchmarks/RESULTS.md "Wavefront")
        self._pallas_wavefront = pallas_wavefront
        if intersector == "pallas" and sh_order is not None:
            raise ValueError(
                'intersector="pallas" emits first-order moments only; '
                "drop sh_order or use mt/mxu"
            )
        self.intersector = intersector
        self._sources: list[dict] = []
        self._dry = None  # (S, N) padded dry signals
        self._src_len_host = None  # (S,) int32 true lengths
        self._src_loop_host = None  # (S,) bool
        self._dry_dev_cache = None  # lazy (dry, len, loop) device triple
        self._cursor = 0
        self._spectra = None  # (S, n_out, P, F)
        self._spectra_prev = None
        self._conv_state = None
        self._pending_fade = False
        # pose-aware update cache: IR tracing depends only on positions, so
        # rotation-only updates reuse the traced ambisonic IRs and pay just
        # the respectra (listener rotation folds into the HRTF decode)
        self._amb_cache = None  # (S, 4, L)
        self._trace_key = None  # (listener pos, source positions)
        self._orient_key = None  # (yaw, pitch)
        self.last_update_retraced = False  # introspection/profiling

    # -- sources -----------------------------------------------------------

    def add_source(self, samples, pos, gain: float = 1.0, loop: bool = True,
                   directivity=None) -> int:
        """directivity: optional models/directivity.Directivity radiation
        pattern for this source (axis in WORLD space; use
        set_source_directivity to rotate it — that invalidates the trace
        cache like a position change)."""
        self._sources.append(
            {
                "samples": np.asarray(samples, np.float32),
                "pos": np.asarray(pos, np.float32),
                "gain": float(gain),
                "loop": bool(loop),
                "directivity": directivity,
            }
        )
        n = max(len(s["samples"]) for s in self._sources)
        self._dry = np.stack(
            [
                np.pad(s["samples"] * s["gain"], (0, n - len(s["samples"])))
                for s in self._sources
            ]
        ).astype(np.float32)
        self._src_len_host = np.asarray(
            [len(s["samples"]) for s in self._sources], np.int32
        )
        self._src_loop_host = np.asarray(
            [s["loop"] for s in self._sources], bool
        )
        self._dry_dev_cache = None  # lazy: see _dry_dev
        self._spectra = None  # force re-trace
        self._amb_cache = None
        self._trace_key = None
        return len(self._sources) - 1

    # device arena: render chunks gather their dry blocks ON DEVICE from
    # an int32 cursor (_stream_blocks) — one transfer at FIRST USE, no
    # per-chunk host assembly (the 16-stream serving host is 1-core).
    # Lazy because serving joins create one renderer per client and the
    # stacked pump renders every lane from the FOUNDING lane's arena:
    # uploading 48 identical (S, 44100) arrays through a slow relay
    # measured ~10 s of join storm (r5 netserve bench bring-up).
    @property
    def _dry_dev(self):
        if self._dry_dev_cache is None:
            self._dry_dev_cache = (
                jnp.asarray(self._dry),
                jnp.asarray(self._src_len_host),
                jnp.asarray(self._src_loop_host),
            )
        return self._dry_dev_cache[0]

    @property
    def _src_len_dev(self):
        self._dry_dev  # materialize the triple
        return self._dry_dev_cache[1]

    @property
    def _src_loop_dev(self):
        self._dry_dev
        return self._dry_dev_cache[2]

    # HRTF device arrays, same lazy pattern (hosts in _hrtf_host)
    @property
    def hrtf_l(self):
        if self._hrtf_dev is None:
            self._hrtf_dev = (jnp.asarray(self._hrtf_host[0]),
                              jnp.asarray(self._hrtf_host[1]))
        return self._hrtf_dev[0]

    @property
    def hrtf_r(self):
        if self._hrtf_dev is None:
            self._hrtf_dev = (jnp.asarray(self._hrtf_host[0]),
                              jnp.asarray(self._hrtf_host[1]))
        return self._hrtf_dev[1]

    def set_source_pos(self, idx: int, pos) -> None:
        self._sources[idx]["pos"] = np.asarray(pos, np.float32)

    def set_scene_arrays(self, arrays) -> None:
        """Swap the device geometry mid-stream — e.g. the output of
        models/scene.rigid_transform_arrays for a moving occluder (zero
        host rebuild, same shapes -> no recompile). Invalidates the
        pose-aware trace cache: the next update() re-traces even for an
        identical pose (the room itself changed)."""
        self._arrays = arrays
        self._trace_key = None
        self._amb_cache = None

    def set_source_directivity(self, idx: int, directivity) -> None:
        self._sources[idx]["directivity"] = directivity

    # -- acoustic frame ------------------------------------------------------

    def update(self, listener_pos, yaw: float = 0.0, pitch: float = 0.0,
               swap_lock=None, traced_amb=None) -> None:
        """Re-trace all source IRs for the new pose and swap spectra with a
        one-block crossfade.

        Pose-aware: translation (listener or any source moved) re-traces;
        pure rotation only re-decodes the cached ambisonic IRs (~free next
        to a trace); an identical pose is a no-op (no spectra swap, no
        crossfade).

        swap_lock: when update runs on a separate acoustic thread
        (app/walkthrough.py::AsyncAcoustics — the decoupled-tracing
        architecture of main.zig:518-521), pass the lock the render
        thread holds during render()/render_block(): the expensive
        trace + respectra run UNLOCKED and only the final
        spectra/crossfade swap is made atomic against a concurrent
        stream read.

        traced_amb: (S, C, L_ir) ambisonic IRs for exactly this pose,
        already traced elsewhere — engine/serving.py::BatchedAcoustics
        traces EVERY stream's listener in one shared multi-listener
        dispatch and hands each renderer its slice, so this update pays
        only the respectra. Ignored on rotation-only updates (the cached
        IRs are the same trace)."""
        cfg = self.cfg
        lp = np.asarray(listener_pos, np.float32)
        trace_key = (
            lp.tobytes(),
            tuple(
                (s["pos"].tobytes(), s.get("directivity"))
                for s in self._sources
            ),
        )
        orient_key = (float(yaw), float(pitch))
        fresh = self._spectra is None
        if not fresh and trace_key == self._trace_key and orient_key == self._orient_key:
            self.last_update_retraced = False
            return  # nothing moved
        listener = jnp.asarray(lp)
        orient = jnp.asarray(
            quat.quat_from_roll_pitch_yaw(np.float32(pitch), np.float32(yaw), np.float32(0.0))
        )
        retrace = self._amb_cache is None or trace_key != self._trace_key
        if retrace and traced_amb is not None:
            self._amb_cache = traced_amb
            self._trace_key = trace_key
        elif retrace:
            with profiling.span("ir_retrace"):
                irs = []
                for s in self._sources:
                    if self._ir_fn is not None:
                        ir = self._ir_fn(
                            self._arrays, jnp.asarray(s["pos"]), listener
                        )
                    elif self.intersector == "pallas":
                        from ..ops.pallas_trace import trace_ir_pallas

                        ir = trace_ir_pallas(
                            self._arrays, jnp.asarray(s["pos"]), listener,
                            cfg=cfg, n_rays=self.n_rays,
                            max_bounces=self.max_bounces, fused_hist=True,
                            src_directivity=s.get("directivity"),
                            interpret=self._pallas_interpret,
                            wavefront=self._pallas_wavefront,
                        )
                    else:
                        ir = trace_ir(
                            self._arrays, jnp.asarray(s["pos"]), listener,
                            cfg=cfg, n_rays=self.n_rays,
                            max_bounces=self.max_bounces,
                            intersector=self.intersector,
                            sh_order=self.sh_order,
                            src_directivity=s.get("directivity"),
                        )
                    if self.sh_order is not None:
                        from ..models.ir import ambisonic_ir_hoa

                        irs.append(ambisonic_ir_hoa(ir))
                    else:
                        irs.append(ambisonic_ir(ir))
                self._amb_cache = jnp.stack(irs)  # (S, C, L)
                self._trace_key = trace_key
        self.last_update_retraced = retrace
        self._orient_key = orient_key
        with profiling.span("ir_respectra"):
            spectra = self._respectra_for(self._amb_cache, orient)
        self._swap_spectra(spectra, swap_lock)

    def _respectra_for(self, amb, orient):
        """Decode (S, C, L_ir) ambisonic IRs at `orient` into this
        renderer's partitioned spectra — the ONE decode-selection
        dispatch (HOA/FOA x binaural/speaker-rig, incl. the full-bank
        plumb). update() and the serving coordinator's per-handle
        publish (engine/serving.py::_publish_traced) both call this, so
        batched streams can never decode differently from solo ones."""
        cfg = self.cfg
        if self.sh_order is not None:
            if self._decoder is not None:
                return _respectra_speakers_hoa(
                    amb, orient, self._decoder, cfg.block_size,
                    self.sh_order,
                )
            return _respectra_hoa(
                amb, orient, self.hrtf_l, self.hrtf_r, cfg.block_size,
                self.sh_order, full_bank=self._full_bank,
            )
        if self._decoder is not None:
            return _respectra_speakers(
                amb, orient, self._decoder, cfg.block_size
            )
        return _respectra(
            amb, orient, self.hrtf_l, self.hrtf_r, cfg.block_size
        )

    def _swap_spectra(self, spectra, swap_lock=None) -> None:
        """Adopt new partitioned spectra: first call initializes the conv
        state, later calls arm a one-block crossfade. Atomic against a
        concurrent render when swap_lock (held by the render thread) is
        given."""
        import contextlib

        cfg = self.cfg
        with swap_lock if swap_lock is not None else contextlib.nullcontext():
            if self._spectra is None:
                self._spectra = spectra
                self._spectra_prev = spectra
                P = spectra[0].shape[-2]
                S = spectra[0].shape[0]
                self._conv_state = cp.conv_init_real(
                    (S, self.n_out), P, cfg.block_size
                )
            else:
                self._spectra_prev = self._spectra
                self._spectra = spectra
                self._pending_fade = True

    def apply_traced(self, listener_pos, yaw: float, pitch: float,
                     amb, spectra, swap_lock=None) -> None:
        """Batched-serving fastest path (engine/serving.py): adopt
        externally traced ambisonic IRs AND their already-decoded
        partitioned spectra — the coordinator batches BOTH the trace and
        the respectra across streams, so this stream's acoustic update is
        pure bookkeeping + an atomic swap (no dispatch at all).
        Cache/crossfade semantics match update()."""
        lp = np.asarray(listener_pos, np.float32)
        trace_key = (
            lp.tobytes(),
            tuple(
                (s["pos"].tobytes(), s.get("directivity"))
                for s in self._sources
            ),
        )
        orient_key = (float(yaw), float(pitch))
        fresh = self._spectra is None
        if (not fresh and trace_key == self._trace_key
                and orient_key == self._orient_key):
            self.last_update_retraced = False
            return
        self.last_update_retraced = (
            self._amb_cache is None or trace_key != self._trace_key
        )
        self._amb_cache = amb
        self._trace_key = trace_key
        self._orient_key = orient_key
        self._swap_spectra(spectra, swap_lock)

    def note_traced_pose(self, listener_pos, yaw: float, pitch: float) -> bool:
        """Pose-cache bookkeeping ONLY, for serving's render-pump stacked
        publish (engine/serving.py::_publish_traced): the pump holds the
        cohort's spectra stacked on device and never materializes this
        lane's slice, so adoption is just recording what pose the lane's
        column was traced at. Returns True when the positions changed
        (i.e. the round's trace was a real re-trace for this lane) —
        the same retraced test apply_traced uses."""
        lp = np.asarray(listener_pos, np.float32)
        trace_key = (
            lp.tobytes(),
            tuple(
                (s["pos"].tobytes(), s.get("directivity"))
                for s in self._sources
            ),
        )
        retraced = self._trace_key is None or trace_key != self._trace_key
        self._trace_key = trace_key
        self._orient_key = (float(yaw), float(pitch))
        self.last_update_retraced = retraced
        return retraced

    # -- audio stream --------------------------------------------------------

    def render_block(self) -> np.ndarray:
        """One 128-sample block — (B, 2) stereo, or (B, n_spk) feeds when
        constructed with speaker_dirs; crossfades on the first block after
        an update()."""
        return self.render(self.cfg.block_size)

    def render(self, n_samples: int) -> np.ndarray:
        """ceil(n/B) blocks in ONE device dispatch (_stream_blocks:
        cursor-driven on-device chunk assembly + convolution scan);
        bit-identical to repeated single-block calls."""
        if self._spectra is None:
            raise RuntimeError("call update() once before rendering")
        B = self.cfg.block_size
        K = -(-n_samples // B)
        with profiling.span("ir_stream_chunk"):
            ys, self._conv_state = _stream_blocks(
                self._dry_dev, self._src_len_dev, self._src_loop_dev,
                np.int32(self._cursor), self._conv_state,
                self._spectra_prev, self._spectra,
                np.bool_(self._pending_fade),
                K=K, B=B, n_out=self.n_out,
            )
        self._pending_fade = False
        self._cursor += K * B
        return np.asarray(ys).reshape(K * B, self.n_out)[:n_samples]
