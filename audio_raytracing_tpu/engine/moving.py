"""Moving-source AND moving-listener offline renderer: doppler on the
direct path, keyframed reflection tails (the IR-pipeline analogue of the
engine's per-voice doppler).

The interactive engine already pitch-shifts moving voices by fetching
samples `sr * d / c` behind the write cursor with the distance lerped
across each block (sound_system.zig:248-272; ops/doppler.py). The IR
pipeline had no moving-source story: a traced impulse response is a
snapshot of the field for one source position.

This module renders a source moving along a trajectory with the standard
split used by production acoustic engines:

  * **direct path** — exact per-sample doppler: the source position is
    interpolated between trajectory keyframes, and each output sample i
    reads the dry signal at the fractional position `i - sr * d(i) / c`
    (the reference's own fetch law), so approach/recede produces a true
    pitch shift. Amplitude follows the IR pipeline's direct-arrival law
    exactly — per-band air absorption `clip(1 - air*d*f, 0, 1) / (d+1)`
    reduced to the band-mean-energy broadband gain that `ambisonic_ir`
    applies (models/ir.py::direct_ir), times a keyframe-interpolated
    occlusion visibility. Direction is encoded per sample with the
    reference's first-order SH law (ops/ambisonic.sh_encode), giving
    continuous panning. Deviation from the reference's fetch: samples
    before the first wavefront arrival (`i < sr*d/c`) are silent here;
    the reference clamps the read offset to 0 (a UB guard, not acoustics).

  * **reflection tail** — the field minus its direct term is re-traced at
    trajectory keyframes (trace_ir(include_direct=False), ~10-30 Hz) and
    the dry signal is streamed through crossfaded partitioned convolution,
    swapping keyframe spectra at block boundaries (the same block-fade the
    streaming renderer uses for listener motion). Tail doppler is omitted
    — diffuse-field pitch shifts are perceptually negligible next to the
    direct path's, which is why keyframed convolution is the standard
    approximation.

TPU mapping: the direct path is a single jitted gather + elementwise pass
over all samples; the tail is ONE `lax.scan` over blocks around the
real-arithmetic partitioned convolver (runs on complex64-less runtimes),
with per-block keyframe indices gathered from a stacked (K, S, 2, P, F)
spectra arena — no per-block host dispatches.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import Config, DEFAULT_CONFIG
from ..models.ir import ambisonic_ir, trace_ir
from ..models.scene import Scene
from ..ops import conv_partitioned as cp
from ..ops.ambisonic import sh_encode
from ..ops.eq import EQ_FREQS
from ..ops.intersect import nearest_hit
from ..utils import quat

_HI = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("n_out", "cfg"))
def _direct_doppler_bed(dry_pad, pos_k, lst_k, vis_k, t_keys, gain,
                        n_out: int, cfg, spm, dgain_k=None):
    """Per-sample doppler-resampled direct-path ambisonic bed (4, n_out),
    in the WORLD frame (the caller applies listener rotation).

    dry_pad: (n_dry + 1,) dry signal with one trailing zero (the fetch's
    +1 neighbour); pos_k / lst_k: (K, 3) keyframe source / listener
    positions (listener motion doppler-shifts through the same total-path
    law); vis_k (K,) keyframe visibilities; t_keys (K,) keyframe times in
    samples.
    """
    i = jnp.arange(n_out, dtype=jnp.float32)
    pos = jnp.stack(
        [jnp.interp(i, t_keys, pos_k[:, c]) for c in range(3)], axis=-1
    )  # (n_out, 3)
    lpos = jnp.stack(
        [jnp.interp(i, t_keys, lst_k[:, c]) for c in range(3)], axis=-1
    )
    sh, dist = sh_encode(pos - lpos)  # (n_out, 4), (n_out,)
    # the IR pipeline's direct amplitude (cfg.air_model-aware): band-mean
    # energy -> broadband gain
    from ..models.ir import _air_amplitude

    amp = _air_amplitude(dist, cfg) / (dist[:, None] + 1.0)
    if dgain_k is not None:
        dg = jnp.stack(
            [jnp.interp(i, t_keys, dgain_k[:, c])
             for c in range(dgain_k.shape[1])],
            axis=-1,
        )  # (n_out, n_bands)
        amp = amp * dg
    g = jnp.sqrt(jnp.mean(amp * amp, axis=-1))  # (n_out,)
    vis = jnp.interp(i, t_keys, vis_k)
    # fractional-delay fetch: read position i - sr*d/c (zig:248-268)
    foff = i - spm * dist
    arrived = foff >= 0.0
    foff = jnp.maximum(foff, 0.0)
    i0 = foff.astype(jnp.int32)
    beta = foff - jnp.trunc(foff)
    n_dry = dry_pad.shape[0] - 1
    i0c = jnp.minimum(i0, n_dry - 1)
    s = dry_pad[i0c] * (1.0 - beta) + dry_pad[i0c + 1] * beta
    s = jnp.where(arrived & (i0 < n_dry), s, 0.0)
    return (sh * (s * g * vis * gain)[:, None]).T  # (4, n_out)


@jax.jit
def _tail_stream(dry_blocks, spec_re, spec_im, k_idx, k_prev):
    """Keyframed time-varying partitioned convolution.

    dry_blocks: (n_blocks, S, 2, B) channel-duplicated dry blocks;
    spec_re/spec_im: (K, S, 2, P, F) stacked keyframe spectra;
    k_idx/k_prev: (n_blocks,) int32 active/previous keyframe per block.
    Returns (n_blocks * B, 2) — block b crossfades spectra whenever the
    keyframe changed (the streaming renderer's block-fade law).
    """
    S = dry_blocks.shape[1]
    P = spec_re.shape[-2]
    B = dry_blocks.shape[-1]
    state = cp.conv_init_real((S, 2), P, B)

    def step(st, inp):
        x, ki, kp = inp
        new = (spec_re[ki], spec_im[ki])
        old = (spec_re[kp], spec_im[kp])

        def plain(x, s):
            return cp.conv_block_real(x, s, *new)

        def faded(x, s):
            return cp.conv_block_crossfade_real(x, s, old, new)

        y, st = jax.lax.cond(ki == kp, plain, faded, x, st)
        return st, jnp.sum(y, axis=0).T  # (B, 2)

    _, ys = jax.lax.scan(step, state, (dry_blocks, k_idx, k_prev))
    return ys.reshape(-1, 2)


def render_ir_moving_offline(
    scene: Scene,
    sources: Sequence[dict],
    listener_pos=None,
    listener_yaw: float = 0.0,
    listener_pitch: float = 0.0,
    cfg: Config = DEFAULT_CONFIG,
    updates_per_second: float = 15.0,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    intersector: str = "mt",
    hrtf=None,
    listener_track=None,
) -> np.ndarray:
    """Offline render with moving sources AND/OR a moving listener: true
    direct-path doppler + keyframed reflection tails.

    sources: [{"samples": mono f32, "track": t_sec -> (3,) position,
    "gain": g, "directivity": Directivity?, "orientation_track":
    (t_sec -> (3,) world emission axis)?}]; a static source may give
    "pos" instead of "track". A source with a directivity radiates per
    its pattern along the (possibly rotating) axis: keyframed into the
    tail traces (src_axis is dynamic — one compile serves every axis) and
    keyframe-interpolated into the per-sample direct bed.
    The listener is either static (listener_pos + yaw/pitch) or moving:
    listener_track(t_sec) -> (pos (3,), yaw, pitch). Listener translation
    doppler-shifts the direct path through the same total-distance fetch
    law as source motion; listener rotation is applied per SAMPLE to the
    direct bed (the reference rotates its ambisonic bed per sample,
    sound_system.zig:480-492) and per KEYFRAME to the tail spectra.
    Returns (n + ir + taps - 2, 2) f32 stereo — the same length as
    render_ir_offline, to which this is exactly equivalent when every
    track is constant.
    """
    from .system import default_hrtf

    hl, hr = hrtf if hrtf is not None else default_hrtf()
    hl = jnp.asarray(hl)
    hr = jnp.asarray(hr)
    taps = hl.shape[-1]
    arrays = scene.device_arrays()
    if listener_track is None:
        if listener_pos is None:
            raise ValueError("give listener_pos or listener_track")
        _lp = np.asarray(listener_pos, np.float32)
        _ly, _lpi = float(listener_yaw), float(listener_pitch)
        listener_track = lambda t: (_lp, _ly, _lpi)  # noqa: E731
    sr = cfg.sample_rate
    B = cfg.block_size
    L = cfg.ir_n_bins
    n = max(len(s["samples"]) for s in sources)
    n_bed = n + L - 1
    n_final = n_bed + taps - 1
    n_blocks = -(-n_final // B)
    n_stream = n_blocks * B
    # keyframe spacing: whole blocks, so spectra swap at block boundaries
    hop = max(1, round(sr / updates_per_second / B)) * B
    K = n_stream // hop + 2  # +1 cover, +1 for the interp right edge
    t_keys = np.arange(K, dtype=np.float32) * hop  # in samples

    def track_of(s):
        if "track" in s and s["track"] is not None:
            return s["track"]
        p = np.asarray(s["pos"], np.float32)
        return lambda t: p

    # ---- keyframe poses ----------------------------------------------------
    lst_k = np.zeros((K, 3), np.float32)
    quat_k = np.zeros((K, 4), np.float32)
    for k, t in enumerate(t_keys):
        lp, ly, lpi = listener_track(float(t) / sr)
        lst_k[k] = np.asarray(lp, np.float32)
        quat_k[k] = np.asarray(quat.quat_from_roll_pitch_yaw(
            np.float32(lpi), np.float32(ly), np.float32(0.0)
        ))
    # keep quaternion keyframes in one hemisphere so per-sample nlerp
    # never interpolates through the antipode
    for k in range(1, K):
        if float(np.dot(quat_k[k], quat_k[k - 1])) < 0.0:
            quat_k[k] = -quat_k[k]
    lst_kj = jnp.asarray(lst_k)
    quat_kj = jnp.asarray(quat_k)

    # ---- keyframe positions, visibility, tail IR spectra ------------------
    v0, v1, v2 = arrays.v0, arrays.v1, arrays.v2
    all_spec_re, all_spec_im = [], []
    pos_keys, vis_keys, dry_pads, gains = [], [], [], []
    ir_cache: dict[bytes, jnp.ndarray] = {}
    dgain_keys = []
    for s in sources:
        track = track_of(s)
        pk = np.stack([np.asarray(track(t / sr), np.float32) for t in t_keys])
        pos_keys.append(pk)
        sdir = s.get("directivity")
        otrack = s.get("orientation_track")
        if otrack is not None and sdir is None:
            raise ValueError(
                "orientation_track was given without a directivity — the "
                "track would be silently ignored; add 'directivity' to "
                "the source (an omni pattern has nothing to rotate)"
            )
        if sdir is not None:
            if otrack is not None:
                ax_k = np.stack([
                    np.asarray(otrack(t / sr), np.float32) for t in t_keys
                ])
            else:
                ax_k = np.tile(np.asarray(sdir.axis, np.float32), (K, 1))
        else:
            ax_k = None
        # per-keyframe band gains for the direct bed: directivity toward
        # the listener x transmission through occluders (both optional)
        band_gain = None
        if sdir is not None:
            from ..models.directivity import directivity_gain

            band_gain = jnp.asarray(directivity_gain(
                jnp.asarray(lst_k - pk), sdir, axis=jnp.asarray(ax_k)
            ))
        to_l = lst_kj - jnp.asarray(pk)
        d_k = jnp.linalg.norm(to_l, axis=-1)
        if arrays.transmission is not None:
            # transmissive occluders attenuate the direct bed per band
            # (models/ir.py law) instead of hard-blocking — keeps the
            # moving renderer consistent with direct_ir on e.g. a
            # curtain scene
            from ..models.ir import _segment_crossings, _transmission_log_amp

            cross = _segment_crossings(jnp.asarray(pk), to_l, v0, v1, v2)
            trans_k = jnp.exp(jnp.dot(
                cross, _transmission_log_amp(arrays.transmission),
                precision=jax.lax.Precision.HIGHEST,
            ))  # (K, 4)
            band_gain = trans_k if band_gain is None else band_gain * trans_k
            vis_keys.append(jnp.ones(K, jnp.float32))
        else:
            # occlusion visibility at keyframes (direct_ir's test)
            safe = jnp.where(
                d_k[:, None] < 1e-6, jnp.float32([[1, 0, 0]]), to_l
            )
            t_occ, _, _ = nearest_hit(jnp.asarray(pk), safe, v0, v1, v2)
            vis_keys.append(
                jnp.where((t_occ >= d_k) | (d_k < 1e-6), 1.0, 0.0)
            )
        dgain_keys.append(band_gain)
        # reflection-only IR per unique keyframe pose pair (static poses
        # and dwell points trace once)
        amb_irs = []
        for k, row in enumerate(pk):
            key = row.tobytes() + lst_k[k].tobytes() + repr(sdir).encode()
            if ax_k is not None:
                key += ax_k[k].tobytes()
            if key not in ir_cache:
                ir = trace_ir(
                    arrays, jnp.asarray(row), lst_kj[k], cfg=cfg,
                    n_rays=n_rays, max_bounces=max_bounces,
                    include_direct=False, intersector=intersector,
                    src_directivity=sdir,
                    src_axis=None if ax_k is None else jnp.asarray(ax_k[k]),
                )
                ir_cache[key] = ambisonic_ir(ir)
            amb_irs.append(ir_cache[key])
        amb_k = jnp.stack(amb_irs)  # (K, 4, L)
        re, im = jax.vmap(
            lambda a, q: cp.binaural_ir_spectra_real(a, q, hl, hr, B)
        )(amb_k, quat_kj)  # (K, 2, P, F)
        all_spec_re.append(re)
        all_spec_im.append(im)
        g = float(s.get("gain", 1.0))
        gains.append(g)
        dry = np.asarray(s["samples"], np.float32)
        dry_pads.append(np.pad(dry, (0, n - len(dry))))

    spec_re = jnp.stack(all_spec_re, axis=1)  # (K, S, 2, P, F)
    spec_im = jnp.stack(all_spec_im, axis=1)

    # ---- tail: one scan over blocks ---------------------------------------
    S = len(sources)
    dry_arena = np.stack(dry_pads) * np.asarray(gains, np.float32)[:, None]
    dry_stream = np.zeros((S, n_stream), np.float32)
    dry_stream[:, :n] = dry_arena
    dry_blocks = jnp.asarray(
        dry_stream.reshape(S, n_blocks, B).transpose(1, 0, 2)
    )[:, :, None, :].repeat(2, axis=2)  # (n_blocks, S, 2, B)
    k_idx = np.minimum(np.arange(n_blocks) * B // hop, K - 1).astype(np.int32)
    k_prev = np.concatenate([k_idx[:1], k_idx[:-1]])
    tail = _tail_stream(
        dry_blocks, spec_re, spec_im, jnp.asarray(k_idx), jnp.asarray(k_prev)
    )[:n_final]

    # ---- direct path: per-sample doppler bed, then rotate + HRTF decode ---
    bed = None
    for si in range(S):
        dry_pad = jnp.asarray(np.pad(dry_pads[si], (0, 1)))
        b = _direct_doppler_bed(
            dry_pad, jnp.asarray(pos_keys[si]), lst_kj, vis_keys[si],
            jnp.asarray(t_keys), gains[si],
            n_out=n_bed, cfg=cfg, spm=cfg.samples_per_meter,
            dgain_k=dgain_keys[si],
        )
        bed = b if bed is None else bed + b
    # per-sample listener rotation: nlerp the keyframe quaternions (the
    # reference rotates the bed per sample, sound_system.zig:480-492)
    i = jnp.arange(n_bed, dtype=jnp.float32)
    q = jnp.stack(
        [jnp.interp(i, jnp.asarray(t_keys), quat_kj[:, c]) for c in range(4)],
        axis=-1,
    )
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
    xyz = bed[1:4].T
    rot = quat.rotate(q, xyz).T
    bed_rot = jnp.concatenate([bed[:1], rot], axis=0)
    left = jnp.sum(cp.convolve_direct(bed_rot, hl), axis=0)
    right = jnp.sum(cp.convolve_direct(bed_rot, hr), axis=0)
    direct = jnp.stack([left, right], axis=-1)  # (n_final, 2)
    return np.asarray(tail + direct)
