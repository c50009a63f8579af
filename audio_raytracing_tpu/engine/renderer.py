"""Offline renderers: WAV in -> spatialized stereo WAV out.

Two paths, matching the two halves of the framework:

  * render_engine_offline — replay the interactive engine (SoundSystem)
    without a real-time clock: fixed-timestep listener trajectory, acoustic
    re-trace per frame (main.zig's per-frame update block), audio pulled in
    scanned block batches. Produces exactly what the reference app would
    have played through SDL.

  * render_ir_offline — the IR-pipeline path (BASELINE config 3): trace a
    full ambisonic impulse response per source with the wavefront tracer,
    convolve each dry signal with its IR in the frequency domain, rotate by
    listener orientation and decode through the MagLS HRTF bank.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp

from ..config import Config, DEFAULT_CONFIG
from ..models.ir import ambisonic_ir, trace_ir
from ..models.scene import Scene
from ..ops.conv_partitioned import convolve_direct
from ..utils import quat
from .system import SoundSystem, default_hrtf


def render_engine_offline(
    scene: Scene,
    sounds: Sequence[np.ndarray],
    events: Sequence[dict],
    listener_track,
    duration_s: float,
    cfg: Config = DEFAULT_CONFIG,
    updates_per_second: float = 10.0,
    hrtf=None,
) -> np.ndarray:
    """Replay the interactive engine offline.

    sounds: mono float32 arrays. events: [{"t": sec, "sound": id,
    "pos": (3,), "gain": g, "repeat": bool}]. listener_track(t) ->
    (pos (3,), yaw, pitch). Acoustics re-traced at updates_per_second (the
    decoupled ~10 Hz rate the reference's own comment recommends,
    main.zig:518-521). Returns (n, 2) float32 stereo at cfg.sample_rate.
    """
    system = SoundSystem(scene=scene, cfg=cfg, hrtf=hrtf)
    sids = [system.load_sound(s) for s in sounds]
    pending = sorted(events, key=lambda e: e["t"])
    n_total = int(duration_s * cfg.sample_rate)
    step = max(1, int(cfg.sample_rate / updates_per_second / cfg.block_size)) * cfg.block_size
    out = []
    t_samples = 0
    while t_samples < n_total:
        t = t_samples / cfg.sample_rate
        while pending and pending[0]["t"] <= t:
            e = pending.pop(0)
            system.play_sound(
                sids[e["sound"]], pos=e["pos"], gain=e.get("gain", 1.0),
                repeat=e.get("repeat", False),
            )
        pos, yaw, pitch = listener_track(t)
        system.set_listener(pos, yaw=yaw, pitch=pitch)
        system.update_acoustics()
        n = min(step, n_total - t_samples)
        out.append(system.render(n))
        t_samples += out[-1].shape[0]
    return np.concatenate(out, axis=0)[:n_total]


def render_ir_offline(
    scene: Scene,
    sources: Sequence[dict],
    listener_pos,
    listener_yaw: float = 0.0,
    listener_pitch: float = 0.0,
    cfg: Config = DEFAULT_CONFIG,
    n_rays: int | None = None,
    max_bounces: int | None = None,
    hrtf=None,
    intersector: str = "mt",
    sh_order: int | None = None,
    speaker_dirs=None,
    ir_fn=None,
    hoa_hrtf: str = "magls4",
    src_directivity=None,
) -> np.ndarray:
    """Physically-based offline render via traced impulse responses.

    sources: [{"samples": mono f32, "pos": (3,), "gain": g,
    "directivity": Directivity?}]. A source's optional per-source
    "directivity" (models/directivity.py) overrides the function-level
    src_directivity (applies to the traced model; ir_fn models handle
    their own). Each source's
    ambisonic IR is traced on device, the dry signal convolved with the IR
    channels, the summed ambisonic bed rotated by the listener orientation
    and HRTF-decoded to stereo. Returns (n + ir - 1, 2) f32.

    sh_order=N renders a higher-order bed (ops/hoa.py): (N+1)^2 traced SH
    channels, full-order rotation, then either a binaural decode or, when
    `speaker_dirs` (S, 3) is given, a mode-matching decode to speaker
    feeds (n + ir - 1, S). hoa_hrtf picks the binaural decoder:
    "magls4" (default) max-rE-truncates through the reference's
    first-order MagLS bank; "sphere" decodes EVERY channel through the
    order-N rigid-sphere MagLS bank (data/hrtf_hoa_sphere.npz,
    tools/make_hoa_hrtf.py) — true HOA binaural.

    ir_fn(scene_arrays, source_pos, listener) -> ImpulseResponse swaps the
    acoustic model per source (e.g. models.ism.image_source_ir or
    hybrid_ir) while reusing this decode chain; incompatible with sh_order
    (the alternate families produce first-order fields only).

    All convolutions go through lax.conv (real arithmetic) so the renderer
    runs on TPU runtimes without complex64 support.
    """
    hl, hr = hrtf if hrtf is not None else default_hrtf()
    if ir_fn is not None and sh_order is not None:
        raise ValueError("ir_fn produces first-order IRs; sh_order requires "
                         "the default tracer")
    if speaker_dirs is not None and sh_order is None:
        sh_order = 1
    arrays = scene.device_arrays()
    listener = jnp.asarray(listener_pos, jnp.float32)
    orient = quat.quat_from_roll_pitch_yaw(
        np.float32(listener_pitch), np.float32(listener_yaw), np.float32(0.0)
    )

    n_max = max(len(s["samples"]) for s in sources)
    amb_total = None
    for s in sources:
        if ir_fn is not None:
            ir = ir_fn(arrays, jnp.asarray(s["pos"], jnp.float32), listener)
        else:
            ir = trace_ir(
                arrays, jnp.asarray(s["pos"], jnp.float32), listener, cfg=cfg,
                n_rays=n_rays, max_bounces=max_bounces, intersector=intersector,
                sh_order=sh_order,
                src_directivity=s.get("directivity", src_directivity),
            )
        if sh_order is not None:
            from ..models.ir import ambisonic_ir_hoa

            amb = ambisonic_ir_hoa(ir)  # (n_sh, L)
        else:
            amb = ambisonic_ir(ir)  # (4, L)
        dry = jnp.asarray(np.pad(np.asarray(s["samples"], np.float32), (0, n_max - len(s["samples"]))))
        wet = convolve_direct(dry[None, :] * float(s.get("gain", 1.0)), amb)  # (C, n+L-1)
        amb_total = wet if amb_total is None else amb_total + wet

    # rotate the summed bed by the listener orientation, then decode
    if sh_order is not None:
        from ..ops.hoa import decode_to_speakers, hoa_to_reference_foa, rotate_hoa

        amb_rot = rotate_hoa(amb_total, jnp.asarray(orient), sh_order)
        if speaker_dirs is not None:
            return np.asarray(decode_to_speakers(amb_rot, speaker_dirs).T)
        full_bank = hoa_hrtf == "sphere" or str(hoa_hrtf).endswith(".npz")
        if full_bank and sh_order >= 1:
            from ..ops.hoa import hoa_binaural_bank

            bl, br = hoa_binaural_bank(
                sh_order,
                bank=None if hoa_hrtf == "sphere" else hoa_hrtf,
            )
            left = jnp.sum(convolve_direct(amb_rot, bl), axis=0)
            right = jnp.sum(convolve_direct(amb_rot, br), axis=0)
            return np.asarray(jnp.stack([left, right], axis=-1))
        if hoa_hrtf != "magls4" and not full_bank:
            raise ValueError(f"unknown hoa_hrtf {hoa_hrtf!r}")
        amb4 = hoa_to_reference_foa(amb_rot)
        left = jnp.sum(convolve_direct(amb4, jnp.asarray(hl)), axis=0)
        right = jnp.sum(convolve_direct(amb4, jnp.asarray(hr)), axis=0)
        return np.asarray(jnp.stack([left, right], axis=-1))
    xyz = amb_total[1:4].T
    rot = quat.rotate(jnp.asarray(orient)[None, :], xyz).T
    amb_rot = jnp.concatenate([amb_total[:1], rot], axis=0)
    left = jnp.sum(convolve_direct(amb_rot, jnp.asarray(hl)), axis=0)
    right = jnp.sum(convolve_direct(amb_rot, jnp.asarray(hr)), axis=0)
    return np.asarray(jnp.stack([left, right], axis=-1))
