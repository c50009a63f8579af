"""Central configuration for the TPU acoustic-raytracing framework.

The reference (Sandalmoth/audio-raytracing) hardcodes every tunable as a
comptime constant scattered across files (see SURVEY.md §5 "Config/flag
system"). Here they are lifted into one frozen dataclass so every layer —
tracing policy, DSP, IR pipeline, sharding — reads from a single source of
truth.

Provenance of the defaults (reference file:line):
  - sample_rate 44100, block_size 128, speed_of_sound 350:
    src/sound_system.zig:11-15, 31, 32
  - raycast capacity 128: call sites src/main.zig:483, 561, 621, 648, 686-690
  - finish grace 65536 samples (reverb tail): src/sound_system.zig:454-458
  - specular exponent 16: src/main.zig:722
  - air absorption 1e-5 and EQ band freqs {4, 64, 1024, 16384}:
    src/sound_system.zig:229-238, 573
  - tick rate 83 Hz: src/main.zig:13-16
  - BIH leaf sizes {64,128,...}: src/raytracer.zig:17 (we use a flat arena,
    so a single max_leaf_size applies)
  - reverb wet/feedback coupling 0.5*atan(100*x): src/main.zig:785-786
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class Config:
    # --- audio format (reference: sound_system.zig:11-21, 31-32) ---
    sample_rate: int = 44100
    block_size: int = 128
    speed_of_sound: float = 350.0

    # --- voice lifecycle ---
    finish_grace_samples: int = 65536  # reverb-tail grace past one-shot end
    max_voices: int = 8  # static voice-table size for jit (padded, masked)

    # --- tracing policy (reference: main.zig:522-788) ---
    # NOTE: the reference's capacity-128 candidate truncation has no knob
    # here: acoustic queries are dense by design (no truncation); the
    # Space parity API takes `capacity` per call.
    specular_exponent: float = 16.0
    backoff: float = 0.999  # hit point backed off toward ray origin
    occlusion_colocated_eps: float = 1e-3  # |L-S|^2 below => no occlusion
    reflection_dir_eps: float = 1e-3  # |dir|^2 below => skip visibility ray

    # --- attenuation EQ (reference: sound_system.zig:229-238, 565-596) ---
    # band frequencies/coefficients are fixed constants in ops/eq.py
    # (EQ_FREQS etc.): they are tied to the reference's hardcoded LR2
    # sections, not free parameters
    air_absorption: float = 1e-5
    # IR-pipeline air-absorption model: "reference" = the clamp law above
    # (which hits EXACTLY zero at d = 1e5/f meters — the top pseudo-band
    # at ~6 m! fine for the reference's room, wrong at scale) or
    # "iso9613" = ISO 9613-1 atmospheric absorption (models/air.py) from
    # the conditions below, amplitude = 10^(-alpha d / 20) per band.
    # The per-sample engine DSP (ops/eq.py) always keeps the reference
    # law: it is part of the audible parity surface.
    air_model: str = "reference"
    air_temperature_c: float = 20.0
    air_humidity_pct: float = 50.0
    air_pressure_kpa: float = 101.325

    # --- diffraction band frequencies (models/diffraction.py) ---
    # "pseudo" evaluates wedge/knife-edge wavenumbers at the reference's
    # pseudo-frequency EQ constants (4/64/1024/16384 — NOT Hz; band 0's
    # kL then sits at 4 Hz, lambda ~ 87 m, far from the band's real
    # ~64 Hz center) for continuity with the EQ/air parity surface;
    # "physical" uses AIR_BAND_HZ (64/313.5/1881/9216 Hz), the measured
    # LR2 band centers, which is what the UTD coefficient physics wants.
    diffraction_band_model: str = "pseudo"

    # --- reverb environment coupling (reference: main.zig:785-786) ---
    reverb_coupling_scale: float = 0.5
    reverb_coupling_rate: float = 100.0

    # --- upstream quirks: replicate-or-fix, made explicit (SURVEY.md §7) ---
    # main.zig:580-584 assigns (not accumulates) the paired-distance reverb
    # estimate, so only the final opposite pair survives the /14 mean.
    quirk_capped_mean_overwrite: bool = True
    # main.zig:745 bins z reflections on `ld[0] > 2` where symmetry says
    # `ld[2] > 0`.
    quirk_zbin_ld0: bool = True
    # The reference's scalar slab test (tail lanes of each leaf run,
    # raytracer.zig:67-78) clamps tmin to 0 — an origin-inside box is
    # reported at distance 0 — while its 8-lane SIMD path (115-149) drops
    # it. "Parity" is therefore ambiguous; we default to the SIMD semantics
    # uniformly (the reference's hot path) and True reproduces the mixed
    # per-lane behavior byte for byte (Space.raycast / models/bih.py).
    quirk_tail_lane_clamp: bool = False

    # --- BIH / spatial index (reference: raytracer.zig:17) ---
    bih_max_leaf_size: int = 8

    # --- geometry padding for TPU-friendly static shapes ---
    triangle_pad: int = 128  # pad triangle count to a multiple of this

    # --- IR pipeline (new TPU-first capability; BASELINE.json configs) ---
    ir_length: int = 32768  # samples in a traced impulse response
    ir_bins_per_sample: int = 1  # histogram resolution (delay bins)
    n_bands: int = 4  # absorption bands (matches the EQ band count)
    max_bounces: int = 8
    rays_per_source: int = 1 << 17

    # --- output stage (no reference analogue: the reference can clip on
    # loud scenes; both default to parity = off) ---
    master_gain: float = 1.0
    limiter: bool = False  # tanh soft clip on the stereo output

    # --- fixed-timestep game loop (reference: main.zig:13-16; the lag cap
    # applies to wall-clock drivers, cf. app/demo.py docstring) ---
    ticks_per_second: int = 83
    max_tick_seconds: float = 0.1  # lag-accumulator cap for real-time loops

    @property
    def tick(self) -> float:
        return 1.0 / float(self.ticks_per_second)

    @property
    def samples_per_meter(self) -> float:
        return self.sample_rate / self.speed_of_sound

    @property
    def ir_n_bins(self) -> int:
        return self.ir_length * self.ir_bins_per_sample


DEFAULT_CONFIG = Config()


def reverb_coupling(cfg: Config, capped_mean_dist: float) -> float:
    """feedback_gain = wet = 0.5*atan(100*x) (reference: main.zig:785-786)."""
    return cfg.reverb_coupling_scale * math.atan(
        cfg.reverb_coupling_rate * capped_mean_dist
    )
