"""audio_raytracing_tpu — TPU-native acoustic raytracing framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Sandalmoth/audio-raytracing (a Zig+SDL real-time acoustic raytracer):
geometric sound propagation against triangle meshes driving a spatial
audio renderer (first-order ambisonics, doppler, 4-band EQ, FDN reverb,
MagLS HRTF binaural decode), redesigned for TPU — batched ray wavefronts,
impulse-response energy histograms, partitioned FFT convolution, and
multi-chip sharding over jax.sharding meshes.

Layout:
  config     — every tunable, lifted from the reference's comptime constants
  models/    — Scene (geometry + BIH arena), acoustic parameter model, IR model
  ops/       — compute kernels: intersection, traversal, DSP, convolution
  sim/       — acoustic simulation policy (probe/occlusion/reflections)
  engine/    — SoundSystem facade, block renderer, offline renderer
  parallel/  — device-mesh sharding of rays + IR histogram collectives
  utils/     — OBJ/WAV/quaternion/profiling helpers
"""

from .config import Config, DEFAULT_CONFIG

__version__ = "0.1.0"

__all__ = ["Config", "DEFAULT_CONFIG", "__version__"]
