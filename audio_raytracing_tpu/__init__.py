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


def __getattr__(name):
    """Lazy top-level API (keeps `import audio_raytracing_tpu` jax-free)."""
    from importlib import import_module

    table = {
        "Scene": ("models.scene", "Scene"),
        "SceneArrays": ("models.scene", "SceneArrays"),
        "box_room": ("models.scene", "box_room"),
        "Space": ("models.space", "Space"),
        "SpaceBuilder": ("models.space", "SpaceBuilder"),
        "SoundSystem": ("engine.system", "SoundSystem"),
        "trace_ir": ("models.ir", "trace_ir"),
        "trace_ir_pallas": ("ops.pallas_trace", "trace_ir_pallas"),
        "trace_ir_pallas_ensemble": (
            "ops.pallas_trace", "trace_ir_pallas_ensemble"
        ),
        "ambisonic_ir": ("models.ir", "ambisonic_ir"),
        "ambisonic_ir_hoa": ("models.ir", "ambisonic_ir_hoa"),
        "image_source_ir": ("models.ism", "image_source_ir"),
        "plane_groups": ("models.ism", "plane_groups"),
        "PlaneGroups": ("models.ism", "PlaneGroups"),
        "trace_ir_multi_listener": ("models.ir", "trace_ir_multi_listener"),
        "AcousticMaterial": ("models.materials", "AcousticMaterial"),
        "MATERIAL_PRESETS": ("models.materials", "MATERIAL_PRESETS"),
        "ImpulseResponse": ("models.ir", "ImpulseResponse"),
        "acoustic_update": ("sim.probe", "acoustic_update"),
        "render_ir_offline": ("engine.renderer", "render_ir_offline"),
        "render_ir_moving_offline": ("engine.moving", "render_ir_moving_offline"),
        "render_engine_offline": ("engine.renderer", "render_engine_offline"),
        "trace_ir_sharded": ("parallel.sharding", "trace_ir_sharded"),
        "trace_irs_multi_source": ("parallel.sharding", "trace_irs_multi_source"),
        "trace_irs_multi_listener_sharded": ("parallel.sharding", "trace_irs_multi_listener_sharded"),
        "hybrid_ir": ("models.ism", "hybrid_ir"),
        "diffraction_ir": ("models.diffraction", "diffraction_ir"),
        "diffraction_ir_utd": ("models.diffraction", "diffraction_ir_utd"),
        "diffraction_ir_utd2": ("models.diffraction", "diffraction_ir_utd2"),
        "diffraction_ir_utd3": ("models.diffraction", "diffraction_ir_utd3"),
        "Directivity": ("models.directivity", "Directivity"),
        "DIRECTIVITY_PRESETS": ("models.directivity", "DIRECTIVITY_PRESETS"),
        "directivity_gain": ("models.directivity", "directivity_gain"),
        "reverb_params_from_ir": ("engine.calibrate", "reverb_params_from_ir"),
        "fdn_gain_for_t60": ("engine.calibrate", "fdn_gain_for_t60"),
        "fdn_t60_of_gain": ("engine.calibrate", "fdn_t60_of_gain"),
        "extract_edges": ("models.diffraction", "extract_edges"),
        "extract_wedges": ("models.diffraction", "extract_wedges"),
        "rigid_transform_arrays": ("models.scene", "rigid_transform_arrays"),
        "AudioSink": ("native", "AudioSink"),
        "run_live": ("engine.live", "run_live"),
        "IRStreamRenderer": ("engine.ir_stream", "IRStreamRenderer"),
        "BatchedAcoustics": ("engine.serving", "BatchedAcoustics"),
        "wave_ir": ("models.wave", "wave_ir"),
        "wave_ir_bands": ("models.wave", "wave_ir_bands"),
        "wave_run": ("models.wave", "wave_run"),
        "wave_ir_energy": ("models.wave", "wave_ir_energy"),
        "hybrid_wave_ir": ("models.wave", "hybrid_wave_ir"),
        "voxelize_triangles": ("models.wave", "voxelize_triangles"),
        "WaveDomain": ("models.wave", "WaveDomain"),
        "WaveIR": ("models.wave", "WaveIR"),
        "wave_run_sharded": ("parallel.wave_sharded", "wave_run_sharded"),
        "fit_materials": ("models.inverse", "fit_materials"),
        "fit_source_position": ("models.inverse", "fit_source_position"),
        "fit_source_and_materials": (
            "models.inverse", "fit_source_and_materials"
        ),
        "log_energy_loss": ("models.inverse", "log_energy_loss"),
        "measured_ir_to_energy": ("models.inverse", "measured_ir_to_energy"),
        "FitResult": ("models.inverse", "FitResult"),
    }
    if name in table:
        mod, attr = table[name]
        return getattr(import_module(f".{mod}", __name__), attr)
    raise AttributeError(name)


__all__ = [
    "Config", "DEFAULT_CONFIG", "Scene", "SceneArrays", "box_room", "Space",
    "SpaceBuilder", "SoundSystem", "trace_ir", "trace_ir_pallas",
    "trace_ir_pallas_ensemble",
    "ambisonic_ir", "ambisonic_ir_hoa", "image_source_ir",
    "plane_groups", "PlaneGroups",
    "trace_ir_multi_listener", "AcousticMaterial",
    "MATERIAL_PRESETS", "ImpulseResponse", "acoustic_update",
    "render_ir_offline", "render_ir_moving_offline", "render_engine_offline",
    "trace_ir_sharded",
    "trace_irs_multi_source", "trace_irs_multi_listener_sharded",
    "hybrid_ir", "diffraction_ir", "diffraction_ir_utd",
    "diffraction_ir_utd2", "diffraction_ir_utd3",
    "extract_edges", "extract_wedges",
    "Directivity", "DIRECTIVITY_PRESETS", "directivity_gain",
    "reverb_params_from_ir", "fdn_gain_for_t60", "fdn_t60_of_gain",
    "rigid_transform_arrays", "AudioSink", "run_live",
    "IRStreamRenderer", "BatchedAcoustics",
    "wave_ir", "wave_ir_bands", "wave_run", "wave_ir_energy",
    "hybrid_wave_ir",
    "voxelize_triangles", "WaveDomain", "WaveIR", "wave_run_sharded",
    "fit_materials", "fit_source_position", "fit_source_and_materials",
    "log_energy_loss",
    "measured_ir_to_energy", "FitResult",
    "__version__",
]
