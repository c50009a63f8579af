"""The serialized Pallas executable must match the sources it bakes in.

bench.py silently falls back to the ~5x slower XLA path when
benchmarks/pallas_trace_exec.pkl is stale (its source hash no longer
matches HASHED_SOURCES) — this bit round 1 once via a models/ir.py edit
(CLAUDE.md). This test turns the convention into a CI-style failure:
editing any hashed source without re-running
benchmarks/build_pallas_aot.py makes a fast test fail (VERDICT r1 item 8).
"""

import importlib.util
import pickle
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load_builder():
    spec = importlib.util.spec_from_file_location(
        "build_pallas_aot", ROOT / "benchmarks" / "build_pallas_aot.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_aot_artifact_hash_fresh():
    mod = _load_builder()
    artifact = ROOT / "benchmarks" / "pallas_trace_exec.pkl"
    assert artifact.exists(), (
        "benchmarks/pallas_trace_exec.pkl missing — run "
        "`python benchmarks/build_pallas_aot.py` on the TPU and commit it"
    )
    with open(artifact, "rb") as f:
        blob = pickle.load(f)
    assert blob["source_sha"] == mod.kernel_source_hash(), (
        "AOT Pallas executable is STALE: a file in HASHED_SOURCES changed "
        "since benchmarks/build_pallas_aot.py last ran. bench.py would "
        "silently fall back to the ~5x slower XLA path (extra."
        "aot_artifact_stale). Re-run `python benchmarks/build_pallas_aot.py` "
        "on the TPU and commit the refreshed .pkl."
    )
    assert blob["rays"] == mod.BENCH_RAYS and blob["bounces"] == mod.BENCH_BOUNCES


def test_hashed_sources_exist():
    """Renaming a hashed source must not silently drop it from the guard."""
    mod = _load_builder()
    for rel in mod.HASHED_SOURCES:
        assert (ROOT / rel).exists(), rel
