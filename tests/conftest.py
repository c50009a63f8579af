"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip sharding (parallel/) is validated without TPU hardware via
XLA's host-platform device-count override (SURVEY.md §4). Must run before
any `import jax` in the test session, hence top-level in conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Site customization (e.g. a preloaded TPU PJRT plugin) may have already
# imported jax and forced its own platform list via jax.config — re-force
# CPU *after* import so tests are deterministic and the virtual 8-device
# mesh is available.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache (machine-local, gitignored): the suite's
# dominant cost is XLA CPU compiles of the giant interpret-mode Pallas
# programs; re-runs deserialize them from disk instead (also lowers the
# compiler-memory pressure behind the historical mid-suite segfaults —
# see test_pallas_trace.py's cache-clearing fixture).
from audio_raytracing_tpu.utils.compile_cache import enable as _enable_cc

# enable() host-keys CPU-backed caches itself: XLA:CPU entries are
# machine code, and loading a cache built on a different host (the
# workspace moves between rounds) segfaulted a full-suite run (see
# utils/compile_cache.host_key)
_enable_cc(Path(__file__).resolve().parent / ".jax_compile_cache")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xA0D10)


@pytest.fixture(scope="session")
def world_obj_path():
    p = Path(__file__).resolve().parent.parent / "data" / "world.obj"
    if not p.exists():
        pytest.skip("data/world.obj not present")
    return p
