"""Persistent XLA compilation cache, measured to work through the axon
remote-compile relay (2026-08-18 probe): a second process's
`.compile()` of the same program drops 5.26 s -> 0.21 s (kernel
executable served from disk; 3.5 s -> 0.3 s for a plain XLA program).
Only the compile step is covered — Python tracing + Mosaic lowering
(~10 s for a mid-size fused-trace kernel) still run — but through the
relay the compile step is the minutes-long part for big kernels, so this
is the difference between "every benchmark process pays a Mosaic
compile" and "only the first ever does".

Used by: bench.py and benchmarks/* (repo-committed warm cache at
benchmarks/.jax_compile_cache so the driver's bench run hits it on the
same container image) and tests/conftest.py (machine-local cache — CPU
executables are big and churn, so that directory is gitignored).
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_key() -> str:
    """Short fingerprint of THIS host's CPU (x86 feature flags when
    available). XLA:CPU cache entries are machine-code AOT results:
    loading one built on a different host logs only a machine-features
    warning and can then SIGILL (a full-suite run segfaulted inside
    compilation_cache.get_executable_and_time when the workspace moved
    hosts between rounds). Keying the CPU cache dir by this makes a
    host move land on a fresh directory instead."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 says "flags", aarch64 says "Features"
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":")[1].split()))
                    break
    except OSError:
        pass
    if not flags:
        flags = platform.processor() or platform.machine() or "unknown"
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


def enable(cache_dir) -> None:
    """Idempotently point jax's persistent compilation cache at
    `cache_dir`. MOSTLY safe on any backend/version: a mismatched entry
    is normally a clean cache miss — EXCEPT XLA:CPU AOT entries built on
    a different machine, which load with only a machine-features WARNING
    and can then wedge or SIGILL (observed 2026-08-21: a CPU smoke run
    of bench_netserve loaded the committed benchmarks cache's
    cross-machine CPU artifacts and the pump dispatch hung forever).
    Set ARTPU_NO_COMPILE_CACHE=1 to skip enabling (CPU smoke runs of the
    TPU benches should)."""
    import jax

    if os.environ.get("ARTPU_NO_COMPILE_CACHE") == "1":
        return
    if jax.default_backend() == "cpu":
        # XLA:CPU entries are host machine code — never share them
        # across hosts (the committed benchmarks cache is for TPU
        # executables; a CPU run that loaded its cross-machine CPU
        # entries wedged). A CPU-backed run gets a host-keyed subdir:
        # still cached locally, never poisonous. Calling
        # default_backend() here just front-loads the backend init the
        # caller pays moments later anyway.
        cache_dir = os.path.join(str(cache_dir), "cpu-" + host_key())
    cache_dir = str(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # relay compiles are worth caching from ~1 s; size floor off so the
    # small audio-engine programs cache too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
