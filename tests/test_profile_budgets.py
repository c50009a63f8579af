"""Perfetto/Chrome-trace budget assertions (tools/profile_trace.py).

The reference's whole observability story is two std.debug.print timing
spans (main.zig:525-526, sound_system.zig:133-134); ours is a real device
trace plus THIS regression gate: parse the profile, attribute XLA-module
device time to TraceAnnotation steps by time overlap, compare against
budgets. The synthetic trace below replicates the measured structure of
jax.profiler output on the axon TPU backend (process "/device:TPU:0" with
an "XLA Modules" lane; annotations only as host spans).
"""

import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.profile_trace import assert_budgets, parse_device_step_times


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmp_path


def _meta(pid, name, tid=None):
    if tid is None:
        return {"ph": "M", "pid": pid, "name": "process_name",
                "args": {"name": name}}
    return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
            "args": {"name": name}}


def _x(pid, tid, name, ts, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name,
            "ts": ts, "dur": dur}


def test_device_attribution_by_overlap(tmp_path):
    """Module spans land in the right step; Ops-lane kernels (nested
    inside module spans) are NOT double counted; out-of-window device
    work goes to _device_total only."""
    ev = [
        _meta(3, "/device:TPU:0"), _meta(701, "/host:CPU"),
        _meta(3, "XLA Modules", tid=2), _meta(3, "XLA Ops", tid=3),
        # two annotation windows on the host lane
        _x(701, 9, "step_a", 0.0, 10_000.0),
        _x(701, 9, "step_b", 20_000.0, 10_000.0),
        # a python frame must not be mistaken for an annotation
        _x(701, 9, "$contextlib.py:132 __enter__", 0.0, 50_000.0),
        # module spans: 2 ms in step_a, 3 ms in step_b, 1 ms in neither
        _x(3, 2, "jit_f(123)", 1_000.0, 2_000.0),
        _x(3, 2, "jit_g(456)", 21_000.0, 3_000.0),
        _x(3, 2, "jit_h(789)", 40_000.0, 1_000.0),
        # nested kernels on the Ops lane — ignored (double counting)
        _x(3, 3, "fusion.1", 1_000.0, 1_900.0),
        _x(3, 3, "copy-start", 21_000.0, 0.0),
    ]
    out = parse_device_step_times(_write_trace(tmp_path, ev))
    assert abs(out["step_a"] - 2.0) < 1e-9
    assert abs(out["step_b"] - 3.0) < 1e-9
    assert abs(out["_device_total"] - 6.0) < 1e-9
    assert "$contextlib.py:132 __enter__" not in out

    named = parse_device_step_times(tmp_path, step_names=["step_a"])
    assert set(named) == {"step_a", "_device_total"}


def test_overlap_clipping(tmp_path):
    """A module span straddling the window boundary contributes only its
    inside part."""
    ev = [
        _meta(3, "/device:TPU:0"), _meta(701, "/host:CPU"),
        _meta(3, "XLA Modules", tid=2),
        _x(701, 9, "step", 0.0, 10_000.0),
        _x(3, 2, "jit_f(1)", 8_000.0, 4_000.0),  # 2 ms in, 2 ms out
    ]
    out = parse_device_step_times(_write_trace(tmp_path, ev))
    assert abs(out["step"] - 2.0) < 1e-9
    assert abs(out["_device_total"] - 4.0) < 1e-9


def test_cpu_fallback_uses_host_span(tmp_path):
    """No /device: process (CPU backend) -> step time is the annotation
    span's wall duration."""
    ev = [
        _meta(701, "/host:CPU"),
        _x(701, 9, "mystep", 100.0, 7_500.0),
    ]
    out = parse_device_step_times(_write_trace(tmp_path, ev))
    assert abs(out["mystep"] - 7.5) < 1e-9


def test_assert_budgets():
    step_ms = {"trace": 12.0, "engine": 3.0}
    assert assert_budgets(step_ms, {"trace": 15, "engine": 5}) == []
    bad = assert_budgets(step_ms, {"trace": 10, "missing": 1})
    assert len(bad) == 2
    assert any("12.00 ms > budget 10" in b for b in bad)
    assert any("missing" in b and "absent" in b for b in bad)


def test_budgets_file_covers_gated_steps():
    """The committed budgets.json must gate every step profile_trace
    captures under --what all — pallas/XLA trace, the audio block, and
    (r4) the serving round (the L=16 multi-listener NEE trace + ambisonic
    conversion backing the render-pump stream-count claims)."""
    budgets = json.loads(
        (Path(__file__).resolve().parent.parent / "benchmarks" /
         "budgets.json").read_text())
    for step in ("pallas_trace", "xla_trace", "engine_16blocks",
                 "serving_round"):
        assert step in budgets, f"budgets.json missing gate for {step}"
        assert float(budgets[step]) > 0
