"""Profiling & memory observability.

TPU-native rebuild of the reference's three probes (SURVEY §5.1):
  * GpuProfiler timestamp queries (gpu_ops/profiler.rs:33) -> jax.profiler
    traces viewable in TensorBoard/Perfetto;
  * TracingAllocator RSS counters (utils/alloc_stats.rs:4)  -> host RSS via
    /proc/self/status plus live device-buffer accounting;
  * WgpuContext::print_memory_usage (gpu_ops/context.rs:278) ->
    device_memory_report().
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/kjarni-trace") -> Iterator[None]:
    """Capture a jax profiler trace for the enclosed region.

    View with TensorBoard (`tensorboard --logdir <dir>`) or Perfetto.
    """
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside a trace (decode step, prefill, ...)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


def host_memory_mb() -> dict[str, float]:
    """Current/peak host RSS in MB (TracingAllocator analogue)."""
    out = {"rss_mb": 0.0, "peak_rss_mb": 0.0}
    try:
        for line in Path("/proc/self/status").read_text().splitlines():
            if line.startswith("VmRSS:"):
                out["rss_mb"] = float(line.split()[1]) / 1024
            elif line.startswith("VmHWM:"):
                out["peak_rss_mb"] = float(line.split()[1]) / 1024
    except OSError:
        pass
    return out


def device_memory_report() -> list[dict]:
    """Per-device live-buffer accounting (print_memory_usage analogue)."""
    import jax
    report = []
    for dev in jax.devices():
        entry = {"device": str(dev), "live_buffer_mb": None}
        try:
            stats = dev.memory_stats()
            if stats:
                entry["live_buffer_mb"] = stats.get("bytes_in_use", 0) / 1e6
                entry["peak_mb"] = stats.get("peak_bytes_in_use", 0) / 1e6
                entry["limit_mb"] = stats.get("bytes_limit", 0) / 1e6
        except Exception:
            pass
        report.append(entry)
    return report


def print_memory_usage() -> None:
    host = host_memory_mb()
    print(f"[kjarni] host rss: {host['rss_mb']:.0f} MB "
          f"(peak {host['peak_rss_mb']:.0f} MB)")
    for entry in device_memory_report():
        if entry.get("live_buffer_mb") is not None:
            print(f"[kjarni] {entry['device']}: "
                  f"{entry['live_buffer_mb']:.0f} MB live"
                  + (f" (peak {entry['peak_mb']:.0f} MB)"
                     if "peak_mb" in entry else ""))
        else:
            print(f"[kjarni] {entry['device']}: memory stats unavailable")
