"""Profiling helpers: capture an xprof trace of a function and summarise
per-kernel device time.

The engine's throughput on dispatch-overhead-bound runtimes is governed by
the number of kernels per transport iteration; this census (trace.json.gz
parsing, no TensorBoard needed) is the tool used for the optimisation work
logged in docs/PHYSICS_VALIDATION.md. The reference's only profiling was
wall-clock prints (MC-GPU_v1.3.cu:2806-2812).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import tempfile
from typing import Callable, Dict, List, Tuple

import jax


def capture_trace(fn: Callable[[], object], trace_dir: str | None = None) -> str:
    """Run fn under the JAX profiler; returns the trace.json.gz path."""
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="cbctmc_trace_")
    with jax.profiler.trace(trace_dir):
        out = fn()
        jax.block_until_ready(out)
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        raise FileNotFoundError(f"No trace written under {trace_dir}")
    return sorted(paths)[-1]


def kernel_census(trace_path: str, top: int = 25) -> List[Dict]:
    """Aggregate device-event durations by kernel name."""
    with gzip.open(trace_path) as f:
        trace = json.load(f)
    duration = collections.Counter()
    count = collections.Counter()
    for event in trace.get("traceEvents", []):
        if event.get("ph") == "X" and "dur" in event:
            name = event.get("name", "?")
            duration[name] += event["dur"]
            count[name] += 1
    rows = [
        {"name": name, "total_ms": dur / 1e3, "count": count[name]}
        for name, dur in duration.most_common(top)
    ]
    return rows


def profile_projection_step(
    run: Callable[[], object], top: int = 25
) -> Tuple[List[Dict], str]:
    """Convenience wrapper: trace one engine call and return the census."""
    path = capture_trace(run)
    return kernel_census(path, top=top), path
