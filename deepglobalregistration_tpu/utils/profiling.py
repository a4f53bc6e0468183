"""Profiling hooks: jax.profiler traces + stage timers (SURVEY.md section 5).

The reference's observability is wall-clock timers (util/timer.py); on TPU the
equivalent first-class tool is a device trace. ``trace()`` wraps a code region;
``summarize_trace`` parses the captured trace_viewer JSON into per-op device
times so results are readable without TensorBoard.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dgr_trace"):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str, top: int = 25) -> Dict[str, float]:
    """Aggregate device op durations (ms) from the newest trace in log_dir."""
    files = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return {}
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data.get("traceEvents", [])
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    optime: collections.Counter = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            pname = pids.get(e["pid"], "")
            if "TPU" in pname or "XLA" in pname:
                optime[e["name"][:80]] += e["dur"]
    return {name: dur / 1000.0 for name, dur in optime.most_common(top)}
