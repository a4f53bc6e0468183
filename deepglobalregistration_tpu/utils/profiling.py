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


def attribute_trace(log_dir: str, compiled_text: str, top: int = 30,
                    by: str = "line") -> Dict[str, float]:
    """Join device op times with HLO source metadata -> ms per source line.

    compiled_text: ``jit(fn).lower(*args).compile().as_text()`` of the SAME
    program that was traced. Ops whose HLO carries no metadata aggregate
    under their op-name prefix. by='line' groups on file:line; by='op'
    groups on the op_name metadata (the jax primitive path).
    """
    import re

    meta = {}
    pat_line = re.compile(
        r"%(\S+?) = .*?source_file=\"([^\"]+)\".*?source_line=(\d+)")
    pat_op = re.compile(r"%(\S+?) = .*?op_name=\"([^\"]+)\"")
    for ln in compiled_text.splitlines():
        m = pat_line.search(ln) if by == "line" else pat_op.search(ln)
        if m:
            if by == "line":
                name, f, l = m.groups()
                meta[name] = f"{f.rsplit('/', 1)[-1]}:{l}"
            else:
                name, op = m.groups()
                meta[name] = op[:100]
    optime = summarize_trace(log_dir, top=10 ** 6)
    agg: collections.Counter = collections.Counter()
    for op, ms in optime.items():
        if op.startswith("jit_") or op.startswith("jit("):
            continue  # whole-program envelope event
        agg[meta.get(op, op.split(".")[0])] += ms
    return {k: v for k, v in agg.most_common(top)}
