"""Profiling/tracing hooks — the observability tier the reference lacks
(SURVEY.md §5: it tells users to watch nvtop; here scans emit structured
metrics and can capture full XLA profiler traces).

Enable with the environment variable ``CUDASP_PROFILE_DIR=/some/dir`` (one
trace per scan, viewable in TensorBoard / xprof) or programmatically:

    with trace_scan("/tmp/trace"):
        scan(...)
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time

log = logging.getLogger("cudasp_tpu")


@contextlib.contextmanager
def trace_scan(trace_dir=None):
    """Capture a jax.profiler trace of the enclosed scan (no-op when
    trace_dir is falsy and CUDASP_PROFILE_DIR is unset)."""
    trace_dir = trace_dir or os.environ.get("CUDASP_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        yield
    log.info("scan trace (%.3fs) written to %s",
             time.perf_counter() - t0, trace_dir)


def annotate(name: str):
    """Named sub-span inside a captured trace (jax TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def emit_metrics(metrics, stream=None) -> None:
    """One structured JSON line per scan (rows/s, bytes staged, matches) —
    set CUDASP_METRICS=1 to emit on stderr from every scan() call."""
    if metrics is None:
        return
    stream = stream or sys.stderr
    print(json.dumps({"event": "scan_metrics", **metrics.as_dict()}),
          file=stream)
