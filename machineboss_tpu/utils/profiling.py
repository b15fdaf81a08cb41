"""Profiling hooks (TPU equivalent of the reference's ProgressLog timing,
ref src/logger.h:57-115 — here: XLA/TPU traces viewable in TensorBoard /
xprof, plus a simple wall-clock section timer).

Usage:
    with trace_if("/tmp/trace"):           # no-op when dir is falsy
        run_dp()
    with timed("forward", logger):         # logs elapsed seconds
        run_dp()
"""

import contextlib
import time


@contextlib.contextmanager
def trace_if(trace_dir):
    """jax.profiler.trace when trace_dir is set; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def timed(label, log_fn=None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    msg = "%s: %.3fs" % (label, dt)
    if log_fn is not None:
        log_fn(msg)
    else:
        import sys
        sys.stderr.write(msg + "\n")
