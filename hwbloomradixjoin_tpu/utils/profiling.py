"""Profiler capture — jax.profiler traces replacing rdtsc/perf_event tiers.

The reference's three observability tiers (SURVEY.md §5: rdtsc phase timers,
SYNCSTATS barrier-wait stats, hardware counters) map to:
  phase timers   -> utils/timing.PhaseTimer (host wall clock around jitted
                    phases) + this module's device trace capture
  syncstats      -> per-device step timing from the trace (imbalance view)
  perf counters  -> utils/roofline analytic attainment
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str = "/tmp/hbrj_trace", enabled: bool = True):
    """Capture a jax.profiler trace around a region (view with xprof/tensorboard)."""
    if not enabled:
        yield None
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the device timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
