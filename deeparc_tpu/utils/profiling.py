"""Tracing / profiling helpers (SURVEY.md section 5: the reference has none;
its only signal is Ceres' per-iteration stdout). Wraps jax.profiler for
device traces plus lightweight host-side phase timers."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_PHASE_TOTALS: dict = defaultdict(float)
_PHASE_COUNTS: dict = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str, sink: dict | None = None):
    """Accumulate wall time per named phase; read back via phase_report()."""
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        _PHASE_TOTALS[name] += dt
        _PHASE_COUNTS[name] += 1
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt


def phase_report() -> dict:
    return {
        name: {"total_s": _PHASE_TOTALS[name], "count": _PHASE_COUNTS[name]}
        for name in _PHASE_TOTALS
    }


def reset_phases() -> None:
    _PHASE_TOTALS.clear()
    _PHASE_COUNTS.clear()


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
