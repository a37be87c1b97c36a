"""Numerical-debugging toggles (SURVEY.md section 5, sanitizer row).

The reference has no sanitizers (plain ``-W -Wall -O3``,
``CMakeLists.txt:2``); in the JAX functional model the equivalent guard is
``jax_debug_nans``: every jitted computation is re-run op-by-op when a NaN
appears, raising ``FloatingPointError`` at the producing primitive instead of
silently propagating — e.g. the unguarded perspective divide when a point
crosses z = 0 (``src/snavely_reprojection_error.hh:49-50``;
geometry/projection.py).
"""

from __future__ import annotations

import contextlib

import jax


def set_nan_debugging(enabled: bool = True) -> None:
    """Globally enable/disable jax_debug_nans (fail loudly on NaN).

    Clears the executable caches on enable: computations compiled before the
    toggle do not carry the NaN checks and would keep silently propagating.
    """
    jax.config.update("jax_debug_nans", enabled)
    if enabled:
        jax.clear_caches()


@contextlib.contextmanager
def nan_debugging(enabled: bool = True):
    """Scoped jax_debug_nans toggle (restores the previous value on exit)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    if enabled:
        jax.clear_caches()
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
