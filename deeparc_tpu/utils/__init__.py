from deeparc_tpu.utils.profiling import phase_timer, trace_to
from deeparc_tpu.utils.logging import JsonlLogger
from deeparc_tpu.utils.checkpoint import load_solver_state, save_solver_state

__all__ = [
    "phase_timer",
    "trace_to",
    "JsonlLogger",
    "load_solver_state",
    "save_solver_state",
]
