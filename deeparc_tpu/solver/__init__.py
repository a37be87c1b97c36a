from deeparc_tpu.solver.lm import LMResult, levenberg_marquardt
from deeparc_tpu.solver.ba import BAResult, solve_ba

__all__ = ["LMResult", "levenberg_marquardt", "BAResult", "solve_ba"]
