"""Pallas TPU kernels: fused linearization for the dense-grid BA engine.

SURVEY.md section 7 stage 6 — the hot loops Ceres runs multithreaded on CPU
(residual+Jacobian evaluation, normal-equation accumulation; call stack at
SURVEY.md section 3.2) fused into single-pass on-chip kernels so no Jacobian
plane ever round-trips through HBM.
"""

from deeparc_tpu.kernels.rig_pallas import (  # noqa: F401
    cost_grid,
    flat_of_native,
    linearize_grid,
    native_of_flat,
)
