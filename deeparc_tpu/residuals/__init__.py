from deeparc_tpu.residuals.reprojection import (
    ObsJacobians,
    camera_col_indices,
    camera_dim,
    cost,
    flatten_camera,
    gather_slices,
    jacobian_blocks,
    residuals,
    unflatten_camera,
)
from deeparc_tpu.residuals.hemisphere import hemisphere_residuals

__all__ = [
    "ObsJacobians",
    "camera_col_indices",
    "camera_dim",
    "cost",
    "flatten_camera",
    "gather_slices",
    "jacobian_blocks",
    "residuals",
    "unflatten_camera",
    "hemisphere_residuals",
]
