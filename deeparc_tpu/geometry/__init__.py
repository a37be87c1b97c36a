from deeparc_tpu.geometry.rotation import (
    angle_axis_rotate,
    angle_axis_to_matrix,
    matrix_to_angle_axis,
    quaternion_to_angle_axis,
)
from deeparc_tpu.geometry.projection import project_observation, CameraSlice
from deeparc_tpu.geometry.camera import (
    camera_center_single,
    camera_center_composed,
    hemisphere_camera_centers,
)

__all__ = [
    "angle_axis_rotate",
    "angle_axis_to_matrix",
    "matrix_to_angle_axis",
    "quaternion_to_angle_axis",
    "project_observation",
    "CameraSlice",
    "camera_center_single",
    "camera_center_composed",
    "hemisphere_camera_centers",
]
