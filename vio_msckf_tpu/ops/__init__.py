from vio_msckf_tpu.ops.distortion import (
    distort_points,
    undistort_points,
    project_points,
)
from vio_msckf_tpu.ops.pyramid import build_pyramid
from vio_msckf_tpu.ops.fast import fast_score_map, detect_grid_features
from vio_msckf_tpu.ops.klt import pyramidal_lk

__all__ = [
    "distort_points",
    "undistort_points",
    "project_points",
    "build_pyramid",
    "fast_score_map",
    "detect_grid_features",
    "pyramidal_lk",
]
