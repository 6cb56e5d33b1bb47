from tti.calib.io import CalibrationData, load_extrinsics, load_intrinsics, save_extrinsics
from tti.calib.geometry import (
    camera_plane,
    distort_points,
    pixels_to_plane_mm,
    pixels_to_world,
    project_points,
    rodrigues,
    undistort_points,
)

__all__ = [
    "CalibrationData",
    "load_extrinsics",
    "load_intrinsics",
    "save_extrinsics",
    "camera_plane",
    "distort_points",
    "pixels_to_plane_mm",
    "pixels_to_world",
    "project_points",
    "rodrigues",
    "undistort_points",
]
