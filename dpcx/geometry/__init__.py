"""Geometry core: quaternion and camera math.

Single source of truth for rotation conventions (SURVEY.md §7 "hard parts"):
quaternions are (w, x, y, z), unit-normalized, and represent ACTIVE rotations
of points: ``p' = R(q) @ p``.
"""

from dpcx.geometry.quaternion import (
    quaternion_multiply,
    quaternion_conjugate,
    quaternion_normalize,
    quaternion_rotate,
    quaternion_to_matrix,
    quaternion_from_axis_angle,
    quaternion_angular_distance,
    random_quaternion,
)
from dpcx.geometry.camera import (
    camera_from_view_angles,
    look_at_quaternion,
    intrinsics_matrix,
)

__all__ = [
    "quaternion_multiply",
    "quaternion_conjugate",
    "quaternion_normalize",
    "quaternion_rotate",
    "quaternion_to_matrix",
    "quaternion_from_axis_angle",
    "quaternion_angular_distance",
    "random_quaternion",
    "camera_from_view_angles",
    "look_at_quaternion",
    "intrinsics_matrix",
]
