"""Geometry core: cameras, gravity, manifolds, perspective fields."""

from geocalib_tpu.geometry.camera import CAMERA_MODELS, NUM_DIST_PARAMS, Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.manifolds import EuclideanManifold, SphericalManifold
from geocalib_tpu.geometry.perspective_fields import (
    J_perspective_field,
    get_latitude_field,
    get_perspective_field,
    get_up_field,
    get_horizon_line,
)

__all__ = [
    "CAMERA_MODELS",
    "NUM_DIST_PARAMS",
    "Camera",
    "Gravity",
    "EuclideanManifold",
    "SphericalManifold",
    "J_perspective_field",
    "get_latitude_field",
    "get_perspective_field",
    "get_up_field",
    "get_horizon_line",
]
