"""geocalib_tpu: TPU-native single-image camera calibration.

A from-scratch JAX/XLA framework with the capabilities of cvg/GeoCalib
(ECCV 2024): per-pixel perspective fields from a CNN, refined by a batched,
fully on-device Levenberg-Marquardt solver with hand-derived analytic
Jacobians, differentiable end-to-end. Pixel-last planar math keeps the TPU
VPU lanes packed; training is SPMD over a jax.sharding.Mesh.

Quick start:
    from geocalib_tpu import GeoCalib
    result = GeoCalib(weights="params.msgpack").calibrate(image)
    result["camera"].vfov, result["gravity"].roll
"""

__version__ = "0.1.0"

from geocalib_tpu.extractor import GeoCalib, load_params, save_params
from geocalib_tpu.geometry import Camera, Gravity, get_perspective_field
from geocalib_tpu.optim import LMConfig, run_lm

__all__ = [
    "GeoCalib",
    "load_params",
    "save_params",
    "Camera",
    "Gravity",
    "get_perspective_field",
    "LMConfig",
    "run_lm",
]
