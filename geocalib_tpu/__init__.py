"""geocalib_tpu: TPU-native single-image camera calibration.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
cvg/GeoCalib (ECCV 2024): per-pixel perspective fields from a CNN,
refined by a batched, fully on-device Levenberg-Marquardt solver with
hand-derived analytic Jacobians, differentiable end-to-end.
"""

__version__ = "0.1.0"

from geocalib_tpu.geometry import Camera, Gravity

__all__ = ["Camera", "Gravity"]
