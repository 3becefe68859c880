"""Per-image evaluation metrics: camera, gravity, fields, pixel projection.

Re-design of /root/reference/siclib/eval/simple_pipeline.py:48-143 — batched
jnp versions (the reference loops per image on the host).
"""

from typing import Dict, Sequence

import jax.numpy as jnp

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.training.losses import (
    dist_error,
    gravity_error,
    pitch_error,
    roll_error,
    vfov_error,
)

Array = jnp.ndarray


def pixel_projection_errors(
    camera_pred: Camera,
    camera_gt: Camera,
    n: int = 64,
    distortion_only: bool = True,
) -> Dict[str, Array]:
    """Reprojection pixel distance between predicted and GT cameras.

    Projects an n×n grid of rays built with the GT pinhole camera through
    both cameras and measures the pixel displacement
    (simple_pipeline.py:48-96). Returns dist (B, n*n) and valid (B, n*n).
    """
    if distortion_only:
        camera_pred = Camera(
            size=camera_gt.size,
            f=camera_gt.f,
            c=camera_gt.c,
            k=camera_pred.k,
            model=camera_gt.model,
        )

    # per-image n×n grids over each image's own [0, W_i-1]×[0, H_i-1] — the
    # batch may mix original sizes (reference builds the grid per image,
    # simple_pipeline.py:78-82)
    t = jnp.linspace(0.0, 1.0, n)
    xg, yg = jnp.meshgrid(t, t, indexing="xy")
    unit = jnp.stack([xg, yg], axis=-1).reshape(-1, 2)  # (n*n, 2) in [0,1]
    xy = unit[None] * (camera_gt.size[:, None, :] - 1.0)  # (B, n*n, 2)

    uv_pin, _ = camera_gt.pinhole().image2world(xy)
    xy_gt, valid_gt = camera_gt.world2image(uv_pin)
    xy_pred, valid_pred = camera_pred.world2image(uv_pin)

    dist = jnp.sqrt(jnp.sum((xy_pred - xy_gt) ** 2, axis=-1))
    return {"dist": dist, "valid": valid_gt & valid_pred, "valid_gt": valid_gt}


def camera_metrics(
    camera_pred: Camera,
    camera_gt: Camera,
    thresholds: Sequence[float] = (0.5, 1.0, 3.0, 5.0),
) -> Dict[str, Array]:
    """vfov/focal/k1 errors + pixel projection recalls, all (B,)."""
    out = {
        "vfov": jnp.degrees(camera_pred.vfov),
        "vfov_error": vfov_error(camera_pred, camera_gt),
        "focal": camera_pred.f[..., 1],
        "focal_error": jnp.abs(camera_pred.f[..., 1] - camera_gt.f[..., 1]),
        "rel_focal_error": jnp.abs(camera_pred.f[..., 1] - camera_gt.f[..., 1])
        / camera_gt.f[..., 1],
    }
    if camera_gt.model != "pinhole":
        out["k1"] = camera_pred.k[..., 0]
        out["k1_error"] = dist_error(camera_pred, camera_gt)
        for distortion_only, tag in ((False, "projection"), (True, "distortion")):
            res = pixel_projection_errors(
                camera_pred, camera_gt, distortion_only=distortion_only
            )
            denom = jnp.maximum(res["valid_gt"].sum(-1), 1)
            for th in thresholds:
                hit = ((res["dist"] < th) & res["valid"]).sum(-1)
                out[f"pixel_{tag}_error@{th:g}"] = hit / denom
    return out


def gravity_metrics(gravity_pred: Gravity, gravity_gt: Gravity) -> Dict[str, Array]:
    return {
        "roll": jnp.degrees(gravity_pred.roll),
        "pitch": jnp.degrees(gravity_pred.pitch),
        "roll_error": roll_error(gravity_pred, gravity_gt),
        "pitch_error": pitch_error(gravity_pred, gravity_gt),
        "gravity_error": gravity_error(gravity_pred, gravity_gt),
    }
