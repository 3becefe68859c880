"""Training losses and metrics for perspective fields and solver parameters.

Re-design of the reference loss stack:
- field losses with confidence weighting:
  /root/reference/siclib/models/decoders/up_decoder.py:52-79 and
  latitude_decoder.py:53-98 (l1 over channels, weights = confidences
  normalized to mean 1, detached).
- parameter losses: /root/reference/siclib/models/optimization/
  lm_optimizer.py:598-625 (L1 on gravity vec3d, focal/h, distortion).
- metrics: /root/reference/siclib/models/utils/metrics.py.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity

Array = jnp.ndarray


def _conf_weight(confidence: Array) -> Array:
    """Normalized per-pixel weights with mean 1, gradient-detached."""
    w = confidence / jnp.sum(confidence, axis=(-2, -1), keepdims=True)
    w = w * (confidence.shape[-1] * confidence.shape[-2])
    return jax.lax.stop_gradient(w)


def field_loss(
    pred: Array,
    target: Array,
    confidence: Optional[Array] = None,
    loss_type: str = "l1",
) -> Array:
    """Per-image field loss (B,), channel-last inputs (B, H, W, C)."""
    res = pred - target
    if loss_type == "l1":
        loss = jnp.abs(res).sum(-1)
    elif loss_type == "l2":
        loss = (res**2).sum(-1)
    elif loss_type == "dot":
        loss = 1.0 - (pred * target).sum(-1)
    elif loss_type == "cauchy":
        c = 0.007  # ~5 degrees
        loss = c**2 / 2 * jnp.log1p((res**2).sum(-1) / c**2)
    elif loss_type == "huber":
        c = jnp.deg2rad(1.0)
        a = jnp.abs(res)
        loss = jnp.where(a < c, 0.5 * res**2, c * (a - 0.5 * c)).sum(-1)
    else:
        raise ValueError(f"unknown loss type {loss_type}")
    if confidence is not None:
        loss = loss * _conf_weight(confidence)
    return loss.mean(axis=(-2, -1))


def param_losses(
    pred_cam: Camera, pred_grav: Gravity, gt_cam: Camera, gt_grav: Gravity
) -> Dict[str, Array]:
    """L1 losses on the solver outputs (B,)."""
    gravity = jnp.abs(pred_grav.vec3d - gt_grav.vec3d).sum(-1)
    h = gt_cam.size[..., 1]
    focal = jnp.abs(pred_cam.f - gt_cam.f).mean(-1) / h
    dist = jnp.abs(pred_cam.k - gt_cam.k).sum(-1)
    return {
        "gravity": gravity,
        "focal": focal,
        "dist": dist,
        "param_total": gravity + focal + dist,
    }


def geocalib_losses(
    fields: Dict[str, Array],
    lm_camera: Camera,
    lm_gravity: Gravity,
    data: Dict[str, Array],
    gt_camera: Camera,
    gt_gravity: Gravity,
) -> Dict[str, Array]:
    """Full training loss dict; "total" is optimized (networks/geocalib.py:55-66)."""
    up = field_loss(
        fields["up_field"], data["up_field"], fields.get("up_confidence"), "l1"
    )
    lat = field_loss(
        fields["latitude_field"],
        data["latitude_field"],
        fields.get("latitude_confidence"),
        "l1",
    )
    losses = {"up_total": up, "latitude_total": lat, "perspective_total": up + lat}
    losses |= param_losses(lm_camera, lm_gravity, gt_camera, gt_gravity)
    losses["total"] = losses["perspective_total"] + losses["param_total"]
    return losses


# --------------------------- metrics --------------------------- #


def _wrap_deg(x: Array) -> Array:
    """Wrap angle differences into [-180, 180] degrees."""
    return (x + 180.0) % 360.0 - 180.0


def roll_error(pred: Gravity, gt: Gravity) -> Array:
    return jnp.abs(_wrap_deg(jnp.degrees(pred.roll) - jnp.degrees(gt.roll)))


def pitch_error(pred: Gravity, gt: Gravity) -> Array:
    return jnp.abs(jnp.degrees(pred.pitch) - jnp.degrees(gt.pitch))


def gravity_error(pred: Gravity, gt: Gravity) -> Array:
    cos = jnp.clip(jnp.sum(pred.vec3d * gt.vec3d, -1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def vfov_error(pred: Camera, gt: Camera) -> Array:
    return jnp.abs(jnp.degrees(pred.vfov) - jnp.degrees(gt.vfov))


def dist_error(pred: Camera, gt: Camera) -> Array:
    return jnp.abs(pred.k[..., 0] - gt.k[..., 0])


def up_angle_error(pred: Array, target: Array) -> Array:
    """Per-pixel angular error in degrees, (B, H, W)."""
    cos = jnp.clip(jnp.sum(pred * target, -1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def latitude_angle_error(pred: Array, target: Array) -> Array:
    return jnp.degrees(jnp.abs(pred - target))[..., 0]


def geocalib_metrics(
    fields: Dict[str, Array],
    lm_camera: Camera,
    lm_gravity: Gravity,
    data: Dict[str, Array],
    gt_camera: Camera,
    gt_gravity: Gravity,
) -> Dict[str, Array]:
    """Per-image metric dict (B,) matching the reference metric names."""
    up_err = up_angle_error(fields["up_field"], data["up_field"])
    lat_err = latitude_angle_error(fields["latitude_field"], data["latitude_field"])
    out = {
        "roll_error": roll_error(lm_gravity, gt_gravity),
        "pitch_error": pitch_error(lm_gravity, gt_gravity),
        "gravity_error": gravity_error(lm_gravity, gt_gravity),
        "vfov_error": vfov_error(lm_camera, gt_camera),
        "k1_error": dist_error(lm_camera, gt_camera),
        "up_angle_error": up_err.mean(axis=(-2, -1)),
        "latitude_angle_error": lat_err.mean(axis=(-2, -1)),
    }
    for th in (1, 5, 10):
        out[f"up_angle_recall@{th}"] = (up_err < th).mean(axis=(-2, -1))
        out[f"latitude_angle_recall@{th}"] = (lat_err < th).mean(axis=(-2, -1))
    return out
