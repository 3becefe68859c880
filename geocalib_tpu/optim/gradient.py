"""First-order (Adam) calibration baseline over (roll, pitch, vfov).

Re-design of /root/reference/siclib/models/optimization/perspective_opt.py
(PerspectiveParamOpt: Adam + ReduceLROnPlateau over the parameters against
the predicted fields). TPU version: the whole optimization is one
lax.scan of optax Adam steps with a plateau-based learning-rate scale —
no host loop, fully batched and differentiable.
"""

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from geocalib_tpu.geometry import planar_fields as pf
from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class GDConfig:
    num_steps: int = 100
    lr: float = 0.05
    plateau_patience: int = 10
    plateau_factor: float = 0.5
    use_latitude: bool = True


class GDResult(NamedTuple):
    camera: Camera
    gravity: Gravity
    costs: Array  # (num_steps, B)


def _cost(params: Array, data_planes, h: int, w: int, use_latitude: bool) -> Array:
    """Per-image field mismatch for params (B, 3) = (roll, pitch, vfov)."""
    obs_upx, obs_upy, obs_lat, B = data_planes
    roll, pitch, vfov = params[:, 0], params[:, 1], params[:, 2]
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(h)),
            "width": jnp.full((B,), float(w)),
            "vfov": jnp.clip(vfov, jnp.radians(5.0), jnp.radians(170.0)),
        }
    )
    grav = Gravity.from_rp(roll, pitch)
    u, v = pf.make_grid(cam, h, w)
    upx, upy = pf.up_planes(cam, grav, u, v)
    cost = ((upx - obs_upx) ** 2 + (upy - obs_upy) ** 2).mean(-1)
    if use_latitude and obs_lat is not None:
        sinlat = pf.sinlat_planes(cam, grav, u, v)
        cost = cost + ((sinlat - jnp.sin(obs_lat)) ** 2).mean(-1)
    return cost


def run_gradient_descent(data: Dict[str, Array], cfg: GDConfig = GDConfig()) -> GDResult:
    """Adam-optimize (roll, pitch, vfov) against the observed fields."""
    up = data["up_field"]
    B, h, w = up.shape[:3]
    up_flat = up.reshape(B, -1, 2)
    obs_lat = (
        data["latitude_field"].reshape(B, -1)
        if cfg.use_latitude and "latitude_field" in data
        else None
    )
    planes = (up_flat[..., 0], up_flat[..., 1], obs_lat, B)

    params0 = jnp.stack(
        [jnp.zeros((B,)), jnp.zeros((B,)), jnp.full((B,), 1.0)], axis=-1
    )
    opt = optax.adam(1.0)  # unit lr; scaled per-lane below
    opt_state = opt.init(params0)

    grad_fn = jax.value_and_grad(
        lambda p: _cost(p, planes, h, w, cfg.use_latitude).sum(), has_aux=False
    )

    def body(state, _):
        params, opt_state, lr, best, since = state
        total, grads = grad_fn(params)
        cost_lanes = _cost(params, planes, h, w, cfg.use_latitude)
        updates, opt_state = opt.update(grads, opt_state)
        params = params + lr[:, None] * updates  # per-lane lr scale

        improved = cost_lanes < best - 1e-8
        since = jnp.where(improved, 0, since + 1)
        best = jnp.minimum(best, cost_lanes)
        plateau = since >= cfg.plateau_patience
        lr = jnp.where(plateau, lr * cfg.plateau_factor, lr)
        since = jnp.where(plateau, 0, since)
        return (params, opt_state, lr, best, since), cost_lanes

    state0 = (
        params0,
        opt_state,
        jnp.full((B,), cfg.lr),
        jnp.full((B,), jnp.inf),
        jnp.zeros((B,), jnp.int32),
    )
    (params, _, _, _, _), costs = jax.lax.scan(
        body, state0, None, length=cfg.num_steps
    )

    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(h)),
            "width": jnp.full((B,), float(w)),
            "vfov": jnp.clip(params[:, 2], jnp.radians(5.0), jnp.radians(170.0)),
        }
    )
    return GDResult(cam, Gravity.from_rp(params[:, 0], params[:, 1]), costs)
