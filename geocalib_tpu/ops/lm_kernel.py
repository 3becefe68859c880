"""Fused LM normal-equation Pallas kernel (the solver's only O(N) stage).

One pass over the pixel planes computes, per tile held in VMEM: the
perspective-field forward, residuals against the network fields, robust
(huber/...) IRLS weights x confidences, all P Jacobian planes, and the
normal-equation accumulation

    G += sum_n w * J * r          (B, P)
    H += sum_n w * J * J^T        (B, P, P)
    cost += sum_n rho(r) * conf   (B,)

without ever materializing the (B, P, N) Jacobian planes in HBM. The XLA
fallback (optim/lm.py build_system) writes/reads those planes each
iteration; this kernel reads only the five observation planes per step.

The per-tile math *is* geometry/planar_fields called on (B, T) tiles inside
the kernel, so kernel and fallback agree to float precision by construction.
The backward pass is a jax.custom_vjp that differentiates the identical
planar math (pure XLA), which keeps the solver trainable end-to-end
(the reference trains through 10 unrolled LM steps).

Reference for what is being fused: geocalib/lm_optimizer.py:248-385
(calculate_residuals / calculate_costs / setup_system einsums).
"""

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geocalib_tpu.geometry import planar_fields as pf
from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.optim.losses import get_loss_fn, scaled_loss

Array = jnp.ndarray

OBS_KEYS = ("up_x", "up_y", "lat_sin", "up_conf", "lat_conf")


def pallas_tile(n: int, max_tile: int = 1024) -> Optional[int]:
    """Largest power-of-two tile <= max_tile dividing n (None: no fit)."""
    t = max_tile
    while t >= 128:
        if n % t == 0:
            return t
        t //= 2
    return None


def _tile_system(
    u: Array,
    v: Array,
    obs: Dict[str, Array],
    camera: Camera,
    gravity: Gravity,
    M: Array,
    cfg,
    with_system: bool,
) -> Tuple[Array, Array, Array]:
    """The fused math on (B, T) planes: (G_tile, H_tile, cost_tile_sum)."""
    loss_fn = get_loss_fn(cfg.loss_fn)
    mask = cfg.param_mask  # static python floats
    P = cfg.num_params
    B = u.shape[0]

    channels = []  # (residual, weight, J_cols)
    cost = jnp.zeros((B,), jnp.float32)
    if "up_x" in obs:
        pred_x, pred_y = pf.up_planes(camera, gravity, u, v)
        r_up = (obs["up_x"] - pred_x, obs["up_y"] - pred_y)
        up_sq = r_up[0] ** 2 + r_up[1] ** 2
        c, w_up, _ = scaled_loss(up_sq, loss_fn, cfg.up_loss_fn_scale)
        if "up_conf" in obs:
            c = c * obs["up_conf"]
            w_up = w_up * obs["up_conf"]
        cost = cost + jnp.sum(c, axis=-1)
        if with_system:
            J_up = pf.J_up_planes(
                camera, gravity, u, v, cfg.use_spherical_manifold, cfg.use_log_focal, M
            )
            channels += [(r_up[0], w_up, J_up[0]), (r_up[1], w_up, J_up[1])]
    if "lat_sin" in obs:
        r_lat = obs["lat_sin"] - pf.sinlat_planes(camera, gravity, u, v)
        c, w_lat, _ = scaled_loss(r_lat**2, loss_fn, cfg.lat_loss_fn_scale)
        if "lat_conf" in obs:
            c = c * obs["lat_conf"]
            w_lat = w_lat * obs["lat_conf"]
        cost = cost + jnp.sum(c, axis=-1)
        if with_system:
            J_lat = pf.J_lat_planes(
                camera, gravity, u, v, cfg.use_spherical_manifold, cfg.use_log_focal, M
            )
            channels.append((r_lat, w_lat, J_lat))

    if not with_system:
        zero = jnp.zeros((B, P), jnp.float32)
        return zero, jnp.zeros((B, P * P), jnp.float32), cost

    G_rows = [jnp.zeros((B,), jnp.float32)] * P
    H_rows = [[jnp.zeros((B,), jnp.float32)] * P for _ in range(P)]
    for r, wts, J in channels:
        Jm = [J[p] * mask[p] for p in range(P)]
        wr = r * wts
        for p in range(P):
            G_rows[p] = G_rows[p] + jnp.sum(Jm[p] * wr, axis=-1)
            Jw = Jm[p] * wts
            for q in range(p, P):
                H_rows[p][q] = H_rows[p][q] + jnp.sum(Jw * Jm[q], axis=-1)
    for p in range(P):
        for q in range(p):
            H_rows[p][q] = H_rows[q][p]
    G = jnp.stack(G_rows, axis=-1)  # (B, P)
    # H stays rank-2 (B, P*P) inside the kernel: Mosaic's layout inference
    # rejects rank-changing vector reshapes/stacks on small arrays.
    H = jnp.stack([H_rows[p][q] for p in range(P) for q in range(P)], axis=-1)
    return G, H, cost


def _grid_rows(h: int, w: int) -> Tuple[Array, Array]:
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    return jnp.tile(x, h)[None, :], jnp.repeat(y, w)[None, :]  # (1, N) each


def _make_kernel(cfg, obs_keys: Tuple[str, ...], model: str, with_system: bool):
    def kernel(xx_ref, yy_ref, cam_ref, grav_ref, M_ref, *refs):
        obs_refs = refs[: len(obs_keys)]
        out_refs = refs[len(obs_keys) :]
        j = pl.program_id(0)

        cam = Camera.from_data(cam_ref[:], model=model)
        gravity = Gravity(vec3d=grav_ref[:])
        # manifold matrix as (B, 1) plane slices — a (B,6)->(B,3,2) reshape
        # is a rank-changing vector shape cast Mosaic cannot lay out.
        M6 = M_ref[:]
        M = [[M6[:, (2 * k + d) : (2 * k + d) + 1] for d in range(2)] for k in range(3)]

        fx, fy = cam.f[:, 0:1], cam.f[:, 1:2]
        cx, cy = cam.c[:, 0:1], cam.c[:, 1:2]
        u = (xx_ref[0, :][None, :] - cx) / fx  # (B, T)
        v = (yy_ref[0, :][None, :] - cy) / fy

        obs = {k: r[:] for k, r in zip(obs_keys, obs_refs)}
        G, H, cost = _tile_system(u, v, obs, cam, gravity, M, cfg, with_system)

        @pl.when(j == 0)
        def _():
            for ref in out_refs:
                ref[:] = jnp.zeros_like(ref)

        if with_system:
            out_refs[0][:] += G
            out_refs[1][:] += H
            out_refs[2][:] += cost[:, None]
        else:
            out_refs[0][:] += cost[:, None]

    return kernel


def _forward_pallas(data, camera, gravity, h, w, cfg, with_system, interpret):
    obs_keys = tuple(k for k in OBS_KEYS if k in data)
    B, N = data[obs_keys[0]].shape
    T = pallas_tile(N)
    assert T is not None, f"N={N} has no pallas tile; use the XLA fallback"
    P = cfg.num_params

    xx, yy = _grid_rows(h, w)
    M = pf.manifold_matrix(gravity, cfg.use_spherical_manifold)  # (B, 3, 2)

    plane = pl.BlockSpec((B, T), lambda j: (0, j), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, T), lambda j: (0, j), memory_space=pltpu.VMEM)
    full = lambda *s: pl.BlockSpec(s, lambda j: (0,) * len(s), memory_space=pltpu.VMEM)

    in_specs = [row, row, full(B, 8), full(B, 3), full(B, 6)]
    in_specs += [plane] * len(obs_keys)
    inputs = [xx, yy, camera.data, gravity.vec3d, M.reshape(B, 6)]
    inputs += [data[k] for k in obs_keys]

    if with_system:
        out_shape = (
            jax.ShapeDtypeStruct((B, P), jnp.float32),
            jax.ShapeDtypeStruct((B, P * P), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        )
        out_specs = (full(B, P), full(B, P * P), full(B, 1))
    else:
        out_shape = (jax.ShapeDtypeStruct((B, 1), jnp.float32),)
        out_specs = (full(B, 1),)

    outs = pl.pallas_call(
        _make_kernel(cfg, obs_keys, camera.model, with_system),
        grid=(N // T,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)

    if with_system:
        G, H, cost = outs
        return G, H.reshape(B, P, P), cost[:, 0] / N
    zero = jnp.zeros((B, P), jnp.float32)
    return zero, jnp.zeros((B, P, P), jnp.float32), outs[0][:, 0] / N


def _forward_planar(data, camera, gravity, h, w, cfg, with_system):
    """Pure-XLA twin of the kernel on full (B, N) planes (backward path)."""
    u, v = pf.make_grid(camera, h, w)
    M = pf.manifold_matrix(gravity, cfg.use_spherical_manifold)
    G, H, cost = _tile_system(u, v, data, camera, gravity, M, cfg, with_system)
    N = u.shape[-1]
    P = cfg.num_params
    return G, H.reshape(H.shape[0], P, P), cost / N


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def lm_system_pallas(data, camera, gravity, h, w, cfg, with_system=True, interpret=False):
    """Fused G (B,P) / H (B,P,P) / mean cost (B,) over the full pixel grid.

    data: planar observations — any of "up_x", "up_y", "lat_sin", "up_conf",
    "lat_conf", each (B, N = h*w) float32. Forward runs the Pallas kernel;
    the VJP differentiates the identical planar XLA math, so the solver
    remains trainable. with_system=False returns zero G/H and only the cost.
    """
    return _forward_pallas(data, camera, gravity, h, w, cfg, with_system, interpret)


def _fwd(data, camera, gravity, h, w, cfg, with_system, interpret):
    out = _forward_pallas(data, camera, gravity, h, w, cfg, with_system, interpret)
    return out, (data, camera, gravity)


def _bwd(h, w, cfg, with_system, interpret, res, ct):
    data, camera, gravity = res
    _, vjp = jax.vjp(
        lambda d, c, g: _forward_planar(d, c, g, h, w, cfg, with_system),
        data,
        camera,
        gravity,
    )
    return vjp(ct)


lm_system_pallas.defvjp(_fwd, _bwd)
