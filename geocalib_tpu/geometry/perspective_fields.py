"""Perspective fields (up vectors + latitudes) and their analytic Jacobians.

Forward parity: /root/reference/geocalib/perspective_fields.py
(get_up_field :47-81, get_latitude_field :185-211, get_perspective_field
:278-320). Jacobian parity: J_up_field :84-182, J_latitude_field :214-275,
J_perspective_field :323-365 — validated against jax.jacfwd of the forward in
tests/test_perspective_jacobians.py.

TPU-first conventions:
- Fields are channel-LAST grids (B, h, w, C); (h, w) are static Python ints
  so everything traces to fixed shapes.
- Jacobians are returned flattened over pixels, (B, N, C, P) with
  P = 2 (gravity tangent) + 1 (focal) + num_k (distortion), ready to feed the
  batched normal-equation matmuls on the MXU without reshuffling.
- No Python loops over the batch; everything broadcasts.
"""

from typing import Tuple

import jax.numpy as jnp

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.jacobians import J_up_projection, J_vecnorm
from geocalib_tpu.geometry.manifolds import SphericalManifold


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # clamp INSIDE the sqrt: jnp.linalg.norm has a NaN vjp at v == 0, and
    # the projected up vector is exactly 0 at the principal point when the
    # camera looks straight along gravity — training differentiates through
    # this via the LM residuals (IFT/unroll), so the vjp must stay finite
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(sq, eps * eps))


def get_up_field_flat(
    camera: Camera, gravity: Gravity, h: int, w: int, normalize: bool = True
) -> jnp.ndarray:
    """Up-vector field flattened over pixels, shape (B, N, 2)."""
    xy = camera.pixel_coordinates(h, w)  # (N, 2)
    uv = camera.normalize(xy)  # (B, N, 2)

    abc = gravity.vec3d  # (B, 3)
    projected = abc[..., None, :2] - abc[..., 2, None, None] * uv  # (B, N, 2)

    if camera.has_distortion:
        d_uv = camera.distort_scale(uv)  # (B, N, 1)
        offset = camera.up_projection_offset(uv)  # (B, N, 2)
        # (d I + o uvᵀ) @ projected, expanded elementwise (no (N,2,2) matrices)
        inner = jnp.sum(uv * projected, axis=-1, keepdims=True)  # (B, N, 1)
        projected = d_uv * projected + offset * inner

    return _normalize(projected) if normalize else projected


def get_up_field(
    camera: Camera, gravity: Gravity, h: int, w: int, normalize: bool = True
) -> jnp.ndarray:
    """Up-vector field as a grid, shape (B, h, w, 2)."""
    flat = get_up_field_flat(camera, gravity, h, w, normalize)
    return flat.reshape(flat.shape[:-2] + (h, w, 2))


def get_latitude_field_flat(
    camera: Camera, gravity: Gravity, h: int, w: int
) -> jnp.ndarray:
    """Latitude field (radians) flattened over pixels, shape (B, N, 1)."""
    xy = camera.pixel_coordinates(h, w)
    uv1, _ = camera.image2world(xy)  # (B, N, 3)
    rays = camera.pixel_bearing_many(uv1)
    lat = jnp.einsum("...Nj,...j->...N", rays, gravity.vec3d)
    eps = 1e-6
    return jnp.arcsin(jnp.clip(lat, -1 + eps, 1 - eps))[..., None]


def get_latitude_field(camera: Camera, gravity: Gravity, h: int, w: int) -> jnp.ndarray:
    """Latitude field (radians) as a grid, shape (B, h, w, 1)."""
    flat = get_latitude_field_flat(camera, gravity, h, w)
    return flat.reshape(flat.shape[:-2] + (h, w, 1))


def get_perspective_field(
    camera: Camera, gravity: Gravity, h: int, w: int,
    use_up: bool = True, use_latitude: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up (B, h, w, 2) and latitude (B, h, w, 1) fields (channel-last)."""
    assert use_up or use_latitude
    B = camera.batch_shape[0] if camera.batch_shape else 1
    up = (
        get_up_field(camera, gravity, h, w)
        if use_up else jnp.zeros((B, h, w, 2), jnp.float32)
    )
    lat = (
        get_latitude_field(camera, gravity, h, w)
        if use_latitude else jnp.zeros((B, h, w, 1), jnp.float32)
    )
    return up, lat


def get_horizon_line(
    camera: Camera, gravity: Gravity, relative: bool = True
) -> jnp.ndarray:
    """Left/right border intersections of the horizon, (B, 2).

    Parity: perspective_fields.py:18-44.
    """
    midpoint3 = jnp.einsum(
        "...ij,...j->...i",
        camera.K @ gravity.R,
        jnp.array([0.0, 0.0, 1.0], jnp.float32),
    )
    midpoint = midpoint3[..., :2] / midpoint3[..., 2:3]

    left_offset = midpoint[..., 0] * jnp.tan(gravity.roll)
    right_offset = (camera.size[..., 0] - midpoint[..., 0]) * jnp.tan(gravity.roll)
    left = midpoint[..., 1] + left_offset
    right = midpoint[..., 1] - right_offset
    horizon = jnp.stack([left, right], axis=-1)
    return horizon / camera.size[..., 1:2] if relative else horizon


# ---------------------------------------------------------------------- #
# analytic Jacobians wrt [gravity tangent (2), focal (1), dist (num_k)]
# ---------------------------------------------------------------------- #


def J_up_field(
    camera: Camera, gravity: Gravity, h: int, w: int,
    spherical: bool = False, log_focal: bool = False,
) -> jnp.ndarray:
    """Jacobian of the normalized up field, shape (B, N, 2, 3 + num_k)."""
    xy = camera.pixel_coordinates(h, w)
    uv = camera.normalize(xy)  # (B, N, 2)
    abc = gravity.vec3d

    projected = abc[..., None, :2] - abc[..., 2, None, None] * uv  # pre-distortion

    # d(normalize)/d(raw projected up)
    raw_up = get_up_field_flat(camera, gravity, h, w, normalize=False)
    J_norm2proj = J_vecnorm(raw_up)  # (B, N, 2, 2)

    has_dist = camera.has_distortion
    if has_dist:
        d_uv = camera.distort_scale(uv)  # (B, N, 1)
        offset = camera.up_projection_offset(uv)  # (B, N, 2)
        # D = d I + o uvᵀ as an operator applied to (..., N, 2, X) chains
        offset_uvT = jnp.einsum("...i,...j->...ij", offset, uv)  # (B, N, 2, 2)
        D = d_uv[..., None] * jnp.eye(2, dtype=uv.dtype) + offset_uvT

    blocks = []

    # -- gravity block ------------------------------------------------- #
    J_proj2abc = J_up_projection(uv, abc, wrt="abc")  # (B, N, 2, 3)
    if has_dist:
        J_proj2abc = jnp.einsum("...Nij,...Njk->...Nik", D, J_proj2abc)
    J_abc2delta = SphericalManifold.J_plus(abc) if spherical else gravity.J_rp()
    J_proj2delta = jnp.einsum("...Nij,...jk->...Nik", J_proj2abc, J_abc2delta)
    blocks.append(jnp.einsum("...Nij,...Njk->...Nik", J_norm2proj, J_proj2delta))

    # -- focal block ---------------------------------------------------- #
    J_proj2uv = J_up_projection(uv, abc, wrt="uv")  # (B, N, 2, 2) = -c I
    if has_dist:
        J_proj2up = jnp.einsum("...Nij,...Njk->...Nik", D, J_proj2uv)
        inner = jnp.sum(uv * projected, axis=-1)[..., None, None]  # (B, N, 1, 1)
        J_proj2uv = (
            jnp.einsum("...i,...j->...ji", offset, projected)  # (dd/duv) ⊗ p
            + inner * camera.J_up_projection_offset(uv, wrt="uv")  # (do/duv)(uv·p)
            + jnp.einsum("...i,...j->...ij", offset, projected)  # o ⊗ p
            + J_proj2up
        )

    J_uv2f = camera.J_normalize(xy, wrt="f")  # (B, N, 2, 2) diag
    if log_focal:
        J_uv2f = J_uv2f * camera.f[..., None, None, :]
    J_uv2f = J_uv2f.sum(-1)  # (B, N, 2)

    J_proj2f = jnp.einsum("...ij,...j->...i", J_proj2uv, J_uv2f)
    J_up2f = jnp.einsum("...Nij,...Nj->...Ni", J_norm2proj, J_proj2f)[..., None]
    blocks.append(J_up2f)

    # -- distortion block ------------------------------------------------ #
    if has_dist:
        J_duv = camera.J_distort(uv, wrt="scale2dist")  # (B, N, K): ds/dk
        J_first2dist = jnp.einsum("...n,...k->...nk", projected, J_duv)
        # (do/dk)·(uv·p): offset is radial (o = φ uv) so uv ⊗ p contracted with
        # J_offset_k matches the direct form (see reference :175-177).
        uv_projT = jnp.einsum("...i,...j->...ij", uv, projected)
        J_offset_k = camera.J_up_projection_offset(uv, wrt="dist")  # (B, N, 2, K)
        J_sec2dist = jnp.einsum("...nj,...jk->...nk", uv_projT, J_offset_k)
        J_k = jnp.einsum("...ij,...jk->...ik", J_norm2proj, J_first2dist + J_sec2dist)
        blocks.append(J_k)

    return jnp.concatenate(blocks, axis=-1)  # (B, N, 2, 3 + K)


def J_latitude_field(
    camera: Camera, gravity: Gravity, h: int, w: int,
    spherical: bool = False, log_focal: bool = False,
) -> jnp.ndarray:
    """Jacobian of sin(latitude) wrt parameters, shape (B, N, 1, 3 + num_k).

    Note: like the reference (J_latitude_field :214-275 is used against
    sin-latitude residuals), this is the Jacobian of rays·g, not of asin(·).
    """
    xy = camera.pixel_coordinates(h, w)
    uv1, _ = camera.image2world(xy)  # (B, N, 3)
    uv1_norm = camera.pixel_bearing_many(uv1)

    J_norm2w = J_vecnorm(uv1)[..., :2]  # (B, N, 3, 2)

    blocks = []

    # gravity
    J_delta = SphericalManifold.J_plus(gravity.vec3d) if spherical else gravity.J_rp()
    blocks.append(jnp.einsum("...Ni,...ij->...Nj", uv1_norm, J_delta))  # (B, N, 2)

    # focal
    J_w2f = camera.J_image2world(xy, "f")  # (B, N, 2, 2)
    if log_focal:
        J_w2f = J_w2f * camera.f[..., None, None, :]
    J_w2f = J_w2f.sum(-1)  # (B, N, 2)
    J_norm2f = jnp.einsum("...Nij,...Nj->...Ni", J_norm2w, J_w2f)  # (B, N, 3)
    blocks.append(
        jnp.einsum("...Ni,...i->...N", J_norm2f, gravity.vec3d)[..., None]
    )  # (B, N, 1)

    # distortion
    if camera.has_distortion:
        J_w2dist = camera.J_image2world(xy, "dist")  # (B, N, 2, K)
        J_norm2dist = jnp.einsum("...Nij,...Njk->...Nik", J_norm2w, J_w2dist)
        blocks.append(
            jnp.einsum("...Nij,...i->...Nj", J_norm2dist, gravity.vec3d)
        )  # (B, N, K)

    return jnp.concatenate(blocks, axis=-1)[..., None, :]  # (B, N, 1, 3 + K)


def J_perspective_field(
    camera: Camera, gravity: Gravity, h: int, w: int,
    spherical: bool = False, log_focal: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up and latitude Jacobians, (B, N, 2, P) and (B, N, 1, P)."""
    J_up = J_up_field(camera, gravity, h, w, spherical, log_focal)
    J_lat = J_latitude_field(camera, gravity, h, w, spherical, log_focal)
    return J_up, J_lat
