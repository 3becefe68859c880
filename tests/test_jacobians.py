"""Analytic-Jacobian gradient checker.

TPU-native re-creation of the reference's de-facto unit-test suite
(/root/reference/siclib/geometry/gradient_checker.py): every hand-derived
Jacobian is validated against jax.jacfwd of the corresponding forward, for
all camera models, both manifolds, and boundary poses — here parametrized
with pytest instead of the reference's edit-a-constant approach.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.geometry.camera import NUM_DIST_PARAMS, Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.jacobians import J_up_projection, J_vecnorm
from geocalib_tpu.geometry.manifolds import SphericalManifold
from geocalib_tpu.geometry.perspective_fields import (
    J_perspective_field,
    get_latitude_field_flat,
    get_up_field_flat,
)

ATOL = 5e-3  # reference tolerance (gradient_checker.py uses atol=5e-3 in f32)

H, W = 8, 10
MODELS = ["pinhole", "simple_radial", "radial", "simple_divisional"]
K1 = {"pinhole": 0.0, "simple_radial": -0.2, "radial": -0.15, "simple_divisional": -0.3}
K2 = {"pinhole": 0.0, "simple_radial": 0.0, "radial": 0.05, "simple_divisional": 0.0}
POSES = [(0.0, 0.0), (0.3, -0.25), (np.pi / 4, np.pi / 4), (-np.pi / 4, 0.1)]


def make_camera(model: str, B: int = 2) -> Camera:
    vfov = jnp.full((B,), 0.9)
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(H)),
            "width": jnp.full((B,), float(W)),
            "vfov": vfov,
            "k1": jnp.full((B,), K1[model]),
            "k2": jnp.full((B,), K2[model]),
        },
        model=model,
    )
    return cam


def make_gravity(roll: float, pitch: float, B: int = 2) -> Gravity:
    return Gravity.from_rp(jnp.full((B,), roll), jnp.full((B,), pitch))


def test_J_vecnorm():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    J = J_vecnorm(v)
    J_auto = jax.vmap(jax.jacfwd(lambda x: x / jnp.linalg.norm(x)))(v)
    np.testing.assert_allclose(J, J_auto, atol=1e-5)


def test_J_up_projection_abc():
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)
    abc = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    J = J_up_projection(uv[None], abc[None], wrt="abc")[0]
    f = lambda a: a[None, :2] - a[2] * uv
    J_auto = jax.jacfwd(f)(abc)
    np.testing.assert_allclose(J, J_auto, atol=1e-5)


def test_spherical_manifold_J_plus():
    rng = np.random.default_rng(2)
    for _ in range(5):
        x = rng.normal(size=(3,)).astype(np.float32)
        x = jnp.asarray(x / np.linalg.norm(x))
        J = SphericalManifold.J_plus(x)
        J_auto = jax.jacfwd(lambda d: SphericalManifold.plus(x, d))(jnp.zeros(2))
        np.testing.assert_allclose(J, J_auto, atol=1e-5)


@pytest.mark.parametrize("model", [m for m in MODELS if m != "pinhole"])
def test_distortion_jacobians(model):
    """Closed-form distortion Jacobians vs autodiff of the scale functions.

    pinhole is excluded at parametrize time (it has no distortion params) so
    the full-suite run reports 0 skips.
    """
    cam = make_camera(model, B=1)
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.uniform(-0.6, 0.6, size=(1, 6, 2)), jnp.float32)
    nk = NUM_DIST_PARAMS[model]

    # undistort wrt pts
    J = cam.J_undistort(uv, "pts")[0]
    f = lambda p: cam.undistort(p.reshape(1, 1, 2))[0].reshape(2)
    J_auto = jax.vmap(jax.jacfwd(f))(uv[0])
    np.testing.assert_allclose(J, J_auto, atol=1e-5)

    # undistort wrt dist
    J = cam.J_undistort(uv, "dist")[0][..., :nk]

    def f_dist(kk, p):
        cam2 = cam.replace(k=kk[None])
        return cam2.undistort(p.reshape(1, 1, 2))[0].reshape(2)

    J_auto = jax.vmap(lambda p: jax.jacfwd(f_dist)(cam.k[0], p))(uv[0])[..., :nk]
    np.testing.assert_allclose(J, J_auto, atol=1e-5)

    # offset = d scale / d uv
    off = cam.up_projection_offset(uv)[0]
    f_scale = lambda p: cam.distort_scale(p.reshape(1, 1, 2)).reshape(())
    off_auto = jax.vmap(jax.jacfwd(f_scale))(uv[0])
    np.testing.assert_allclose(off, off_auto, atol=1e-5)

    # d scale / d k
    J = cam.J_distort(uv, "scale2dist")[0][..., :nk]

    def f_scale_k(kk, p):
        cam2 = cam.replace(k=kk[None])
        return cam2.distort_scale(p.reshape(1, 1, 2)).reshape(())

    J_auto = jax.vmap(lambda p: jax.jacfwd(f_scale_k)(cam.k[0], p))(uv[0])[..., :nk]
    np.testing.assert_allclose(J, J_auto, atol=1e-5)

    # d offset / d uv
    J = cam.J_up_projection_offset(uv, "uv")[0]
    f_off = lambda p: cam.up_projection_offset(p.reshape(1, 1, 2)).reshape(2)
    J_auto = jax.vmap(jax.jacfwd(f_off))(uv[0])
    np.testing.assert_allclose(J, J_auto, atol=1e-4)

    # d offset / d k
    J = cam.J_up_projection_offset(uv, "dist")[0][..., :nk]

    def f_off_k(kk, p):
        cam2 = cam.replace(k=kk[None])
        return cam2.up_projection_offset(p.reshape(1, 1, 2)).reshape(2)

    J_auto = jax.vmap(lambda p: jax.jacfwd(f_off_k)(cam.k[0], p))(uv[0])[..., :nk]
    np.testing.assert_allclose(J, J_auto, atol=1e-4)


def _field_from_delta(cam, grav, delta, spherical):
    """Forward fields after a parameter update — the autodiff oracle."""
    nk = NUM_DIST_PARAMS[cam.model]
    grav2 = grav.update(delta[..., :2], spherical=spherical)
    cam2 = cam.update_focal(delta[..., 2:3], as_log=True)
    if nk:
        cam2 = cam2.update_dist(delta[..., 3 : 3 + nk])
    up = get_up_field_flat(cam2, grav2, H, W)  # (B, N, 2)
    lat = jnp.sin(get_latitude_field_flat(cam2, grav2, H, W))  # (B, N, 1)
    return up, lat


@pytest.mark.parametrize("model", MODELS)
@pytest.mark.parametrize("spherical", [False, True])
@pytest.mark.parametrize("pose", POSES)
def test_perspective_field_jacobians(model, spherical, pose):
    """Full J_perspective_field vs jacfwd of the complete forward."""
    B = 2
    cam = make_camera(model, B)
    grav = make_gravity(*pose, B=B)
    nk = NUM_DIST_PARAMS[model]
    P = 3 + nk

    J_up, J_lat = J_perspective_field(cam, grav, H, W, spherical=spherical, log_focal=True)
    assert J_up.shape == (B, H * W, 2, P)
    assert J_lat.shape == (B, H * W, 1, P)

    J_auto_up, J_auto_lat = jax.jacfwd(
        lambda d: _field_from_delta(cam, grav, d, spherical)
    )(jnp.zeros((B, P)))
    # jacfwd over (B, P) input gives (B, N, C, B, P); take the diagonal over B
    idx = jnp.arange(B)
    J_auto_up = J_auto_up[idx, :, :, idx, :]
    J_auto_lat = J_auto_lat[idx, :, :, idx, :]

    np.testing.assert_allclose(np.asarray(J_up), np.asarray(J_auto_up), atol=ATOL)
    np.testing.assert_allclose(np.asarray(J_lat), np.asarray(J_auto_lat), atol=ATOL)
