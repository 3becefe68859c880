"""Planar (pixel-last) field math vs the vector reference implementation.

The planar path is the TPU hot path; the vector path is validated against
jax.jacfwd in test_jacobians.py — agreement here closes the loop.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.geometry import planar_fields as pf
from geocalib_tpu.geometry.camera import NUM_DIST_PARAMS, Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.perspective_fields import (
    J_perspective_field,
    get_latitude_field_flat,
    get_up_field_flat,
)

H, W = 7, 9
MODELS = ["pinhole", "simple_radial", "radial", "simple_divisional"]
K1 = {"pinhole": 0.0, "simple_radial": -0.2, "radial": -0.15, "simple_divisional": -0.3}
K2 = {"pinhole": 0.0, "simple_radial": 0.0, "radial": 0.05, "simple_divisional": 0.0}


def make_cam_grav(model, B=3, seed=0):
    rng = np.random.default_rng(seed)
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(H)),
            "width": jnp.full((B,), float(W)),
            "vfov": jnp.asarray(rng.uniform(0.7, 1.3, (B,)), jnp.float32),
            "k1": jnp.full((B,), K1[model]),
            "k2": jnp.full((B,), K2[model]),
        },
        model=model,
    )
    grav = Gravity.from_rp(
        jnp.asarray(rng.uniform(-0.6, 0.6, (B,)), jnp.float32),
        jnp.asarray(rng.uniform(-0.6, 0.6, (B,)), jnp.float32),
    )
    return cam, grav


@pytest.mark.parametrize("model", MODELS)
def test_planar_forward_matches_vector(model):
    cam, grav = make_cam_grav(model)
    u, v = pf.make_grid(cam, H, W)

    upx, upy = pf.up_planes(cam, grav, u, v)
    up_vec = get_up_field_flat(cam, grav, H, W)  # (B, N, 2)
    np.testing.assert_allclose(upx, up_vec[..., 0], atol=1e-6)
    np.testing.assert_allclose(upy, up_vec[..., 1], atol=1e-6)

    sinlat = pf.sinlat_planes(cam, grav, u, v)
    lat_vec = get_latitude_field_flat(cam, grav, H, W)[..., 0]
    np.testing.assert_allclose(sinlat, jnp.sin(lat_vec), atol=1e-6)


@pytest.mark.parametrize("model", MODELS)
@pytest.mark.parametrize("spherical", [False, True])
@pytest.mark.parametrize("log_focal", [False, True])
def test_planar_jacobians_match_vector(model, spherical, log_focal):
    cam, grav = make_cam_grav(model, seed=1)
    u, v = pf.make_grid(cam, H, W)
    P = 3 + NUM_DIST_PARAMS[model]

    J_up_vec, J_lat_vec = J_perspective_field(cam, grav, H, W, spherical, log_focal)

    J_up = pf.J_up_planes(cam, grav, u, v, spherical, log_focal)
    assert len(J_up) == 2 and len(J_up[0]) == P
    for c in range(2):
        for p in range(P):
            np.testing.assert_allclose(
                J_up[c][p], J_up_vec[..., c, p], atol=2e-5,
                err_msg=f"J_up[{c}][{p}]",
            )

    J_lat = pf.J_lat_planes(cam, grav, u, v, spherical, log_focal)
    assert len(J_lat) == P
    for p in range(P):
        np.testing.assert_allclose(
            J_lat[p], J_lat_vec[..., 0, p], atol=2e-5, err_msg=f"J_lat[{p}]"
        )
