"""Camera & gravity pytree basics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.utils.conversions import focal2fov, fov2focal, rad2rotmat


def test_from_dict_vfov():
    cam = Camera.from_dict({"height": 320.0, "width": 480.0, "vfov": 0.8})
    np.testing.assert_allclose(cam.vfov, 0.8, rtol=1e-6)
    np.testing.assert_allclose(cam.c, np.array([240.0, 160.0]), rtol=1e-6)


def test_from_data_padding():
    cam = Camera.from_data(jnp.array([[100.0, 80.0, 90.0, 90.0, 50.0, 40.0]]))
    assert cam.k.shape == (1, 2)
    np.testing.assert_allclose(cam.k, 0.0)


def test_distort_undistort_roundtrip():
    for model, k1 in [("simple_radial", -0.1), ("radial", -0.1), ("simple_divisional", -0.2)]:
        cam = Camera.from_dict(
            {"height": 100.0, "width": 100.0, "vfov": 0.9, "k1": k1}, model=model
        )
        cam = jax.tree.map(lambda x: x[None], cam)  # add batch dim
        uv = jnp.asarray(np.random.default_rng(0).uniform(-0.2, 0.2, (1, 16, 2)), jnp.float32)
        d, _ = cam.distort(uv)
        u, _ = cam.undistort(d)
        # approximate inverses: accurate for small radii
        np.testing.assert_allclose(u, uv, atol=2e-3)


def test_update_focal_log_and_clamp():
    cam = Camera.from_dict({"height": jnp.array([100.0]), "width": jnp.array([100.0]),
                            "vfov": jnp.array([0.9])})
    f0 = cam.f[0, 1]
    cam2 = cam.update_focal(jnp.array([0.1]), as_log=True)
    # rtol 1e-4: float32 exp(log(f) + d) round-trip carries ~1e-5 relative error
    np.testing.assert_allclose(cam2.f[0, 1], f0 * np.exp(0.1), rtol=1e-4)
    # huge positive delta clamps at FoV = 5 deg
    cam3 = cam.update_focal(jnp.array([100.0]), as_log=True)
    np.testing.assert_allclose(np.degrees(float(cam3.vfov[0])), 5.0, rtol=1e-4)
    # huge negative delta clamps at FoV = 150 deg
    cam4 = cam.update_focal(jnp.array([-100.0]), as_log=True)
    np.testing.assert_allclose(np.degrees(float(cam4.vfov[0])), 150.0, rtol=1e-4)


def test_scale_crop_undo():
    cam = Camera.from_dict({"height": jnp.array([240.0]), "width": jnp.array([320.0]),
                            "vfov": jnp.array([0.9])})
    scales = jnp.array([0.5, 0.5])
    crop_pad = jnp.array([-4.0, -2.0])
    cam2 = cam.scale(scales).crop(crop_pad)
    cam3 = cam2.undo_scale_crop({"scales": scales, "crop_pad": crop_pad})
    np.testing.assert_allclose(cam3.data, cam.data, rtol=1e-5, atol=1e-5)


def test_world2image_image2world_roundtrip():
    cam = Camera.from_dict(
        {"height": jnp.array([100.0]), "width": jnp.array([100.0]), "vfov": jnp.array([0.9]),
         "k1": jnp.array([-0.05])}, model="simple_radial")
    xy = cam.pixel_coordinates(10, 10)[None] * 10.0  # spread across image
    xy = jnp.clip(xy, 0, 99)
    p3d, _ = cam.image2world(xy)
    xy2, _ = cam.world2image(p3d)
    np.testing.assert_allclose(xy2, xy, atol=0.5)


def test_gravity_rp_roundtrip():
    rolls = jnp.array([0.0, 0.4, -0.7, 1.2])
    pitches = jnp.array([0.0, -0.3, 0.5, -1.0])
    g = Gravity.from_rp(rolls, pitches)
    np.testing.assert_allclose(g.roll, rolls, atol=1e-3)
    np.testing.assert_allclose(g.pitch, pitches, atol=1e-3)
    np.testing.assert_allclose(jnp.linalg.norm(g.vec3d, axis=-1), 1.0, atol=1e-6)


def test_gravity_R_orthonormal():
    g = Gravity.from_rp(jnp.array([0.3]), jnp.array([-0.2]))
    R = g.R
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), jnp.eye(3)[None], atol=1e-6)


def test_fov_focal_roundtrip():
    fov = jnp.array([0.3, 0.9, 1.8])
    size = jnp.array([320.0, 320.0, 320.0])
    np.testing.assert_allclose(focal2fov(fov2focal(fov, size), size), fov, rtol=1e-6)


def test_camera_is_pytree():
    cam = Camera.from_dict({"height": 100.0, "width": 100.0, "vfov": 0.9}, model="radial")
    leaves = jax.tree.leaves(cam)
    assert len(leaves) == 4
    cam2 = jax.tree.map(lambda x: x * 2, cam)
    assert cam2.model == "radial"


def test_rad2rotmat_yaw():
    R = rad2rotmat(jnp.array(0.0), jnp.array(0.0), jnp.array(0.5))
    np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-6)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-6)
