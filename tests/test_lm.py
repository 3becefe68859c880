"""LM solver convergence on synthetic perspective fields.

TPU-native re-creation of the reference's TestLM contract
(/root/reference/siclib/geometry/gradient_checker.py:579-641): synthesize
*perfect* fields from a random GT (camera, gravity), run the solver from the
trivial init, and assert recovery — parametrized over camera models and both
gravity manifolds, plus prior/shared-intrinsics cases the reference never
covered with tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.perspective_fields import get_perspective_field
from geocalib_tpu.optim.lm import LMConfig, run_lm
from geocalib_tpu.optim import linalg

H, W = 40, 40


def make_gt(model, B=2, seed=0, k1=None):
    rng = np.random.default_rng(seed)
    vfov = jnp.asarray(rng.uniform(0.6, 1.4, (B,)), jnp.float32)
    roll = jnp.asarray(rng.uniform(-0.6, 0.6, (B,)), jnp.float32)
    pitch = jnp.asarray(rng.uniform(-0.6, 0.6, (B,)), jnp.float32)
    if k1 is None:
        k1 = jnp.asarray(rng.uniform(-0.2, 0.05, (B,)), jnp.float32)
    else:
        k1 = jnp.full((B,), k1, jnp.float32)
    if model == "pinhole":
        k1 = jnp.zeros((B,), jnp.float32)
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(H)),
            "width": jnp.full((B,), float(W)),
            "vfov": vfov,
            "k1": k1,
        },
        model=model,
    )
    grav = Gravity.from_rp(roll, pitch)
    return cam, grav


def synth_data(cam, grav):
    up, lat = get_perspective_field(cam, grav, H, W)
    return {"up_field": up, "latitude_field": lat}


@pytest.mark.parametrize("model", ["pinhole", "simple_radial", "radial", "simple_divisional"])
@pytest.mark.parametrize("spherical", [True, False])
def test_lm_recovers_gt(model, spherical):
    cam_gt, grav_gt = make_gt(model, B=2, seed=3)
    data = synth_data(cam_gt, grav_gt)
    cfg = LMConfig(camera_model=model, use_spherical_manifold=spherical, num_steps=30)
    res = jax.jit(lambda d: run_lm(d, cfg))(data)

    np.testing.assert_allclose(res.gravity.roll, grav_gt.roll, atol=2e-3)
    np.testing.assert_allclose(res.gravity.pitch, grav_gt.pitch, atol=2e-3)
    np.testing.assert_allclose(res.camera.vfov, cam_gt.vfov, atol=5e-3)
    if model != "pinhole":
        np.testing.assert_allclose(
            res.camera.k[..., 0], cam_gt.k[..., 0], atol=2e-2
        )
    # cost must have collapsed vs the trivial init
    assert np.all(np.asarray(res.info["final_cost"]) < np.asarray(res.info["initial_cost"]))


def test_lm_with_focal_prior():
    cam_gt, grav_gt = make_gt("pinhole", B=2, seed=5)
    data = synth_data(cam_gt, grav_gt)
    data["prior_focal"] = cam_gt.f[..., 1]
    cfg = LMConfig(camera_model="pinhole")
    res = jax.jit(lambda d: run_lm(d, cfg))(data)
    # focal must stay exactly at the prior; gravity must still be recovered
    np.testing.assert_allclose(res.camera.f[..., 1], cam_gt.f[..., 1], rtol=1e-6)
    np.testing.assert_allclose(res.gravity.roll, grav_gt.roll, atol=2e-3)
    np.testing.assert_allclose(res.gravity.pitch, grav_gt.pitch, atol=2e-3)
    assert np.all(np.asarray(res.info["focal_uncertainty"]) == 0.0)


def test_lm_with_gravity_prior():
    cam_gt, grav_gt = make_gt("pinhole", B=2, seed=7)
    data = synth_data(cam_gt, grav_gt)
    data["prior_gravity"] = grav_gt.vec3d
    cfg = LMConfig(camera_model="pinhole")
    res = jax.jit(lambda d: run_lm(d, cfg))(data)
    np.testing.assert_allclose(res.gravity.vec3d, grav_gt.vec3d, atol=1e-6)
    np.testing.assert_allclose(res.camera.vfov, cam_gt.vfov, atol=5e-3)


def test_lm_shared_intrinsics():
    # one camera, several gravities: shared solve must recover the common focal
    B = 4
    rng = np.random.default_rng(11)
    vfov = jnp.full((B,), 1.0, jnp.float32)
    cam_gt = Camera.from_dict(
        {"height": jnp.full((B,), float(H)), "width": jnp.full((B,), float(W)), "vfov": vfov}
    )
    grav_gt = Gravity.from_rp(
        jnp.asarray(rng.uniform(-0.5, 0.5, (B,)), jnp.float32),
        jnp.asarray(rng.uniform(-0.5, 0.5, (B,)), jnp.float32),
    )
    data = synth_data(cam_gt, grav_gt)
    cfg = LMConfig(camera_model="pinhole", shared_intrinsics=True)
    res = jax.jit(lambda d: run_lm(d, cfg))(data)
    f = np.asarray(res.camera.f[..., 1])
    np.testing.assert_allclose(f, f[0], rtol=1e-5)  # identical across the batch
    np.testing.assert_allclose(res.camera.vfov, cam_gt.vfov, atol=5e-3)
    np.testing.assert_allclose(res.gravity.roll, grav_gt.roll, atol=2e-3)


def test_lm_with_confidence_weights():
    # corrupt half the field, mask it out with zero confidence
    cam_gt, grav_gt = make_gt("pinhole", B=1, seed=13)
    up, lat = get_perspective_field(cam_gt, grav_gt, H, W)
    noise = jnp.zeros((1, H, W, 1)).at[:, : H // 2].set(1.0)
    up_bad = up + noise * 0.5
    conf = 1.0 - noise[..., 0]
    data = {
        "up_field": up_bad,
        "latitude_field": lat,
        "up_confidence": conf,
        "latitude_confidence": jnp.ones_like(conf),
    }
    res = jax.jit(lambda d: run_lm(d, LMConfig()))(data)
    np.testing.assert_allclose(res.camera.vfov, cam_gt.vfov, atol=2e-2)
    np.testing.assert_allclose(res.gravity.roll, grav_gt.roll, atol=1e-2)


def test_lm_is_differentiable():
    # gradients must flow from solver outputs back to the input fields
    cam_gt, grav_gt = make_gt("pinhole", B=1, seed=17)
    data = synth_data(cam_gt, grav_gt)
    cfg = LMConfig(num_steps=5, with_uncertainty=False, early_stop=False, loss_fn="squared")

    def loss(up):
        res = run_lm({"up_field": up, "latitude_field": data["latitude_field"]}, cfg)
        return jnp.sum(res.gravity.vec3d**2) + jnp.sum(res.camera.f)

    g = jax.grad(loss)(data["up_field"])
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_cholesky_solve_small_matches_numpy():
    rng = np.random.default_rng(19)
    for P in (3, 4, 5):
        A = rng.normal(size=(6, P, P)).astype(np.float32)
        Hm = A @ np.swapaxes(A, -1, -2) + 0.5 * np.eye(P, dtype=np.float32)
        g = rng.normal(size=(6, P)).astype(np.float32)
        x = linalg.cholesky_solve_small(jnp.asarray(Hm), jnp.asarray(g))
        x_np = np.linalg.solve(Hm, g[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), x_np, atol=1e-3)
        Inv = linalg.inv_small(jnp.asarray(Hm))
        np.testing.assert_allclose(np.asarray(Inv), np.linalg.inv(Hm), atol=1e-3)


def test_max_eig_2x2():
    rng = np.random.default_rng(23)
    A = rng.normal(size=(8, 2, 2)).astype(np.float32)
    M = A @ np.swapaxes(A, -1, -2)
    got = linalg.max_eig_2x2(jnp.asarray(M))
    want = np.linalg.eigvalsh(M)[..., -1]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
