"""Alternative solvers: RANSAC, gradient descent, heuristic LM init."""

import jax
import jax.numpy as jnp
import numpy as np

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.perspective_fields import get_perspective_field
from geocalib_tpu.optim import (
    GDConfig,
    LMConfig,
    RansacConfig,
    run_gradient_descent,
    run_lm,
    run_ransac,
)

H, W = 64, 64


def make_data(B=2, seed=0):
    rng = np.random.default_rng(seed)
    vfov = jnp.asarray(rng.uniform(0.7, 1.3, (B,)), jnp.float32)
    roll = jnp.asarray(rng.uniform(-0.5, 0.5, (B,)), jnp.float32)
    pitch = jnp.asarray(rng.uniform(-0.5, 0.5, (B,)), jnp.float32)
    cam = Camera.from_dict(
        {"height": jnp.full((B,), float(H)), "width": jnp.full((B,), float(W)),
         "vfov": vfov}
    )
    grav = Gravity.from_rp(roll, pitch)
    up, lat = get_perspective_field(cam, grav, H, W)
    return {"up_field": up, "latitude_field": lat}, (roll, pitch, vfov)


def test_ransac_recovers_gt():
    data, (roll, pitch, vfov) = make_data(seed=1)
    cfg = RansacConfig(n_iter=500, chunk=50, scoring_stride=2)
    res = jax.jit(lambda d: run_ransac(d, cfg, jax.random.PRNGKey(0)))(data)
    np.testing.assert_allclose(res.gravity.roll, roll, atol=0.05)
    np.testing.assert_allclose(res.gravity.pitch, pitch, atol=0.05)
    np.testing.assert_allclose(res.camera.vfov, vfov, atol=0.15)


def test_ransac_with_focal_prior():
    data, (roll, pitch, vfov) = make_data(seed=2)
    f = H / 2.0 / jnp.tan(vfov / 2.0)
    data["prior_focal"] = f
    cfg = RansacConfig(n_iter=300, chunk=50, scoring_stride=2)
    res = jax.jit(lambda d: run_ransac(d, cfg, jax.random.PRNGKey(1)))(data)
    np.testing.assert_allclose(res.camera.f[:, 1], f, rtol=1e-5)
    np.testing.assert_allclose(res.gravity.roll, roll, atol=0.05)


def test_gradient_descent_reduces_cost():
    data, (roll, pitch, vfov) = make_data(seed=3)
    res = jax.jit(lambda d: run_gradient_descent(d, GDConfig(num_steps=150)))(data)
    costs = np.asarray(res.costs)
    assert np.all(costs[-1] < 0.3 * costs[0]), (costs[0], costs[-1])
    np.testing.assert_allclose(res.gravity.roll, roll, atol=0.1)
    np.testing.assert_allclose(res.gravity.pitch, pitch, atol=0.1)


def test_lm_heuristic_init():
    data, (roll, pitch, vfov) = make_data(seed=4)
    cfg = LMConfig(init_mode="heuristic", num_steps=10)
    res = jax.jit(lambda d: run_lm(d, cfg))(data)
    np.testing.assert_allclose(res.gravity.roll, roll, atol=2e-3)
    np.testing.assert_allclose(res.camera.vfov, vfov, atol=5e-3)
    # heuristic init must start closer than trivial for tilted cameras
    assert np.all(np.asarray(res.info["initial_cost"]) >= 0)


def test_vp_line_detection_cv2_fallback():
    # the UVP baseline's line detector must work without pytlsd/deeplsd:
    # cv2's built-in LSD (a reference dependency) backs the "lsd" mode
    import numpy as np

    from geocalib_tpu.models.baselines import VPEstimator

    det = VPEstimator.__new__(VPEstimator)  # skip the solver-package gate
    det.line_type = "lsd"
    img = np.zeros((120, 160), np.uint8)
    img[40:42, :] = 255
    img[:, 80:82] = 255
    lines = det._detect_lines(img)
    assert lines.ndim == 3 and lines.shape[1:] == (2, 2)
    assert len(lines) >= 2 and np.isfinite(lines).all()
