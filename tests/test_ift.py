"""IFT gradients at the LM fixed point vs reference-style unrolled backprop.

grad_mode="ift" must (a) produce the identical forward estimate, and
(b) produce gradients wrt the observed fields that match unrolled
differentiation when the solver has converged (the IFT is exact at the
fixed point; unrolling approaches it as the iterates converge).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.perspective_fields import get_perspective_field
from geocalib_tpu.optim.lm import LMConfig, run_lm


def _data(B=2, H=32, W=32, noise=0.005, seed=0):
    rng = np.random.default_rng(seed)
    cam = Camera.from_dict(
        {
            "height": jnp.full((B,), float(H)),
            "width": jnp.full((B,), float(W)),
            "vfov": jnp.asarray(rng.uniform(0.8, 1.2, (B,)), jnp.float32),
        },
        model="pinhole",
    )
    grav = Gravity.from_rp(
        jnp.asarray(rng.uniform(-0.3, 0.3, (B,)), jnp.float32),
        jnp.asarray(rng.uniform(-0.3, 0.3, (B,)), jnp.float32),
    )
    up, lat = get_perspective_field(cam, grav, H, W)
    up = up + jnp.asarray(rng.normal(0, noise, up.shape), jnp.float32)
    lat = lat + jnp.asarray(rng.normal(0, noise, lat.shape), jnp.float32)
    return {"up_field": up, "latitude_field": lat}


def _loss_fn(mode):
    cfg = LMConfig(
        num_steps=40, early_stop=False, loss_fn="squared",
        with_uncertainty=False, grad_mode=mode,
    )

    def loss(data):
        res = run_lm(data, cfg)
        return (
            jnp.sum(res.gravity.rp**2)
            + jnp.sum((res.camera.vfov - 1.0) ** 2)
        )

    return jax.jit(jax.value_and_grad(loss))


def test_ift_forward_identical():
    data = _data()
    cfg_u = LMConfig(num_steps=20, with_uncertainty=False, grad_mode="unroll")
    cfg_i = LMConfig(num_steps=20, with_uncertainty=False, grad_mode="ift")
    ru = jax.jit(lambda d: run_lm(d, cfg_u))(data)
    ri = jax.jit(lambda d: run_lm(d, cfg_i))(data)
    # the ift path applies one zero-delta manifold update -> float noise only
    np.testing.assert_allclose(
        np.asarray(ru.gravity.rp), np.asarray(ri.gravity.rp), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ru.camera.vfov), np.asarray(ri.camera.vfov), atol=1e-6
    )


def test_ift_gradients_match_unrolled():
    data = _data()
    lu, gu = _loss_fn("unroll")(data)
    li, gi = _loss_fn("ift")(data)
    np.testing.assert_allclose(float(li), float(lu), rtol=1e-6)
    for k in data:
        a, b = np.asarray(gu[k]), np.asarray(gi[k])
        denom = np.abs(a).max()
        assert denom > 0
        np.testing.assert_allclose(b, a, atol=0.05 * denom, err_msg=k)


def test_ift_trains_in_train_step():
    """The SPMD train step runs with grad_mode='ift' (memory-lean path)."""
    import dataclasses as dc

    from geocalib_tpu.training.train_step import TrainConfig, create_train_state

    cfg = TrainConfig(variant="tiny", lm_steps=3)
    lm = dc.replace(cfg.lm_config(), grad_mode="ift")
    assert lm.grad_mode == "ift"  # config plumb-through sanity
    # full-step coverage happens in test_training; here just ensure the
    # loss differentiates through run_lm in ift mode inside value_and_grad
    data = _data(B=2, H=32, W=32)

    def loss(d):
        res = run_lm(d, lm)
        return jnp.sum(res.gravity.rp**2)

    g = jax.jit(jax.grad(loss))(data)
    assert np.isfinite(np.asarray(g["up_field"])).all()
    del create_train_state
