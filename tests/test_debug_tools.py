"""detect_anomaly + gradient audit (reference train.py:342-344, 496-505)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from geocalib_tpu.training.debug import audit_gradients, detect_anomaly


def test_detect_anomaly_raises_on_nan():
    with detect_anomaly():
        with pytest.raises(Exception):  # jax raises FloatingPointError
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # restored afterwards: no raise
    out = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))
    assert np.isnan(np.asarray(out))


def test_audit_gradients_finds_disconnected():
    params = {"used": jnp.ones((3,)), "dead": jnp.ones((2,))}

    def loss(p):
        return jnp.sum(p["used"] ** 2) + 0.0 * jnp.sum(p["dead"])

    dead = audit_gradients(jax.grad(loss)(params))
    assert len(dead) == 1 and "dead" in dead[0]


def test_perceptual_driver_parse():
    from geocalib_tpu.eval.run_perceptual import parse_result

    out = parse_result("Pitch: -3.2° / Roll: 1.5° / HFOV : 62.1° / Distortion: 0.04")
    assert out == (-3.2, 1.5, 62.1, 0.04)
    with pytest.raises(ValueError):
        parse_result("garbage")
