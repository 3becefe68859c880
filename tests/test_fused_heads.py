"""Parity of the fused dual-head forward vs the plain per-head modules.

The fused tower (models/fused_heads.py) must reproduce
GeoCalibNet.apply's eval output exactly up to float re-association in the
wider convs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.models.fused_heads import fused_forward, fused_heads_apply
from geocalib_tpu.models.geocalib_net import GeoCalibNet


@pytest.fixture(scope="module")
def tiny_net_and_vars():
    net = GeoCalibNet(variant="tiny")
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, img[:1])
    return net, variables, img


def test_fused_forward_matches_unfused(tiny_net_and_vars):
    net, variables, img = tiny_net_and_vars
    ref = net.apply(variables, img)
    out = fused_forward(variables, img, variant="tiny")
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-3, atol=1e-4, err_msg=k
        )


def test_fused_forward_jits_and_batches(tiny_net_and_vars):
    net, variables, img = tiny_net_and_vars
    f = jax.jit(lambda v, x: fused_forward(v, x, variant="tiny"))
    out = f(variables, jnp.tile(img, (2, 1, 1, 1)))
    assert out["up_field"].shape == (4, 64, 64, 2)
    assert out["latitude_field"].shape == (4, 64, 64, 1)
    assert np.all(np.isfinite(np.asarray(out["up_field"])))
    # up field stays unit-norm
    norms = np.linalg.norm(np.asarray(out["up_field"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_fused_heads_confidences_in_range(tiny_net_and_vars):
    net, variables, img = tiny_net_and_vars
    out = fused_forward(variables, img, variant="tiny")
    for k in ("up_confidence", "latitude_confidence"):
        v = np.asarray(out[k])
        assert v.shape == (2, 64, 64)
        assert v.min() >= 0.0 and v.max() <= 1.0


def test_fused_matches_variant_b_small_image():
    # the released architecture (variant b) on a small image: checks the
    # channel bookkeeping at the real head widths (64/512)
    net = GeoCalibNet(variant="b")
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, img)
    ref = net.apply(variables, img)
    out = fused_forward(variables, img, variant="b")
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-3, atol=1e-4, err_msg=k
        )
