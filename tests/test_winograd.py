"""Winograd F(2x2,3x3) conv vs lax.conv ground truth (ops/winograd.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.ops.winograd import transform_kernel, winograd_conv3x3


def _ref_conv(x, k, b=None):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out if b is None else out + b


@pytest.mark.parametrize("shape", [(2, 8, 8, 4, 6), (1, 16, 12, 8, 8)])
def test_winograd_matches_direct_f32(shape):
    B, H, W, C, F = shape
    kx, kk, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    k = jax.random.normal(kk, (3, 3, C, F), jnp.float32) / 3.0
    b = jax.random.normal(kb, (F,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(winograd_conv3x3(x, k, b)),
        np.asarray(_ref_conv(x, k, b)),
        rtol=2e-4, atol=2e-4,
    )


def test_winograd_pretransformed_kernel_and_jit():
    B, H, W, C, F = 2, 32, 32, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(2), (3, 3, C, F), jnp.float32) / 3.0
    u = transform_kernel(k)
    f = jax.jit(lambda x, u: winograd_conv3x3(x, None, u=u))
    np.testing.assert_allclose(
        np.asarray(f(x, u)), np.asarray(_ref_conv(x, k)), rtol=2e-4, atol=2e-4
    )


def test_winograd_bf16_accuracy():
    """bf16 matmul phase must stay within bf16-direct-conv error levels."""
    B, H, W, C, F = 2, 32, 32, 32, 32
    x = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, C), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (3, 3, C, F), jnp.float32) / 9.0
    exact = np.asarray(_ref_conv(x, k))
    scale = np.abs(exact).max()
    wino = np.asarray(
        winograd_conv3x3(x.astype(jnp.bfloat16), k, matmul_dtype=jnp.bfloat16)
    ).astype(np.float32)
    direct = np.asarray(
        _ref_conv(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))
    ).astype(np.float32)
    err_w = np.abs(wino - exact).max() / scale
    err_d = np.abs(direct - exact).max() / scale
    # bf16 winograd loses at most ~3x the error of bf16 direct conv
    assert err_w < 3.0 * err_d + 1e-3, (err_w, err_d)
