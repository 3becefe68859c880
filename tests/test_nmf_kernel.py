"""NMF Pallas kernel vs the XLA NMF2D module (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.models.hamburger import NMF2D
from geocalib_tpu.ops.nmf_kernel import nmf_pallas


@pytest.mark.parametrize("steps", [1, 7])
def test_nmf_kernel_matches_module(steps):
    B, N, D, R = 2, 256, 64, 16
    x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.float32))
    bases = jax.random.uniform(jax.random.PRNGKey(0), (B, D, R), jnp.float32)
    ref = NMF2D(rank=R, eval_steps=steps).apply({}, x, bases=bases)
    out = nmf_pallas(x, bases, steps=steps, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_nmf_kernel_batch_independent():
    # per-sample independence: batching two samples == running them alone
    B, N, D, R = 2, 128, 32, 8
    x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(3), (B, N, D), jnp.float32))
    bases = jax.random.uniform(jax.random.PRNGKey(4), (B, D, R), jnp.float32)
    full = nmf_pallas(x, bases, steps=3, interpret=True)
    for i in range(B):
        single = nmf_pallas(x[i : i + 1], bases[i : i + 1], steps=3, interpret=True)
        np.testing.assert_allclose(np.asarray(single[0]), np.asarray(full[i]), rtol=1e-5, atol=1e-6)
