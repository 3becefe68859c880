"""Manifold ⊞ operators and their Jacobians (pure jnp).

Covers the two parameterizations the LM solver optimizes gravity on:

- ``EuclideanManifold``: plain additive updates on (roll, pitch).
- ``SphericalManifold``: S² retraction via a Householder frame, following
  Hertzberg et al., "Integrating Generic Sensor Fusion Algorithms with Sound
  State Representations through Encapsulation of Manifolds" (Eq. 109), with
  the Householder vector built as in Golub & Van Loan Alg. 5.1.1 pivoting on
  the *last* element. Behavioral parity with
  /root/reference/geocalib/misc.py:157-259, written branch-free for XLA.
"""

import jax.numpy as jnp

_EPS = 1e-7


class EuclideanManifold:
    """Trivial manifold: x ⊞ δ = x + δ."""

    @staticmethod
    def plus(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
        return x + delta

    @staticmethod
    def J_plus(x: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.eye(x.shape[-1], dtype=x.dtype), x.shape[:-1] + (x.shape[-1], x.shape[-1])
        )


def _householder_vector(x: jnp.ndarray):
    """Householder vector v (v[n-1]=1) and beta with (I - beta v vᵀ) x = ||x|| e_n.

    Args:
        x: (..., n) array.

    Returns:
        v: (..., n), beta: (...,).
    """
    sigma = jnp.sum(x[..., :-1] ** 2, axis=-1)
    sigma = jnp.where(sigma < _EPS, sigma + _EPS, sigma)
    xpiv = x[..., -1]
    norm = jnp.linalg.norm(x, axis=-1)

    vpiv = jnp.where(xpiv < 0, xpiv - norm, -sigma / (xpiv + norm))
    beta = 2.0 * vpiv**2 / (sigma + vpiv**2)
    v = jnp.concatenate(
        [x[..., :-1] / vpiv[..., None], jnp.ones_like(vpiv)[..., None]], axis=-1
    )
    return v, beta


def _apply_householder(y: jnp.ndarray, v: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Apply H = I - beta v vᵀ to y."""
    return y - v * (beta * jnp.einsum("...i,...i->...", v, y))[..., None]


class SphericalManifold:
    """S² retraction in the 2D tangent plane at x."""

    @staticmethod
    def plus(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
        """x ⊞ δ: map tangent vector δ (..., n-1) onto the sphere through x (..., n).

        The output keeps the norm of x (inputs are typically unit vectors).
        """
        nx = jnp.linalg.norm(x, axis=-1, keepdims=True)

        # ||δ|| is non-differentiable at δ=0 (exactly where J_plus is taken and
        # where training-time autodiff runs), so use the double-where pattern:
        # Taylor branch in terms of ||δ||² for small δ, exact branch guarded
        # against the NaN-producing sqrt(0) gradient.
        nd2 = jnp.sum(delta**2, axis=-1, keepdims=True)
        small = nd2 < _EPS
        nd = jnp.sqrt(jnp.where(small, jnp.ones_like(nd2), nd2))
        sinc = jnp.where(small, 1.0 - nd2 / 6.0, jnp.sin(nd) / nd)
        cos_nd = jnp.where(small, 1.0 - nd2 / 2.0, jnp.cos(nd))

        exp_delta = jnp.concatenate([sinc * delta, cos_nd], axis=-1)

        v, beta = _householder_vector(x)
        return nx * _apply_householder(exp_delta, v, beta)

    @staticmethod
    def J_plus(x: jnp.ndarray) -> jnp.ndarray:
        """Jacobian d(x ⊞ δ)/dδ at δ=0, shape (..., n, n-1)."""
        v, beta = _householder_vector(x)
        H = -jnp.einsum("...,...k,...l->...kl", beta, v, v)
        H = H + jnp.eye(x.shape[-1], dtype=x.dtype)
        return H[..., :-1]
