"""Shared analytic Jacobian helpers (pure jnp).

Parity targets: /root/reference/siclib/geometry/jacobians.py (J_vecnorm,
J_focal2fov, J_up_projection), validated against jax.jacfwd in
tests/test_jacobians.py.
"""

import jax.numpy as jnp


def J_vecnorm(vec: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Jacobian of v ↦ v/||v||₂, shape (..., D, D)."""
    D = vec.shape[-1]
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)[..., None]  # (..., 1, 1)
    norm = jnp.maximum(norm, eps)
    xxT = jnp.einsum("...i,...j->...ij", vec, vec)
    eye = jnp.eye(D, dtype=vec.dtype)
    return eye / norm - xxT / norm**3


def J_focal2fov(focal: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of focal2fov(f, h) = 2 atan(h / 2f) wrt f."""
    return -4.0 * h / (4.0 * focal**2 + h**2)


def J_up_projection(uv: jnp.ndarray, abc: jnp.ndarray, wrt: str = "uv") -> jnp.ndarray:
    """Jacobian of the up-vector projection p(uv) = (a, b) - c·uv.

    Args:
        uv: normalized image coordinates (..., N, 2).
        abc: gravity vector (..., 3).
        wrt: "uv" → (..., N, 2, 2); "abc" → (..., N, 2, 3).
    """
    if wrt == "uv":
        c = abc[..., 2][..., None, None, None]
        eye = jnp.eye(2, dtype=uv.dtype)
        return -c * jnp.broadcast_to(eye, uv.shape[:-1] + (2, 2))
    if wrt == "abc":
        zeros = jnp.zeros_like(uv[..., 0])
        ones = jnp.ones_like(uv[..., 0])
        # rows: d(a - c·u)/d(a,b,c) = [1, 0, -u]; d(b - c·v)/d(a,b,c) = [0, 1, -v]
        row0 = jnp.stack([ones, zeros, -uv[..., 0]], axis=-1)
        row1 = jnp.stack([zeros, ones, -uv[..., 1]], axis=-1)
        return jnp.stack([row0, row1], axis=-2)
    raise ValueError(f"Unknown wrt: {wrt}")
