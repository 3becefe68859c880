"""Tiny batched linear-algebra kernels for the LM solver (pure jnp).

The reference moves every (B, P, P) Cholesky factorization to the CPU
(/root/reference/geocalib/lm_optimizer.py:128-137) — a device→host→device
round trip per LM iteration. Here P is a *static* Python int (3..5 for
single-image calibration), so we unroll the Cholesky-solve completely at
trace time into plain vectorized arithmetic over the batch: no lapack
custom-calls, no host syncs, fully fusible by XLA inside lax.scan.
"""

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def cholesky_solve_small(H: Array, g: Array, eps: float = 1e-12) -> Array:
    """Solve H x = g for SPD H of static size (..., P, P), g (..., P).

    Fully unrolled LDLᵀ-style Cholesky at trace time (P is a Python int).
    Singular / non-PD lanes are guarded: pivots are clamped away from zero,
    which mirrors the reference's "Cholesky failed → zero step" fallback
    (lm_optimizer.py:128-137) without aborting the whole batch.
    """
    P = H.shape[-1]
    assert g.shape[-1] == P

    # Cholesky factorization H = L Lᵀ, unrolled with static indices.
    L = [[None] * P for _ in range(P)]
    for j in range(P):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # clamp pivot: non-PD lanes get a huge pivot -> near-zero update
        Ljj = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = Ljj
        inv_Ljj = 1.0 / Ljj
        for i in range(j + 1, P):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_Ljj

    # forward substitution L y = g
    y = [None] * P
    for i in range(P):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]

    # backward substitution Lᵀ x = y
    x = [None] * P
    for i in reversed(range(P)):
        s = y[i]
        for k in range(i + 1, P):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]

    return jnp.stack(x, axis=-1)


def inv_small(H: Array) -> Array:
    """Inverse of SPD H (..., P, P) with static P, via unrolled Cholesky solves."""
    P = H.shape[-1]
    eye = jnp.eye(P, dtype=H.dtype)
    cols = [
        cholesky_solve_small(H, jnp.broadcast_to(eye[i], H.shape[:-2] + (P,)))
        for i in range(P)
    ]
    return jnp.stack(cols, axis=-1)  # columns of H^{-1} e_i stacked -> H^{-1}


def max_eig_2x2(M: Array) -> Array:
    """Largest eigenvalue of a symmetric 2x2 block (..., 2, 2), closed form.

    Replaces the reference's CPU eigvalsh for the gravity-uncertainty block
    (lm_optimizer.py:495-500).
    """
    a = M[..., 0, 0]
    c = M[..., 1, 1]
    b = M[..., 0, 1]
    mean = 0.5 * (a + c)
    radius = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b**2, 0.0))
    return mean + radius


def damp_hessian(H: Array, lamb: Array, eps: float = 1e-6) -> Array:
    """Levenberg damping H + clamp(λ·diag(H), eps) I (lm_optimizer.py:109-127)."""
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    damped = jnp.maximum(diag * lamb[..., None], eps)
    return H + damped[..., None] * jnp.eye(H.shape[-1], dtype=H.dtype)


def solve_arrow(
    D: Array,
    U: Array,
    S: Array,
    g_g: Array,
    g_i: Array,
    eps: float = 1e-12,
    cross_sum=None,
) -> Tuple[Array, Array]:
    """Solve the shared-intrinsics arrow system via a Schur complement.

    System (one camera shared across a batch of B images):

        [ blockdiag(D_b)   U_b ] [ x_g,b ]   [ g_g,b ]
        [ U_bᵀ (summed)     S  ] [ x_i   ] = [ g_i   ]

    with D (B, 2, 2) per-image gravity blocks, U (B, 2, p) gravity-intrinsic
    coupling, S (p, p) the summed intrinsics block. The reference densifies
    this into a (2B+p)² matrix and factorizes it on the CPU
    (lm_optimizer.py:361-383, 429-434); the Schur form keeps everything
    batched and tiny: Ŝ = S - Σ_b U_bᵀ D_b⁻¹ U_b (p×p), then back-substitute.

    When the image batch is sharded over a mesh axis (SURVEY §2.6 row 4),
    pass ``cross_sum`` (e.g. ``lambda x: lax.psum(x, axis)``): the Schur
    Σ_b corrections then reduce over the GLOBAL batch while D/U/g_g stay
    per-shard. S and g_i must already be globally summed by the caller.

    Returns:
        x_g (B, 2), x_i (p,).
    """
    # D_b^{-1} via closed-form 2x2 inverse
    a = D[..., 0, 0]
    d = D[..., 1, 1]
    b = D[..., 0, 1]
    c = D[..., 1, 0]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < eps, jnp.sign(det) * eps + eps, det)
    inv = (
        jnp.stack([d, -b, -c, a], axis=-1).reshape(D.shape) / det[..., None, None]
    )

    Dinv_U = jnp.einsum("bij,bjk->bik", inv, U)  # (B, 2, p)
    Dinv_g = jnp.einsum("bij,bj->bi", inv, g_g)  # (B, 2)

    corr_S = jnp.einsum("bji,bjk->ik", U, Dinv_U)  # (p, p)
    corr_g = jnp.einsum("bji,bj->i", U, Dinv_g)  # (p,)
    if cross_sum is not None:
        corr_S, corr_g = cross_sum(corr_S), cross_sum(corr_g)
    S_hat = S - corr_S
    rhs = g_i - corr_g

    x_i = cholesky_solve_small(S_hat, rhs)
    x_g = Dinv_g - jnp.einsum("bik,k->bi", Dinv_U, x_i)
    return x_g, x_i
