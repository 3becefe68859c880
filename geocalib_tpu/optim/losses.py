"""Robust cost functions returning (value, first, second) derivatives.

Parity targets: /root/reference/siclib/models/optimization/losses.py
(scaled_loss :8, squared_loss :26, huber_loss :31, barron_loss :42-93) and
/root/reference/geocalib/lm_optimizer.py:61-93. All functions take the
*squared* residual magnitude x = ||r||² and are pure jnp, branch-free via
jnp.where so they trace into a single fused XLA computation.
"""

from typing import Callable, Tuple

import jax.numpy as jnp

Array = jnp.ndarray
LossFn = Callable[[Array], Tuple[Array, Array, Array]]


def scaled_loss(x: Array, fn: LossFn, a: float) -> Tuple[Array, Array, Array]:
    """Apply fn to x pre-scaled by a²: value is post-scaled, d2 post-divided."""
    a2 = a**2
    loss, d1, d2 = fn(x / a2)
    return loss * a2, d1, d2 / a2


def squared_loss(x: Array) -> Tuple[Array, Array, Array]:
    """Plain squared loss (identity on x = r²)."""
    return x, jnp.ones_like(x), jnp.zeros_like(x)


def huber_loss(x: Array) -> Tuple[Array, Array, Array]:
    """Classical Huber loss on x = r², with first and second derivatives."""
    mask = x <= 1.0
    sx = jnp.sqrt(x + 1e-8)  # guard the sqrt for the backward pass
    isx = jnp.maximum(jnp.finfo(jnp.float32).eps, 1.0 / sx)
    loss = jnp.where(mask, x, 2.0 * sx - 1.0)
    d1 = jnp.where(mask, jnp.ones_like(x), isx)
    d2 = jnp.where(mask, jnp.zeros_like(x), -isx / (2.0 * jnp.maximum(x, 1e-8)))
    return loss, d1, d2


def barron_loss(x: Array, alpha: float = 1.0, c: float = 1.0) -> Tuple[Array, Array, Array]:
    """Barron's general robust loss (CVPR 2019) on x = r².

    Matches the reference's formulation with its special cases at
    alpha ∈ {2, 0, -inf}; derivatives are exact.
    """
    c2 = c**2
    xc = x / c2

    if alpha == 2.0:
        return 0.5 * xc, 0.5 / c2 * jnp.ones_like(x), jnp.zeros_like(x)
    if alpha == 0.0:
        loss = jnp.log1p(0.5 * xc)
        d1 = 1.0 / (x + 2.0 * c2)
        d2 = -(d1**2)
        return loss, d1, d2
    if alpha == -jnp.inf or alpha < -1e8:
        e = jnp.exp(-0.5 * xc)
        loss = 1.0 - e
        d1 = 0.5 / c2 * e
        d2 = -0.25 / (c2**2) * e
        return loss, d1, d2

    beta = abs(alpha - 2.0)
    base = xc / beta + 1.0
    p = alpha / 2.0
    loss = (beta / alpha) * (base**p - 1.0)
    d1 = (1.0 / (2.0 * c2)) * base ** (p - 1.0)
    d2 = ((p - 1.0) / (2.0 * c2 * c2 * beta)) * base ** (p - 2.0)
    return loss, d1, d2


def make_scaled_barron(alpha: float, c: float) -> LossFn:
    """scaled_barron(a, c)(x) analog of the reference factory."""

    def fn(x: Array) -> Tuple[Array, Array, Array]:
        return barron_loss(x, alpha=alpha, c=c)

    return fn


LOSS_FNS = {
    "squared": squared_loss,
    "huber": huber_loss,
    "barron": barron_loss,
}


def get_loss_fn(name: str) -> LossFn:
    try:
        return LOSS_FNS[name]
    except KeyError:
        raise ValueError(f"Unknown loss {name!r}; expected one of {sorted(LOSS_FNS)}")
