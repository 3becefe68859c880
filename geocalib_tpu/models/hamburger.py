"""Light Hamburger decoder head (HamNet / SegNeXt) in Flax, NHWC.

Re-design of /root/reference/geocalib/modules.py:120-288. The NMF2D matrix
decomposition is the MXU-friendly core: a fixed number of multiplicative
updates, each a pair of batched matmuls over (N, D)×(D, R) — large, static,
bfloat16-able. Layout differences vs torch: features are kept (B, N, D)
(token-major) so every update is a plain einsum with no transposes
materialized.

The reference draws random NMF bases per forward with torch.rand
(modules.py:131-133); here the bases come from a threaded Flax RNG
("nmf" stream) with a deterministic fallback for reproducible eval.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from geocalib_tpu.models.modules import ConvModule, Conv2d, FeatureFusionBlock, resize_bilinear

Array = jnp.ndarray


class NMF2D(nn.Module):
    """Non-negative matrix factorization by multiplicative updates.

    Factorizes x (B, N, D) ≈ coef (B, N, R) @ basesᵀ (B, R, D).
    """

    rank: int = 64
    train_steps: int = 6
    eval_steps: int = 7
    inv_t: float = 1.0
    eps: float = 1e-6

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, bases: Optional[Array] = None
    ) -> Array:
        B, N, D = x.shape
        R = self.rank

        if bases is None:
            if self.has_rng("nmf"):
                rng = self.make_rng("nmf")
            else:
                # deterministic eval: fixed seed → reproducible bases
                rng = jax.random.PRNGKey(0)
            bases = jax.random.uniform(rng, (B, D, R), dtype=x.dtype)
        bases = bases / (jnp.linalg.norm(bases, axis=1, keepdims=True) + self.eps)

        # init coefficients with a softmax attention over bases
        coef = jnp.einsum("bnd,bdr->bnr", x, bases)
        coef = jax.nn.softmax(self.inv_t * coef, axis=-1)

        steps = self.train_steps if train else self.eval_steps
        for _ in range(steps):
            bases, coef = self._update(x, bases, coef)

        # final coef refresh, then reconstruct
        coef = self._update_coef(x, bases, coef)
        return jnp.einsum("bnr,bdr->bnd", coef, bases)

    def _update_coef(self, x: Array, bases: Array, coef: Array) -> Array:
        numer = jnp.einsum("bnd,bdr->bnr", x, bases)
        denom = jnp.einsum("bnr,brs->bns", coef, jnp.einsum("bdr,bds->brs", bases, bases))
        return coef * numer / (denom + self.eps)

    def _update(self, x: Array, bases: Array, coef: Array) -> Tuple[Array, Array]:
        coef = self._update_coef(x, bases, coef)
        numer = jnp.einsum("bnd,bnr->bdr", x, coef)
        denom = jnp.einsum("bdr,brs->bds", bases, jnp.einsum("bnr,bns->brs", coef, coef))
        bases = bases * numer / (denom + self.eps)
        return bases, coef


class Hamburger(nn.Module):
    """1×1 → NMF → 1×1 with residual ReLU (geocalib/modules.py:203-224)."""

    ham_channels: int = 512

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        B, H, W, C = x.shape
        h = ConvModule(self.ham_channels, 1)(x, train=train)
        h = nn.relu(h)
        h = NMF2D()(h.reshape(B, H * W, C), train=train).reshape(B, H, W, C)
        h = ConvModule(self.ham_channels, 1)(h, train=train)
        return nn.relu(x + h)


class LightHamHead(nn.Module):
    """Aggregate the 4 backbone scales, decompose, fuse low-level features.

    Mirrors /root/reference/geocalib/modules.py:227-288: upsample all scales
    to stride-4, concat, squeeze to ham_channels, Hamburger, align to
    out_channels, two ×2 upsamples with a 3×3 conv between, fuse with the
    full-res low-level features, and predict a log-confidence map.

    Returns (features (B, H, W, out_channels), log_confidence (B, H, W)).
    """

    out_channels: int = 64
    ham_channels: int = 512

    @nn.compact
    def __call__(
        self, hl_features: Sequence[Array], ll_features: Array, train: bool = False
    ) -> Tuple[Array, Array]:
        target = hl_features[0].shape[1:3]
        ups = [resize_bilinear(f, target) for f in hl_features]
        x = jnp.concatenate(ups, axis=-1)
        x = ConvModule(self.ham_channels, 1)(x, train=train)
        x = Hamburger(self.ham_channels)(x, train=train)
        feats = ConvModule(self.out_channels, 1)(x, train=train)

        feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
        feats = ConvModule(self.out_channels, 3, padding=1, use_bias=False)(
            feats, train=train
        )
        feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
        feats = FeatureFusionBlock(self.out_channels, upsample=False)(feats, ll_features)

        unc = ConvModule(self.out_channels, 3, padding=1, use_bias=False)(
            feats, train=train
        )
        log_confidence = Conv2d(1, 1)(unc)[..., 0]
        return feats, log_confidence
