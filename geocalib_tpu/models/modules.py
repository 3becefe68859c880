"""Shared NN building blocks (Flax/linen, NHWC).

TPU-native re-design of the reference's torch modules
(/root/reference/geocalib/modules.py:23-117, :300-440 and
/root/reference/siclib/models/utils/modules.py): same computational graph,
but NHWC layout (TPU conv-native), explicit torch-style padding so shapes
match the reference exactly, and BatchNorm with an optional named axis for
cross-chip stat syncing (the SyncBatchNorm equivalent — reference
siclib/train.py:336).
"""

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


def gelu(x: Array) -> Array:
    """Exact (erf) GELU — torch's nn.GELU default, unlike jax.nn.gelu."""
    return jax.nn.gelu(x, approximate=False)


def _pair(p: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (p, p) if isinstance(p, int) else tuple(p)


class Conv2d(nn.Module):
    """Conv with torch-style explicit symmetric padding, NHWC."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        return nn.Conv(
            features=self.features,
            kernel_size=(kh, kw),
            strides=_pair(self.strides),
            padding=((ph, ph), (pw, pw)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent over NHWC with optional cross-device sync.

    When ``axis_name`` is set and ``train=True``, batch statistics are
    averaged over that mesh axis inside the jitted step — the TPU-native
    replacement for torch SyncBatchNorm (reference siclib/train.py:336-337).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name if train else None,
        )(x)


class ConvModule(nn.Module):
    """conv → [BN] → ReLU (reference geocalib/modules.py:23-55)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    padding: Union[int, Tuple[int, int]] = 0
    use_norm: bool = False
    use_bias: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2d(
            self.features, self.kernel_size, padding=self.padding, use_bias=self.use_bias
        )(x)
        if self.use_norm:
            x = BatchNorm(axis_name=self.bn_axis_name)(x, train=train)
        return nn.relu(x)


class ResidualConvUnit(nn.Module):
    """relu→conv3→relu→conv3 + relu(x) (reference geocalib/modules.py:57-80).

    The skip connection is relu(x), not x: the reference's inplace ReLU
    (`self.relu = ReLU(inplace=True)`; modules.py:71-79) mutates its input,
    so its `out + x` adds the *rectified* input. Trained reference weights
    assume these semantics.
    """

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        r = nn.relu(x)
        out = Conv2d(self.features, 3, padding=1)(r)
        out = nn.relu(out)
        out = Conv2d(self.features, 3, padding=1)(out)
        return out + r


def resize_bilinear(x: Array, size: Tuple[int, int]) -> Array:
    """Bilinear NHWC resize, half-pixel centers (= torch align_corners=False)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")


class FeatureFusionBlock(nn.Module):
    """Fuse two feature maps with residual units (geocalib/modules.py:82-117)."""

    features: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x: Array, skip: Optional[Array] = None) -> Array:
        if skip is not None:
            x = x + ResidualConvUnit(self.features)(skip)
        x = ResidualConvUnit(self.features)(x)
        if self.upsample:
            x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        return x


class DWConv(nn.Module):
    """3×3 depthwise conv (geocalib/modules.py:293-311)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Conv2d(self.dim, 3, padding=1, groups=self.dim)(x)


class Mlp(nn.Module):
    """1×1 conv → dwconv → GELU → 1×1 conv (geocalib/modules.py:313-340)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2d(self.hidden_features, 1)(x)
        x = DWConv(self.hidden_features)(x)
        x = gelu(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = Conv2d(self.out_features, 1)(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask.astype(x.dtype) / keep


class AttentionModule(nn.Module):
    """Multi-scale strip-conv attention (geocalib/modules.py:374-410).

    5×5 depthwise, then three separable strip convs (7, 11, 21), summed,
    mixed with a 1×1 conv, and used as a multiplicative gate.
    """

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        u = x
        attn = Conv2d(self.dim, 5, padding=2, groups=self.dim)(x)

        branches = [attn]
        for k in (7, 11, 21):
            b = Conv2d(self.dim, (1, k), padding=(0, k // 2), groups=self.dim)(attn)
            b = Conv2d(self.dim, (k, 1), padding=(k // 2, 0), groups=self.dim)(b)
            branches.append(b)
        attn = sum(branches)
        attn = Conv2d(self.dim, 1)(attn)
        return attn * u


class SpatialAttention(nn.Module):
    """proj → GELU → attention gate → proj + skip (geocalib/modules.py:413-437)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shortcut = x
        x = Conv2d(self.dim, 1)(x)
        x = gelu(x)
        x = AttentionModule(self.dim)(x)
        x = Conv2d(self.dim, 1)(x)
        return x + shortcut


class MSCANBlock(nn.Module):
    """BN → attention and BN → MLP residual block with layer scale
    (geocalib/modules.py:440-478)."""

    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    drop_path: float = 0.0
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        init = nn.initializers.constant(1e-2)
        ls1 = self.param("layer_scale_1", init, (self.dim,))
        ls2 = self.param("layer_scale_2", init, (self.dim,))
        dp = DropPath(self.drop_path)

        h = BatchNorm(axis_name=self.bn_axis_name)(x, train=train)
        h = SpatialAttention(self.dim)(h)
        x = x + dp(ls1 * h, train=train)

        h = BatchNorm(axis_name=self.bn_axis_name)(x, train=train)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, drop=self.drop)(h, train=train)
        x = x + dp(ls2 * h, train=train)
        return x


class StemConv(nn.Module):
    """Two stride-2 3×3 convs with BN (geocalib/modules.py:343-372): /4 res."""

    out_channels: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2d(self.out_channels // 2, 3, strides=2, padding=1)(x)
        x = BatchNorm(axis_name=self.bn_axis_name)(x, train=train)
        x = gelu(x)
        x = Conv2d(self.out_channels, 3, strides=2, padding=1)(x)
        x = BatchNorm(axis_name=self.bn_axis_name)(x, train=train)
        return x


class OverlapPatchEmbed(nn.Module):
    """Strided conv patch embedding with BN (geocalib/modules.py:481-513)."""

    embed_dim: int
    patch_size: int = 3
    stride: int = 2
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2d(
            self.embed_dim, self.patch_size, strides=self.stride, padding=self.patch_size // 2
        )(x)
        return BatchNorm(axis_name=self.bn_axis_name)(x, train=train)
