"""DeepCalib baseline: dense CNN + per-parameter classification heads.

Re-design of /root/reference/siclib/models/networks/deepcalib.py
(DenseNet161 + 4 heads of 256 bins each over roll/rho/vfov/k1_hat, NLL
loss, softargmax decoding): a conf-driven Flax DenseNet (no torchvision /
ImageNet weights in this environment) with the same head structure, bin
bounds, and decoding; rho = pitch-proxy (distance of horizon midpoint),
k1_hat the normalized distortion (reference conversions pitch↔rho in
siclib/utils/conversions.py).
"""

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from geocalib_tpu.models.modules import BatchNorm, Conv2d

Array = jnp.ndarray

BOUNDS = {
    "roll": (-jnp.pi / 4, jnp.pi / 4),
    "rho": (-1.0, 1.0),
    "vfov": (jnp.deg2rad(20.0), jnp.deg2rad(105.0)),
    "k1_hat": (-0.7, 0.7),
}
HEADS = ("roll", "rho", "vfov", "k1_hat")
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def bin_centers(lo: float, hi: float, num_bins: int) -> Array:
    """Parity with get_centers_and_edges (deepcalib.py:24-27)."""
    return jnp.linspace(lo, hi + (hi - lo) / (num_bins - 1), num_bins)


def bins_to_val(centers: Array, logits: Array, softargmax: bool = False) -> Array:
    """Decode logits (B, num_bins) to values (deepcalib.py:121-133)."""
    if not softargmax:
        return centers[jnp.argmax(logits, axis=-1)]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.sum(centers[None, : logits.shape[-1]] * p, axis=-1)


class DenseLayer(nn.Module):
    growth_rate: int = 32
    bn_size: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = nn.relu(BatchNorm()(x, train=train))
        y = Conv2d(self.bn_size * self.growth_rate, 1, use_bias=False)(y)
        y = nn.relu(BatchNorm()(y, train=train))
        y = Conv2d(self.growth_rate, 3, padding=1, use_bias=False)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int = 32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        for _ in range(self.num_layers):
            x = DenseLayer(self.growth_rate)(x, train=train)
        return x


class Transition(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.relu(BatchNorm()(x, train=train))
        x = Conv2d(self.features, 1, use_bias=False)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """DenseNet trunk; block_config (6,12,36,24) ~ densenet161 structure."""

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 36, 24)
    init_features: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = Conv2d(self.init_features, 7, strides=2, padding=3, use_bias=False)(x)
        x = nn.relu(BatchNorm()(x, train=train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        features = self.init_features
        for i, layers in enumerate(self.block_config):
            x = DenseBlock(layers, self.growth_rate)(x, train=train)
            features += layers * self.growth_rate
            if i != len(self.block_config) - 1:
                features //= 2
                x = Transition(features)(x, train=train)
        return x


class ClassificationHead(nn.Module):
    num_bins: int = 256
    growth_rate: int = 32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # transition → small dense block → pool → MLP → bins (deepcalib.py:83-116)
        x = Transition(x.shape[-1] // 2)(x, train=train)
        x = DenseBlock(3, self.growth_rate)(x, train=train)
        x = nn.relu(BatchNorm()(x, train=train))
        x = x.mean(axis=(1, 2))
        x = nn.relu(nn.Dense(512)(x))
        return nn.log_softmax(nn.Dense(self.num_bins)(x), axis=-1)


@dataclasses.dataclass(frozen=True)
class DeepCalibConf:
    num_bins: int = 256
    softargmax: bool = False
    # "tiny" trunk for tests
    block_config: Tuple[int, ...] = (6, 12, 36, 24)
    growth_rate: int = 32


class DeepCalib(nn.Module):
    """4-head classification calibrator; returns per-head logits + values."""

    num_bins: int = 256
    softargmax: bool = False
    block_config: Sequence[int] = (6, 12, 36, 24)
    growth_rate: int = 32

    @nn.compact
    def __call__(self, image: Array, train: bool = False) -> Dict[str, Array]:
        mean = jnp.asarray(IMAGENET_MEAN, image.dtype)
        std = jnp.asarray(IMAGENET_STD, image.dtype)
        x = (image - mean) / std

        trunk = DenseNet(self.growth_rate, self.block_config)(x, train=train)

        out: Dict[str, Array] = {}
        for head in HEADS:
            logits = ClassificationHead(self.num_bins, self.growth_rate)(
                trunk, train=train
            )
            centers = bin_centers(*BOUNDS[head], self.num_bins)
            out[f"{head}_logits"] = logits
            out[head] = bins_to_val(centers, logits, self.softargmax)
        return out

    @staticmethod
    def loss(out: Dict[str, Array], gt: Dict[str, Array], num_bins: int = 256) -> Array:
        """NLL over the GT bin of each head (deepcalib.py loss)."""
        total = 0.0
        for head in HEADS:
            lo, hi = BOUNDS[head]
            centers = bin_centers(lo, hi, num_bins)
            target = jnp.argmin(
                jnp.abs(gt[head][:, None] - centers[None, : num_bins]), axis=-1
            )
            total = total - jnp.take_along_axis(
                out[f"{head}_logits"], target[:, None], axis=-1
            )[:, 0]
        return total
