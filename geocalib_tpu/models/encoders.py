"""Alternative backbones: VGG- and ResNet-style pyramids (Flax, NHWC).

Re-design of /root/reference/siclib/models/encoders/{vgg.py,resnet.py}
(torchvision feature extractors): dependency-free conf-driven equivalents
returning 4-scale feature pyramids compatible with the decoders.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from geocalib_tpu.models.modules import BatchNorm, Conv2d

Array = jnp.ndarray


class VGG(nn.Module):
    """VGG-style: stacked 3×3 conv+ReLU stages with maxpool downsampling."""

    dims: Sequence[int] = (64, 128, 320, 512)
    convs_per_stage: int = 2

    @nn.compact
    def __call__(self, image: Array, train: bool = False) -> Tuple[Array, ...]:
        x = image[..., ::-1] * 255.0
        outs = []
        for i, dim in enumerate(self.dims):
            # stride-2 downsampling: 2 at stage 0 handled by two pools below
            x = nn.max_pool(x, (2, 2), strides=(2, 2)) if i > 0 else x
            if i == 0:
                x = nn.max_pool(
                    Conv2d(dim // 2, 3, padding=1)(x), (2, 2), strides=(2, 2)
                )
                x = nn.relu(x)
                x = nn.max_pool(
                    nn.relu(Conv2d(dim, 3, padding=1)(x)), (2, 2), strides=(2, 2)
                )
            for _ in range(self.convs_per_stage):
                x = nn.relu(Conv2d(dim, 3, padding=1)(x))
            outs.append(x)
        return tuple(outs)


class ResNetBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        residual = x
        y = Conv2d(self.features, 3, strides=self.strides, padding=1, use_bias=False)(x)
        y = BatchNorm()(y, train=train)
        y = nn.relu(y)
        y = Conv2d(self.features, 3, padding=1, use_bias=False)(y)
        y = BatchNorm()(y, train=train)
        if residual.shape != y.shape:
            residual = Conv2d(self.features, 1, strides=self.strides, use_bias=False)(
                residual
            )
            residual = BatchNorm()(residual, train=train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-style: stem + 4 stages of basic blocks at strides 4/8/16/32."""

    dims: Sequence[int] = (64, 128, 320, 512)
    blocks_per_stage: int = 2

    @nn.compact
    def __call__(self, image: Array, train: bool = False) -> Tuple[Array, ...]:
        x = image[..., ::-1] * 255.0
        x = Conv2d(self.dims[0], 7, strides=2, padding=3, use_bias=False)(x)
        x = BatchNorm()(x, train=train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for i, dim in enumerate(self.dims):
            for j in range(self.blocks_per_stage):
                strides = 2 if (i > 0 and j == 0) else 1
                x = ResNetBlock(dim, strides)(x, train=train)
            outs.append(x)
        return tuple(outs)
