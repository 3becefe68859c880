"""FPN decoder: alternative to the Light Hamburger head.

Re-design of /root/reference/siclib/models/decoders/fpn.py (lateral 1×1 +
top-down sum/GLU/feed-forward fusion): NHWC Flax with the same fusion
options, returning (features, log_confidence) like LightHamHead.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from geocalib_tpu.models.modules import Conv2d, ConvModule, resize_bilinear

Array = jnp.ndarray


class FPN(nn.Module):
    out_channels: int = 64
    fusion: str = "sum"  # sum | glu | ff

    @nn.compact
    def __call__(
        self, hl_features: Sequence[Array], ll_features: Array, train: bool = False
    ) -> Tuple[Array, Array]:
        laterals = [
            Conv2d(self.out_channels, 1)(f) for f in hl_features
        ]  # high→low resolution order: index 0 is the finest

        # top-down pathway
        x = laterals[-1]
        for lat in reversed(laterals[:-1]):
            x = resize_bilinear(x, lat.shape[1:3])
            if self.fusion == "sum":
                x = x + lat
            elif self.fusion == "glu":
                gate = nn.sigmoid(Conv2d(self.out_channels, 1)(jnp.concatenate([x, lat], -1)))
                x = gate * x + (1 - gate) * lat
            elif self.fusion == "ff":
                x = ConvModule(self.out_channels, 3, padding=1)(
                    jnp.concatenate([x, lat], -1), train=train
                )
            else:
                raise ValueError(f"unknown fusion {self.fusion!r}")
            x = ConvModule(self.out_channels, 3, padding=1)(x, train=train)

        # to full resolution, fuse low-level features
        feats = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        feats = ConvModule(self.out_channels, 3, padding=1)(feats, train=train)
        feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
        feats = feats + ConvModule(self.out_channels, 3, padding=1)(
            ll_features, train=train
        )

        unc = ConvModule(self.out_channels, 3, padding=1, use_bias=False)(
            feats, train=train
        )
        log_confidence = Conv2d(1, 1)(unc)[..., 0]
        return feats, log_confidence
