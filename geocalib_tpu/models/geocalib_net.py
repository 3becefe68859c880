"""GeoCalib network: backbone + low-level encoder + perspective decoder.

Re-design of /root/reference/geocalib/geocalib.py (inference net) and
/root/reference/siclib/models/networks/geocalib.py (training net): a Flax
module that predicts per-pixel perspective fields (up vectors, latitudes)
with confidences, feeding the on-device LM solver
(geocalib_tpu.optim.lm.run_lm). NHWC throughout.
"""

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from geocalib_tpu.models.hamburger import LightHamHead
from geocalib_tpu.models.modules import ConvModule
from geocalib_tpu.models.mscan import MSCAN, MSCAN_VARIANTS

Array = jnp.ndarray


class LowLevelEncoder(nn.Module):
    """Two 3×3 convs at full resolution (geocalib/geocalib.py:18-41)."""

    feat_dim: int = 64

    @nn.compact
    def __call__(self, image: Array, train: bool = False) -> Array:
        assert image.shape[1] % 32 == 0 and image.shape[2] % 32 == 0, (
            "image size must be a multiple of 32"
        )
        x = ConvModule(self.feat_dim, 3, padding=1)(image, train=train)
        return ConvModule(self.feat_dim, 3, padding=1)(x, train=train)


class UpDecoder(nn.Module):
    """LightHamHead → 1×1 conv → L2-normalized up field
    (geocalib/geocalib.py:44-57)."""

    out_channels: int = 64
    ham_channels: int = 512

    @nn.compact
    def __call__(self, hl, ll, train: bool = False) -> Dict[str, Array]:
        feats, log_conf = LightHamHead(self.out_channels, self.ham_channels)(
            hl, ll, train=train
        )
        up = nn.Conv(2, (1, 1))(feats)
        # safe normalize: clamp INSIDE the sqrt. jnp.linalg.norm has a NaN
        # vjp at exactly-zero vectors (0/0), and bf16 conv outputs do hit
        # exact zeros — one such pixel NaN-poisons the gradients of every
        # upstream parameter (observed as a full training stall on TPU).
        sq = jnp.sum(up * up, axis=-1, keepdims=True)
        up = up / jnp.sqrt(jnp.maximum(sq, 1e-24))
        return {"up_field": up, "up_confidence": nn.sigmoid(log_conf)}


class LatitudeDecoder(nn.Module):
    """LightHamHead → 1×1 conv → tanh → asin latitude field
    (geocalib/geocalib.py:60-77)."""

    out_channels: int = 64
    ham_channels: int = 512

    @nn.compact
    def __call__(self, hl, ll, train: bool = False) -> Dict[str, Array]:
        feats, log_conf = LightHamHead(self.out_channels, self.ham_channels)(
            hl, ll, train=train
        )
        eps = 1e-5  # avoid inf in asin backward at ±1
        # tanh/clip/asin MUST run in f32: in bf16, 1 - 1e-5 rounds to exactly
        # 1.0, the clip becomes a no-op, and asin'(±1) = inf — one saturated
        # pixel then NaN-poisons the gradients of the whole shared trunk
        # (observed as a full on-chip training stall).
        pre = nn.Conv(1, (1, 1))(feats)
        lat = jnp.tanh(pre.astype(jnp.float32))
        lat = jnp.arcsin(jnp.clip(lat, -1 + eps, 1 - eps)).astype(pre.dtype)
        return {"latitude_field": lat, "latitude_confidence": nn.sigmoid(log_conf)}


class GeoCalibNet(nn.Module):
    """Full perspective-field network.

    Args (construction):
        variant: MSCAN size ("b" = released architecture, "tiny" for tests).
        bn_axis_name: mesh axis for synced BatchNorm stats during training.

    __call__ input: image (B, H, W, 3) RGB in [0, 1]; H, W multiples of 32.
    Output dict: up_field (B, H, W, 2), latitude_field (B, H, W, 1),
    up_confidence / latitude_confidence (B, H, W).
    """

    variant: str = "b"
    drop_path_rate: float = 0.0
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, image: Array, train: bool = False) -> Dict[str, Array]:
        dims, ratios, depths = MSCAN_VARIANTS[self.variant]
        # scale head widths with the backbone so the tiny variant stays tiny
        out_ch = min(64, dims[0])
        ham_ch = min(512, sum(dims))

        hl = MSCAN(
            embed_dims=dims,
            mlp_ratios=ratios,
            depths=depths,
            drop_path_rate=self.drop_path_rate,
            bn_axis_name=self.bn_axis_name,
        )(image, train=train)
        ll = LowLevelEncoder(feat_dim=out_ch)(image, train=train)

        out = UpDecoder(out_ch, ham_ch)(hl, ll, train=train)
        out |= LatitudeDecoder(out_ch, ham_ch)(hl, ll, train=train)
        return out
