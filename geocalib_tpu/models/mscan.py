"""MSCAN backbone (SegNeXt) in Flax, NHWC.

Re-design of the reference backbone (/root/reference/geocalib/modules.py:516-575,
/root/reference/siclib/models/encoders/mscan.py): 4-stage pyramid of
conv-attention blocks. Differences from the torch original are deliberate
TPU choices: NHWC end to end (no (B,N,C) flatten/permute round-trips — XLA
fuses the LayerNorm over the channel axis directly), stochastic depth done
with a per-sample mask, BatchNorm syncable over a mesh axis.

Variants: "b" is the released model (dims [64,128,320,512], depths
[3,3,12,3]); "tiny" is a test-size variant the reference lacks.
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from geocalib_tpu.models.modules import MSCANBlock, OverlapPatchEmbed, StemConv

Array = jnp.ndarray

MSCAN_VARIANTS = {
    # dims, mlp_ratios, depths
    "b": ((64, 128, 320, 512), (8, 8, 4, 4), (3, 3, 12, 3)),
    "tiny": ((16, 24, 32, 48), (4, 4, 2, 2), (1, 1, 2, 1)),
}


class MSCAN(nn.Module):
    """Multi-scale convolutional attention network.

    Input: RGB image in [0, 1], NHWC. Matches the reference's input mapping
    (RGB→BGR, ×255 — geocalib/modules.py:557-560) so converted weights stay
    drop-in compatible.

    Returns 4 feature maps at strides (4, 8, 16, 32).
    """

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 3, 12, 3)
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, image: Array, train: bool = False) -> Tuple[Array, ...]:
        # rgb -> bgr and [0,1] -> [0,255] (parity with reference weights)
        x = image[..., ::-1] * 255.0

        num_stages = len(self.embed_dims)
        total_depth = sum(self.depths)
        dpr = [
            self.drop_path_rate * i / max(total_depth - 1, 1) for i in range(total_depth)
        ]

        outs = []
        cur = 0
        for i in range(num_stages):
            if i == 0:
                x = StemConv(self.embed_dims[0], bn_axis_name=self.bn_axis_name)(
                    x, train=train
                )
            else:
                x = OverlapPatchEmbed(
                    self.embed_dims[i],
                    patch_size=3,
                    stride=2,
                    bn_axis_name=self.bn_axis_name,
                )(x, train=train)
            for j in range(self.depths[i]):
                x = MSCANBlock(
                    dim=self.embed_dims[i],
                    mlp_ratio=self.mlp_ratios[i],
                    drop=self.drop_rate,
                    drop_path=dpr[cur + j],
                    bn_axis_name=self.bn_axis_name,
                )(x, train=train)
            cur += self.depths[i]
            # eps matches torch nn.LayerNorm (weight-conversion parity)
            x = nn.LayerNorm(epsilon=1e-5)(x)  # over channels; NHWC needs no permute
            outs.append(x)

        return tuple(outs)
