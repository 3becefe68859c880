"""Stage-by-stage timing of LightHamHead by differencing jitted prefixes.

Each prefix is one jit call (so the ~3 ms relay overhead cancels in the
differences). Stages follow hamburger.py:LightHamHead.__call__.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from geocalib_tpu.models.hamburger import Hamburger, LightHamHead
from geocalib_tpu.models.modules import ConvModule, Conv2d, FeatureFusionBlock, resize_bilinear

B = 16
N = 10
DIMS = (64, 128, 320, 512)


def timeit(fn, *args):
    red = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


from flax import linen as nn


class HeadPrefix(LightHamHead):
    stages: int = 1

    @nn.compact
    def __call__(self, hl_features, ll_features, train=False):
        target = hl_features[0].shape[1:3]
        ups = [resize_bilinear(f, target) for f in hl_features]
        x = jnp.concatenate(ups, axis=-1)
        if self.stages == 1:
            return x
        x = ConvModule(self.ham_channels, 1)(x, train=train)
        if self.stages == 2:
            return x
        x = Hamburger(self.ham_channels)(x, train=train)
        if self.stages == 3:
            return x
        feats = ConvModule(self.out_channels, 1)(x, train=train)
        feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
        if self.stages == 4:
            return feats
        feats = ConvModule(self.out_channels, 3, padding=1, use_bias=False)(feats, train=train)
        feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
        if self.stages == 5:
            return feats
        feats = FeatureFusionBlock(self.out_channels, upsample=False)(feats, ll_features)
        if self.stages == 6:
            return feats
        unc = ConvModule(self.out_channels, 3, padding=1, use_bias=False)(feats, train=train)
        log_confidence = Conv2d(1, 1)(unc)[..., 0]
        return feats, log_confidence


STAGE_NAMES = {
    1: "ups_resize+concat",
    2: "squeeze_1x1",
    3: "hamburger_nmf",
    4: "align+resize_x2",
    5: "conv3x3@160+resize_x2",
    6: "feature_fusion@320",
    7: "uncertainty_convs@320",
}


def main():
    key = jax.random.PRNGKey(0)
    hl = [
        jax.random.normal(key, (B, 320 // s, 320 // s, d), jnp.bfloat16)
        for s, d in zip((4, 8, 16, 32), DIMS)
    ]
    ll = jax.random.normal(key, (B, 320, 320, 64), jnp.bfloat16)

    prev = 0.0
    for s in range(1, 8):
        head = HeadPrefix(64, 512, stages=s)
        p = jax.jit(head.init)(key, jax.tree.map(lambda x: x[:1], hl), ll[:1])
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        f = jax.jit(lambda p, h, l, head=head: head.apply(p, h, l))
        t = timeit(f, p, hl, ll)
        print(f"prefix {s} ({STAGE_NAMES[s]}): {t:.2f} ms  (+{t - prev:.2f})")
        prev = t


if __name__ == "__main__":
    main()
