"""Per-module timing of the flagship CNN on the current backend.

Times MSCAN backbone, LowLevelEncoder, and the two decoder heads separately
(bf16, batch 16 @ 320x320), plus the full net at batch 16 and 32, to show
where end-to-end milliseconds go.
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

from geocalib_tpu.models.geocalib_net import GeoCalibNet, LatitudeDecoder, LowLevelEncoder, UpDecoder
from geocalib_tpu.models.mscan import MSCAN, MSCAN_VARIANTS

B, H, W = 16, 320, 320
N = 10


def timeit(fn, *args):
    # reduce to a scalar ON DEVICE: fetching full activations through the
    # remote-TPU tunnel would dominate the measurement
    red = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def main():
    key = jax.random.PRNGKey(0)
    dims, ratios, depths = MSCAN_VARIANTS["b"]

    def bf16(p):
        return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)

    img = jnp.zeros((B, H, W, 3), jnp.bfloat16)

    backbone = MSCAN(embed_dims=dims, mlp_ratios=ratios, depths=depths)
    pb = bf16(jax.jit(backbone.init)(key, jnp.zeros((1, H, W, 3), jnp.bfloat16)))
    bb = jax.jit(lambda p, x: backbone.apply(p, x))
    print(f"mscan_backbone: {timeit(bb, pb, img):.1f} ms/batch")
    hl = jax.tree.map(jnp.asarray, bb(pb, img))

    ll_enc = LowLevelEncoder(feat_dim=64)
    pl = bf16(jax.jit(ll_enc.init)(key, jnp.zeros((1, H, W, 3), jnp.bfloat16)))
    lf = jax.jit(lambda p, x: ll_enc.apply(p, x))
    print(f"lowlevel_encoder: {timeit(lf, pl, img):.1f} ms/batch")
    ll = jnp.asarray(lf(pl, img))

    for name, head in [("up_head", UpDecoder(64, 512)), ("lat_head", LatitudeDecoder(64, 512))]:
        ph = bf16(jax.jit(head.init)(key, jax.tree.map(lambda x: x[:1], hl), ll[:1]))
        hf = jax.jit(lambda p, h, l, head=head: head.apply(p, h, l))
        print(f"{name}: {timeit(hf, ph, hl, ll):.1f} ms/batch")

    net = GeoCalibNet(variant="b")
    pn = jax.jit(net.init)({"params": key}, jnp.zeros((1, H, W, 3), jnp.float32))
    for b in (16, 32):
        im = jnp.zeros((b, H, W, 3), jnp.float32)

        @jax.jit
        def full(p, x):
            pp = jax.tree.map(lambda v: v.astype(jnp.bfloat16), p)
            return net.apply(pp, x.astype(jnp.bfloat16))

        dt = timeit(full, pn, im)
        print(f"full_net b={b}: {dt:.1f} ms/batch -> {b / dt * 1e3:.1f} img/s")


if __name__ == "__main__":
    main()
