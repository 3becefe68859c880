"""Micro-bench the pieces of LightHamHead to find the decoder-time dominator.

Times, in bf16 at batch 16: full-res 3x3 convs (the FLOP bulk), the
FeatureFusionBlock, Hamburger/NMF at stride 8, bilinear resizes, and the
scale-aggregation squeeze.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from geocalib_tpu.models.hamburger import Hamburger
from geocalib_tpu.models.modules import Conv2d, FeatureFusionBlock, resize_bilinear

B = 16
N = 10


def timeit(fn, *args):
    red = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def bench_module(name, mod, *xs):
    key = jax.random.PRNGKey(0)
    p = jax.jit(mod.init)(key, *jax.tree.map(lambda x: x[:1], xs))
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    f = jax.jit(lambda p, *a: mod.apply(p, *a))
    print(f"{name}: {timeit(f, p, *xs):.2f} ms")


def main():
    x_full = jnp.zeros((B, 320, 320, 64), jnp.bfloat16)
    x_half = jnp.zeros((B, 160, 160, 64), jnp.bfloat16)
    x_s8 = jnp.zeros((B, 80, 80, 512), jnp.bfloat16)
    x_cat = jnp.zeros((B, 80, 80, 1024), jnp.bfloat16)

    bench_module("conv3x3_64_fullres", Conv2d(64, 3, padding=1), x_full)
    bench_module("ffb_fullres", FeatureFusionBlock(64, upsample=False), x_full, x_full)
    bench_module("hamburger_s8", Hamburger(512), x_s8)
    bench_module("squeeze_1x1_1024to512", Conv2d(512, 1), x_cat)
    bench_module("conv3x3_64_halfres", Conv2d(64, 3, padding=1), x_half)

    f = jax.jit(lambda x: resize_bilinear(x, (320, 320)))
    print(f"resize_160to320: {timeit(f, x_half):.2f} ms")

    # how much faster is the same full-res FLOP volume at 128 channels?
    x128 = jnp.zeros((B, 320, 320, 128), jnp.bfloat16)
    bench_module("conv3x3_128_fullres", Conv2d(128, 3, padding=1), x128)


if __name__ == "__main__":
    main()
