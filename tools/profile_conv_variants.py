"""Which formulation of the full-res 3x3/64ch conv runs fastest on the MXU?

Measures (in,out) channel combinations, grouped conv (two heads fused
block-diagonally), and a space-to-depth reformulation, all bf16 batch 16.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

B, H, W = 16, 320, 320
N = 10


def timeit(fn, *args):
    red = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def conv(x, k, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def main():
    key = jax.random.PRNGKey(0)

    for cin, cout in [(64, 64), (64, 128), (128, 64), (128, 128), (64, 256), (256, 64)]:
        x = jax.random.normal(key, (B, H, W, cin), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16)
        dt = timeit(jax.jit(conv), x, k)
        gfl = B * H * W * 9 * cin * cout * 2 / 1e9
        print(f"conv3x3 {cin}->{cout}: {dt:.2f} ms  ({gfl/dt:.0f} GFLOP/ms)")

    # two heads fused as one grouped conv (block-diagonal weights)
    x = jax.random.normal(key, (B, H, W, 128), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, 64, 128), jnp.bfloat16)
    dt = timeit(jax.jit(partial(conv, groups=2)), x, k)
    print(f"conv3x3 grouped 2x(64->64): {dt:.2f} ms")

    # space-to-depth: 3x3@320x320x64 == 2x2@160x160x256 (kernel covers 4x4)
    x = jax.random.normal(key, (B, H // 2, W // 2, 256), jnp.bfloat16)
    k = jax.random.normal(key, (2, 2, 256, 256), jnp.bfloat16)

    def s2d_conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    dt = timeit(jax.jit(s2d_conv), x, k)
    print(f"conv2x2 s2d 256->256 @160x160: {dt:.2f} ms")

    # fused both-heads s2d: 2x2 @ 160x160, 256 -> 512 grouped x2
    k2 = jax.random.normal(key, (2, 2, 256, 512), jnp.bfloat16)
    dt = timeit(jax.jit(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
    )), jnp.concatenate([x, x], -1), k2)
    print(f"conv2x2 s2d grouped 2x(256->256): {dt:.2f} ms")


if __name__ == "__main__":
    main()
