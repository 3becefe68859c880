"""Isolated timing of the fused full-res RCU chain and its pieces (bf16, b=16).

Checks whether the in-context +18.6 ms for ffb_rcu1 (see
profile_fused_stages) is intrinsic op cost or graph-interaction overhead.
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

B, H, W, C = 16, 320, 320, 128
N = 10


def timeit(fn, *args):
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    k1 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
    k2 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C), jnp.bfloat16) * 0.05

    # full RCU: r=relu(x); h=relu(conv1(r)); out=conv2(h)+r
    def rcu(x, k1, k2):
        r = jax.nn.relu(x)
        h = jax.nn.relu(conv(r, k1))
        return conv(h, k2) + r

    print(f"rcu_full: {timeit(jax.jit(rcu), x, k1, k2):.2f} ms")
    print(f"two_convs_only: {timeit(jax.jit(lambda x, a, b: conv(conv(x, a), b)), x, k1, k2):.2f} ms")
    print(f"one_conv: {timeit(jax.jit(conv), x, k1):.2f} ms")
    print(f"relu_only: {timeit(jax.jit(jax.nn.relu), x):.2f} ms")

    # block-diagonal kernel assembled from halves (as in fused_heads)
    ha = k1[:, :, :64, :64]
    hb = k1[:, :, 64:, 64:]

    def rcu_assembled(x, ha, hb, k2):
        z = jnp.zeros((3, 3, 64, 64), ha.dtype)
        kd = jnp.concatenate(
            [jnp.concatenate([ha, z], 3), jnp.concatenate([z, hb], 3)], 2
        )
        r = jax.nn.relu(x)
        h = jax.nn.relu(conv(r, kd))
        return conv(h, k2) + r

    print(f"rcu_blockdiag_assembled: {timeit(jax.jit(rcu_assembled), x, ha, hb, k2):.2f} ms")


if __name__ == "__main__":
    main()
