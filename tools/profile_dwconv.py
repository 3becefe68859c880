"""Marginal cost of MSCAN's depthwise/strip convs vs their FLOP/bandwidth floor.

MSCAN stage shapes (variant b, batch 16 @ 320x320 input):
  stage1 (16, 80, 80, 64), stage2 (16, 40, 40, 128),
  stage3 (16, 20, 20, 320), stage4 (16, 10, 10, 512).
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

N = 10


def timeit(fn, *args):
    np.asarray(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def dw(x, k):
    C = x.shape[-1]
    kh, kw = k.shape[0], k.shape[1]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def chain(reps, kh, kw):
    @jax.jit
    def f(x, k):
        def body(c, _):
            return dw(c, k), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))
    return f


def marginal(shape, kh, kw):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.bfloat16)
    k = jax.random.normal(key, (kh, kw, 1, shape[-1]), jnp.bfloat16) * 0.3
    t1 = timeit(chain(1, kh, kw), x, k)
    t21 = timeit(chain(21, kh, kw), x, k)
    dt = (t21 - t1) / 20
    mb = np.prod(shape) * 2 / 1e6
    print(f"dw {kh}x{kw} @{shape}: {dt:.3f} ms  ({2*mb/dt:.0f} GB/s r+w)")


def main():
    for shape in [(16, 80, 80, 64), (16, 40, 40, 128), (16, 20, 20, 320)]:
        marginal(shape, 5, 5)
        marginal(shape, 1, 7)
        marginal(shape, 7, 1)
        marginal(shape, 1, 21)
        marginal(shape, 21, 1)
        marginal(shape, 3, 3)


if __name__ == "__main__":
    main()
