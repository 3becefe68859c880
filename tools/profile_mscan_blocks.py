"""Marginal cost of one MSCANBlock per stage (scan-chained, bf16, batch 16).

Stage shapes for variant b at 320x320: s1 (80,80,64) x3 blocks,
s2 (40,40,128) x3, s3 (20,20,320) x12, s4 (10,10,512) x3.
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

from geocalib_tpu.models.modules import MSCANBlock

B = 16
N = 10


def timeit(fn, *args):
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def marginal(hw, dim, ratio, nblocks):
    block = MSCANBlock(dim=dim, mlp_ratio=ratio)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, hw, hw, dim), jnp.bfloat16)
    p = jax.jit(block.init)(jax.random.PRNGKey(1), x[:1])
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, p)

    def chain(reps):
        @jax.jit
        def f(p, x):
            def body(c, _):
                return block.apply(p, c), None
            out, _ = jax.lax.scan(body, x, None, length=reps)
            return out
        return f

    t1 = timeit(chain(1), p, x)
    t11 = timeit(chain(11), p, x)
    dt = (t11 - t1) / 10
    print(f"block @({hw},{hw},{dim}) r{ratio}: {dt:.3f} ms x{nblocks} = {dt*nblocks:.2f} ms")


def main():
    marginal(80, 64, 8, 3)
    marginal(40, 128, 8, 3)
    marginal(20, 320, 4, 12)
    marginal(10, 512, 4, 3)


if __name__ == "__main__":
    main()
