"""Fused-MSCANBlock kernel vs flax XLA backbone, on the current backend."""

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

from geocalib_tpu.models.mscan import MSCAN, MSCAN_VARIANTS
from geocalib_tpu.ops.mscan_block_kernel import mscan_forward_pallas

B, H, W = 16, 320, 320
N = 10


def timeit(fn, *args):
    red = jax.jit(
        lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a)))
    )
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def main():
    dims, ratios, depths = MSCAN_VARIANTS["b"]
    net = MSCAN(embed_dims=dims, mlp_ratios=ratios, depths=depths)
    img32 = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(1), img32)
    v16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables)
    img = jax.random.uniform(jax.random.PRNGKey(2), (B, H, W, 3), jnp.bfloat16)

    t_flax = timeit(lambda p, x: net.apply(p, x), v16, img)
    print(f"flax XLA backbone : {t_flax:7.2f} ms/batch", flush=True)
    t_kern = timeit(
        lambda p, x: mscan_forward_pallas(
            p["params"], p.get("batch_stats", {}), x, MSCAN_VARIANTS["b"]
        ),
        v16,
        img,
    )
    print(f"fused block kernel: {t_kern:7.2f} ms/batch  ({t_flax / t_kern:.2f}x)", flush=True)

    # numerical sanity on-backend
    a = jax.jit(lambda p, x: net.apply(p, x))(v16, img[:2])
    b = jax.jit(
        lambda p, x: mscan_forward_pallas(
            p["params"], p.get("batch_stats", {}), x, MSCAN_VARIANTS["b"]
        )
    )(v16, img[:2])
    for i, (x, y) in enumerate(zip(a, b)):
        d = np.abs(np.asarray(x, np.float32) - np.asarray(y, np.float32)).max()
        m = np.abs(np.asarray(x, np.float32)).max()
        print(f"stage {i}: max abs diff {d:.4f} (ref max {m:.2f})", flush=True)


if __name__ == "__main__":
    main()
