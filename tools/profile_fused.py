"""Fused vs unfused full-net throughput on the current backend (bf16, b=16)."""

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

from geocalib_tpu.models.fused_heads import fused_forward
from geocalib_tpu.models.geocalib_net import GeoCalibNet

B, H, W = 16, 320, 320
N = 10


def timeit(fn, *args):
    red = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def main():
    net = GeoCalibNet(variant="b")
    pn = jax.jit(net.init)({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 3), jnp.float32))
    img = jnp.zeros((B, H, W, 3), jnp.float32)

    def cast(p):
        return jax.tree.map(lambda v: v.astype(jnp.bfloat16), p)

    dt = timeit(jax.jit(lambda p, x: net.apply(cast(p), x.astype(jnp.bfloat16))), pn, img)
    print(f"unfused: {dt:.1f} ms/batch -> {B/dt*1e3:.1f} img/s")
    dt = timeit(jax.jit(lambda p, x: fused_forward(cast(p), x.astype(jnp.bfloat16))), pn, img)
    print(f"fused:   {dt:.1f} ms/batch -> {B/dt*1e3:.1f} img/s")


if __name__ == "__main__":
    main()
