"""Split timing: CNN forward vs LM solver vs end-to-end, on the current backend.

Run on the TPU to see where the bench's time actually goes. Same pipelined
timing discipline as bench.py (enqueue all, one final fetch).
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

from geocalib_tpu.models import GeoCalibNet
from geocalib_tpu.optim.lm import LMConfig, run_lm

B, H, W = 16, 320, 320
N = 10


def timeit(fn, *args):
    np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.time()
    outs = [fn(*args) for _ in range(N)]
    np.asarray(jax.tree.leaves(outs[-1])[0])
    return (time.time() - t0) / N


def main():
    on_tpu = jax.default_backend() != "cpu"
    net = GeoCalibNet(variant="b")
    params = jax.jit(net.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 3), jnp.float32)
    )
    key = jax.random.PRNGKey(42)

    @jax.jit
    def cnn_only(params, key):
        image = jax.random.uniform(key, (B, H, W, 3), jnp.float32)
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        fields = net.apply(p, image.astype(jnp.bfloat16))
        return {k: v.astype(jnp.float32) for k, v in fields.items()}

    fields = cnn_only(params, key)
    fields = jax.tree.map(lambda x: np.asarray(x), fields)
    fields_dev = jax.tree.map(jnp.asarray, fields)

    for name, cfg in [
        ("lm_pallas", LMConfig(use_pallas=on_tpu)),
        ("lm_xla", LMConfig(use_pallas=False)),
    ]:
        lm = jax.jit(lambda f, cfg=cfg: run_lm(dict(f), cfg).gravity.rp)
        dt = timeit(lm, fields_dev)
        print(f"{name}: {dt*1e3:.1f} ms/batch -> {B/dt:.1f} img/s")

    dt = timeit(cnn_only, params, key)
    print(f"cnn_bf16: {dt*1e3:.1f} ms/batch -> {B/dt:.1f} img/s")


if __name__ == "__main__":
    main()
