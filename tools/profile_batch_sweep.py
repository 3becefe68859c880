"""Throughput vs batch size for the fused serving path.

The bench pins batch 16; serving throughput on TPU generally rises with
batch until HBM or scheduling saturates. Run on the chip:

    python tools/profile_batch_sweep.py [batches...]
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

import bench
from geocalib_tpu.models import GeoCalibNet
from geocalib_tpu.optim.lm import LMConfig


def main():
    batches = [int(a) for a in sys.argv[1:]] or [16, 24, 32, 48, 64]
    net = GeoCalibNet(variant="b")
    params = jax.jit(net.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 320, 320, 3), jnp.float32)
    )
    key = jax.random.PRNGKey(42)
    on_tpu = jax.default_backend() != "cpu"
    for b in batches:
        bench.B = b
        fwd = bench.build_forward(net, LMConfig(use_pallas=on_tpu), fused=True)
        dt = bench.time_path(fwd, params, key)
        print(f"B={b:3d}  {dt * 1e3:7.1f} ms/batch  {b / dt:7.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
